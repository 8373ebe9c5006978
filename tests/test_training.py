"""Tests for training machinery: optimizer masks, GOP loss, curriculum."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.models import PWave, PMCTF
from learned_pmctf_tpu.training.optim import (
    make_optimizer, trainable_mask, decay_mask)
from learned_pmctf_tpu.training.steps import (
    StageGates, make_pwave_train_step, make_pmctf_train_step)
from learned_pmctf_tpu.training.curriculum import (
    CurriculumConfig, clone_me_stage, load_from_iframe, PART_PREDICATES)


RNG = jax.random.PRNGKey(0)


def _img(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, shape), jnp.float32)


def test_stage_gates_match_reference_rules():
    # ref: train_pMCTF_L.py:110-118
    g0 = StageGates.for_stage(0)
    assert g0.d_me == 1.0 and g0.d_rec == 0.0 and g0.r_mv == 0.0
    g1 = StageGates.for_stage(1)
    assert g1.r_mv == 1.0 and g1.r_latent == 0.0
    g2 = StageGates.for_stage(2)
    assert g2.d_rec == 1.0 and g2.r_latent == 1.0 and g2.d_me == 0.0


def test_trainable_mask_and_frozen_updates():
    m = PWave(decomp_levels=2, features=8, ar_features=8)
    x = _img((1, 1, 16, 16))
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    mask = trainable_mask(params, lambda p: not p.startswith("wavelet"))
    tx = make_optimizer(params, 1e-3, trainable=mask)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    frozen_norm = sum(
        float(jnp.sum(jnp.abs(v)))
        for v in jax.tree.leaves(updates["params"]["wavelet"]))
    live_norm = sum(
        float(jnp.sum(jnp.abs(v)))
        for v in jax.tree.leaves(updates["params"]["dequant"]))
    assert frozen_norm == 0.0
    assert live_norm > 0.0


def test_decay_mask_excludes_biases_and_scalars():
    m = PWave(decomp_levels=2, features=8, ar_features=8)
    x = _img((1, 1, 16, 16))
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    dm = decay_mask(params)
    # QP is (2,1,1,1) 4-D -> decayed? reference excludes 1-D and biases;
    # QP has ndim 4 so it IS decayed there too. biases must be excluded:
    leaf = dm["params"]["dequant"]["conv1"]
    assert leaf["kernel"] is True and leaf["bias"] is False


def test_pwave_train_step_reduces_loss():
    m = PWave(decomp_levels=2, features=8, ar_features=8)
    x = _img((2, 1, 32, 32), 1)
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    tx = make_optimizer(params, 1e-4)
    opt_state = tx.init(params)
    step = make_pwave_train_step(m, tx)
    losses = []
    for i in range(3):
        params, opt_state, metrics = step(
            params, opt_state, x, jnp.float32(10.0), jnp.float32(0.01))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_pmctf_gop2_train_step():
    m = PMCTF(decomp_levels=1, num_me_stages=2, channel_mv=8, channel_n=8,
              features=8, ar_features=8, spynet_levels=4)
    frames = jnp.stack([_img((1, 1, 64, 64), s) for s in range(2)])
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: m.init(r, frames[0], frames[1], 10, dpb,
                         method=PMCTF.full_init_graph)
    )({"params": RNG, "noise": jax.random.PRNGKey(1)})
    tx = make_optimizer(params, 1e-4, clip_norm=5.0)
    opt_state = tx.init(params)
    step = make_pmctf_train_step(m, tx, 2, StageGates.for_stage(4),
                                 remat=True)
    params, opt_state, metrics = step(
        params, opt_state, frames, jnp.float32(10.0), jnp.float32(0.05),
        jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["rd_loss"]))
    assert float(metrics["bpp_H"]) > 0


def test_curriculum_config_parses_reference_schedule():
    cfg = CurriculumConfig.from_json("configs/train_mctf_gop16.json")
    assert cfg.total_epochs == 29
    assert sum(cfg.num_epochs) == 29
    assert cfg.num_frames == [4, 4, 2, 2, 2, 4, 8, 16]
    assert cfg.parts[0] == "Inter" and cfg.parts[3] == "MCTF"


def test_part_predicates():
    assert PART_PREDICATES["Inter"]("mv_encoder_0/enc_1/kernel")
    assert PART_PREDICATES["Inter"]("temporal_filtering_0/p_t/conv1/bias")
    assert not PART_PREDICATES["Inter"]("hp_coder/QP")
    assert not PART_PREDICATES["All"]("optic_flow/basic_0/conv1/kernel")
    assert PART_PREDICATES["All"]("lp_coder/QP")


def test_clone_me_stage():
    params = {"params": {
        "mv_encoder_0": {"k": jnp.ones((2, 2))},
        "mv_encoder_1": {"k": jnp.zeros((2, 2))},
        "mv_spatial_adaptors_0_0": {"k": jnp.full((2,), 3.0)},
        "mv_spatial_adaptors_1_0": {"k": jnp.zeros((2,))},
        "mv_y_q_scale_enc": jnp.stack([jnp.full((2, 1, 1, 1), 5.0),
                                       jnp.zeros((2, 1, 1, 1))]),
        "mv_y_q_scale_dec": jnp.stack([jnp.full((2, 1, 1, 1), 7.0),
                                       jnp.zeros((2, 1, 1, 1))]),
    }}
    out = clone_me_stage(params, start_idx=1, copy_idx=0, num_me_stages=2)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mv_encoder_1"]["k"]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mv_spatial_adaptors_1_0"]["k"]), 3.0)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["mv_y_q_scale_enc"][1]), 5.0)


def test_load_from_iframe():
    params = {"params": {"lp_coder": {"a": jnp.zeros(2)},
                         "hp_coder": {"a": jnp.zeros(2)},
                         "optic_flow": {"b": jnp.zeros(2)}}}
    iframe = {"params": {"a": jnp.ones(2)}}
    out = load_from_iframe(params, iframe)
    np.testing.assert_array_equal(np.asarray(out["params"]["lp_coder"]["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["params"]["hp_coder"]["a"]), 1.0)


@pytest.mark.slow
def test_pmctf_split_step_matches_fused():
    """The per-stage-program split step (the GOP-16 compile-size fix)
    reproduces the fused step's metrics, end-to-end gradients and
    post-Adam params (tests/split_step_equiv_script.py; CPU subprocess
    so the suite's TPU stays free of its many small compiles)."""
    import os
    import subprocess
    import sys

    from tests.conftest import SANITIZED_CPU_ENV

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(SANITIZED_CPU_ENV)
    env["PMCTF_EQUIV_GOP"] = "4"
    env["XLA_FLAGS"] = ""  # single CPU device is enough
    proc = subprocess.run(
        [sys.executable,
         os.path.join(root, "tests", "split_step_equiv_script.py")],
        env=env, capture_output=True, text=True, timeout=7000, cwd=root)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "SPLIT_STEP_EQUIV_OK" in proc.stdout
