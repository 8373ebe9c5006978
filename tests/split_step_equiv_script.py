"""Split-step vs fused-step equivalence (run on CPU, subprocess).

Runs ONE tiny pMCTF GOP-8 train step through both implementations —
the fused single-program step (make_pmctf_train_step) and the
per-stage-program split step (make_pmctf_train_step_split, the GOP-16
compile-size fix) — from identical params/optimizer state/frames/rng,
and asserts the resulting metrics AND updated parameters match. The
split step chains per-stage VJP programs with manual cotangent
threading; this script is the proof that the chaining reproduces the
fused end-to-end gradient exactly (up to float reassociation across
jit boundaries).

Invoke via tests/test_training.py::test_pmctf_split_step_matches_fused,
or directly:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python tests/split_step_equiv_script.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.training.optim import make_optimizer
    from learned_pmctf_tpu.training.steps import (
        StageGates, make_pmctf_train_step, make_pmctf_train_step_split)
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    gop = int(os.environ.get("PMCTF_EQUIV_GOP", "8"))

    module = PMCTF(decomp_levels=1, num_me_stages=2, channel_mv=8,
                   channel_n=8, features=8, ar_features=8, spynet_levels=2)
    g = np.random.default_rng(0)
    frames = jnp.asarray(
        g.integers(0, 256, (gop, 1, 1, 64, 64)), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, frames[0], frames[1], 10, dpb,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)})

    tx = make_optimizer(params, 1e-4, clip_norm=5.0)
    opt_state = tx.init(params)
    gates = StageGates.for_stage(7)
    q = jnp.float32(10.0)
    lm = jnp.float32(0.05)
    rng = jax.random.PRNGKey(2)

    from learned_pmctf_tpu.training.steps import pmctf_gop_loss

    fused = make_pmctf_train_step(module, tx, gop, gates, me_base=0)
    split = make_pmctf_train_step_split(module, tx, gop, gates, me_base=0,
                                        return_grads=True)

    # fused gradients straight off the end-to-end loss
    def loss_fn(p):
        return pmctf_gop_loss(module, p, [frames[i] for i in range(gop)],
                              q, lm, gates, 0, rng, True)

    (_, m_f), g_f = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(params)
    p_f, _, _ = fused(params, opt_state, frames, q, lm, rng)
    p_s, _, m_s, g_s = split(params, opt_state, frames, q, lm, rng)

    for k in ("rd_loss", "bpp_L", "bpp_H", "bpp_mv", "mse", "me_mse"):
        a, b = float(m_f[k]), float(m_s[k])
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6,
                                   err_msg=f"metric {k}")

    # raw-gradient comparison, scale-aware per leaf: a chaining bug
    # (missing/duplicated cotangent term) shows up at the leaf's own
    # magnitude; float reassociation across the split's jit boundaries
    # only perturbs near-zero leaves, absorbed by the atol term.
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    flat_s = jax.tree.leaves(g_s)
    assert len(flat_f) == len(flat_s)
    for (path, a), b in zip(flat_f, flat_s):
        a, b = np.asarray(a), np.asarray(b)
        atol = 1e-5 * (1.0 + float(np.max(np.abs(a))))
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=atol,
            err_msg=f"grad {jax.tree_util.keystr(path)}")

    # post-Adam params: belt-and-braces on top of the grad check. Adam's
    # first-step update is ~lr·sign(g), so float-reassociation sign flips
    # of NEAR-ZERO grads legitimately move a param by up to 2·lr = 2e-4;
    # atol sits just above that (systematic optimizer-path bugs move many
    # params well beyond it, and the raw-grad check above pins the rest).
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(p_f),
                            jax.tree.leaves(p_s)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=2.5e-4,
            err_msg=f"param {jax.tree_util.keystr(path)}")
    print("SPLIT_STEP_EQUIV_OK", float(m_f["rd_loss"]), float(m_s["rd_loss"]))


if __name__ == "__main__":
    main()
