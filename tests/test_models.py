"""Model-level tests: pWave forward, lossless perfect reconstruction,
four-step teacher-forcing consistency, pMCTF forward/inverse."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.models import PWave, PMCTF
from learned_pmctf_tpu.models.context import ContextFusionFourStep
from learned_pmctf_tpu.models.wavelet import LiftingScheme2D


RNG = jax.random.PRNGKey(0)


def _img(shape, seed=0, maxval=256):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, maxval, shape), jnp.float32)


@pytest.fixture(scope="session")
def pwave_small():
    m = PWave(decomp_levels=2, features=16, ar_features=16)
    x = _img((1, 1, 32, 32))
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    return m, params


@pytest.fixture(scope="session")
def pwave_lossless():
    m = PWave(decomp_levels=2, lossy=False, features=16, ar_features=16)
    x = _img((1, 1, 32, 32))
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    return m, params


def test_lifting2d_learned_roundtrip():
    m = LiftingScheme2D(lossy=True)
    x = _img((1, 1, 32, 16), 1)
    params = jax.jit(lambda: m.init(RNG, x))()

    def roundtrip(p, x):
        sb = m.apply(p, x, method=LiftingScheme2D.forward_lift_2d)
        return m.apply(p, sb, method=LiftingScheme2D.backward_lift_2d)

    rec = jax.jit(roundtrip)(params, x)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-2)


def test_pwave_forward_outputs(pwave_small):
    m, params = pwave_small
    x = _img((2, 1, 32, 32), 2)
    out = jax.jit(lambda p, x: m.apply(p, x, 10))(params, x)
    assert out["x_hat"].shape == x.shape
    assert out["bits"].shape == (2,)
    assert float(out["bpp_total"]) > 0
    assert np.isfinite(float(out["mse"]))


def test_pwave_variable_rate_single_compilation(pwave_small):
    """q_index is traced: ONE compiled program serves all 21 rate points.
    With distinct learned (min, max) QP endpoints, the rate must increase
    with q_index (larger q scale = finer quantization)."""
    m, params = pwave_small
    # at init min==max==1/16 (interp is constant); emulate a trained model
    qp = jnp.array([0.02, 1.0]).reshape(2, 1, 1, 1)
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["params"]["QP"] = qp
    params["params"]["QP_ll"] = qp
    x = _img((1, 1, 32, 32), 3)
    f = jax.jit(lambda p, x, q: m.apply(p, x, q))
    bpps = [float(f(params, x, q)["bpp_total"]) for q in (0.0, 10.0, 20.0)]
    assert bpps[0] < bpps[1] < bpps[2], bpps


def test_pwave_lossless_perfect_reconstruction(pwave_lossless):
    """In lossless mode the full codec is exactly invertible:
    integer lifting + rounded-mean residual coding reconstructs x."""
    m, params = pwave_lossless
    x = _img((1, 1, 32, 32), 4)
    out = jax.jit(lambda p, x: m.apply(p, x, training=False))(params, x)
    np.testing.assert_array_equal(np.asarray(out["x_hat"]), np.asarray(x))


def test_pwave_grads_flow(pwave_small):
    m, params = pwave_small
    x = _img((1, 1, 32, 32), 5)

    def loss(p):
        out = m.apply(p, x, 10)
        return 0.01 * out["mse"] + out["bpp_total"]

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in leaves)
    assert np.isfinite(total) and total > 0
    # QP params train (rate-distortion tradeoff reaches them)
    gq = g["params"]["QP"]
    assert float(jnp.sum(jnp.abs(gq))) > 0


def test_fourstep_write_mode_consistent():
    """write-mode x_hat must equal forward x_hat (same coding decisions),
    and the 4 symbol planes must partition the quantized residual."""
    m = ContextFusionFourStep(in_ch=1, ctx_ch=1, features=8, use_ctx=True)
    x = _img((1, 1, 16, 16), 6, maxval=16) - 8.0
    ctx = _img((1, 1, 16, 16), 7, maxval=4)
    params = jax.jit(lambda: m.init(RNG, x, ctx))()

    fwd = jax.jit(lambda p: m.apply(p, x, ctx, training=False))
    wr = jax.jit(lambda p: m.apply(p, x, ctx, write=True, training=False))
    x_res, x_q, x_hat, s_hat = fwd(params)
    out = wr(params)
    syms, scales, x_hat_w = out[0:4], out[4:8], out[8]
    np.testing.assert_allclose(np.asarray(x_hat_w), np.asarray(x_hat), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sum(syms)), np.asarray(x_q), rtol=1e-6)


@pytest.fixture(scope="session")
def pmctf_small():
    m = PMCTF(decomp_levels=2, num_me_stages=2, channel_mv=8, channel_n=8,
              features=16, ar_features=16)
    g = np.random.default_rng(0)
    ref = _img((1, 1, 64, 64), 8)
    cur = _img((1, 1, 64, 64), 9)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    rngs = {"params": RNG, "noise": jax.random.PRNGKey(1)}
    params = jax.jit(lambda: m.init(rngs, ref, cur, 10, dpb,
                                    method=PMCTF.full_init_graph))()
    return m, params, ref, cur


def test_pmctf_forward_one_stage(pmctf_small):
    m, params, ref, cur = pmctf_small
    dpb = {"mv_feature": None, "ref_mv_y": None}
    out = jax.jit(
        lambda p, r, c, k: m.apply(p, r, c, 10, True, dpb, rngs={"noise": k})
    )(params, ref, cur, jax.random.PRNGKey(2))
    for key in ("bpp", "bpp_me", "bpp_H", "bpp_L", "me_mse", "L_t", "H_t", "mv_hat"):
        assert key in out, key
    assert out["L_t"].shape == ref.shape
    assert out["H_t"].shape == ref.shape
    assert out["mv_hat"].shape == (1, 2, 64, 64)
    assert out["dpb"]["mv_feature"] is not None
    assert float(out["bpp"]) > 0


def test_pmctf_dpb_second_stage(pmctf_small):
    """Second stage consumes the DPB from the first (adaptor_1 path)."""
    m, params, ref, cur = pmctf_small
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    f0 = jax.jit(lambda p, r, c: m.apply(p, r, c, 10, False, dpb0,
                                         training=False))
    out0 = f0(params, ref, cur)
    dpb1 = out0["dpb"]
    f1 = jax.jit(lambda p, r, c, d: m.apply(p, r, c, 10, False, d,
                                            stage_idx=1, training=False))
    out1 = f1(params, ref, cur, dpb1)
    assert float(out1["bpp"]) > 0


def test_pmctf_mctf_inverse_consistency(pmctf_small):
    """inverse_mctf(forward_mctf(ref, cur)) == (ref, cur) to fp tolerance."""
    m, params, ref, cur = pmctf_small
    mv = jnp.asarray(np.random.default_rng(3).normal(size=(1, 2, 64, 64)) * 2,
                     jnp.float32)

    def roundtrip(p, r, c, mv):
        l, h, _, _ = m.apply(p, r, c, mv, 0, method=PMCTF.forward_mctf)
        return m.apply(p, l, h, mv, 0, method=PMCTF.inverse_mctf)

    r2, c2 = jax.jit(roundtrip)(params, ref, cur, mv)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(ref), atol=1e-3)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(cur), atol=1e-3)


def test_pmctf_chroma_path(pmctf_small):
    """Chroma pass with reused halved MV (batch 2 chroma planes)."""
    m, params, ref, cur = pmctf_small
    chroma_ref = _img((2, 1, 32, 32), 10)
    chroma_cur = _img((2, 1, 32, 32), 11)
    mv = jnp.asarray(np.random.default_rng(4).normal(size=(1, 2, 64, 64)),
                     jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    out = jax.jit(
        lambda p, r, c, mv: m.apply(p, r, c, 10, True, dpb, mv_hat=mv,
                                    training=False)
    )(params, chroma_ref, chroma_cur, mv)
    assert out["L_t"].shape == chroma_ref.shape
    assert out["bpp_me"] is None
