"""Bitstream round-trip tests: compress -> decompress parity.

The de-facto correctness criterion of the reference (SURVEY.md §4): the
decoded reconstruction must match the encoder-side reconstruction exactly.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.models import PWave
from learned_pmctf_tpu.codec import PWaveCodec


RNG = jax.random.PRNGKey(0)


def _img(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, shape), jnp.float32)


def _trained_like_params(m, params):
    """Spread QP endpoints so rate points differ (init has min==max)."""
    qp = jnp.array([0.02, 0.5]).reshape(2, 1, 1, 1)
    params["params"]["QP"] = qp
    params["params"]["QP_ll"] = qp
    return params


@pytest.fixture(scope="session")
def pwave_codec():
    m = PWave(decomp_levels=2, features=16, ar_features=16, ll_mode="fourstep")
    x = _img((1, 1, 32, 32))
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    params = _trained_like_params(m, params)
    return PWaveCodec(m, params)


def _assert_roundtrip(codec, f, x_hat_enc, padding, q_index):
    """Decoded recon vs encoder recon, as tight as the construction allows.

    The decoded integer symbols are exact by construction (any symbol
    error desyncs the range coder and produces O(100) errors, not 1e-5).
    The reconstructions can differ by float ulps ONLY because the encoder
    evaluates the parameter nets inside one fused program while the
    decoder uses standalone sub-programs; XLA may fuse/reassociate those
    differently. 1e-5 is far below one quantization step, so any real
    divergence (context-model mismatch, stream desync) fails loudly.
    Decoding itself must be bit-deterministic: two decodes are identical.
    """
    atol = getattr(codec, "_rt_atol", 1e-5)
    out = codec.decompress(file_name=f, padding=padding, q_index=q_index)
    np.testing.assert_allclose(
        np.asarray(out["x_hat"]), np.asarray(x_hat_enc), atol=atol, rtol=0)
    out2 = codec.decompress(file_name=f, padding=padding, q_index=q_index)
    np.testing.assert_array_equal(
        np.asarray(out["x_hat"]), np.asarray(out2["x_hat"]))
    return out


def test_pwave_fourstep_roundtrip(pwave_codec, tmp_path):
    codec = pwave_codec
    x = _img((1, 1, 32, 32), 1)
    f = str(tmp_path / "img.bin")
    x_hat_enc, stream = codec.compress(x, q_index=10, file_name=f,
                                       sideinfo=(1, 1, 32, 32))
    assert len(stream) > 0
    _assert_roundtrip(codec, f, x_hat_enc, padding=32, q_index=10)


def test_pwave_roundtrip_multiple_rates(pwave_codec, tmp_path):
    codec = pwave_codec
    x = _img((1, 1, 32, 32), 2)
    sizes = []
    for q in (0, 20):
        f = str(tmp_path / f"img_q{q}.bin")
        x_hat_enc, stream = codec.compress(x, q_index=q, file_name=f,
                                           sideinfo=(1, 1, 32, 32))
        _assert_roundtrip(codec, f, x_hat_enc, padding=32, q_index=q)
        sizes.append(len(stream))
    assert sizes[0] < sizes[1]  # higher q_index -> finer quant -> more bits


def test_pwave_roundtrip_batch2(pwave_codec, tmp_path):
    """Chroma-style coding: two planes stacked in the batch dim."""
    codec = pwave_codec
    x = _img((2, 1, 32, 32), 3)
    f = str(tmp_path / "chroma.bin")
    x_hat_enc, _ = codec.compress(x, q_index=10, file_name=f,
                                  sideinfo=(1, 2, 32, 32))
    _assert_roundtrip(codec, f, x_hat_enc, padding=32, q_index=10)


def test_pwave_ar_roundtrip(tmp_path):
    """Reference-parity AR LL mode: per-pixel decode matches the
    vectorized teacher-forced encode exactly."""
    m = PWave(decomp_levels=2, features=16, ar_features=16, ll_mode="ar")
    x = _img((1, 1, 16, 16), 4)
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    params = _trained_like_params(m, params)
    codec = PWaveCodec(m, params)
    f = str(tmp_path / "ar.bin")
    x_hat_enc, _ = codec.compress(x, q_index=10, file_name=f,
                                  sideinfo=(1, 1, 16, 16))
    _assert_roundtrip(codec, f, x_hat_enc, padding=16, q_index=10)


@pytest.mark.skipif(
    bool(__import__("os").environ.get("PMCTF_SKIP_SLOW_TESTS")),
    reason="slow test disabled")
@pytest.mark.parametrize("ll_mode", ["fourstep", "ar"])
def test_pwave_roundtrip_production_width(ll_mode, tmp_path):
    """Bitstream round-trip at PRODUCTION widths (features=112,
    ar_features=128, decomp_levels=4) on a 256x256 plane — catches bugs
    that only appear at real channel counts / level depth (fold gating,
    layout choices). Slow: compiles the full-width encode/decode graphs.
    """
    m = PWave(decomp_levels=4, features=112, ar_features=128,
              ll_mode=ll_mode)
    x = _img((1, 1, 256, 256), 5)
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    params = _trained_like_params(m, params)
    codec = PWaveCodec(m, params)
    # the ENTROPY path is exact (any symbol slip desyncs the range coder
    # into O(100) garbage — and decode determinism is asserted); but the
    # final reconstruction runs as a standalone program vs the encoder's
    # fused one, and 4 synthesis levels at 112 features accumulate more
    # fusion-reassociation ulps than the toy pyramids: measured 2e-4 max
    # (CPU, ~1e-6 relative) — far below one quantization step.
    codec._rt_atol = 1e-3
    f = str(tmp_path / f"prod_{ll_mode}.bin")
    x_hat_enc, stream = codec.compress(x, q_index=10, file_name=f,
                                       sideinfo=(1, 1, 256, 256))
    assert len(stream) > 0
    _assert_roundtrip(codec, f, x_hat_enc, padding=256, q_index=10)


def test_pwave_roundtrip_act_bf16(tmp_path):
    """Bitstream round-trip for a model constructed with act_bf16=True.

    The codec stream paths force f32 tracing (layers.f32_streams): bf16
    results are program-structure-dependent (XLA rounds bf16 only at
    fusion boundaries, which differ between the encoder's single fused
    program and the decoder's standalone sub-graphs), so a bf16 symbol
    chain can never be bit-deterministic between encode and decode —
    measured as a real range-coder desync on the TPU. act_bf16 therefore
    applies to training/estimate/bench graphs only; this test asserts
    that streams from an act_bf16 model still round-trip in the exact
    f32 regime."""
    m = PWave(decomp_levels=2, features=16, ar_features=16,
              ll_mode="fourstep", act_bf16=True)
    x = _img((1, 1, 32, 32), 6)
    params = jax.jit(lambda: m.init(RNG, x, 10))()
    params = _trained_like_params(m, params)
    codec = PWaveCodec(m, params)
    f = str(tmp_path / "bf16.bin")
    x_hat_enc, _ = codec.compress(x, q_index=10, file_name=f,
                                  sideinfo=(1, 1, 32, 32))
    assert x_hat_enc.dtype == jnp.float32
    _assert_roundtrip(codec, f, x_hat_enc, padding=32, q_index=10)
