"""Unit tests for core ops: lifting, warp, resample, quant, masks, color."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from learned_pmctf_tpu.ops import (
    split_even_odd,
    merge_even_odd,
    flow_warp,
    bilinear_upsample,
    bilinear_downsample,
    avg_pool2,
    checkerboard_masks,
    ste_round,
    ste_clamp,
    lower_bound,
    rgb_to_ycocg_lossless,
    ycocg_to_rgb_lossless,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
from learned_pmctf_tpu.ops.lifting import (
    haar_forward,
    haar_backward,
    cdf97_forward,
    cdf97_backward,
    skip_filter_rows,
)
from learned_pmctf_tpu.ops.masks import causal_conv_mask


def test_split_merge_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 16, 8)), jnp.float32)
    e, o = split_even_odd(x)
    assert e.shape == (2, 1, 8, 8)
    np.testing.assert_array_equal(np.asarray(merge_even_odd(e, o)), np.asarray(x))


def test_haar_lossless_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 1, 32, 16)), jnp.float32)
    l, h = haar_forward(x, lossy=False)
    rec = haar_backward(l, h, lossy=False)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_cdf97_lossless_perfect_reconstruction():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, 256, size=(1, 1, 64, 32)), jnp.float32)
    l, h = cdf97_forward(x, lossy=False)
    rec = cdf97_backward(l, h, lossy=False)
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(x))


def test_cdf97_lossy_reconstruction_close():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 1, 64, 32)) * 100, jnp.float32)
    l, h = cdf97_forward(x, lossy=True)
    rec = cdf97_backward(l, h, lossy=True)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-2)


def test_skip_filter_reflect_border():
    # out[0] must use reflected x[1] for the i-1 tap
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1)
    y = skip_filter_rows(x, 1.0, 0.0, 0.0)  # out[i] = x[i-1]
    np.testing.assert_array_equal(
        np.asarray(y).ravel(), np.array([1.0, 0.0, 1.0, 2.0])
    )
    y = skip_filter_rows(x, 0.0, 0.0, 1.0)  # out[i] = x[i+1]
    np.testing.assert_array_equal(
        np.asarray(y).ravel(), np.array([1.0, 2.0, 3.0, 2.0])
    )


def test_flow_warp_identity():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 3, 12, 10)), jnp.float32)
    flow = jnp.zeros((2, 2, 12, 10), jnp.float32)
    np.testing.assert_allclose(np.asarray(flow_warp(x, flow)), np.asarray(x), rtol=1e-6)


def test_flow_warp_integer_shift():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 1, 4, 4))
    # shift content left by 1: sample at x+1
    flow = jnp.zeros((1, 2, 4, 4), jnp.float32).at[:, 0].set(1.0)
    out = np.asarray(flow_warp(x, flow))[0, 0]
    expect = np.asarray(x)[0, 0]
    np.testing.assert_allclose(out[:, :3], expect[:, 1:], rtol=1e-6)
    np.testing.assert_allclose(out[:, 3], expect[:, 3], rtol=1e-6)  # border clamp


def test_flow_warp_halfpel_bilinear():
    x = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 1, 1, 8))
    flow = jnp.zeros((1, 2, 1, 8), jnp.float32).at[:, 0].set(0.5)
    out = np.asarray(flow_warp(x, flow))[0, 0, 0]
    np.testing.assert_allclose(out[:-1], np.arange(7) + 0.5, rtol=1e-6)


def test_flow_warp_grad_flows():
    x = jnp.ones((1, 1, 8, 8), jnp.float32)
    flow = jnp.full((1, 2, 8, 8), 0.3, jnp.float32)

    def loss(f):
        return jnp.sum(flow_warp(x * 2.0, f) ** 2)

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()


def test_resample_shapes():
    x = jnp.ones((1, 2, 8, 8), jnp.float32)
    assert bilinear_upsample(x).shape == (1, 2, 16, 16)
    assert bilinear_downsample(x).shape == (1, 2, 4, 4)
    assert avg_pool2(x).shape == (1, 2, 4, 4)
    np.testing.assert_allclose(np.asarray(avg_pool2(x)), 1.0)


def test_checkerboard_masks_partition():
    masks = checkerboard_masks(5, 6)
    total = sum(np.asarray(m) for m in masks)
    np.testing.assert_array_equal(total, np.ones((1, 1, 5, 6)))
    # mask_0 = (0,0) phase
    assert np.asarray(masks[0])[0, 0, 0, 0] == 1
    assert np.asarray(masks[1])[0, 0, 0, 1] == 1
    assert np.asarray(masks[2])[0, 0, 1, 0] == 1
    assert np.asarray(masks[3])[0, 0, 1, 1] == 1


def test_causal_conv_mask():
    m = np.asarray(causal_conv_mask(3, 3, "A", 1, 1))[0, 0]
    np.testing.assert_array_equal(m, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
    m = np.asarray(causal_conv_mask(3, 3, "B", 1, 1))[0, 0]
    np.testing.assert_array_equal(m, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])


def test_ste_round_grad_identity():
    g = jax.grad(lambda x: jnp.sum(ste_round(x) * 3.0))(jnp.array([0.3, 1.7]))
    np.testing.assert_allclose(np.asarray(g), [3.0, 3.0])


def test_ste_clamp_grad_identity():
    g = jax.grad(lambda x: jnp.sum(ste_clamp(x, -1.0, 1.0)))(jnp.array([-5.0, 0.5, 5.0]))
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])


def test_lower_bound_grad_rule():
    x = jnp.array([0.2, 0.8])
    # g > 0 below bound: blocked; g > 0 above bound: passes
    g = jax.grad(lambda v: jnp.sum(lower_bound(v, 0.5)))(x)
    np.testing.assert_allclose(np.asarray(g), [0.0, 1.0])
    # g < 0 (pushes x up) passes everywhere
    g = jax.grad(lambda v: jnp.sum(-lower_bound(v, 0.5)))(x)
    np.testing.assert_allclose(np.asarray(g), [-1.0, -1.0])


def test_ycocg_lossless_roundtrip():
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.integers(0, 256, size=(1, 3, 8, 8)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(ycocg_to_rgb_lossless(rgb_to_ycocg_lossless(rgb))), np.asarray(rgb)
    )


def test_ycbcr_roundtrip_close():
    rng = np.random.default_rng(6)
    rgb = jnp.asarray(rng.uniform(16, 240, size=(1, 3, 8, 8)), jnp.float32)
    rec = ycbcr_to_rgb(rgb_to_ycbcr(rgb))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rgb), atol=0.5)


# ---- BT.601/709 studio-range + chroma subsampling golden tests ------------
# Golden reference: /root/reference/pMCTF/utils/conversion.py (pure numpy,
# loaded directly so the torch-importing pMCTF package is not touched).

def _load_ref_conversion():
    import importlib.util
    path = "/root/reference/pMCTF/utils/conversion.py"
    spec = importlib.util.spec_from_file_location("_ref_conversion", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_HAS_REF = __import__("os").path.isfile(
    "/root/reference/pMCTF/utils/conversion.py")


@pytest.mark.skipif(not _HAS_REF, reason="reference tree not available")
@pytest.mark.parametrize("flavor", [601, 709])
def test_rgb_ycbcr_studio_golden(flavor):
    """Bit-exact vs conversion.py rgb2ycbcr/ycbcr2rgb (both flavors)."""
    from learned_pmctf_tpu.ops import rgb_to_ycbcr_studio, ycbcr_to_rgb_studio
    ref = _load_ref_conversion()
    rng = np.random.default_rng(7)
    rgb_hwc = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)

    want = ref.rgb2ycbcr(rgb_hwc, flavor=flavor)          # (H, W, 3) uint8
    got = rgb_to_ycbcr_studio(
        jnp.asarray(np.moveaxis(rgb_hwc, -1, 0).astype(np.float32)),
        flavor=flavor)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(got), 0, -1).astype(np.uint8), want)

    want_rgb = ref.ycbcr2rgb(want, flavor=flavor)
    got_rgb = ycbcr_to_rgb_studio(
        jnp.asarray(np.moveaxis(want, -1, 0).astype(np.float32)),
        flavor=flavor)
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(got_rgb), 0, -1).astype(np.uint8), want_rgb)


@pytest.mark.skipif(not _HAS_REF, reason="reference tree not available")
def test_yuv444_to_420_golden():
    """Chroma box-average+round matches conversion.py YCbCr4442YCbCr420."""
    from learned_pmctf_tpu.ops import yuv444_to_420, yuv420_to_444
    ref = _load_ref_conversion()
    rng = np.random.default_rng(8)
    ycbcr_hwc = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)

    want_replicated = ref.YCbCr4442YCbCr420(ycbcr_hwc)    # 420 as 444 array
    want_y, want_cb, want_cr = ref.YCbCr420_to_channels(want_replicated)

    x = jnp.asarray(np.moveaxis(ycbcr_hwc, -1, 0).astype(np.float32))[None]
    y, cb, cr = yuv444_to_420(x)
    np.testing.assert_array_equal(
        np.asarray(y[0, 0]).astype(np.uint8), want_y)
    np.testing.assert_array_equal(
        np.asarray(cb[0, 0]).astype(np.uint8), want_cb)
    np.testing.assert_array_equal(
        np.asarray(cr[0, 0]).astype(np.uint8), want_cr)

    # nearest-mode 420->444 matches the reference's 2x2 replication
    up = yuv420_to_444(y, cb, cr, mode="nearest")
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(up[0]), 0, -1).astype(np.uint8),
        want_replicated)
