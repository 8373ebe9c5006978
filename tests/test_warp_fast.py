"""Tests for the gather-free separable warp (flow_warp_fast)."""

import numpy as np
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.ops.warp import flow_warp, flow_warp_fast


def _img(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


def test_fast_warp_identity():
    x = _img((1, 1, 16, 24))
    flow = jnp.zeros((1, 2, 16, 24), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(flow_warp_fast(x, flow, 4)), np.asarray(x), atol=1e-6)


def test_fast_warp_exact_for_constant_flow():
    x = _img((2, 1, 32, 48), 1)
    flow = jnp.full((2, 2, 32, 48), 2.6, jnp.float32).at[:, 1].set(-1.4)
    exact = flow_warp(x, flow)
    fast = flow_warp_fast(x, flow, 8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_fast_warp_exact_for_horizontally_constant_fy():
    """Separable approximation is exact when flow_y doesn't vary along x."""
    rng = np.random.default_rng(2)
    x = _img((1, 1, 32, 48), 3)
    fy = jnp.tile(jnp.linspace(-3, 3, 32, dtype=jnp.float32)[None, None, :, None],
                  (1, 1, 1, 48))
    fx = jnp.asarray(rng.normal(size=(1, 1, 32, 48)) * 2, jnp.float32)
    flow = jnp.concatenate([fx, fy], axis=1)
    exact = flow_warp(x, flow)
    fast = flow_warp_fast(x, flow, 8)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def test_fast_warp_clamps_large_flow():
    x = _img((1, 1, 16, 16), 4)
    flow = jnp.full((1, 2, 16, 16), 100.0, jnp.float32)
    out = flow_warp_fast(x, flow, 4)  # displacement clamped to 4
    assert np.isfinite(np.asarray(out)).all()


def test_fast_warp_grads():
    x = _img((1, 1, 16, 16), 5)
    flow = jnp.full((1, 2, 16, 16), 0.3, jnp.float32)
    g = jax.grad(lambda f: jnp.sum(flow_warp_fast(x, f, 4) ** 2))(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0
