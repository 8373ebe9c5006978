"""Multi-device sharding tests (virtual CPU devices)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import jax

from tests.conftest import SANITIZED_CPU_ENV


requires_multidevice = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices")


@requires_multidevice
def test_mesh_and_shardings():
    import jax.numpy as jnp
    from learned_pmctf_tpu.parallel import (
        make_mesh, data_sharding, frame_sharding, replicated)

    mesh = make_mesh(8, spatial=2)
    assert mesh.shape == {"data": 4, "spatial": 2}

    x = jnp.ones((4, 1, 16, 32))
    xs = jax.device_put(x, frame_sharding(mesh))
    assert len(xs.sharding.device_set) == 8

    # gradient-style psum via sharded reduction
    y = jax.jit(lambda v: jnp.sum(v))(xs)
    assert float(y) == 4 * 16 * 32


@requires_multidevice
def test_spatial_sharded_conv_matches_single_device():
    """W-sharded lifting must equal the unsharded result (halo exchange)."""
    import jax.numpy as jnp
    from learned_pmctf_tpu.parallel import make_mesh, frame_sharding
    from learned_pmctf_tpu.ops.lifting import cdf97_forward

    mesh = make_mesh(8, spatial=2)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 1, 32, 64)), jnp.float32)

    ref_l, ref_h = jax.jit(cdf97_forward)(x)
    xs = jax.device_put(x, frame_sharding(mesh))
    with mesh:
        l, h = jax.jit(cdf97_forward)(xs)
    np.testing.assert_allclose(np.asarray(l), np.asarray(ref_l), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h), atol=1e-5)


@requires_multidevice
def test_spatial_sharded_learned_lifting_matches_single_device():
    """The full learned 2-D lifting (PU CNNs + skip taps) under a
    width-sharded frame equals the unsharded result — the halo exchanges
    XLA inserts for the conv stencils and the fold/unfold reshapes must
    compose correctly at non-toy size (256x512)."""
    import jax.numpy as jnp
    from learned_pmctf_tpu.parallel import make_mesh, frame_sharding
    from learned_pmctf_tpu.models.wavelet import LiftingScheme2D

    mesh = make_mesh(8, spatial=2)
    m = LiftingScheme2D()
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 1, 256, 512)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)

    fwd = jax.jit(lambda p, v: m.apply(p, v, method=LiftingScheme2D.forward_lift_2d))
    ref = fwd(params, x)
    xs = jax.device_put(x, frame_sharding(mesh))
    with mesh:
        out = fwd(params, xs)
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=5e-5, rtol=1e-5)


def test_dp_step_matches_single_device():
    """Sharded data-parallel train step == unsharded step numerically
    (slow: compiles a tiny GOP-2 step twice on the virtual CPU mesh)."""
    if os.environ.get("PMCTF_SKIP_SLOW_TESTS"):
        pytest.skip("slow test disabled")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tests", "dp_equiv_script.py")],
        env=SANITIZED_CPU_ENV, capture_output=True, text=True, timeout=1800,
        cwd=root)
    assert "DP-EQUIV OK" in proc.stdout, proc.stdout + proc.stderr


def test_dryrun_multichip_subprocess():
    """The driver-facing dryrun entry compiles and runs (slow; subprocess
    with a sanitized env so the axon TPU plugin is bypassed)."""
    if os.environ.get("PMCTF_SKIP_SLOW_TESTS"):
        pytest.skip("slow test disabled")
    proc = subprocess.run(
        [sys.executable, "__graft_entry__.py", "dryrun", "8"],
        env=SANITIZED_CPU_ENV, capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "OK" in proc.stdout, proc.stdout + proc.stderr
