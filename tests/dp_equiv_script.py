"""Data-parallel equivalence check (run under a virtual CPU mesh).

Runs ONE tiny pMCTF GOP-2 train step twice — unsharded on a single
device, then with the batch sharded over the mesh's 'data' axis — and
asserts the resulting parameters and metrics match. This pins down the
semantics the parallel surface promises: pjit data parallelism is pure
SPMD, so gradients psum'd over ICI must equal the single-device batch
gradient up to float reduction order (SURVEY.md §2.6 item 1).

Invoke via tests/test_parallel.py::test_dp_step_matches_single_device,
or directly:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tests/dp_equiv_script.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.parallel import make_mesh
    from learned_pmctf_tpu.training.optim import make_optimizer
    from learned_pmctf_tpu.training.steps import (
        StageGates, make_pmctf_train_step)

    n = jax.device_count()
    assert n >= 8, jax.devices()

    module = PMCTF(decomp_levels=1, num_me_stages=1, channel_mv=8,
                   channel_n=8, features=8, ar_features=8, spynet_levels=2)
    batch = 8
    g = np.random.default_rng(0)
    frames = jnp.asarray(
        g.integers(0, 256, (2, batch, 1, 64, 128)), jnp.float32)

    rng = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = module.init(rng, frames[0], frames[1], 10, dpb,
                         method=PMCTF.full_init_graph)
    tx = make_optimizer(params, learning_rate=1e-4)
    opt_state = tx.init(params)
    step = make_pmctf_train_step(module, tx, num_frames=2,
                                 gates=StageGates.for_stage(2))

    args = (params, opt_state, frames, jnp.float32(10.0),
            jnp.float32(0.05), jax.random.PRNGKey(3))

    # single-device reference (explicit placement on device 0)
    d0 = jax.devices()[0]
    args_single = jax.device_put(args, d0)
    p_ref, _, m_ref = step(*args_single)

    # data-sharded: batch over the mesh 'data' axis, params replicated
    mesh = make_mesh(n, spatial=1)
    shard_frames = NamedSharding(mesh, P(None, "data"))
    args_dp = (jax.device_put(params, NamedSharding(mesh, P())),
               jax.device_put(opt_state, NamedSharding(mesh, P())),
               jax.device_put(frames, shard_frames),
               jnp.float32(10.0), jnp.float32(0.05), jax.random.PRNGKey(3))
    with mesh:
        p_dp, _, m_dp = step(*args_dp)

    loss_ref = float(m_ref["rd_loss"])
    loss_dp = float(m_dp["rd_loss"])
    print(f"rd_loss single={loss_ref:.6f} dp={loss_dp:.6f}")
    np.testing.assert_allclose(loss_dp, loss_ref, rtol=1e-5)

    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_dp = jax.tree_util.tree_leaves(p_dp)
    assert len(flat_ref) == len(flat_dp)
    worst = 0.0
    for a, b in zip(flat_ref, flat_dp):
        a = np.asarray(a)
        b = np.asarray(b)
        # atol covers zero-initialized leaves (biases, gains) where the
        # first Adam update is pure sign-of-tiny-gradient noise: the
        # sharded psum's different reduction order can flip those signs,
        # moving the update by up to ~lr (1e-4 here) — far below any real
        # divergence (a broken gradient reduction shows O(1) relative
        # errors on the non-zero leaves, which rtol still catches).
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=1.5e-4)
        denom = np.maximum(np.abs(a), 1e-3)
        worst = max(worst, float(np.max(np.abs(a - b) / denom)))
    print(f"params match: {len(flat_ref)} leaves, worst rel diff {worst:.2e}")
    print("DP-EQUIV OK")


if __name__ == "__main__":
    main()
