"""Component-level profile of the pMCTF hot path at 1080p on the real TPU.

Times each stage-level component with the honest-sync methodology
(host scalar readback; block_until_ready is enqueue-only via axon).
Run: python benchmarks/profile_components.py
"""

import time

import numpy as np


def timeit(fn, *args, runs=3, warmup=1, **kw):
    import jax.numpy as jnp
    for _ in range(warmup):
        out = fn(*args, **kw)
        _sync(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args, **kw)
        _sync(out)
    return (time.perf_counter() - t0) / runs


def _sync(out):
    import jax
    import jax.numpy as jnp
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype")]
    s = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) % 1000.0 for x in leaves)
    float(s)


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep", warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})

    h, w = 1152, 1920
    ref = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    cur = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    flow = jnp.asarray(g.normal(0, 3, (1, 2, h, w)), jnp.float32)
    q = jnp.float32(10.0)

    apply = module.apply

    @jax.jit
    def motion(params, ref, cur):
        return apply(params, ref, cur, q, dpb0, 0, 1, False,
                     method=PMCTF.compute_and_code_motion)

    @jax.jit
    def spynet_only(params, ref, cur):
        return apply(params, cur / 255.0, ref / 255.0,
                     method=lambda m, a, b: m.optic_flow(a, b))

    @jax.jit
    def mctf(params, ref, cur, mv):
        return apply(params, ref, cur, mv, 0, method=PMCTF.forward_mctf)

    @jax.jit
    def warp_exact(params, x, mv):
        from learned_pmctf_tpu.ops.warp import flow_warp
        return flow_warp(x, mv)

    @jax.jit
    def warp_fast(params, x, mv):
        from learned_pmctf_tpu.ops.warp import flow_warp_fast
        return flow_warp_fast(x, mv)

    @jax.jit
    def hp_fwd(params, x):
        return apply(params, x, q, training=False,
                     method=lambda m, y, qi, training: m.hp_coder(
                         y, qi, training=training))

    @jax.jit
    def inv(params, l, hh, mv):
        return apply(params, l, hh, mv, 0, False, method=PMCTF.inverse_mctf)

    @jax.jit
    def full_luma(params, ref, cur):
        out = apply(params, ref, cur, q, False, dpb0, stage_idx=0,
                    training=False)
        return {k: out[k] for k in ("L_t", "H_t", "mv_hat", "bpp", "dpb")}

    names = [
        ("warp_exact_1ch", lambda: warp_exact(params, ref, flow)),
        ("warp_fast_1ch", lambda: warp_fast(params, ref, flow)),
        ("spynet", lambda: spynet_only(params, ref, cur)),
        ("motion_full(SpyNet+MVcode)", lambda: motion(params, ref, cur)),
        ("forward_mctf(2warp+2PU)", lambda: mctf(params, ref, cur, flow)),
        ("hp_coder_forward", lambda: hp_fwd(params, cur)),
        ("inverse_mctf", lambda: inv(params, ref, cur, flow)),
        ("full_luma_stage", lambda: full_luma(params, ref, cur)),
    ]
    for name, fn in names:
        dt = timeit(fn, runs=3, warmup=1)
        print(f"{name:32s} {dt*1000:9.1f} ms")


if __name__ == "__main__":
    main()
