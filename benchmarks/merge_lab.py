"""A/B: can chroma coding hide inside the luma program's latency bubbles?

Three programs, same total work (one luma pair + one chroma pair):
  split : luma program, then chroma program (the bench.py structure)
  same  : luma+chroma of the SAME pair in one program (chroma depends on
          luma's mv_hat -> serialized; measured +1.4% in round 3a)
  cross : luma of pair i+1 + chroma of pair i in one program — fully
          independent subgraphs, XLA free to interleave

Run: python benchmarks/merge_lab.py
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast", act_bf16=True)
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
    refc = jnp.asarray(g.integers(0, 256, (2, 1, h // 2, w // 2)), jnp.float32)
    curc = jnp.asarray(g.integers(0, 256, (2, 1, h // 2, w // 2)), jnp.float32)
    mvprev = jnp.asarray(g.normal(0, 2, (1, 2, h, w)), jnp.float32)
    q = jnp.float32(10.0)

    def luma(p, r, c, dpb):
        out = module.apply(p, r, c, q, False, dpb, stage_idx=0,
                           training=False)
        return {k: out[k] for k in ("L_t", "H_t", "mv_hat", "bpp", "dpb")}

    def chroma(p, r, c, mv):
        out = module.apply(p, r, c, q, False, dpb0, mv_hat=mv, stage_idx=0,
                           training=False)
        return {k: out[k] for k in ("L_t", "H_t", "bpp")}

    jl = jax.jit(luma)
    jc = jax.jit(chroma)

    @jax.jit
    def same(p, r, c, rc, cc, dpb):
        lo = luma(p, r, c, dpb)
        co = chroma(p, rc, cc, lo["mv_hat"])
        return lo, co

    @jax.jit
    def cross(p, r, c, rc, cc, mv, dpb):
        lo = luma(p, r, c, dpb)
        co = chroma(p, rc, cc, mv)
        return lo, co

    def syncv(outs):
        tot = jnp.float32(0)
        for o in jax.tree_util.tree_leaves(outs):
            if hasattr(o, "dtype"):
                tot = tot + jnp.sum(o.astype(jnp.float32) % 997.0)
        return float(tot)

    def timed(fn, runs=4):
        syncv(fn())
        t0 = time.perf_counter()
        for _ in range(runs):
            syncv(fn())
        return (time.perf_counter() - t0) / runs

    t_split = timed(lambda: (jl(params, ref, cur, dpb0),
                             jc(params, refc, curc, mvprev)))
    t_same = timed(lambda: same(params, ref, cur, refc, curc, dpb0))
    t_cross = timed(lambda: cross(params, ref, cur, refc, curc, mvprev, dpb0))
    print(f"split  luma;chroma : {t_split*1e3:7.1f} ms")
    print(f"same-pair merged   : {t_same*1e3:7.1f} ms")
    print(f"cross-pair merged  : {t_cross*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
