"""Round-3 profile: pipelined component times + dispatch-overhead split.

Earlier profiles timed each program with a per-call scalar readback; that
includes one ~38-70 ms tunnel sync per call, so small programs were
overstated and the dispatch-gap contribution to the GOP wall time was
unknown. Here every component is timed CHAINED (K enqueues, ONE final
sync over all outputs — the same methodology as bench.py), giving the
true pipelined per-call cost; the single-call-synced time is measured
alongside, so (single - chained) isolates the sync/dispatch overhead.

Also A/Bs the merged-pair program (luma+chroma coded in ONE jit) against
the two-program chain to see whether program-boundary overhead matters on
the coded path.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

K = 6


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.models.pmctf import PMCTF as P
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=P.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})
    apply = module.apply

    h, w = 1152, 1920
    ref = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    cur = jnp.asarray(g.integers(0, 256, (1, 1, h, w)), jnp.float32)
    refc = jnp.asarray(g.integers(0, 256, (2, 1, h // 2, w // 2)), jnp.float32)
    curc = jnp.asarray(g.integers(0, 256, (2, 1, h // 2, w // 2)), jnp.float32)
    mv = jnp.asarray(g.normal(0, 3, (1, 2, h, w)), jnp.float32)
    q = jnp.float32(10.0)

    def sync(outs):
        tot = 0.0
        for out in outs:
            leaves = [x for x in jax.tree_util.tree_leaves(out)
                      if hasattr(x, "dtype")]
            tot += float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) % 997.0
                             for x in leaves))
        return tot

    def timed(fn, *args, runs=2):
        """(chained_per_call_ms, single_call_ms)."""
        sync([fn(*args)])  # compile
        t0 = time.perf_counter()
        for _ in range(runs):
            sync([fn(*args) for _ in range(K)])
        chained = (time.perf_counter() - t0) / runs / K * 1e3
        t0 = time.perf_counter()
        for _ in range(runs):
            sync([fn(*args)])
        single = (time.perf_counter() - t0) / runs * 1e3
        return chained, single

    @jax.jit
    def luma_full(p, r, c):
        out = apply(p, r, c, q, False, dpb0, stage_idx=0, training=False)
        return {k: out[k] for k in ("L_t", "H_t", "mv_hat", "bpp", "dpb")}

    @jax.jit
    def chroma_full(p, r, c, mv):
        out = apply(p, r, c, q, False, dpb0, mv_hat=mv, stage_idx=0,
                    training=False)
        return {k: out[k] for k in ("L_t", "H_t", "bpp")}

    @jax.jit
    def pair_full(p, r, c, rc, cc):
        """Luma + chroma of one temporal pair in ONE program."""
        out = apply(p, r, c, q, False, dpb0, stage_idx=0, training=False)
        outc = apply(p, rc, cc, q, False, dpb0, mv_hat=out["mv_hat"],
                     stage_idx=0, training=False)
        return {"L_t": out["L_t"], "H_t": out["H_t"],
                "mv_hat": out["mv_hat"], "bpp": out["bpp"],
                "dpb": out["dpb"], "L_tc": outc["L_t"], "H_tc": outc["H_t"],
                "bppc": outc["bpp"]}

    @jax.jit
    def inv_luma(p, l, hh, mvv):
        return apply(p, l, hh, mvv, 0, False, method=P.inverse_mctf)

    @jax.jit
    def inv_chroma(p, l, hh, mvv):
        return apply(p, l, hh, mvv, 0, True, method=P.inverse_mctf)

    @jax.jit
    def inv_pair(p, l, hh, lc, hc, mvv):
        """Inverse luma + chroma in ONE program."""
        ry, cy = apply(p, l, hh, mvv, 0, False, method=P.inverse_mctf)
        rc, cc = apply(p, lc, hc, mvv, 0, True, method=P.inverse_mctf)
        return ry, cy, rc, cc

    @jax.jit
    def motion(p, r, c):
        return apply(p, r, c, q, dpb0, 0, 1, False,
                     method=P.compute_and_code_motion)

    @jax.jit
    def hp_full(p, x):
        return apply(p, x, q, training=False,
                     method=lambda m, a, b, training: m.hp_coder(
                         a, b, training=training))["x_hat"]

    @jax.jit
    def ana(p, x):
        return apply(p, x, method=lambda m, a: m.hp_coder.analysis(a))[3]["ll"]

    @jax.jit
    def post(p, x):
        return apply(p, x, method=lambda m, a: m.hp_coder.postprocess(a))

    cases = [
        ("luma_full_stage0", luma_full, (params, ref, cur)),
        ("chroma_full_stage0", chroma_full, (params, refc, curc, mv)),
        ("pair_full(merged)", pair_full, (params, ref, cur, refc, curc)),
        ("inv_luma", inv_luma, (params, ref, cur, mv)),
        ("inv_chroma", inv_chroma, (params, refc, curc, mv)),
        ("inv_pair(merged)", inv_pair, (params, ref, cur, refc, curc, mv)),
        ("motion_full", motion, (params, ref, cur)),
        ("hp_coder_full", hp_full, (params, cur)),
        ("analysis", ana, (params, cur)),
        ("postprocess", post, (params, cur)),
    ]
    t = {}
    for name, fn, args in cases:
        chained, single = timed(fn, *args)
        t[name] = chained
        print(f"{name:24s} chained {chained:8.1f} ms   single {single:8.1f} ms"
              f"   overhead {single - chained:6.1f} ms", flush=True)

    gop4 = (t["luma_full_stage0"] + t["chroma_full_stage0"]
            + t["inv_luma"] + t["inv_chroma"]) * 15 / 1000.0
    gop2 = (t["pair_full(merged)"] + t["inv_pair(merged)"]) * 15 / 1000.0
    print(f"gop16 estimate, 4 programs/pair: {gop4:.2f} s ({16/gop4:.2f} fps)")
    print(f"gop16 estimate, 2 programs/pair: {gop2:.2f} s ({16/gop2:.2f} fps)")


if __name__ == "__main__":
    main()
