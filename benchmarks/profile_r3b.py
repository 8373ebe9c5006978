"""Round-3 profile B: latency-bound-path experiments.

profile_r3 showed (a) dispatch overhead ~0, (b) the inverse-MCTF
programs are latency-bound (merged luma+chroma inverse runs 81 ms vs
63+54 separate — XLA overlaps independent chains). Here:

  Q1: does merging ALL independent inverse pairs of a temporal stage
      into one program compound that overlap win?
  Q2: do bf16 activations help the full luma pair-coding now that the
      net-boundary casts are in place?
  Q3: fold on/off A/B at full scale (net effect of fold2 in situ).
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

K = 4


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.models.pmctf import PMCTF as P
    from learned_pmctf_tpu.models.layers import conv_compute_dtype
    from learned_pmctf_tpu.ops.fold import fold_small_convs
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
        sync([fn(*args)])
        t0 = time.perf_counter()
        for _ in range(runs):
            sync([fn(*args) for _ in range(K)])
        return (time.perf_counter() - t0) / runs / K * 1e3

    # ---- Q1: stage-wide merged inverse ------------------------------------
    def make_inv_stage(n_pairs):
        @jax.jit
        def inv_stage(p, ls, hs, lcs, hcs, mvs):
            outs = []
            for i in range(n_pairs):
                ry, cy = apply(p, ls[i], hs[i], mvs[i], 0, False,
                               method=P.inverse_mctf)
                rc, cc = apply(p, lcs[i], hcs[i], mvs[i], 0, True,
                               method=P.inverse_mctf)
                outs.append((ry, cy, rc, cc))
            return outs
        return inv_stage

    for n in (2, 4):
        fn = make_inv_stage(n)
        ls = [ref] * n
        hs = [cur] * n
        lcs = [refc] * n
        hcs = [curc] * n
        mvs = [mv] * n
        t = timed(fn, params, ls, hs, lcs, hcs, mvs)
        print(f"inv_stage merged n={n}: {t:7.1f} ms total, "
              f"{t/n:6.1f} ms/pair", flush=True)

    # ---- Q2/Q3: full luma pair under policy variants ----------------------
    def luma_variant(tag, ctx):
        with ctx:
            fn = jax.jit(
                lambda p, r, c: {
                    k: v for k, v in apply(
                        p, r, c, q, False, dpb0, stage_idx=0,
                        training=False).items()
                    if k in ("L_t", "H_t", "mv_hat", "bpp")})
            t = timed(fn, params, ref, cur)
        print(f"luma_full[{tag}]: {t:7.1f} ms", flush=True)

    import contextlib
    luma_variant("baseline(fold,f32)", contextlib.nullcontext())
    luma_variant("bf16-act", conv_compute_dtype(jnp.bfloat16))
    luma_variant("no-fold", fold_small_convs(False))
    with fold_small_convs(False):
        luma_variant("bf16-act+no-fold", conv_compute_dtype(jnp.bfloat16))


if __name__ == "__main__":
    main()
