"""Fresh component profile after fold2 + fast-warp, plus bf16-activation
experiments for the HBM-bound full-res conv stacks.

Q1: where do the ~650 ms of a luma pair-coding go now?
Q2: does casting activations to bf16 speed the postprocess net (full-res
    64ch convs measured ~295 GB/s effective -> possibly HBM-bound)?
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def timeit(fn, *args, runs=3):
    import jax.numpy as jnp
    import jax
    def sync(out):
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
        float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) % 1000.0 for x in leaves))
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(runs):
        sync(fn(*args))
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.models.pmctf import PMCTF as P
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep", warp_mode="fast")
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
    def inv_luma(p, l, hh, mvv):
        return apply(p, l, hh, mvv, 0, False, method=P.inverse_mctf)

    @jax.jit
    def inv_chroma(p, l, hh, mvv):
        return apply(p, l, hh, mvv, 0, True, method=P.inverse_mctf)

    @jax.jit
    def motion(p, r, c):
        return apply(p, r, c, q, dpb0, 0, 1, False,
                     method=P.compute_and_code_motion)

    @jax.jit
    def mctf_fwd(p, r, c, mvv):
        return apply(p, r, c, mvv, 0, method=P.forward_mctf)

    @jax.jit
    def hp_full(p, x):
        return apply(p, x, q, training=False,
                     method=lambda m, a, b, training: m.hp_coder(
                         a, b, training=training))["x_hat"]

    @jax.jit
    def ana(p, x):
        return apply(p, x, method=lambda m, a: m.hp_coder.analysis(a))[3]["ll"]

    @jax.jit
    def syn(p, x):
        def f(m, a):
            y = m.hp_coder.analysis(a)
            return m.hp_coder.synthesis({l: dict(y[l]) for l in y})
        return apply(p, x, method=f)

    @jax.jit
    def post(p, x):
        return apply(p, x, method=lambda m, a: m.hp_coder.postprocess(a))

    t = {}
    t["luma_full_stage0"] = timeit(luma_full, params, ref, cur)
    t["chroma_full_stage0"] = timeit(chroma_full, params, refc, curc, mv)
    t["inv_luma"] = timeit(inv_luma, params, ref, cur, mv)
    t["inv_chroma"] = timeit(inv_chroma, params, refc, curc, mv)
    t["motion_full"] = timeit(motion, params, ref, cur)
    t["mctf_fwd"] = timeit(mctf_fwd, params, ref, cur, mv)
    t["hp_coder_full"] = timeit(hp_full, params, cur)
    t["analysis"] = timeit(ana, params, cur)
    t["ana+synthesis"] = timeit(syn, params, cur)
    t["postprocess"] = timeit(post, params, cur)

    gop_est = (t["luma_full_stage0"] + t["chroma_full_stage0"]
               + t["inv_luma"] + t["inv_chroma"]) * 15 / 1000.0
    for k, v in t.items():
        print(f"{k:24s} {v:8.1f} ms")
    print(f"gop16 estimate from stage0 components: {gop_est:.2f} s "
          f"({16/gop_est:.2f} fps)")

    # --- Q2: bf16 activations through the postprocess net ---------------
    from learned_pmctf_tpu.models.layers import conv_compute_dtype
    try:
        with conv_compute_dtype(jnp.bfloat16):
            post_bf16 = jax.jit(
                lambda p, x: apply(
                    p, x, method=lambda m, a: m.hp_coder.postprocess(a)))
            tb = timeit(post_bf16, params, cur)
        print(f"postprocess bf16-compute      {tb:8.1f} ms")
    except Exception as e:
        print("bf16 hook unavailable:", type(e).__name__, e)


if __name__ == "__main__":
    main()
