"""Measure per-stage BATCHED chroma pair-coding vs sequential pairs.

Chroma pair-codings within one temporal stage are independent (they reuse
halved luma MVs and never touch the DPB), so all N pairs of a stage can
run as ONE program with the U/V planes of every pair stacked on the batch
axis: frames ordered [u_0..u_{N-1}, v_0..v_{N-1}] so PMCTF._tile_mv's
jnp.tile replication pairs mv_i with both planes of pair i.

At batch >= 4 the fold2 path auto-disables (ops/fold.py:foldable) — the
batch dim fills the MXU sublanes instead, and the latency-bound conv
chains of independent pairs interleave.

Run: python benchmarks/chroma_batch_lab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.models import PMCTF
from learned_pmctf_tpu.utils.cache import enable_compilation_cache


def timed(fn, *args, runs=4):
    r = fn(*args)
    _ = float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b), r, jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
        _ = float(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), r, jnp.float32(0)))
    return (time.perf_counter() - t0) / runs


def main():
    enable_compilation_cache()
    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast", act_bf16=True)
    g = np.random.default_rng(0)
    h, w = 1152, 1920
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})

    def chroma_fn(p, ref, cur, mv):
        out = module.apply(p, ref, cur, jnp.float32(10.0), False, dpb0,
                           mv_hat=mv, stage_idx=0, training=False)
        return {k: out[k] for k in ("L_t", "H_t", "bpp")}

    jfn = jax.jit(chroma_fn)

    for npairs in (1, 2, 4, 8):
        refs = jnp.asarray(
            g.integers(0, 256, (2 * npairs, 1, h // 2, w // 2)), jnp.float32)
        curs = jnp.asarray(
            g.integers(0, 256, (2 * npairs, 1, h // 2, w // 2)), jnp.float32)
        mvs = jnp.asarray(g.normal(0, 2, (npairs, 2, h, w)), jnp.float32)
        dt = timed(jfn, params, refs, curs, mvs)
        print(f"chroma npairs={npairs}: {dt*1e3:7.1f} ms total, "
              f"{dt*1e3/npairs:6.1f} ms/pair", flush=True)


if __name__ == "__main__":
    main()
