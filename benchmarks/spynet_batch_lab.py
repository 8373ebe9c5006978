"""Would stage-batching SpyNet win? batch-1 x N sequential vs one batch-N.

Within a temporal stage every pair's flow depends only on the previous
stage's frames, so all N flows of a stage could run as ONE batched
program (the MV *coding* stays sequential through the DPB). The catch:
the fold2 space-to-depth execution of MEBasic is gated to batch<=2
(larger batches trigger pathological XLA layouts), so batch-8 runs
unfolded. This lab measures both at padded-1080p to decide whether the
model grows an `est_mv` bypass.

Run: python benchmarks/spynet_batch_lab.py   (one TPU job at a time)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, runs=5):
    r = fn(*args)
    _ = float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(runs):
        r = fn(*args)
        _ = float(jnp.sum(r))
    return (time.perf_counter() - t0) / runs


def main():
    from learned_pmctf_tpu.models.spynet import MESpynet
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    g = np.random.default_rng(0)
    module = MESpynet(levels=6, luma_mode=True, fast_warp=True)
    h, w = 1152, 1920
    x1 = jnp.asarray(g.random((1, 1, h, w)), jnp.float32)
    params = module.init(jax.random.PRNGKey(0), x1, x1)

    jf = jax.jit(lambda p, a, b: module.apply(p, a, b))

    for n in (1, 2, 4, 8):
        a = jnp.asarray(g.random((n, 1, h, w)), jnp.float32)
        b = jnp.asarray(g.random((n, 1, h, w)), jnp.float32)
        dt = timed(jf, params, a, b)
        print(f"batch {n}: {dt*1e3:8.2f} ms total, {dt/n*1e3:7.2f} ms/flow",
              flush=True)

    # the sequential alternative at batch 1 (what bench does today)
    a = jnp.asarray(g.random((8, 1, h, w)), jnp.float32)
    b = jnp.asarray(g.random((8, 1, h, w)), jnp.float32)

    def seq8(p, a, b):
        outs = [jf(p, a[i:i + 1], b[i:i + 1]) for i in range(8)]
        return sum(jnp.sum(o) for o in outs)

    r = seq8(params, a, b)
    _ = float(r)
    t0 = time.perf_counter()
    for _ in range(5):
        _ = float(seq8(params, a, b))
    dt = (time.perf_counter() - t0) / 5
    print(f"8x batch-1 sequential: {dt*1e3:8.2f} ms total, "
          f"{dt/8*1e3:7.2f} ms/flow", flush=True)


if __name__ == "__main__":
    main()
