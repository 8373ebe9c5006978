"""Micro-lab 3: candidate shapes for space-to-depth folding decisions.

Chained timing (one readback per K-apply program). Questions:
  - does a 64ch k3 conv at half-res beat the equivalent 16ch k3 at
    full-res (folded PU nets, 4x FLOPs at higher MXU occupancy)?
  - does 256ch k3 at half-res beat 64ch k3 at full res (folded
    postprocess, 4x FLOPs)?
  - 7x7 rates for the SpyNet MEBasic stack.
"""

import time

import numpy as np

K = 16


def chain_time(fn, x, runs=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        for _ in range(K):
            x = fn(x)
        return jnp.sum(x.astype(jnp.float32) % 997.0)

    float(chained(x))
    t0 = time.perf_counter()
    for _ in range(runs):
        float(chained(x))
    return (time.perf_counter() - t0) / runs / K


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    g = np.random.default_rng(0)

    def stack(ws, k):
        pad = ((k // 2, k // 2), (k // 2, k // 2))

        def f(x):
            for w in ws:
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), pad,
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
                x = jnp.maximum(y, 0.01 * y)
            return x
        return f

    cases = [
        # name, in shape, n convs, (O, I, kh, kw)
        ("pu16 k3 @1152x960  base", (1, 1152, 960), 8, (16, 16, 3, 3)),
        ("pu64 k3 @576x480  folded", (1, 576, 480), 8, (64, 64, 3, 3)),
        ("pu64 k3 @576x960  foldW", (1, 576, 960), 8, (64, 64, 3, 3)),
        ("post64 k3 @1152x1920 base", (1, 1152, 1920), 8, (64, 64, 3, 3)),
        ("post256 k3 @576x960 folded", (1, 576, 960), 8, (256, 256, 3, 3)),
        ("spy64 k7 @1152x1920", (1, 1152, 1920), 2, (64, 64, 7, 7)),
        ("spy64 k7 @576x960", (1, 576, 960), 2, (64, 64, 7, 7)),
        ("lstm32 k3 @576x960", (1, 576, 960), 8, (32, 32, 3, 3)),
        ("lstm128 k3 @288x480 folded", (1, 288, 480), 8, (128, 128, 3, 3)),
    ]
    for name, (b, h, w), n, wshape in cases:
        x = jnp.asarray(g.normal(0, 1, (b, wshape[1], h, w)), jnp.float32)
        ws = tuple(jnp.asarray(g.normal(0, 0.05, wshape), jnp.float32)
                   for _ in range(n))
        t = chain_time(stack(ws, wshape[2]), x)
        gmacs = (wshape[0] * wshape[1] * wshape[2] * wshape[3]
                 * h * w * b / 1e9)
        print(f"{name:28s} {t*1000/n:8.3f} ms/conv "
              f"{gmacs*2/ (t/n) /1000:8.1f} GFLOP/s", flush=True)


if __name__ == "__main__":
    main()
