"""Layout/dtype microbenchmarks, round 2: CHAINED timing.

The axon relay costs ~35-70 ms per host readback, so per-call timing
floors there. Here each measured op is applied K times with the output
fed back as the input (same shape), jitted as ONE program, with a single
readback at the end: per-op time = (t_chain - t_empty) / K.
"""

import time

import numpy as np

K = 16


def chain_time(fn, x, *rest):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, *rest):
        for _ in range(K):
            x = fn(x, *rest)
        return jnp.sum(x.astype(jnp.float32) % 997.0)

    float(chained(x, *rest))  # compile+warm
    t0 = time.perf_counter()
    runs = 3
    for _ in range(runs):
        float(chained(x, *rest))
    return (time.perf_counter() - t0) / runs / K


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    g = np.random.default_rng(0)

    results = {}

    def conv_stack(dn):
        def f(x, ws, bf16):
            for w in ws:
                if bf16:
                    y = jax.lax.conv_general_dilated(
                        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                        (1, 1), "SAME", dimension_numbers=dn,
                        preferred_element_type=jnp.float32)
                else:
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME", dimension_numbers=dn)
                x = jnp.maximum(y, 0.01 * y)
            return x
        return f

    nchw = conv_stack(("NCHW", "OIHW", "NCHW"))
    nhwc = conv_stack(("NHWC", "HWIO", "NHWC"))

    # (name, in-shape NCHW, weight shapes OIHW) — in==out channels so the
    # stack chains. Folded variants model space-to-depth 2x2 (4x channels,
    # 2x2 kernels, quarter spatial).
    cases = [
        ("fusion112 @576x960 k3", (1, 112, 576, 960), [(112, 112, 3, 3)] * 8),
        ("fusion448 @288x480 k2", (1, 448, 288, 480), [(448, 448, 2, 2)] * 8),
        ("lift16   @1152x960 k3", (1, 16, 1152, 960), [(16, 16, 3, 3)] * 8),
        ("lift64   @576x480 k2", (1, 64, 576, 480), [(64, 64, 2, 2)] * 8),
        ("lift128  @288x240 k2", (1, 128, 288, 240), [(128, 128, 2, 2)] * 8),
    ]
    for name, xshape, wshapes in cases:
        x = jnp.asarray(g.normal(0, 1, xshape), jnp.float32)
        ws = tuple(jnp.asarray(g.normal(0, 0.05, s), jnp.float32)
                   for s in wshapes)
        xh = x.transpose(0, 2, 3, 1)
        wsh = tuple(w.transpose(2, 3, 1, 0) for w in ws)
        for bf16 in (False, True):
            t1 = chain_time(lambda a, w=ws, b=bf16: nchw(a, w, b), x)
            t2 = chain_time(lambda a, w=wsh, b=bf16: nhwc(a, w, b), xh)
            tag = "bf16" if bf16 else "f32 "
            print(f"{name:24s} {tag} NCHW {t1*1000:8.2f} ms  "
                  f"NHWC {t2*1000:8.2f} ms", flush=True)

    # ---- warps (chain: warp output is feature-shaped) ----------------------
    from learned_pmctf_tpu.ops.warp import flow_warp, flow_warp_fast

    h, w = 1152, 1920
    feat = jnp.asarray(g.normal(0, 1, (1, 1, h, w)), jnp.float32)
    flow = jnp.asarray(g.normal(0, 3, (1, 2, h, w)), jnp.float32)

    for name, fn in [
        ("warp_exact", lambda f, m: flow_warp(f, m)),
        ("warp_fast_d64", lambda f, m: flow_warp_fast(f, m, 64)),
        ("warp_fast_d32", lambda f, m: flow_warp_fast(f, m, 32)),
        ("warp_fast_d16", lambda f, m: flow_warp_fast(f, m, 16)),
    ]:
        t = chain_time(fn, feat, flow)
        print(f"{name:24s}      {t*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
