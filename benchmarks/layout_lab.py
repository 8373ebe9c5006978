"""Layout/dtype microbenchmarks for the pMCTF hot ops at 1080p shapes.

Answers, with real-chip numbers:
  1. NCHW vs NHWC conv stacks (fusion-net shape: 112ch @ 576x960;
     lifting shape: 16ch @ 1152x960) in f32 and bf16.
  2. warp: exact gather vs shifted-select (max_disp 64/32/16) vs
     one-hot-matmul (MXU) formulation.

Run: python benchmarks/layout_lab.py
"""

import time

import numpy as np


def sync(x):
    import jax.numpy as jnp
    float(jnp.sum(jnp.abs(x).astype(jnp.float32) % 997.0))


def timeit(fn, *args, runs=5, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(runs):
        sync(fn(*args))
    return (time.perf_counter() - t0) / runs


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    g = np.random.default_rng(0)

    def conv_stack_nchw(x, ws, bf16):
        for w in ws:
            if bf16:
                y = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    preferred_element_type=jnp.float32)
            else:
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jnp.maximum(y, 0.01 * y)
        return x

    def conv_stack_nhwc(x, ws, bf16):
        # x: NHWC, w: HWIO
        for w in ws:
            if bf16:
                y = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                    (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
            else:
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(y, 0.01 * y)
        return x

    cases = [
        ("fusion112@576x960x8", (1, 112, 576, 960), [(112, 112, 3, 3)] * 8),
        ("lift16@1152x960x8", (1, 16, 1152, 960), [(16, 16, 3, 3)] * 8),
        ("pu1-16@1152x960", (1, 1, 1152, 960),
         [(16, 1, 3, 3), (16, 16, 3, 3), (16, 16, 3, 3), (1, 16, 3, 3)]),
    ]
    for name, xshape, wshapes in cases:
        x = jnp.asarray(g.normal(0, 1, xshape), jnp.float32)
        ws = [jnp.asarray(g.normal(0, 0.05, s), jnp.float32) for s in wshapes]
        xh = x.transpose(0, 2, 3, 1)
        wsh = [w.transpose(2, 3, 1, 0) for w in ws]
        for bf16 in (False, True):
            t1 = timeit(jax.jit(lambda a, w=tuple(ws), b=bf16:
                                conv_stack_nchw(a, w, b)), x)
            t2 = timeit(jax.jit(lambda a, w=tuple(wsh), b=bf16:
                                conv_stack_nhwc(a, w, b)), xh)
            tag = "bf16" if bf16 else "f32 "
            print(f"{name:24s} {tag} NCHW {t1*1000:8.2f} ms   "
                  f"NHWC {t2*1000:8.2f} ms", flush=True)

    # ---- warp variants -----------------------------------------------------
    from learned_pmctf_tpu.ops.warp import flow_warp, flow_warp_fast

    h, w = 1152, 1920
    feat = jnp.asarray(g.normal(0, 1, (1, 1, h, w)), jnp.float32)
    flow = jnp.asarray(g.normal(0, 3, (1, 2, h, w)), jnp.float32)

    def warp_onehot(feature, flow, tile=256, max_disp=64):
        """Separable warp where each 1-D resample rides the MXU:
        out = onehot(src_idx) @ rows, built per H-tile to bound memory."""
        b, c, hh, ww = feature.shape
        f32 = jnp.float32
        d = max_disp
        col = jnp.arange(ww, dtype=f32)[None, None, :]
        row = jnp.arange(hh, dtype=f32)[None, :, None]
        px = jnp.clip(col + jnp.clip(flow[:, 0], -d, d), 0.0, ww - 1.0)
        py = jnp.clip(row + jnp.clip(flow[:, 1], -d, d), 0.0, hh - 1.0)
        x0 = jnp.floor(px); y0 = jnp.floor(py)
        wx = (px - x0)[:, None]; wy = (py - y0)[:, None]

        # vertical: out[h, w] = in[y0[h,w], w] -> per column onehot over H
        # one-hot over src rows, matmul over H axis, per W tile.
        def vpass(x, yidx):
            # x: (b, c, H, W), yidx: (b, H, W) int
            outs = []
            for wstart in range(0, ww, tile):
                xs = x[:, :, :, wstart:wstart + tile]        # (b,c,H,T)
                yi = yidx[:, :, wstart:wstart + tile]        # (b,H,T)
                oh = (yi[:, :, None, :] ==
                      jnp.arange(hh, dtype=yi.dtype)[None, None, :, None])
                oh = oh.astype(jnp.bfloat16)                 # (b,H,Hs,T)
                # out[b,c,h,t] = sum_s oh[b,h,s,t] * xs[b,c,s,t]
                o = jnp.einsum("bhst,bcst->bcht", oh,
                               xs.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                outs.append(o)
            return jnp.concatenate(outs, axis=3)

        y0i = y0.astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, hh - 1)
        v0 = vpass(feature, y0i)
        v1 = vpass(feature, y1i)
        v = v0 + (v1 - v0) * wy

        def hpass(x, xidx):
            outs = []
            for hstart in range(0, hh, tile):
                xs = x[:, :, hstart:hstart + tile, :]        # (b,c,T,W)
                xi = xidx[:, hstart:hstart + tile, :]        # (b,T,W)
                oh = (xi[:, :, :, None] ==
                      jnp.arange(ww, dtype=xi.dtype)[None, None, None, :])
                oh = oh.astype(jnp.bfloat16)                 # (b,T,W,Ws)
                o = jnp.einsum("btws,bcts->bctw", oh,
                               xs.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32)
                outs.append(o)
            return jnp.concatenate(outs, axis=2)

        x0i = x0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, ww - 1)
        h0 = hpass(v, x0i)
        h1 = hpass(v, x1i)
        return h0 + (h1 - h0) * wx

    variants = [
        ("warp_exact", jax.jit(flow_warp)),
        ("warp_fast_d64", jax.jit(lambda f, m: flow_warp_fast(f, m, 64))),
        ("warp_fast_d32", jax.jit(lambda f, m: flow_warp_fast(f, m, 32))),
        ("warp_fast_d16", jax.jit(lambda f, m: flow_warp_fast(f, m, 16))),
        ("warp_onehot_t256", jax.jit(warp_onehot)),
    ]
    ref = None
    for name, fn in variants:
        dt = timeit(fn, feat, flow, runs=5, warmup=2)
        out = fn(feat, flow)
        if ref is None:
            ref = out
            err = 0.0
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
        print(f"{name:24s} {dt*1000:8.2f} ms  max_err_vs_exact {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
