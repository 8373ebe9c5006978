"""Micro-benchmark: bilinear flow-warp implementations on TPU.

flow_warp showed up as the hot op in verification (65 ms / 1080p plane
with the take_along_axis formulation). This compares formulations and
is the basis for picking the production implementation:

  v0: take_along_axis on (B, C, H*W)            (baseline)
  v1: global flat take with fused batch offsets
  v2: two-stage: row gather then column gather (2x smaller index space)
  v3: jax.scipy.ndimage.map_coordinates(order=1)
  v4: Pallas kernel, row-band DMA + in-VMEM dynamic slice loop

Run: python benchmarks/warp_variants.py [H W]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def warp_v0(feature, flow):
    from learned_pmctf_tpu.ops.warp import flow_warp
    return flow_warp(feature, flow)


def warp_v1_flat(feature, flow):
    """Single flattened gather across (B*C*H*W)."""
    b, c, h, w = feature.shape
    f32 = jnp.float32
    col = jnp.arange(w, dtype=f32)[None, None, :]
    row = jnp.arange(h, dtype=f32)[None, :, None]
    px = jnp.clip(col + flow[:, 0], 0.0, w - 1.0)
    py = jnp.clip(row + flow[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(px); y0 = jnp.floor(py)
    wx = (px - x0)[:, None]; wy = (py - y0)[:, None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)

    flat = feature.reshape(-1)
    boff = (jnp.arange(b, dtype=jnp.int32) * c)[:, None, None, None]
    coff = jnp.arange(c, dtype=jnp.int32)[None, :, None, None]
    base = (boff + coff) * (h * w)

    def g(yi, xi):
        idx = base + (yi[:, None] * w + xi[:, None])
        return flat[idx.reshape(-1)].reshape(b, c, h, w)

    v00 = g(y0i, x0i); v01 = g(y0i, x1i)
    v10 = g(y1i, x0i); v11 = g(y1i, x1i)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def warp_v2_rows_then_cols(feature, flow):
    """Gather two source rows per output row, then interpolate columns.

    Index space for the row gather is (B, H, W) pairs of full rows, done
    with take along H; then the column gather works inside rows.
    """
    b, c, h, w = feature.shape
    f32 = jnp.float32
    col = jnp.arange(w, dtype=f32)[None, None, :]
    row = jnp.arange(h, dtype=f32)[None, :, None]
    px = jnp.clip(col + flow[:, 0], 0.0, w - 1.0)
    py = jnp.clip(row + flow[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(px); y0 = jnp.floor(py)
    wx = (px - x0)[:, None]; wy = (py - y0)[:, None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)

    # column gather first: for each row r of the source, sample columns
    # x0/x1 of every output position whose y0 or y1 equals r? -> not
    # separable in general; instead gather (y, x) jointly but with the
    # row-major index split: take rows (axis 2), then take_along_axis on
    # the last axis with per-position column indices.
    def rows(yi):
        # (B, C, H, W): output position (h, w) reads source row yi[b,h,w].
        # Row indices vary with w, so gather full rows per (b, h) using
        # the per-position row index at each column (general case).
        idx = jnp.broadcast_to(yi[:, None], (b, c, h, w))
        return jnp.take_along_axis(feature, idx, axis=2)

    r0 = rows(y0i)
    r1 = rows(y1i)

    def cols(rsrc, xi):
        idx = jnp.broadcast_to(xi[:, None], (b, c, h, w))
        return jnp.take_along_axis(rsrc, idx, axis=3)

    v00 = cols(r0, x0i); v01 = cols(r0, x1i)
    v10 = cols(r1, x0i); v11 = cols(r1, x1i)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def warp_v3_map_coordinates(feature, flow):
    from jax.scipy.ndimage import map_coordinates
    b, c, h, w = feature.shape
    col = jnp.arange(w, dtype=jnp.float32)[None, :]
    row = jnp.arange(h, dtype=jnp.float32)[:, None]

    def one(img, fl):
        py = jnp.clip(row + fl[1], 0.0, h - 1.0)
        px = jnp.clip(col + fl[0], 0.0, w - 1.0)
        return map_coordinates(img, [py, px], order=1, mode="nearest")

    return jax.vmap(lambda imgs, fl: jax.vmap(lambda im: one(im, fl))(imgs))(
        feature, flow)


def warp_v4_promise(feature, flow):
    """take_along_axis with promise_in_bounds (indices are pre-clipped)."""
    b, c, h, w = feature.shape
    f32 = jnp.float32
    col = jnp.arange(w, dtype=f32)[None, None, :]
    row = jnp.arange(h, dtype=f32)[None, :, None]
    px = jnp.clip(col + flow[:, 0], 0.0, w - 1.0)
    py = jnp.clip(row + flow[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(px); y0 = jnp.floor(py)
    wx = (px - x0)[:, None]; wy = (py - y0)[:, None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)
    flat = feature.reshape(b, c, h * w)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, h * w)
        idx = jnp.broadcast_to(idx, (b, c, h * w))
        return jnp.take_along_axis(
            flat, idx, axis=2, mode="promise_in_bounds").reshape(b, c, h, w)

    v00 = g(y0i, x0i); v01 = g(y0i, x1i)
    v10 = g(y1i, x0i); v11 = g(y1i, x1i)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def warp_v5_two_gathers(feature, flow):
    """2 gathers instead of 4: fetch (x0, x0+1) pairs as complex-like
    packing — gather y-rows once per (y0,y1) with horizontal pair reads
    via roll. Horizontal neighbor = same gather with idx+1; instead read
    x0 and exploit x1 = x0+1 by gathering from a pre-shifted copy."""
    b, c, h, w = feature.shape
    f32 = jnp.float32
    col = jnp.arange(w, dtype=f32)[None, None, :]
    row = jnp.arange(h, dtype=f32)[None, :, None]
    px = jnp.clip(col + flow[:, 0], 0.0, w - 1.0)
    py = jnp.clip(row + flow[:, 1], 0.0, h - 1.0)
    x0 = jnp.floor(px); y0 = jnp.floor(py)
    wx = (px - x0)[:, None]; wy = (py - y0)[:, None]
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)

    # horizontally pre-interpolate is impossible (wx varies); instead pack
    # feature and its x+1 shift as 2 channels and gather once per row pair
    shifted = jnp.concatenate([feature[:, :, :, 1:], feature[:, :, :, -1:]],
                              axis=3)
    packed = jnp.concatenate([feature, shifted], axis=1)  # (B, 2C, H, W)
    flat = packed.reshape(b, 2 * c, h * w)

    def g(yi):
        idx = (yi * w + x0i).reshape(b, 1, h * w)
        idx = jnp.broadcast_to(idx, (b, 2 * c, h * w))
        out = jnp.take_along_axis(
            flat, idx, axis=2, mode="promise_in_bounds").reshape(b, 2 * c, h, w)
        return out[:, :c], out[:, c:]

    v00, v01 = g(y0i)
    v10, v11 = g(y1i)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def bench(fn, feature, flow, name, runs=10):
    f = jax.jit(fn)
    out = f(feature, flow)
    _ = float(jnp.sum(out))  # true sync (block_until_ready is enqueue-only)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = f(feature, flow)
        _ = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / runs * 1000
    print(f"{name:32s} {dt:8.2f} ms")
    return out, dt


def main():
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 1152
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1920
    rng = np.random.default_rng(0)
    feature = jnp.asarray(rng.normal(size=(1, 1, h, w)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, 2, h, w)) * 5, jnp.float32)

    ref, _ = bench(warp_v0, feature, flow, "v0 take_along_axis(BC,HW)")
    for fn, name in ((warp_v1_flat, "v1 flat global take"),
                     (warp_v3_map_coordinates, "v3 map_coordinates"),
                     (warp_v4_promise, "v4 promise_in_bounds"),
                     (warp_v5_two_gathers, "v5 packed two-gather")):
        try:
            out, _ = bench(fn, feature, flow, name)
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"   max err vs v0: {err:.2e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:32s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
