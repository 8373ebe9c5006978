"""Pallas TPU kernel: fused 3x3 'same' convolution for small channel counts.

Why: the PostProcess stack (ref: pMCTF/layers/postprocessing.py:20-44) is
thirteen 64-channel 3x3 convs per plane. XLA's conv lowering fills only 64
of the 128 MXU lanes at C=64 (~24 TF/s in situ); the width-fold workaround
(ops/fold.py) recovers throughput by *doubling the FLOPs* (64->128ch at
half width, 90.0 -> 54.9 ms per 1080p postprocess stack). This kernel runs
the 64-ch conv directly at its native FLOP count:

- layout (N, H, C, W): channels in sublanes, width in lanes — every row is
  a well-tiled (C, W) 2-D block, and the 3x3 stencil becomes one
  (O, 9C) @ (9C, W) matmul per output row (K=576 fully fills the MXU's
  contraction dim; only M=O=64 is half-filled, the intrinsic ceiling).
- the 9 shifted taps are built in VMEM with lane-rolls (no HBM im2col).
- bias, LeakyReLU(0.2) and the residual skip-add fuse into the same
  kernel, so a whole ResBlock is 2 kernel launches with zero extra HBM
  round trips beyond the activations themselves.

The row halo crosses the row-block boundary, so the input is passed three
times with clamped index maps (top/center/bottom); image-edge rows are
zero-masked in-kernel to give 'same' zero padding.

Inference-path only (bench/codec); training keeps the XLA path (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll_masked(row, shift, w):
    """Lane-roll with zero fill (no wraparound): shift=+1 brings col j-1
    into col j (left tap), shift=-1 brings col j+1 (right tap)."""
    rolled = pltpu.roll(row, shift % row.shape[1], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
    zero = jnp.zeros_like(rolled)
    if shift > 0:
        return jnp.where(col < shift, zero, rolled)
    return jnp.where(col >= w + shift, zero, rolled)


def _conv3x3_kernel(x_top, x_mid, x_bot, w_ref, b_ref, *rest,
                    th, width, act, out_dtype, has_res):
    if has_res:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest
        res_ref = None
    y = pl.program_id(1)
    ny = pl.num_programs(1)
    first = y == 0
    last = y == ny - 1

    wq = w_ref[:]  # (O, 9C)

    for r in range(th):
        # rows above/below, with zero 'same' padding at the image edge
        if r == 0:
            above = x_top[0, th - 1]
            above = jnp.where(first, jnp.zeros_like(above), above)
        else:
            above = x_mid[0, r - 1]
        if r == th - 1:
            below = x_bot[0, 0]
            below = jnp.where(last, jnp.zeros_like(below), below)
        else:
            below = x_mid[0, r + 1]
        mid = x_mid[0, r]

        taps = []
        for row in (above, mid, below):       # dy = 0,1,2
            taps.append(_roll_masked(row, 1, width))   # dx=0: x[j-1]
            taps.append(row)                            # dx=1: x[j]
            taps.append(_roll_masked(row, -1, width))  # dx=2: x[j+1]
        patch = jnp.concatenate(taps, axis=0)  # (9C, W)

        acc = jax.lax.dot_general(
            wq, patch, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (O, W)
        acc = acc + b_ref[:]
        if res_ref is not None:
            acc = acc + res_ref[0, r].astype(jnp.float32)
        if act == "leaky_relu":
            acc = jnp.where(acc >= 0, acc, 0.2 * acc)
        elif act == "tanh":
            acc = jnp.tanh(acc)
        elif act is not None:
            raise ValueError(act)
        out_ref[0, r] = acc.astype(out_dtype)


def _pick_th(h: int, c: int, o: int, width: int, itemsize: int,
             has_res: bool) -> int:
    """Largest row-block height whose double-buffered VMEM footprint
    (3 input copies + output + optional residual) stays under ~12 MB."""
    budget = 12 * 1024 * 1024
    rows_bytes = (3 * c + o + (o if has_res else 0)) * width * itemsize * 2
    for th in (8, 4, 2, 1):
        if h % th == 0 and th * rows_bytes <= budget:
            return th
    return 1


def conv3x3_hcw(x, w, b, *, act=None, residual=None, out_dtype=None):
    """3x3 'same' stride-1 conv on (N, H, C, W) activations.

    x: (N, H, C, W); w: (O, C, 3, 3) [cross-correlation, torch semantics];
    b: (O,). residual: optional (N, H, O, W) added before `act`.
    act: None | 'leaky_relu' (slope 0.2) | 'tanh'.
    Returns (N, H, O, W) in out_dtype (default: x.dtype).
    """
    n, h, c, width = x.shape
    o = w.shape[0]
    assert w.shape == (o, c, 3, 3), (w.shape, x.shape)
    assert width % 128 == 0, width
    out_dtype = out_dtype or x.dtype
    th = _pick_th(h, c, o, width, x.dtype.itemsize,
                  residual is not None)
    grid = (n, h // th)

    # (O, C, 3, 3) -> (O, 9C) with K ordered (dy, dx, c) to match the
    # kernel's tap concatenation
    wk = jnp.transpose(w, (0, 2, 3, 1)).reshape(o, 9 * c).astype(x.dtype)
    bk = b.reshape(o, 1).astype(jnp.float32)

    def idx(dy):
        def f(ni, yi):
            if dy < 0:
                return (ni, jnp.maximum(yi - 1, 0), 0, 0)
            if dy > 0:
                return (ni, jnp.minimum(yi + 1, h // th - 1), 0, 0)
            return (ni, yi, 0, 0)
        return f

    xspec = lambda dy: pl.BlockSpec((1, th, c, width), idx(dy),
                                    memory_space=pltpu.VMEM)
    in_specs = [xspec(-1), xspec(0), xspec(1),
                pl.BlockSpec((o, 9 * c), lambda ni, yi: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((o, 1), lambda ni, yi: (0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x, x, x, wk, bk]
    if residual is not None:
        assert residual.shape == (n, h, o, width), residual.shape
        in_specs.append(pl.BlockSpec((1, th, o, width), idx(0),
                                     memory_space=pltpu.VMEM))
        args.append(residual)

    kernel = functools.partial(
        _conv3x3_kernel, th=th, width=width, act=act,
        out_dtype=out_dtype, has_res=residual is not None)

    flops = 2 * n * h * width * 9 * c * o
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, o, width), idx(0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, o, width), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(3 * x.size + n * h * o * width) * x.dtype.itemsize,
            transcendentals=0),
    )(*args)


def conv3x3_hcw_reference(x, w, b, *, act=None, residual=None,
                          out_dtype=None):
    """Pure-XLA oracle with identical semantics (for tests)."""
    out_dtype = out_dtype or x.dtype
    xc = jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)  # N,C,H,W
    y = jax.lax.conv_general_dilated(
        xc, w.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y + b.reshape(1, -1, 1, 1).astype(jnp.float32)
    y = jnp.transpose(y, (0, 2, 1, 3))  # N,H,O,W
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    if act == "leaky_relu":
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act == "tanh":
        y = jnp.tanh(y)
    return y.astype(out_dtype)
