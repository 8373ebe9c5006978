"""Space-to-depth conv folding for small-channel convolutions.

TPU MXU utilization collapses for convs with few channels (measured on
v5e: 16ch 3x3 runs at ~4 TFLOP/s, 64ch at ~31, 112ch at ~110, 256ch at
~178). The codec's hottest small convs (the PredictUpdate lifting CNNs at
16ch, SpyNet's 7x7 MEBasic stack at 32-64ch) are exactly in the slow
regime. Folding a 2x2 spatial block into channels (x -> 4C channels at
H/2 x W/2) and transforming the kernel to an equivalent zero-structured
one quadruples arithmetic but more than quadruples the MXU rate:
measured net ~1.9x for the PU nets, ~2x for 7x7 stacks.

The transform is EXACT in exact arithmetic (same products, possibly
reassociated sums): out = unfold2(conv(fold2(x), fold2_weights(w))).

Kernel transform, stride-1 odd-k 'same' conv (derivation):
  Y[(o,i,j)][y,x] = sum_{c,dy,dx} W[o,c,dy,dx] X[c, 2y+i+dy, 2x+j+dx]
  with 2y+i+dy = 2(y+u)+p  =>  dy = 2u + p - i  (and likewise for x),
so folded tap (u,v) of folded-out-channel (o,i,j) / folded-in-channel
(c,p,q) carries W[o,c,2u+p-i, 2v+q-j] where the index is in range, else
0. The folded kernel spans u in [ceil((-r-1)/2), floor((r+1)/2)] for
r = (k-1)/2, i.e. size 3 for k=3 and size 5 for k=7, with ~25%/~50%
structural zeros (the 4x-FLOPs price the MXU rate more than repays).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def fold2(x):
    """(B, C, H, W) -> (B, 4C, H/2, W/2); channel order (c, i, j)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, 4 * c, h // 2, w // 2)


def unfold2(x):
    """Inverse of fold2: (B, 4C, H/2, W/2) -> (B, C, H, W)."""
    b, c4, h, w = x.shape
    c = c4 // 4
    x = x.reshape(b, c, 2, 2, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, c, 2 * h, 2 * w)


def _fold_tap_range(k: int):
    """Folded tap offsets (inclusive) for an odd 'same' kernel of size k."""
    r = (k - 1) // 2
    # dy = 2u + p_in - p_out with p_in - p_out in {-1, 0, 1}, dy in [-r, r]
    lo = int(np.ceil((-r - 1) / 2))
    hi = int(np.floor((r + 1) / 2))
    return lo, hi


def _fold_map(k: int) -> np.ndarray:
    """Static scatter map M[(a, b, u, v, dy, dx)] in {0,1}: folded tap
    (u,v) of output-phase a / input-phase b carries original tap (dy,dx).
    Phases a = 2*po + qo, b = 2*pi + qi (matching fold2's channel order).
    """
    r = (k - 1) // 2
    lo, hi = _fold_tap_range(k)
    kf = hi - lo + 1
    m = np.zeros((4, 4, kf, kf, k, k), np.float32)
    for po in range(2):
        for qo in range(2):
            for pi in range(2):
                for qi in range(2):
                    for ui, u in enumerate(range(lo, hi + 1)):
                        dy = 2 * u + pi - po
                        if abs(dy) > r:
                            continue
                        for vi, v in enumerate(range(lo, hi + 1)):
                            dx = 2 * v + qi - qo
                            if abs(dx) > r:
                                continue
                            m[2 * po + qo, 2 * pi + qi,
                              ui, vi, dy + r, dx + r] = 1.0
    return m


def fold2_weights(w):
    """(O, I, k, k) OIHW -> (4O, 4I, k', k') zero-structured equivalent.

    Returns (w_folded, padding): padding is the (possibly asymmetric)
    'same' padding ((top, bottom), (left, right)) for the folded conv.
    One einsum over a static 0/1 map — cheap relative to the conv and
    fused away by XLA when w is a constant.
    """
    o, i, kh, kw = w.shape
    assert kh == kw and kh % 2 == 1, (kh, kw)
    lo, hi = _fold_tap_range(kh)
    m = jnp.asarray(_fold_map(kh), w.dtype)
    wf = jnp.einsum("abuvyx,oiyx->oaibuv", m, w)
    kf = hi - lo + 1
    wf = wf.reshape(4 * o, 4 * i, kf, kf)
    pad = ((-lo, hi), (-lo, hi))
    return wf, pad


def conv2d_folded(x, w, bias=None):
    """'Same' stride-1 NCHW conv computed in folded space.

    x: (B, C, H, W) with even H, W; w: (O, I, k, k) odd k.
    Exact modulo float re-association. Fallback is the caller's job
    (shapes are static under jit).
    """
    wf, pad = fold2_weights(w)
    xf = fold2(x)
    yf = jax.lax.conv_general_dilated(
        xf, wf, (1, 1), pad, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = unfold2(yf)
    if bias is not None:
        y = y + bias.reshape(1, -1, 1, 1)
    return y


# ---------------------------------------------------------------------------
# Global switch (read at TRACE time, like layers.conv_compute_dtype): lets
# tests compare folded vs direct execution. Default ON — the folded path is
# numerically equivalent (same products, reassociated sums) and ~1.9-2x
# faster for the small-channel nets that use it.
# ---------------------------------------------------------------------------

import contextlib
import os

_FOLD_SMALL = [os.environ.get("PMCTF_FOLD", "1") != "0"]


@contextlib.contextmanager
def fold_small_convs(enabled: bool):
    _FOLD_SMALL.append(bool(enabled))
    try:
        yield
    finally:
        _FOLD_SMALL.pop()


def fold_enabled() -> bool:
    return _FOLD_SMALL[-1]


def foldable(x) -> bool:
    """Folding applies to even-sized spatial dims (static under jit).

    Batch gate: folding is restricted to batch <= 2 (the single-pair
    luma / u+v-chroma codec paths it was measured on). At larger batch
    XLA materializes the 6-D fold/unfold intermediates with pathological
    tile padding (measured 32-128x HBM expansion -> OOM at 1080p batch 8)
    and the batch dimension already fills the MXU sublanes, so folding
    is both unsafe and unnecessary there.
    """
    return (fold_enabled() and x.shape[0] <= 2
            and x.shape[-2] % 2 == 0 and x.shape[-1] % 2 == 0)
