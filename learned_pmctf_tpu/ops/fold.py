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
# Width-only fold (1x2): (B, C, H, W) -> (B, 2C, H, W/2).
#
# fold2 (2x2) quadruples FLOPs (the structural zeros run as real MACs) in
# exchange for 4C MXU channel occupancy; for nets whose channel count is
# already >= 64, doubling to 2C usually reaches the high-rate regime, so
# the width-only variant pays only 2x FLOPs — measured on v5e: the
# postprocess-shaped 64ch stack runs 104 ms direct, 91 ms fold2x2, and
# ~55 ms fold1x2 (benchmarks/foldw_lab.py). Same index algebra as fold2
# restricted to the W axis: folded tap v of output-phase qo/input-phase
# qi carries original tap dx = 2v + qi - qo.
# ---------------------------------------------------------------------------


def foldw2(x):
    """(B, C, H, W) -> (B, 2C, H, W/2); channel order (c, j)."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h, w // 2, 2)
    x = x.transpose(0, 1, 4, 2, 3)
    return x.reshape(b, 2 * c, h, w // 2)


def unfoldw2(x):
    """Inverse of foldw2: (B, 2C, H, W/2) -> (B, C, H, W)."""
    b, c2, h, w = x.shape
    c = c2 // 2
    x = x.reshape(b, c, 2, h, w)
    x = x.transpose(0, 1, 3, 4, 2)
    return x.reshape(b, c, h, 2 * w)


def _foldw_map(k: int) -> np.ndarray:
    """Static scatter map M[(qo, qi, v, dx)] in {0,1} for the W axis."""
    r = (k - 1) // 2
    lo, hi = _fold_tap_range(k)
    kf = hi - lo + 1
    m = np.zeros((2, 2, kf, k), np.float32)
    for qo in range(2):
        for qi in range(2):
            for vi, v in enumerate(range(lo, hi + 1)):
                dx = 2 * v + qi - qo
                if abs(dx) <= r:
                    m[qo, qi, vi, dx + r] = 1.0
    return m


def foldw2_weights(w):
    """(O, I, kh, kw) OIHW -> (2O, 2I, kh, kw') zero-structured equivalent.

    Returns (w_folded, padding) with 'same' padding for the folded conv:
    symmetric (kh-1)/2 rows, (-lo, hi) columns.
    """
    o, i, kh, kw = w.shape
    assert kw % 2 == 1, (kh, kw)
    lo, hi = _fold_tap_range(kw)
    m = jnp.asarray(_foldw_map(kw), w.dtype)
    wf = jnp.einsum("abvx,oiyx->oaibyv", m, w)
    kf = hi - lo + 1
    wf = wf.reshape(2 * o, 2 * i, kh, kf)
    pad = ((kh // 2, kh // 2), (-lo, hi))
    return wf, pad


def fold_by_mode(x, mode):
    """Apply a fold mode to a tensor: '2x2', 'w2', or '2x2w2' (composed)."""
    if mode in (True, "2x2"):
        return fold2(x)
    if mode == "w2":
        return foldw2(x)
    if mode == "2x2w2":
        return foldw2(fold2(x))
    raise ValueError(mode)


def unfold_by_mode(x, mode):
    if mode in (True, "2x2"):
        return unfold2(x)
    if mode == "w2":
        return unfoldw2(x)
    if mode == "2x2w2":
        return unfold2(unfoldw2(x))
    raise ValueError(mode)


def fold_weights_by_mode(w, mode):
    """Fold an OIHW kernel for a mode; returns (w_folded, pad, ch_repeat).

    ch_repeat is the per-original-channel bias replication factor in the
    folded space (channel order is original-channel-major for every mode,
    so jnp.repeat(bias, ch_repeat) matches).
    """
    if mode in (True, "2x2"):
        wf, pad = fold2_weights(w)
        return wf, pad, 4
    if mode == "w2":
        wf, pad = foldw2_weights(w)
        return wf, pad, 2
    if mode == "2x2w2":
        # fold2 of an odd kernel is odd-sized with symmetric 'same'
        # padding (_fold_tap_range is symmetric), so foldw2 composes.
        wf, _ = fold2_weights(w)
        wf, pad = foldw2_weights(wf)
        return wf, pad, 8
    raise ValueError(mode)


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


# Width-fold switch (trace-time, like fold_enabled): gates the cheaper
# fold variants. Default ON — measured on the chip: postprocess-shaped
# stack 90.0 -> 54.9 ms (foldw_lab), full bench 1.835 -> 2.074 fps
# GOP-16 1080p. Kill-switch env var PMCTF_FOLDW=0.
_FOLDW = [os.environ.get("PMCTF_FOLDW", "1") != "0"]


@contextlib.contextmanager
def fold_width_variants(enabled: bool):
    _FOLDW.append(bool(enabled))
    try:
        yield
    finally:
        _FOLDW.pop()


def foldw_enabled() -> bool:
    return _FOLDW[-1]


def fold_mode_small(x):
    """Preferred fold mode for the tiny-channel nets (PredictUpdate at
    16ch): composed 2x2+w2 reaches 128ch occupancy at 8x FLOPs, which
    the v5e MXU rate curve still repays vs 64ch at 4x (foldw_lab)."""
    if not (fold_enabled() and x.shape[0] <= 2):
        return False
    h, w = x.shape[-2], x.shape[-1]
    if foldw_enabled() and h % 2 == 0 and w % 4 == 0:
        return "2x2w2"
    if h % 2 == 0 and w % 2 == 0:
        return "2x2"
    return False


def fold_mode_wide(x):
    """Preferred fold mode for 64ch nets (PostProcess): width-only fold
    reaches 128ch at only 2x FLOPs (vs fold2's 256ch at 4x)."""
    if not (fold_enabled() and x.shape[0] <= 2):
        return False
    h, w = x.shape[-2], x.shape[-1]
    if foldw_enabled() and w % 2 == 0:
        return "w2"
    if h % 2 == 0 and w % 2 == 0:
        return "2x2"
    return False
