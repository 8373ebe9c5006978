"""Lifting-scheme building blocks (pure functions).

The learned/fixed wavelet transforms themselves live in
models/wavelet.py as flax modules; this module provides the shared
stateless pieces: even/odd split-merge along the row axis, reflection
padding, the CDF 9/7 (bior4.4) lifting coefficients, and the fixed
(non-learned) Haar and CDF 9/7 transforms used as correctness oracles.

ref: pMCTF/layers/lifting_1d.py:10-22 (split/merge),
     :66-67 (coefficients), :236-378 (Haar, CDF97).
"""

import jax.numpy as jnp

from .quant import ste_round

# bior4.4 lifting coefficients: [p1, u1, p2, u2, scale_h, scale_l]
# ref: pMCTF/layers/lifting_1d.py:66-67
CDF97_COEFFS = (
    -1.586134342059924,
    -0.052980118572961,
    0.882911075530934,
    0.443506852043971,
    0.869864451624781,   # scale_h
    1.149604398860241,   # scale_l
)


def split_even_odd(x):
    """Split rows (axis 2) into even/odd phases. (B,C,H,W)->2x(B,C,H/2,W)."""
    return x[:, :, ::2, :], x[:, :, 1::2, :]


def merge_even_odd(x_e, x_o):
    """Interleave even/odd rows back. Inverse of split_even_odd."""
    b, c, h2, w = x_e.shape
    x = jnp.stack([x_e, x_o], axis=3)  # (B,C,H/2,2,W)
    return x.reshape(b, c, h2 * 2, w)


def reflect_pad_rows(x, pad: int = 1):
    """Reflection-pad rows (axis 2), excluding the border sample.

    Equivalent to torch nn.ReflectionPad2d((0, 0, pad, pad)).
    ref: pMCTF/layers/lifting_1d.py:91.
    """
    return jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")


def skip_filter_rows(x, w_prev, w_curr, w_next):
    """3-tap filter along rows with reflect padding (the lifting skip path).

    out[i] = w_prev*x[i-1] + w_curr*x[i] + w_next*x[i+1], borders reflected.
    Implemented with shifts instead of a conv: this is a pure
    bandwidth-bound stencil that XLA fuses into neighbouring elementwise
    work — cheaper than materializing a grouped 3x1 convolution.
    """
    xp = reflect_pad_rows(x, 1)
    return w_prev * xp[:, :, :-2, :] + w_curr * xp[:, :, 1:-1, :] + w_next * xp[:, :, 2:, :]


def _maybe_round(x, lossy: bool):
    return x if lossy else ste_round(x)


def haar_forward(x, lossy: bool = True):
    """Haar lifting along rows. ref: pMCTF/layers/lifting_1d.py:246-261."""
    x_e, x_o = split_even_odd(x)
    x_o = x_o + _maybe_round(x_e, lossy)
    x_e = x_e + _maybe_round(x_o * 0.5, lossy)
    return x_e, x_o


def haar_backward(l, h, lossy: bool = True):
    """Inverse Haar lifting. ref: pMCTF/layers/lifting_1d.py:263-278."""
    l = l - _maybe_round(0.5 * h, lossy)
    h = h - _maybe_round(l * 1.0, lossy)
    return merge_even_odd(l, h)


def cdf97_forward(x, lossy: bool = True):
    """Fixed CDF 9/7 lifting along rows (non-learned oracle).

    ref: pMCTF/layers/lifting_1d.py:308-342.
    """
    c = CDF97_COEFFS
    x_e, x_o = split_even_odd(x)
    # P1: taps (0, c0, c0) -> c0*(x_e[i] + x_e[i+1])
    x_o = x_o + _maybe_round(skip_filter_rows(x_e, 0.0, c[0], c[0]), lossy)
    # U1: taps (c1, c1, 0) -> c1*(x_o[i-1] + x_o[i])
    x_e = x_e + _maybe_round(skip_filter_rows(x_o, c[1], c[1], 0.0), lossy)
    # P2
    x_o = x_o + _maybe_round(skip_filter_rows(x_e, 0.0, c[2], c[2]), lossy)
    # U2
    x_e = x_e + _maybe_round(skip_filter_rows(x_o, c[3], c[3], 0.0), lossy)
    if lossy:
        x_e = x_e * c[5]
        x_o = x_o * c[4]
    return x_e, x_o


def cdf97_backward(l, h, lossy: bool = True):
    """Inverse fixed CDF 9/7 lifting. ref: pMCTF/layers/lifting_1d.py:344-378."""
    c = CDF97_COEFFS
    if lossy:
        l = l / c[5]
        h = h / c[4]
    l = l - _maybe_round(skip_filter_rows(h, c[3], c[3], 0.0), lossy)
    h = h - _maybe_round(skip_filter_rows(l, 0.0, c[2], c[2]), lossy)
    l = l - _maybe_round(skip_filter_rows(h, c[1], c[1], 0.0), lossy)
    h = h - _maybe_round(skip_filter_rows(l, 0.0, c[0], c[0]), lossy)
    return merge_even_odd(l, h)
