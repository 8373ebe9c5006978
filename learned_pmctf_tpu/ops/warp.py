"""Bilinear backward warping (motion compensation) on NCHW arrays.

TPU-native reimplementation of the reference's normalized-grid
grid_sample warp (ref: pMCTF/layers/video/video_net.py:32-55).  With
align_corners=True + border padding, the normalized-grid formulation is
exactly "sample at (x + flow_x, y + flow_y) in pixel coordinates with
coordinates clamped to the image rect", so we implement that directly —
no grid cache needed, the index math fuses into the gather.
"""

import jax.numpy as jnp


def flow_warp(feature, flow):
    """Warp `feature` (B,C,H,W) backward by `flow` (B,2,H,W).

    flow[:, 0] is horizontal (x) displacement, flow[:, 1] vertical (y),
    in pixels. Bilinear interpolation, border padding.
    """
    b, c, h, w = feature.shape
    compute_dtype = jnp.promote_types(feature.dtype, jnp.float32)

    col = jnp.arange(w, dtype=compute_dtype)[None, None, :]
    row = jnp.arange(h, dtype=compute_dtype)[None, :, None]

    px = col + flow[:, 0].astype(compute_dtype)  # (B,H,W)
    py = row + flow[:, 1].astype(compute_dtype)

    # border padding: clamp continuous coordinates to the valid rect
    px = jnp.clip(px, 0.0, w - 1.0)
    py = jnp.clip(py, 0.0, h - 1.0)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)

    flat = feature.reshape(b, c, h * w)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, h * w)
        idx = jnp.broadcast_to(idx, (b, c, h * w))
        return jnp.take_along_axis(flat, idx, axis=2).reshape(b, c, h, w)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wx = wx[:, None].astype(feature.dtype)
    wy = wy[:, None].astype(feature.dtype)

    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy
