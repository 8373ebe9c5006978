"""Color-space and chroma-format conversions (jnp, NCHW or CHW).

ref: pMCTF/utils/util.py:21-173 (JPEG-flavor YCbCr, lossless YCoCg,
420->444 bilinear upsampling).
"""

import jax
import jax.numpy as jnp


def rgb_to_ycbcr(rgb, bitdepth: int = 8):
    """JPEG-flavor RGB->YCbCr, full range. Input (..., 3, H, W)."""
    delta = 128.0 if bitdepth == 8 else 32768.0
    r = rgb[..., 0, :, :]
    g = rgb[..., 1, :, :]
    b = rgb[..., 2, :, :]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + delta
    cr = (r - y) * 0.713 + delta
    return jnp.stack([y, cb, cr], axis=-3)


def ycbcr_to_rgb(ycbcr, bitdepth: int = 8):
    """JPEG-flavor YCbCr->RGB. Input (..., 3, H, W)."""
    delta = 128.0 if bitdepth == 8 else 32768.0
    y = ycbcr[..., 0, :, :]
    cb = ycbcr[..., 1, :, :] - delta
    cr = ycbcr[..., 2, :, :] - delta
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-3)


def yuv420_to_444(y, u, v, mode: str = "linear"):
    """Upsample chroma 2x and concatenate. y (B,1,H,W); u,v (B,1,H/2,W/2)."""
    b, c, h, w = y.shape
    u = jax.image.resize(u, (u.shape[0], u.shape[1], h, w), method=mode)
    v = jax.image.resize(v, (v.shape[0], v.shape[1], h, w), method=mode)
    return jnp.concatenate([y, u, v], axis=1)


def rgb_to_ycocg_lossless(x):
    """Lossless RGB->YCoCg (integer). ref: pMCTF/utils/util.py:148-160."""
    x = x.astype(jnp.int32)
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    co = r - b
    tmp = b + (co >> 1)
    cg = g - tmp
    y = tmp + (cg >> 1)
    return jnp.stack([y, co, cg], axis=-3).astype(jnp.float32)


def ycocg_to_rgb_lossless(x):
    """Lossless YCoCg->RGB (integer). ref: pMCTF/utils/util.py:163-173."""
    x = x.astype(jnp.int32)
    y, co, cg = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    tmp = y - (cg >> 1)
    g = cg + tmp
    b = tmp - (co >> 1)
    r = b + co
    return jnp.stack([r, g, b], axis=-3).astype(jnp.float32)
