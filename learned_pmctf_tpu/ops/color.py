"""Color-space and chroma-format conversions (jnp, NCHW or CHW).

ref: pMCTF/utils/util.py:21-173 (JPEG-flavor YCbCr, lossless YCoCg,
420->444 bilinear upsampling) and pMCTF/utils/conversion.py:5-160
(BT.601/BT.709 integer studio-range variants, 444->420 chroma
subsampling, 420->444 replication).
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
    """Upsample chroma 2x and concatenate. y (B,1,H,W); u,v (B,1,H/2,W/2).

    mode "linear" matches the reference's bilinear align_corners=False
    (util.py:109-144); mode "nearest" matches the 2x2 replication of
    conversion.py:5-33 (YCbCr4202YCbCr444)."""
    b, c, h, w = y.shape
    u = jax.image.resize(u, (u.shape[0], u.shape[1], h, w), method=mode)
    v = jax.image.resize(v, (v.shape[0], v.shape[1], h, w), method=mode)
    return jnp.concatenate([y, u, v], axis=1)


def yuv444_to_420(ycbcr):
    """4:4:4 -> 4:2:0: box-average each 2x2 chroma block and round.

    Input (..., 3, H, W) with even H, W; returns (y, cb, cr) with chroma
    at half resolution. Rounding is round-half-to-even, matching the
    reference's np.round (conversion.py:52-75, YCbCr4442YCbCr420)."""
    y = ycbcr[..., 0:1, :, :]
    c = ycbcr[..., 1:3, :, :].astype(jnp.float32)
    c = (c[..., 0::2, 0::2] + c[..., 1::2, 0::2]
         + c[..., 0::2, 1::2] + c[..., 1::2, 1::2]) / 4.0
    c = jnp.round(c)
    return y, c[..., 0:1, :, :], c[..., 1:2, :, :]


def rgb_to_ycbcr_studio(rgb, flavor: int = 709):
    """Integer studio-range RGB->YCbCr (BT.601 or BT.709 coefficients).

    Bit-exact re-derivation of conversion.py:79-117 (rgb2ycbcr): 8-bit
    fixed-point matrix, arithmetic >>8, headroom clamps (Y<=235,
    Cb/Cr<=240, all >=16). Input (..., 3, H, W) in [0, 255]."""
    x = rgb.astype(jnp.int32)
    r, g, b = x[..., 0, :, :], x[..., 1, :, :], x[..., 2, :, :]
    if flavor == 601:
        y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
        cb = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
        cr = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    elif flavor == 709:
        y = ((47 * r + 157 * g + 16 * b + 128) >> 8) + 16
        cb = ((-26 * r - 87 * g + 112 * b + 128) >> 8) + 128
        cr = ((112 * r - 102 * g - 10 * b + 128) >> 8) + 128
    else:
        raise ValueError(f"unknown conversion flavor {flavor}")
    y = jnp.minimum(y, 235)
    cb = jnp.minimum(cb, 240)
    cr = jnp.minimum(cr, 240)
    out = jnp.stack([y, cb, cr], axis=-3)
    return jnp.maximum(out, 16)


def ycbcr_to_rgb_studio(ycbcr, flavor: int = 709):
    """Integer studio-range YCbCr->RGB (BT.601 or BT.709 coefficients).

    Bit-exact re-derivation of conversion.py:119-160 (ycbcr2rgb) /
    util.py:73-105 (ycbcr2rgb_709). Input (..., 3, H, W)."""
    x = ycbcr.astype(jnp.int32)
    c = x[..., 0, :, :] - 16
    d = x[..., 1, :, :] - 128
    e = x[..., 2, :, :] - 128
    if flavor == 601:
        r = (298 * c + 409 * e + 128) >> 8
        g = (298 * c - 100 * d - 208 * e + 128) >> 8
        b = (298 * c + 516 * d + 128) >> 8
    elif flavor == 709:
        r = (298 * c + 459 * e + 128) >> 8
        g = (298 * c - 55 * d - 136 * e + 128) >> 8
        b = (298 * c + 541 * d + 128) >> 8
    else:
        raise ValueError(f"unknown conversion flavor {flavor}")
    return jnp.clip(jnp.stack([r, g, b], axis=-3), 0, 255)


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
