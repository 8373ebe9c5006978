"""Spatial resampling ops on NCHW arrays.

Numerics follow the reference's torch semantics:
- bilinear up/down: F.interpolate(..., mode='bilinear', align_corners=False)
  (ref: pMCTF/layers/video/video_net.py:58-71) == half-pixel-center linear
  resize, which is what jax.image.resize('linear') implements.
- nearest upsample: nn.Upsample(scale_factor=2, mode='nearest') == 2x2 repeat.
- avg_pool2: F.avg_pool2d(kernel_size=2, stride=2)
  (ref: pMCTF/layers/video/video_net.py:107-108).
"""

import jax
import jax.numpy as jnp


def bilinear_upsample(x, factor: int = 2):
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, h * factor, w * factor), method="linear")


def bilinear_downsample(x, factor: int = 2):
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, h // factor, w // factor), method="linear")


def bilinear_resize(x, out_h: int, out_w: int):
    b, c, _, _ = x.shape
    return jax.image.resize(x, (b, c, out_h, out_w), method="linear")


def nearest_upsample(x, factor: int = 2):
    x = jnp.repeat(x, factor, axis=2)
    x = jnp.repeat(x, factor, axis=3)
    return x


def avg_pool2(x):
    """2x2 average pooling with stride 2 (NCHW)."""
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 1, 2, 2),
        window_strides=(1, 1, 2, 2),
        padding="VALID",
    ) * 0.25
