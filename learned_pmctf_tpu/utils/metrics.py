"""Quality metrics: PSNR, YUV-weighted PSNR, MS-SSIM (pure jnp).

ref: test_pMCTF_flex.py:82-86 (PSNR), :325 (YUV 6-1-1 weighting);
MS-SSIM replaces the pytorch_msssim dependency with a jnp implementation
(standard Wang et al. multi-scale SSIM, 11x11 gaussian window).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, data_range: float = 255.0):
    mse = jnp.mean((jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2)
    return 20.0 * jnp.log10(data_range) - 10.0 * jnp.log10(mse)


def yuv_psnr(psnr_y, psnr_cb, psnr_cr):
    """YUV PSNR with 6-1-1 weighting. ref: test_pMCTF_flex.py:325."""
    return (6.0 * psnr_y + psnr_cb + psnr_cr) / 8.0


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int = 11, sigma: float = 1.5):
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return tuple(g.tolist())


def _blur(x, win):
    """Separable gaussian filter on (B,C,H,W), valid padding."""
    c = x.shape[1]
    kh = jnp.asarray(win, x.dtype).reshape(1, 1, -1, 1)
    kh = jnp.tile(kh, (c, 1, 1, 1))
    kw = kh.transpose(0, 1, 3, 2)
    dn = ("NCHW", "OIHW", "NCHW")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=c)
    return x


def _ssim_per_scale(x, y, data_range: float, win):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    sigma_x = _blur(x * x, win) - mu_x ** 2
    sigma_y = _blur(y * y, win) - mu_y ** 2
    sigma_xy = _blur(x * y, win) - mu_x * mu_y

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(x, y, data_range: float = 255.0):
    """Multi-scale SSIM on (B,C,H,W); needs H,W > 160 for 5 scales."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    win = _gaussian_window()
    levels = len(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(levels):
        ssim, cs = _ssim_per_scale(x, y, data_range, win)
        vals.append(ssim if i == levels - 1 else cs)
        if i < levels - 1:
            pad_h = x.shape[2] % 2
            pad_w = x.shape[3] % 2
            if pad_h or pad_w:
                x = x[:, :, : x.shape[2] - pad_h, : x.shape[3] - pad_w]
                y = y[:, :, : y.shape[2] - pad_h, : y.shape[3] - pad_w]
            x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID") * 0.25
            y = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 1, 2, 2),
                                      (1, 1, 2, 2), "VALID") * 0.25
    vals = jnp.stack(vals)
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    return jnp.prod(jnp.maximum(vals, 0.0) ** weights)
