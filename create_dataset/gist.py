"""GIST scene descriptors (numpy, FFT Gabor filter bank).

Replaces the reference's lear_gist-1.2 C extension
(ref: create-dataset/pygist/gistmodule.c:19 gist_extract): same
descriptor structure — the image is filtered with a bank of Gabor
filters (4 scales x 8 orientations by default), each response averaged
over a 4x4 spatial grid, giving a 4*4*32 = 512-dim descriptor per
channel (grayscale: 512 floats).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=8)
def _gabor_bank(h: int, w: int, scales: int = 4, orientations: int = 8):
    """Frequency-domain Gabor-like filters (Torralba's GIST construction)."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    rad = np.sqrt(fx ** 2 + fy ** 2) + 1e-12
    theta = np.arctan2(fy, fx)

    filters = []
    for s in range(scales):
        f0 = 0.25 / (2 ** s)  # center frequency per scale
        for o in range(orientations):
            ang = np.pi * o / orientations
            dtheta = np.angle(np.exp(1j * (theta - ang)))
            g = np.exp(
                -10.0 * (rad / f0 - 1.0) ** 2
                - 2.0 * orientations / np.pi * dtheta ** 2
            )
            filters.append(g)
    return np.stack(filters)  # (S*O, H, W)


def _prefilter(img: np.ndarray, fc: float = 4.0) -> np.ndarray:
    """Local luminance/contrast normalization (log + whitening)."""
    img = np.log1p(np.maximum(np.asarray(img, np.float64), 0.0))
    h, w = img.shape
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    gf = np.exp(-(fx ** 2 + fy ** 2) / (fc / min(h, w)) ** 2)
    lowpass = np.real(np.fft.ifft2(np.fft.fft2(img) * gf))
    out = img - lowpass
    local_std = np.sqrt(np.abs(np.real(
        np.fft.ifft2(np.fft.fft2(out ** 2) * gf))))
    return out / (0.2 + local_std)


def gist_descriptor(img: np.ndarray, grid: int = 4, scales: int = 4,
                    orientations: int = 8) -> np.ndarray:
    """(grid*grid*scales*orientations,) float32 descriptor of a gray image."""
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    img = _prefilter(img)
    h, w = img.shape
    bank = _gabor_bank(h, w, scales, orientations)
    spec = np.fft.fft2(img)
    feats = []
    gh, gw = h // grid, w // grid
    for g in bank:
        resp = np.abs(np.fft.ifft2(spec * g))
        blocks = resp[: gh * grid, : gw * grid].reshape(grid, gh, grid, gw)
        feats.append(blocks.mean(axis=(1, 3)).reshape(-1))
    return np.concatenate(feats).astype(np.float32)


def gist_distance(a: np.ndarray, b: np.ndarray) -> float:
    """L2 distance between descriptors."""
    return float(np.linalg.norm(a - b))
