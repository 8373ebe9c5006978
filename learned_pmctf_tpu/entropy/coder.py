"""Host-side entropy coding facades and CDF table construction.

This is the device/host boundary of the framework: the TPU computes symbol
planes and scale/index planes; these classes marshal them (int16, clamped)
into the native rANS backend.

ref: pMCTF/entropy_models/entropy_models.py:9-55 (EntropyCoder facade),
:203-285 (GaussianEncoder scale tables), :124-178 (BitEstimator.update).
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from .. import native
from .distributions import laplace_cdf, gaussian_cdf

PRECISION = 16
SCALE_LEVELS = 256

_LAPLACE_SCALE_MIN, _LAPLACE_SCALE_MAX = 0.01, 64.0
_GAUSSIAN_SCALE_MIN, _GAUSSIAN_SCALE_MAX = 0.11, 64.0


def _scale_bounds(distribution: str):
    if distribution == "laplace":
        return _LAPLACE_SCALE_MIN, _LAPLACE_SCALE_MAX
    if distribution == "gaussian":
        return _GAUSSIAN_SCALE_MIN, _GAUSSIAN_SCALE_MAX
    raise ValueError(distribution)


def build_indexes_from_scales(scales, distribution: str = "laplace"):
    """Map scale planes to CDF-table indices (device-side, jnp).

    ref: pMCTF/entropy_models/entropy_models.py:269-273. Truncation (not
    rounding) matches the reference's .int() cast; values are >= 0 after
    the clamp so floor == trunc.
    """
    smin, smax = _scale_bounds(distribution)
    log_min = math.log(smin)
    step = (math.log(smax) - log_min) / (SCALE_LEVELS - 1)
    scales = jnp.maximum(scales, 1e-5)
    idx = (jnp.log(scales) - log_min) / step
    idx = jnp.clip(idx, 0, SCALE_LEVELS - 1)
    return idx.astype(jnp.int32)


class EntropyCoder:
    """Facade over the native rANS encoder/decoder pair.

    ref: pMCTF/entropy_models/entropy_models.py:9-55.
    """

    def __init__(self, ec_thread: bool = False, stream_part: int = 1):
        self.encoder = native.RansEncoder(ec_thread, stream_part)
        self.decoder = native.RansDecoder(stream_part)

    def reset(self):
        self.encoder.reset()

    def encode_with_indexes(self, symbols, indexes, cdf, cdf_length, offset):
        symbols = np.asarray(symbols).reshape(-1)
        symbols = np.clip(symbols, -30000, 30000).astype(np.int16)
        indexes = np.asarray(indexes).reshape(-1).astype(np.int16)
        self.encoder.encode_with_indexes(symbols, indexes, cdf, cdf_length, offset)

    def flush(self):
        self.encoder.flush()

    def get_encoded_stream(self) -> bytes:
        return self.encoder.get_encoded_stream()

    def set_stream(self, stream: bytes):
        self.decoder.set_stream(stream)

    def decode_stream(self, indexes, cdf, cdf_length, offset) -> np.ndarray:
        indexes = np.asarray(indexes).reshape(-1).astype(np.int16)
        return self.decoder.decode_stream(indexes, cdf, cdf_length, offset)


def pmf_to_cdf_table(pmfs, tail_mass, pmf_lengths, max_length) -> np.ndarray:
    """Stack per-row quantized CDFs into one (N, max_length+2) table.

    ref: pMCTF/entropy_models/entropy_models.py:24-32.
    """
    n = len(pmf_lengths)
    table = np.zeros((n, max_length + 2), dtype=np.int32)
    for i in range(n):
        prob = np.concatenate(
            [pmfs[i, : pmf_lengths[i]], np.atleast_1d(tail_mass[i])]
        ).astype(np.float32)
        cdf = native.pmf_to_quantized_cdf(prob, PRECISION)
        table[i, : cdf.size] = cdf
    return table


class GaussianEncoder:
    """Scale-indexed Laplace/Gaussian coder over a 256-entry log scale table.

    ref: pMCTF/entropy_models/entropy_models.py:203-285.
    """

    def __init__(self, distribution: str = "laplace"):
        self.distribution = distribution
        smin, smax = _scale_bounds(distribution)
        self.scale_table = np.exp(
            np.linspace(math.log(smin), math.log(smax), SCALE_LEVELS)
        ).astype(np.float64)
        self.entropy_coder: EntropyCoder | None = None
        self._cdf = None
        self._cdf_length = None
        self._offset = None

    def _cdf_fn(self, x, scales):
        # f32 on purpose: the reference builds its tables from torch-f32
        # CDFs (entropy_models.py:228-267) and the resulting quantized
        # tables are golden-tested byte-for-byte; requesting f64 here
        # (with x64 disabled) only produced a truncation warning.
        x = jnp.asarray(x, jnp.float32)
        scales = jnp.asarray(scales, jnp.float32)
        if self.distribution == "laplace":
            return np.asarray(laplace_cdf(x, scales))
        return np.asarray(gaussian_cdf(x, scales))

    def update(self, force: bool = False, entropy_coder: EntropyCoder | None = None):
        if entropy_coder is not None:
            self.entropy_coder = entropy_coder
        if not force and self._offset is not None:
            return
        scales = self.scale_table  # (S,)
        # smallest i in [2, 50] with cdf(i) > 0.9999, else 50
        # ref: entropy_models.py:235-245
        probe = np.arange(2, 51, dtype=np.float64)  # (49,)
        cdf_at_i = self._cdf_fn(probe[None, :], scales[:, None])  # (S, 49)
        hit = cdf_at_i > 0.9999
        pmf_center = np.where(hit.any(axis=1), probe[hit.argmax(axis=1)], 50.0)
        pmf_center = pmf_center.astype(np.int32)

        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())
        samples = np.arange(max_length, dtype=np.float64)[None, :] - pmf_center[:, None]

        upper = self._cdf_fn(samples + 0.5, scales[:, None])
        lower = self._cdf_fn(samples - 0.5, scales[:, None])
        pmf = (upper - lower).astype(np.float32)
        tail_mass = (2.0 * lower[:, :1]).astype(np.float32).reshape(-1)

        self._cdf = pmf_to_cdf_table(pmf, tail_mass, pmf_length, max_length)
        self._cdf_length = (pmf_length + 2).astype(np.int32)
        self._offset = (-pmf_center).astype(np.int32)

    def build_indexes(self, scales):
        return np.asarray(build_indexes_from_scales(scales, self.distribution))

    def encode(self, x, scales):
        indexes = self.build_indexes(scales)
        self.entropy_coder.encode_with_indexes(
            np.asarray(x), indexes, self._cdf, self._cdf_length, self._offset
        )

    def encode_with_indexes(self, x, indexes):
        self.entropy_coder.encode_with_indexes(
            np.asarray(x), np.asarray(indexes), self._cdf, self._cdf_length, self._offset
        )

    def decode_stream(self, scales) -> np.ndarray:
        scales = np.asarray(scales)
        indexes = self.build_indexes(scales)
        vals = self.entropy_coder.decode_stream(
            indexes, self._cdf, self._cdf_length, self._offset
        )
        return vals.reshape(scales.shape).astype(np.float32)

    def decode_with_indexes(self, indexes) -> np.ndarray:
        indexes = np.asarray(indexes)
        vals = self.entropy_coder.decode_stream(
            indexes, self._cdf, self._cdf_length, self._offset
        )
        return vals.reshape(indexes.shape).astype(np.float32)


def build_bit_estimator_tables(cdf_fn, channels: int):
    """CDF tables for a factorized BitEstimator.

    cdf_fn: callable taking (1, C, 1, L) -> (1, C, 1, L) CDF values
    (the flax BitEstimator.get_cdf bound to trained params).
    ref: pMCTF/entropy_models/entropy_models.py:124-178.

    Returns (cdf_table, cdf_length, offset) numpy arrays.
    """
    probe = np.arange(2, 51, dtype=np.float32)  # (49,)

    neg = cdf_fn(jnp.asarray(-probe[None, None, None, :]) * jnp.ones((1, channels, 1, 1)))
    neg = np.asarray(neg).reshape(channels, -1)  # (C, 49)
    hit = neg < 1e-4
    minima = np.where(hit.any(axis=1), probe[hit.argmax(axis=1)], 50.0).astype(np.int32)

    pos = cdf_fn(jnp.asarray(probe[None, None, None, :]) * jnp.ones((1, channels, 1, 1)))
    pos = np.asarray(pos).reshape(channels, -1)
    hit = pos > 0.9999
    maxima = np.where(hit.any(axis=1), probe[hit.argmax(axis=1)], 50.0).astype(np.int32)

    offset = -minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = (
        np.arange(max_length, dtype=np.float32)[None, :] - minima[:, None].astype(np.float32)
    )  # (C, L)
    s = jnp.asarray(samples[None, :, None, :])  # (1, C, 1, L)
    upper = np.asarray(cdf_fn(s + 0.5)).reshape(channels, -1)
    lower = np.asarray(cdf_fn(s - 0.5)).reshape(channels, -1)
    pmf = upper - lower

    last = pmf_length - 1
    tail_mass = lower[np.arange(channels), 0] + (
        1.0 - upper[np.arange(channels), last]
    )

    cdf_table = pmf_to_cdf_table(pmf, tail_mass, pmf_length, max_length)
    return cdf_table, (pmf_length + 2).astype(np.int32), offset.astype(np.int32)


class FactorizedCoder:
    """Host-side coder for factorized latents (one CDF per channel).

    Wraps tables from build_bit_estimator_tables; symbol indexes are just
    channel ids. ref: pMCTF/entropy_models/entropy_models.py:180-200.
    """

    def __init__(self, cdf, cdf_length, offset, channels: int,
                 entropy_coder: EntropyCoder | None = None):
        self._cdf = cdf
        self._cdf_length = cdf_length
        self._offset = offset
        self.channels = channels
        self.entropy_coder = entropy_coder

    @staticmethod
    def build_indexes(shape):
        n, c, h, w = shape
        idx = np.arange(c, dtype=np.int16).reshape(1, -1, 1, 1)
        return np.broadcast_to(idx, (n, c, h, w))

    def encode(self, x):
        x = np.asarray(x)
        indexes = self.build_indexes(x.shape)
        self.entropy_coder.encode_with_indexes(
            x, indexes, self._cdf, self._cdf_length, self._offset
        )

    def decode_stream(self, size) -> np.ndarray:
        h, w = size
        shape = (1, self.channels, h, w)
        indexes = self.build_indexes(shape)
        vals = self.entropy_coder.decode_stream(
            indexes, self._cdf, self._cdf_length, self._offset
        )
        return vals.reshape(shape).astype(np.float32)
