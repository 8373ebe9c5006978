"""ctypes bindings to the native rANS entropy-coding backend.

Mirrors the reference's pybind11 surface (ref: pMCTF/cpp/py_rans/py_rans.cpp:227-243
``MLCodec_rans.RansEncoder/RansDecoder`` and ref: pMCTF/cpp/ops/ops.cpp:84-91
``MLCodec_CXX.pmf_to_quantized_cdf``) as plain Python classes backed by a
C shared library built from ``csrc/`` (this image has no pybind11).

The library auto-builds on first import via ``make`` if the .so is missing.
A pure-numpy ``pmf_to_quantized_cdf`` fallback keeps CDF-table construction
working without the native build (the encoder/decoder themselves require it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent / "csrc"
_LIB_PATH = _CSRC / "libpmctf_rans.so"

_lib = None


def build_native(force: bool = False) -> Path:
    """Build the shared library with make. Returns the .so path."""
    if force and _LIB_PATH.exists():
        _LIB_PATH.unlink()
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is not None:
        return _lib
    build_native()
    lib = ctypes.CDLL(str(_LIB_PATH))

    c_i16p = ctypes.POINTER(ctypes.c_int16)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    c_f32p = ctypes.POINTER(ctypes.c_float)

    lib.pmctf_encoder_create.restype = ctypes.c_void_p
    lib.pmctf_encoder_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.pmctf_encoder_destroy.argtypes = [ctypes.c_void_p]
    lib.pmctf_encoder_encode_with_indexes.argtypes = [
        ctypes.c_void_p, c_i16p, c_i16p, ctypes.c_int,
        c_i32p, ctypes.c_int, ctypes.c_int, c_i32p, c_i32p,
    ]
    lib.pmctf_encoder_flush.argtypes = [ctypes.c_void_p]
    lib.pmctf_encoder_stream_size.restype = ctypes.c_int
    lib.pmctf_encoder_stream_size.argtypes = [ctypes.c_void_p]
    lib.pmctf_encoder_get_stream.argtypes = [ctypes.c_void_p, c_u8p]
    lib.pmctf_encoder_reset.argtypes = [ctypes.c_void_p]

    lib.pmctf_decoder_create.restype = ctypes.c_void_p
    lib.pmctf_decoder_create.argtypes = [ctypes.c_int]
    lib.pmctf_decoder_destroy.argtypes = [ctypes.c_void_p]
    lib.pmctf_decoder_set_stream.argtypes = [ctypes.c_void_p, c_u8p, ctypes.c_int]
    lib.pmctf_decoder_decode_stream.argtypes = [
        ctypes.c_void_p, c_i16p, ctypes.c_int,
        c_i32p, ctypes.c_int, ctypes.c_int, c_i32p, c_i32p, c_i16p,
    ]

    lib.pmctf_pmf_to_quantized_cdf.restype = ctypes.c_int
    lib.pmctf_pmf_to_quantized_cdf.argtypes = [
        c_f32p, ctypes.c_int, ctypes.c_int, c_u32p,
    ]
    _lib = lib
    return lib


def _as_c(arr, dtype, ptr_type):
    arr = np.ascontiguousarray(arr, dtype=dtype)
    return arr, arr.ctypes.data_as(ptr_type)


class RansEncoder:
    """Buffering multi-substream rANS encoder (host side)."""

    def __init__(self, multithread: bool = False, stream_part: int = 1):
        self._lib = _load()
        self._h = self._lib.pmctf_encoder_create(int(multithread), int(stream_part))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pmctf_encoder_destroy(self._h)
            self._h = None

    def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes, offsets):
        symbols, sym_p = _as_c(symbols, np.int16, ctypes.POINTER(ctypes.c_int16))
        indexes, idx_p = _as_c(indexes, np.int16, ctypes.POINTER(ctypes.c_int16))
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        assert cdfs.ndim == 2
        _, cdf_p = _as_c(cdfs, np.int32, ctypes.POINTER(ctypes.c_int32))
        sizes, size_p = _as_c(cdfs_sizes, np.int32, ctypes.POINTER(ctypes.c_int32))
        offs, off_p = _as_c(offsets, np.int32, ctypes.POINTER(ctypes.c_int32))
        self._lib.pmctf_encoder_encode_with_indexes(
            self._h, sym_p, idx_p, symbols.size,
            cdf_p, cdfs.shape[0], cdfs.shape[1], size_p, off_p,
        )

    def flush(self):
        self._lib.pmctf_encoder_flush(self._h)

    def get_encoded_stream(self) -> bytes:
        size = self._lib.pmctf_encoder_stream_size(self._h)
        out = np.empty(size, dtype=np.uint8)
        self._lib.pmctf_encoder_get_stream(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.tobytes()

    def reset(self):
        self._lib.pmctf_encoder_reset(self._h)


class RansDecoder:
    """Multi-substream rANS decoder (host side)."""

    def __init__(self, stream_part: int = 1):
        self._lib = _load()
        self._h = self._lib.pmctf_decoder_create(int(stream_part))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.pmctf_decoder_destroy(self._h)
            self._h = None

    def set_stream(self, stream: bytes):
        data = np.frombuffer(stream, dtype=np.uint8)
        data, data_p = _as_c(data, np.uint8, ctypes.POINTER(ctypes.c_uint8))
        self._lib.pmctf_decoder_set_stream(self._h, data_p, data.size)

    def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets) -> np.ndarray:
        indexes, idx_p = _as_c(indexes, np.int16, ctypes.POINTER(ctypes.c_int16))
        cdfs = np.ascontiguousarray(cdfs, dtype=np.int32)
        _, cdf_p = _as_c(cdfs, np.int32, ctypes.POINTER(ctypes.c_int32))
        sizes, size_p = _as_c(cdfs_sizes, np.int32, ctypes.POINTER(ctypes.c_int32))
        offs, off_p = _as_c(offsets, np.int32, ctypes.POINTER(ctypes.c_int32))
        out = np.empty(indexes.size, dtype=np.int16)
        self._lib.pmctf_decoder_decode_stream(
            self._h, idx_p, indexes.size,
            cdf_p, cdfs.shape[0], cdfs.shape[1], size_p, off_p,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        )
        return out


def pmf_to_quantized_cdf(pmf, precision: int = 16) -> np.ndarray:
    """Float PMF -> integer CDF summing to 2^precision, all buckets >= 1.

    Uses the native implementation when available, numpy fallback otherwise.
    """
    pmf = np.ascontiguousarray(pmf, dtype=np.float32)
    try:
        lib = _load()
    except (OSError, subprocess.CalledProcessError):
        return _pmf_to_quantized_cdf_np(pmf, precision)
    out = np.empty(pmf.size + 1, dtype=np.uint32)
    rc = lib.pmctf_pmf_to_quantized_cdf(
        pmf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pmf.size,
        precision, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    if rc != 0:
        raise ValueError(f"pmf_to_quantized_cdf failed with code {rc}")
    return out.astype(np.int32)


def _pmf_to_quantized_cdf_np(pmf: np.ndarray, precision: int) -> np.ndarray:
    """Numpy reference implementation (identical numerics to native)."""
    n = pmf.size
    cdf = np.zeros(n + 1, dtype=np.uint64)
    cdf[1:] = (np.round(pmf.astype(np.float64) * (1 << precision)) + 0.5).astype(np.uint64)
    total = int(cdf.sum())
    if total == 0:
        raise ValueError("zero-mass pmf")
    cdf = ((1 << precision) * cdf) // total
    cdf = np.cumsum(cdf).astype(np.int64)
    cdf[-1] = 1 << precision
    cdf = cdf.astype(np.int64)
    for i in range(n):
        if cdf[i] == cdf[i + 1]:
            freqs = cdf[1:] - cdf[:-1]
            candidates = np.where(freqs > 1)[0]
            if candidates.size == 0:
                raise ValueError("cannot steal frequency")
            best_steal = candidates[np.argmin(freqs[candidates])]
            if best_steal < i:
                cdf[best_steal + 1:i + 1] -= 1
            else:
                cdf[i + 1:best_steal + 1] += 1
    assert cdf[0] == 0 and cdf[-1] == (1 << precision)
    assert np.all(cdf[1:] > cdf[:-1])
    return cdf.astype(np.int32)


if __name__ == "__main__":
    import sys
    if "--build" in sys.argv:
        path = build_native(force="--force" in sys.argv)
        print(f"built {path}")
