"""Round-trip and format tests for the native rANS backend."""

import numpy as np
import pytest

from learned_pmctf_tpu import native


def _random_cdf_table(rng, num_cdfs=8, max_sym=16):
    """Build a valid quantized CDF table: (num_cdfs, max_sym+2) int32."""
    sizes = rng.integers(3, max_sym + 2, size=num_cdfs).astype(np.int32)
    max_len = int(sizes.max())
    cdfs = np.zeros((num_cdfs, max_len), dtype=np.int32)
    for i, sz in enumerate(sizes):
        pmf = rng.random(sz - 1).astype(np.float32) + 0.01
        pmf = pmf / pmf.sum()
        cdf = native.pmf_to_quantized_cdf(pmf, 16)
        cdfs[i, :sz] = cdf
    offsets = rng.integers(-8, 8, size=num_cdfs).astype(np.int32)
    return cdfs, sizes, offsets


def test_pmf_to_quantized_cdf_invariants():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(2, 200))
        pmf = rng.random(n).astype(np.float32)
        pmf[rng.random(n) < 0.3] = 0.0  # zero buckets must get mass stolen in
        pmf = pmf / max(pmf.sum(), 1e-9)
        cdf = native.pmf_to_quantized_cdf(pmf, 16)
        assert cdf[0] == 0
        assert cdf[-1] == 1 << 16
        assert np.all(np.diff(cdf) >= 1)


def test_pmf_native_matches_numpy_fallback():
    rng = np.random.default_rng(1)
    for _ in range(10):
        pmf = rng.random(int(rng.integers(2, 64))).astype(np.float32) + 1e-4
        pmf /= pmf.sum()
        a = native.pmf_to_quantized_cdf(pmf, 16)
        b = native._pmf_to_quantized_cdf_np(pmf, 16)
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("stream_part", [1, 2, 4])
def test_rans_roundtrip(stream_part):
    rng = np.random.default_rng(2)
    cdfs, sizes, offsets = _random_cdf_table(rng)
    n = 5000
    indexes = rng.integers(0, cdfs.shape[0], size=n).astype(np.int16)
    # symbols within each cdf's nominal range, plus out-of-range bypass cases
    symbols = np.empty(n, dtype=np.int16)
    for i in range(n):
        ci = indexes[i]
        symbols[i] = rng.integers(0, sizes[ci] - 2) + offsets[ci]
    wild = rng.random(n) < 0.02
    symbols[wild] = rng.integers(-3000, 3000, size=int(wild.sum()))

    enc = native.RansEncoder(False, stream_part)
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream()
    assert len(stream) > 0

    # container header: (num_streams-1)<<4 | two_byte_size_flag
    flag = stream[0]
    assert (flag >> 4) + 1 == stream_part

    dec = native.RansDecoder(stream_part)
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, cdfs, sizes, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_rans_multithread_matches_sync():
    rng = np.random.default_rng(3)
    cdfs, sizes, offsets = _random_cdf_table(rng)
    n = 2000
    indexes = rng.integers(0, cdfs.shape[0], size=n).astype(np.int16)
    symbols = np.array(
        [rng.integers(0, sizes[c] - 2) + offsets[c] for c in indexes], dtype=np.int16
    )
    streams = []
    for mt in (False, True):
        enc = native.RansEncoder(mt, 1)
        enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
        enc.flush()
        streams.append(enc.get_encoded_stream())
    assert streams[0] == streams[1]


def test_rans_multiple_encode_calls_and_reset():
    rng = np.random.default_rng(4)
    cdfs, sizes, offsets = _random_cdf_table(rng)
    idx1 = rng.integers(0, cdfs.shape[0], size=300).astype(np.int16)
    sym1 = np.array([rng.integers(0, sizes[c] - 2) + offsets[c] for c in idx1], np.int16)
    idx2 = rng.integers(0, cdfs.shape[0], size=200).astype(np.int16)
    sym2 = np.array([rng.integers(0, sizes[c] - 2) + offsets[c] for c in idx2], np.int16)

    enc = native.RansEncoder(False, 1)
    enc.encode_with_indexes(sym1, idx1, cdfs, sizes, offsets)
    enc.encode_with_indexes(sym2, idx2, cdfs, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream()

    dec = native.RansDecoder(1)
    dec.set_stream(stream)
    out1 = dec.decode_stream(idx1, cdfs, sizes, offsets)
    out2 = dec.decode_stream(idx2, cdfs, sizes, offsets)
    np.testing.assert_array_equal(out1, sym1)
    np.testing.assert_array_equal(out2, sym2)

    # reset and reuse
    enc.reset()
    enc.encode_with_indexes(sym2, idx2, cdfs, sizes, offsets)
    enc.flush()
    stream2 = enc.get_encoded_stream()
    dec2 = native.RansDecoder(1)
    dec2.set_stream(stream2)
    np.testing.assert_array_equal(dec2.decode_stream(idx2, cdfs, sizes, offsets), sym2)


def test_rans_negative_index_skipped():
    rng = np.random.default_rng(5)
    cdfs, sizes, offsets = _random_cdf_table(rng)
    indexes = np.array([0, -1, 1, -1, 2], dtype=np.int16)
    symbols = np.array(
        [offsets[0], 99, offsets[1], 98, offsets[2]], dtype=np.int16
    )
    enc = native.RansEncoder(False, 1)
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    dec = native.RansDecoder(1)
    dec.set_stream(enc.get_encoded_stream())
    out = dec.decode_stream(indexes, cdfs, sizes, offsets)
    keep = indexes >= 0
    np.testing.assert_array_equal(out[keep], symbols[keep])


def test_rans_compression_efficiency():
    """A peaked laplacian source should compress well below 16 bits/sym."""
    rng = np.random.default_rng(6)
    vals = np.arange(-30, 31)
    pmf = np.exp(-np.abs(vals) / 2.0).astype(np.float32)
    pmf /= pmf.sum()
    cdf = native.pmf_to_quantized_cdf(pmf, 16)
    cdfs = cdf[None, :].astype(np.int32)
    sizes = np.array([cdf.size], dtype=np.int32)
    offsets = np.array([-30], dtype=np.int32)

    n = 20000
    symbols = rng.laplace(scale=2.0, size=n).round().clip(-30, 30).astype(np.int16)
    indexes = np.zeros(n, dtype=np.int16)
    enc = native.RansEncoder(False, 1)
    enc.encode_with_indexes(symbols, indexes, cdfs, sizes, offsets)
    enc.flush()
    stream = enc.get_encoded_stream()
    bits_per_symbol = len(stream) * 8 / n
    # analytic entropy of a discretized laplace(b=2) is ~3.3 bits
    assert bits_per_symbol < 3.8, bits_per_symbol

    dec = native.RansDecoder(1)
    dec.set_stream(stream)
    np.testing.assert_array_equal(dec.decode_stream(indexes, cdfs, sizes, offsets), symbols)
