"""Generate golden rANS bitstream fixtures from the REFERENCE coder.

Requires the reference build at /tmp/refbuild/libref_rans.so (see the
commands in tests/test_rans_golden.py's module docstring). The checked-in
.npz fixtures let the byte-compatibility test run without the reference
tree. Fixture scenarios cover: single/multi substream containers (parts
1/2/4), bypass escapes (values outside the CDF range on both sides),
skipped symbols (cdf_idx < 0), nonuniform CDF sizes and negative offsets.

Run from repo root: python tests/golden/generate_golden.py
"""

import ctypes
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF_LIB = "/tmp/refbuild/libref_rans.so"


def load_ref():
    lib = ctypes.CDLL(REF_LIB)
    c_i16p = ctypes.POINTER(ctypes.c_int16)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    c_u32p = ctypes.POINTER(ctypes.c_uint32)
    c_f32p = ctypes.POINTER(ctypes.c_float)
    lib.ref_encode.restype = ctypes.c_int
    lib.ref_encode.argtypes = [c_i16p, c_i16p, ctypes.c_int, c_i32p,
                               ctypes.c_int, ctypes.c_int, c_i32p, c_i32p,
                               ctypes.c_int, c_u8p, ctypes.c_int]
    lib.ref_decode.restype = ctypes.c_int
    lib.ref_decode.argtypes = [c_u8p, ctypes.c_int, c_i16p, ctypes.c_int,
                               c_i32p, ctypes.c_int, ctypes.c_int, c_i32p,
                               c_i32p, c_i16p]
    lib.ref_pmf_to_cdf.restype = ctypes.c_int
    lib.ref_pmf_to_cdf.argtypes = [c_f32p, ctypes.c_int, ctypes.c_int, c_u32p]
    return lib


def _p(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def ref_pmf_to_cdf(lib, pmf):
    pmf = np.ascontiguousarray(pmf, np.float32)
    out = np.empty(pmf.size + 1, np.uint32)
    n = lib.ref_pmf_to_cdf(_p(pmf, ctypes.c_float), pmf.size, 16,
                           _p(out, ctypes.c_uint32))
    assert n == pmf.size + 1
    return out.astype(np.int32)


def make_case(rng, n_sym, n_cdf, max_cdflen, bypass_frac, skip_frac, part):
    """Random symbols/CDFs like the codec produces (int16, ±30000 clamp)."""
    sizes = rng.integers(8, max_cdflen + 1, n_cdf).astype(np.int32)
    cdflen = int(sizes.max())
    cdfs = np.zeros((n_cdf, cdflen), np.int32)
    lib = load_ref()
    for i in range(n_cdf):
        m = int(sizes[i]) - 1
        pmf = rng.dirichlet(np.full(m, 0.7)).astype(np.float32)
        cdfs[i, :m + 1] = ref_pmf_to_cdf(lib, pmf)
    offsets = rng.integers(-40, 10, n_cdf).astype(np.int32)

    indexes = rng.integers(0, n_cdf, n_sym).astype(np.int16)
    skip = rng.random(n_sym) < skip_frac
    indexes[skip] = -1

    max_vals = sizes[np.clip(indexes, 0, None)] - 2
    vals = rng.integers(0, np.maximum(max_vals, 1))
    out_of_range = rng.random(n_sym) < bypass_frac
    # below-range and far-above-range escapes (multi-chunk bypass)
    lo = out_of_range & (rng.random(n_sym) < 0.5)
    vals = np.where(lo, -rng.integers(1, 4000, n_sym), vals)
    vals = np.where(out_of_range & ~lo,
                    max_vals + rng.integers(0, 5000, n_sym), vals)
    symbols = (vals + offsets[np.clip(indexes, 0, None)]).astype(np.int16)
    symbols[skip] = 0  # ignored by encoder; decoder returns offset

    return dict(symbols=symbols, indexes=indexes, cdfs=cdfs,
                cdfs_sizes=sizes, offsets=offsets,
                stream_part=np.int32(part))


def ref_encode(lib, case):
    cap = case["symbols"].size * 16 + 1024
    out = np.empty(cap, np.uint8)
    n = lib.ref_encode(
        _p(case["symbols"], ctypes.c_int16), _p(case["indexes"], ctypes.c_int16),
        case["symbols"].size, _p(case["cdfs"], ctypes.c_int32),
        case["cdfs"].shape[0], case["cdfs"].shape[1],
        _p(case["cdfs_sizes"], ctypes.c_int32), _p(case["offsets"], ctypes.c_int32),
        int(case["stream_part"]), _p(out, ctypes.c_uint8), cap)
    assert n > 0
    return out[:n].tobytes()


def main():
    lib = load_ref()
    rng = np.random.default_rng(1234)
    cases = {
        "p1_plain": make_case(rng, 4096, 8, 66, 0.0, 0.0, 1),
        "p1_bypass": make_case(rng, 4096, 8, 66, 0.08, 0.0, 1),
        "p1_skip_bypass": make_case(rng, 2048, 5, 40, 0.05, 0.1, 1),
        "p2_bypass": make_case(rng, 4099, 8, 66, 0.05, 0.0, 2),
        "p4_bypass": make_case(rng, 8192, 12, 80, 0.05, 0.0, 4),
        "p4_large": make_case(rng, 200000, 16, 66, 0.02, 0.0, 4),
        "p1_tiny": make_case(rng, 5, 2, 12, 0.3, 0.0, 1),
    }
    # PMF quantizer golden table
    pmfs = [rng.dirichlet(np.full(m, a)).astype(np.float32)
            for m, a in ((12, 0.5), (65, 0.9), (256, 0.2), (7, 5.0))]
    for name, case in cases.items():
        stream = ref_encode(lib, case)
        np.savez_compressed(
            os.path.join(HERE, f"rans_{name}.npz"),
            stream=np.frombuffer(stream, np.uint8), **case)
        print(f"{name}: {len(stream)} bytes")
    for i, pmf in enumerate(pmfs):
        cdf = ref_pmf_to_cdf(lib, pmf)
        np.savez_compressed(os.path.join(HERE, f"cdf_{i}.npz"),
                            pmf=pmf, cdf=cdf)
    print("done")


if __name__ == "__main__":
    main()
