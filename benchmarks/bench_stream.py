"""Second bench axis: REAL bitstream encode+decode throughput at 1080p.

Unlike bench.py (estimated-entropy device path), this drives the actual
production path: device sub-graphs + host rANS (threaded encoder,
stream_part=2), writing and reading back real .bin streams for one
GOP-4 group (3 luma + 3 chroma pair codings, MV streams, temporal
inverse), reporting frames/s including ALL host entropy work and
file I/O.

Run: python benchmarks/bench_stream.py [--gop 4] [--runs 2]
Prints one JSON line: {"metric": "pmctf_gop4_1080p_write_stream_fps", ...}
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

import numpy as np


def measure_write_stream(gop=4, runs=2, height=1152, width=1920,
                         decode_async=None):
    """Warm write-stream fps for one GOP at the given geometry; reusable
    from bench.py (secondary metric) and the CLI below."""
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec.video_codec import PMCTFCodec
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})

    codec = PMCTFCodec(module, params)  # production defaults: ec_thread, part=2
    codec.update()

    h, w = height, width
    num_stages = int(np.log2(gop))
    # smooth synthetic content (pure noise inflates rANS work unrealistically)
    base = g.normal(0, 30, (1, 1, h // 8, w // 8))
    up = np.kron(base, np.ones((1, 1, 8, 8))) + 128.0
    luma = [jnp.asarray(np.clip(up + g.normal(0, 4, up.shape), 0, 255),
                        jnp.float32) for _ in range(gop)]
    chroma = [jnp.asarray(
        np.clip(np.kron(g.normal(0, 10, (2, 1, h // 16, w // 16)),
                        np.ones((1, 1, 8, 8))) + 128.0, 0, 255), jnp.float32)
        for _ in range(gop)]

    if decode_async is None:
        decode_async = os.environ.get("PMCTF_BENCH_DEC_ASYNC", "0") == "1"

    def run_once(tmpdir):
        fl = list(luma)
        fc = list(chroma)
        mvs = [None] * gop
        pairs = gop // 2
        for stage in range(num_stages):
            dpb = dpb0
            step = 2 ** stage
            code_lt = stage == num_stages - 1
            for gi in range(pairs):
                fi = gi * 2 * step
                out = codec.encode_one_stage(
                    (fl[fi], fc[fi]), (fl[fi + step], fc[fi + step]),
                    code_lt, dpb,
                    os.path.join(tmpdir, f"s{stage}_{gi}.bin"),
                    pic_width=w, pic_height=h, skip_decoding=False,
                    stage_idx=stage, q_index=10, decode_async=decode_async)
                dpb = out["dpb"]
                fl[fi], fl[fi + step] = out["L_t"], out["H_t"]
                fc[fi], fc[fi + step] = out["L_tc"], out["H_tc"]
                mvs[fi + step] = out["mv_hat"]
            pairs //= 2
        if decode_async:
            # overlapped pair decodes: wait + verify the roundtrip is
            # still bit-exact (decoded == encoder-side recon)
            for d in codec.drain_decodes():
                assert d["max_err"] == 0.0, (d["name"], d["errs"])
        pairs = 1
        for stage in reversed(range(num_stages)):
            step = 2 ** stage
            for gi in reversed(range(pairs)):
                fi = gi * 2 * step
                fl[fi], fl[fi + step] = codec.inverse_mctf(
                    fl[fi], fl[fi + step], mvs[fi + step], stage)
                fc[fi], fc[fi + step] = codec.inverse_mctf(
                    fc[fi], fc[fi + step], mvs[fi + step], stage,
                    downscale=True)
            pairs *= 2
        # true device barrier (block_until_ready is enqueue-only via axon)
        return float(sum(jnp.sum(f) for f in fl))

    with tempfile.TemporaryDirectory() as td:
        _ = run_once(td)  # warmup/compile
        t0 = time.perf_counter()
        for _ in range(runs):
            _ = run_once(td)
        dt = (time.perf_counter() - t0) / runs
    codec.close()
    return gop / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gop", type=int, default=4)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--height", type=int, default=1152)
    ap.add_argument("--width", type=int, default=1920)
    args = ap.parse_args()
    fps = measure_write_stream(args.gop, args.runs, args.height, args.width)
    print(json.dumps({
        "metric": f"pmctf_gop{args.gop}_1080p_write_stream_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
