"""Where does the write-stream axis actually spend its time?

The r4 decode-overlap landed structurally (per-unit coders + worker
pool) but moved the GOP-4 1080p number nowhere (0.091 sync vs 0.088
async): the VERDICT's model (device idle during rANS waits) is wrong
somewhere. This lab breaks one warm GOP-4 pair into phases and probes
whether tunnel readbacks release the GIL (i.e. whether threads CAN
overlap host round trips at all on this host).

Run: python benchmarks/stream_profile_lab.py   (one TPU job at a time)
"""

import os
import sys
import time
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec.video_codec import PMCTFCodec
    from learned_pmctf_tpu.utils.cache import enable_compilation_cache
    from learned_pmctf_tpu.utils.stream import decode_p

    enable_compilation_cache()

    # --- GIL/overlap probe: sequential vs threaded readbacks -------------
    x = jnp.ones((1, 1, 288, 480), jnp.float32)  # ~ a subband idx plane

    def one_readback():
        y = x * 1.0000001  # force a fresh tiny program + readback
        return np.asarray(y)

    one_readback()
    t0 = time.perf_counter()
    for _ in range(8):
        one_readback()
    seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    threads = [threading.Thread(target=lambda: [one_readback() for _ in range(4)])
               for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    par = time.perf_counter() - t0
    print(f"[probe] 8 readbacks sequential {seq*1000:.0f} ms, "
          f"2x4 threaded {par*1000:.0f} ms "
          f"(overlap factor {seq/max(par,1e-9):.2f}x)", flush=True)

    # --- phase breakdown of one warm pair coding --------------------------
    module = PMCTF(decomp_levels=4, num_me_stages=4, ll_mode="fourstep",
                   warp_mode="fast")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
    dpb0 = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda r: module.init(r, small, small, 10, dpb0,
                              method=PMCTF.full_init_graph)
    )({"params": jax.random.PRNGKey(0)})
    codec = PMCTFCodec(module, params)
    codec.update()

    h, w = 1152, 1920
    base = g.normal(0, 30, (1, 1, h // 8, w // 8))
    up = np.kron(base, np.ones((1, 1, 8, 8))) + 128.0
    luma = [jnp.asarray(np.clip(up + g.normal(0, 4, up.shape), 0, 255),
                        jnp.float32) for _ in range(2)]
    chroma = [jnp.asarray(
        np.clip(np.kron(g.normal(0, 10, (2, 1, h // 16, w // 16)),
                        np.ones((1, 1, 8, 8))) + 128.0, 0, 255), jnp.float32)
        for _ in range(2)]

    tmp = "/tmp/stream_profile"
    os.makedirs(tmp, exist_ok=True)
    out_path = os.path.join(tmp, "p.bin")
    mv_out = out_path.replace(".bin", "_mv.bin")
    fc_path = out_path.replace(".bin", "_C_main.bin")

    def once(tag):
        from learned_pmctf_tpu.utils.stream import encode_p
        t = {}

        def clock(name, fn, *a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            t[name] = time.perf_counter() - t0
            return r

        out_enc = clock("compress_mv", codec.compress_mv,
                        luma[0], luma[1], dpb0, 0, 10)
        encode_p(out_enc["bit_stream"], 0, mv_out)
        mv_hat = out_enc["mv_hat"]
        out_l = clock("compress_luma", codec.compress_one_stage,
                      luma[0], luma[1], True, mv_hat, ischroma=False,
                      sideinfo=[1, 1, h, w], file_name=out_path,
                      stage_idx=0, q_index=10)
        out_c = clock("compress_chroma", codec.compress_one_stage,
                      chroma[0], chroma[1], True, mv_hat, ischroma=True,
                      sideinfo=[1, 2, h // 2, w // 2], file_name=fc_path,
                      stage_idx=0, q_index=10)
        _, string = decode_p(mv_out)
        clock("decode_mv", codec.decompress_mv, string, h, w, dpb0,
              stage_idx=0, q_index=10)
        clock("decode_luma", codec.decompress_one_stage, out_path, True,
              ischroma=False, psize=128, q_index=10, stage_idx=0)
        clock("decode_chroma", codec.decompress_one_stage, fc_path, True,
              ischroma=True, psize=128, q_index=10, stage_idx=0)
        # threaded decode of the same three units
        t0 = time.perf_counter()
        from learned_pmctf_tpu.entropy.coder import EntropyCoder
        fs = [
            codec._pool().submit(
                codec.decompress_mv, string, h, w, dpb0, stage_idx=0,
                q_index=10, coder=EntropyCoder(*codec._coder_args)),
            codec._pool().submit(
                codec.decompress_one_stage, out_path, True, ischroma=False,
                psize=128, q_index=10, stage_idx=0, own_coders=True),
            codec._pool().submit(
                codec.decompress_one_stage, fc_path, True, ischroma=True,
                psize=128, q_index=10, stage_idx=0, own_coders=True),
        ]
        for f in fs:
            f.result()
        t["decode_3units_threaded"] = time.perf_counter() - t0
        total = sum(v for k, v in t.items() if not k.startswith("decode_3"))
        print(f"[{tag}] " + "  ".join(f"{k}={v:.2f}s" for k, v in t.items())
              + f"  (seq total {total:.2f}s)", flush=True)
        return t

    once("warmup")   # compiles
    once("warm1")
    once("warm2")


if __name__ == "__main__":
    main()
