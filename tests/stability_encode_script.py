"""Fresh-process bitstream encode for the byte-stability regression.

Builds the same tiny codec + GOP-4 as test_video_roundtrip, encodes the
GOP with real bitstreams into argv[1], and prints one line:
``STREAM_SHA256 <hex>`` over the concatenated sorted .bin files.

Two independent processes must print the same hash: the encode-as-decode
replay design makes bytes a pure function of (params, frames, XLA
programs), so any cross-process divergence flags compile-cache or
XLA-version drift that would desync archived bitstreams
(VERDICT r3 item 9).

Invoke via tests/test_codec_roundtrip.py::test_bitstream_bytes_stable_across_processes,
or directly: python tests/stability_encode_script.py /tmp/outdir
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec import PMCTFCodec

    H = W = 64

    def frames(n, seed):
        g = np.random.default_rng(seed)
        base = g.integers(40, 216, (1, 1, H, W)).astype(np.float32)
        luma, chroma = [], []
        for t in range(n):
            drift = g.normal(0, 4, (1, 1, H, W)).astype(np.float32)
            luma.append(jnp.asarray(np.clip(base + drift + 2 * t, 0, 255)))
            chroma.append(jnp.asarray(
                g.integers(0, 256, (2, 1, H // 2, W // 2)).astype(np.float32)))
        return luma, chroma

    m = PMCTF(decomp_levels=2, num_me_stages=2, channel_mv=8, channel_n=8,
              features=8, ar_features=8, spynet_levels=3)
    luma, _ = frames(2, seed=0)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, luma[0], luma[1],
                       10, dpb, method=PMCTF.full_init_graph))()
    qp = jnp.array([0.02, 0.5]).reshape(2, 1, 1, 1)
    for coder in ("lp_coder", "hp_coder"):
        params["params"][coder]["QP"] = qp
        params["params"][coder]["QP_ll"] = qp
    codec = PMCTFCodec(m, params)
    codec.update(force=True)

    fl, fc = frames(4, seed=7)
    pairs_per_stage = ((0, 1), (2, 3)), ((0, 2),)
    for stage, pairs in enumerate(pairs_per_stage):
        dpb = {"mv_feature": None, "ref_mv_y": None}
        for a, b in pairs:
            out = codec.encode_one_stage(
                (fl[a], fc[a]), (fl[b], fc[b]), stage == 1, dpb,
                output_path=os.path.join(outdir, f"s{stage}_{a}_{b}.bin"),
                pic_width=W, pic_height=H, psize=H,
                skip_decoding=True, stage_idx=stage, q_index=10)
            dpb = out["dpb"]
            fl[a], fl[b] = out["L_t"], out["H_t"]
            fc[a], fc[b] = out["L_tc"], out["H_tc"]

    h = hashlib.sha256()
    names = sorted(fn for fn in os.listdir(outdir) if fn.endswith(".bin"))
    assert names, "no bitstreams written"
    for fn in names:
        with open(os.path.join(outdir, fn), "rb") as f:
            h.update(fn.encode())
            h.update(f.read())
    print(f"STREAM_SHA256 {h.hexdigest()}")


if __name__ == "__main__":
    main()
