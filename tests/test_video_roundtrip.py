"""PMCTFCodec bitstream round-trip: the flagship video path.

Drives encode_one_stage over a synthetic GOP-4 (2 temporal stages,
DPB-chained motion within a stage, L-band coded at the last stage) with
skip_decoding=False, and asserts the DECODED L/H bands (luma + chroma)
equal the encoder-side reconstructions. Also asserts the bitstream is
deterministic across encodes.

ref: pMCTF/models/video/pMCTF_L.py:525-637 (encode_one_stage),
test_pMCTF_flex.py:594-618 (the reference's de-facto parity check).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from learned_pmctf_tpu.models import PMCTF
from learned_pmctf_tpu.codec import PMCTFCodec


H, W = 64, 64


def _frames(n, seed=0):
    g = np.random.default_rng(seed)
    base = g.integers(40, 216, (1, 1, H, W)).astype(np.float32)
    luma, chroma = [], []
    for t in range(n):
        drift = g.normal(0, 4, (1, 1, H, W)).astype(np.float32)
        luma.append(jnp.asarray(np.clip(base + drift + 2 * t, 0, 255)))
        chroma.append(jnp.asarray(
            g.integers(0, 256, (2, 1, H // 2, W // 2)).astype(np.float32)))
    return luma, chroma


@pytest.fixture(scope="module")
def codec():
    m = PMCTF(decomp_levels=2, num_me_stages=2, channel_mv=8, channel_n=8,
              features=8, ar_features=8, spynet_levels=3)
    luma, _ = _frames(2)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, luma[0], luma[1],
                       10, dpb, method=PMCTF.full_init_graph))()
    # spread QP endpoints so quantization is non-degenerate
    qp = jnp.array([0.02, 0.5]).reshape(2, 1, 1, 1)
    for coder in ("lp_coder", "hp_coder"):
        params["params"][coder]["QP"] = qp
        params["params"][coder]["QP_ll"] = qp
    c = PMCTFCodec(m, params)
    c.update(force=True)
    yield c
    c.close()


def _run_gop4(codec, outdir, skip_decoding):
    """Hierarchical 2-stage coding of a GOP-4; returns per-pair results."""
    luma, chroma = _frames(4, seed=7)
    fl, fc = list(luma), list(chroma)
    results = {}
    pairs_per_stage = ((0, 1), (2, 3)), ((0, 2),)
    for stage, pairs in enumerate(pairs_per_stage):
        dpb = {"mv_feature": None, "ref_mv_y": None}
        code_lt = stage == 1
        for a, b in pairs:
            out = codec.encode_one_stage(
                (fl[a], fc[a]), (fl[b], fc[b]), code_lt, dpb,
                output_path=os.path.join(outdir, f"s{stage}_{a}_{b}.bin"),
                pic_width=W, pic_height=H, psize=H,
                skip_decoding=skip_decoding, stage_idx=stage, q_index=10)
            dpb = out["dpb"]
            fl[a], fl[b] = out["L_t"], out["H_t"]
            fc[a], fc[b] = out["L_tc"], out["H_tc"]
            results[(stage, a, b)] = out
    return results, fl, fc


def test_gop4_decode_matches_encoder_recon(codec, tmp_path):
    d1 = str(tmp_path / "dec")
    d2 = str(tmp_path / "enc")
    os.makedirs(d1)
    os.makedirs(d2)
    dec, fl_dec, fc_dec = _run_gop4(codec, d1, skip_decoding=False)
    enc, fl_enc, fc_enc = _run_gop4(codec, d2, skip_decoding=True)

    for key in dec:
        for band in ("L_t", "H_t", "L_tc", "H_tc"):
            a = np.asarray(dec[key][band])
            b = np.asarray(enc[key][band])
            # decoded == encoder-side reconstruction. The decoder runs
            # the same full-plane conv graphs; symbols are integers, so
            # any divergence here means a real desync, not noise.
            np.testing.assert_array_equal(a, b, err_msg=f"{key} {band}")
        np.testing.assert_array_equal(
            np.asarray(dec[key]["mv_hat"]), np.asarray(enc[key]["mv_hat"]),
            err_msg=f"{key} mv_hat")
        assert dec[key]["bit_H"] > 0
        assert dec[key]["bit_ME"] > 0

    # bitstreams byte-identical across independent encodes (determinism)
    for fn in sorted(os.listdir(d1)):
        with open(os.path.join(d1, fn), "rb") as f1, \
                open(os.path.join(d2, fn), "rb") as f2:
            assert f1.read() == f2.read(), fn


def test_gop4_decode_async_bit_exact(codec, tmp_path):
    """Overlapped decode (decode_async=True + drain_decodes): all pair
    decodes run on worker threads with per-unit coders and must still be
    bit-exact vs the encoder-side reconstructions (VERDICT r3 item 3)."""
    d = str(tmp_path / "async")
    os.makedirs(d)
    luma, chroma = _frames(4, seed=7)
    fl, fc = list(luma), list(chroma)
    pairs_per_stage = ((0, 1), (2, 3)), ((0, 2),)
    for stage, pairs in enumerate(pairs_per_stage):
        dpb = {"mv_feature": None, "ref_mv_y": None}
        for a, b in pairs:
            out = codec.encode_one_stage(
                (fl[a], fc[a]), (fl[b], fc[b]), stage == 1, dpb,
                output_path=os.path.join(d, f"s{stage}_{a}_{b}.bin"),
                pic_width=W, pic_height=H, psize=H,
                skip_decoding=False, stage_idx=stage, q_index=10,
                decode_async=True)
            dpb = out["dpb"]
            fl[a], fl[b] = out["L_t"], out["H_t"]
            fc[a], fc[b] = out["L_tc"], out["H_tc"]
    results = codec.drain_decodes()
    assert len(results) == 3
    for r in results:
        assert r["max_err"] == 0.0, (r["name"], r["errs"])
    assert codec._pending_decodes == []


@pytest.mark.slow
def test_bitstream_bytes_stable_across_processes(tmp_path):
    """Byte-stability across FRESH processes (VERDICT r3 item 9): the
    same 4-frame sequence encoded in two independent interpreters must
    produce identical bytes — a determinism guard for the
    encode-as-decode replay design against XLA/compile-cache drift."""
    import subprocess
    import sys as _sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(root, "tests", "stability_encode_script.py")
    hashes = []
    for run in ("a", "b"):
        proc = subprocess.run(
            [_sys.executable, script, str(tmp_path / run)],
            capture_output=True, text=True, timeout=1800, cwd=root)
        assert proc.returncode == 0, proc.stderr[-2000:]
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("STREAM_SHA256")]
        assert lines, proc.stdout[-2000:]
        hashes.append(lines[-1].split()[1])
    assert hashes[0] == hashes[1], hashes


def test_gop4_temporal_decode_finite(codec, tmp_path):
    """Full inverse MCTF from decoded bands reproduces a finite GOP."""
    d = str(tmp_path / "t")
    os.makedirs(d)
    results, fl, fc = _run_gop4(codec, d, skip_decoding=False)

    mvs = {key: results[key]["mv_hat"] for key in results}
    # stage 1 then stage 0 (reverse coding order)
    l0, h02 = codec.inverse_mctf(fl[0], fl[2], mvs[(1, 0, 2)], stage_idx=1)
    fl[0], fl[2] = l0, h02
    fc[0], fc[2] = codec.inverse_mctf(
        fc[0], fc[2], mvs[(1, 0, 2)], stage_idx=1, downscale=True)
    for (a, b) in ((0, 1), (2, 3)):
        fl[a], fl[b] = codec.inverse_mctf(
            fl[a], fl[b], mvs[(0, a, b)], stage_idx=0)
        fc[a], fc[b] = codec.inverse_mctf(
            fc[a], fc[b], mvs[(0, a, b)], stage_idx=0, downscale=True)
    luma, _ = _frames(4, seed=7)
    for t in range(4):
        arr = np.asarray(fl[t])
        assert np.all(np.isfinite(arr))
        # lossy reconstruction should stay in the vicinity of the source
        mse = float(np.mean((arr - np.asarray(luma[t])) ** 2))
        assert mse < 5000.0, (t, mse)
