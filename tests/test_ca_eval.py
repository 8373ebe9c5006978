"""Content-adaptive eval CLI: greedy (GOP, ME-downsample) search smoke.

Drives test_pmctf_ca.run_test end-to-end on synthetic frames with a tiny
codec: the search must try multiple (gop, ds) options, pick one, and
produce a reference-shaped log (gop_choice / ds_choice / tested_opts per
chunk, finite RD stats). ref: test_pMCTF_CA.py:341-430 (greedy search),
:105-300 (code_one_gop).
"""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_codec():
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec import PMCTFCodec

    m = PMCTF(decomp_levels=2, num_me_stages=1, channel_mv=8, channel_n=8,
              features=8, ar_features=8, spynet_levels=3)
    y0 = jnp.zeros((1, 1, 64, 64), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, y0, y0, 10, dpb,
                       method=PMCTF.full_init_graph))()
    return PMCTFCodec(m, params)


def _args(h=128, w=128, frames=8, gop=8):
    return {
        "q_idx": 10, "src_height": h, "src_width": w,
        "gop_size": gop, "frame_num": frames, "frame_num_seq": frames,
        "skip_decoding": False, "last_frames": False, "verbose": 0,
        "synthetic": 1,
    }


def test_ca_greedy_search_smoke(tiny_codec):
    import test_pmctf_ca as ca

    log = ca.run_test(tiny_codec, _args())

    # one 8-frame chunk searched over gop {8,4} x ds {1,2}
    assert len(log["gop_choice"]) == 1
    assert log["gop_choice"][0] in (4, 8)
    assert log["ds_choice"][0] in (1, 2)
    assert log["tested_opts"][0] >= 2  # the search really compared options

    n_frames = log["i_frame_num"] + log["p_frame_num"] + log["b_frame_num"]
    assert n_frames == 8
    assert math.isfinite(log["ave_all_frame_bpp"])
    assert log["ave_all_frame_bpp"] > 0
    assert math.isfinite(log["ave_all_frame_psnr"])
    # every frame typed: P frames exist, so timing keys are populated
    assert log["avg_p_encoding_time_ms"] >= 0


def test_ca_code_one_gop_write_stream(tiny_codec, tmp_path):
    """The CA search path composes with the real bitstream path (VERDICT
    r3 item 10): code_one_gop with bin_folder writes real .bin streams,
    the decode check runs (skip_decoding=False), and rates/PSNRs come
    back finite. ref: test_pMCTF_CA.py:105-300 codes real bins during
    the search."""
    import os
    import test_pmctf_ca as ca

    tiny_codec.update(force=True)
    args = _args(h=128, w=128, frames=4, gop=4)
    rng = np.random.default_rng(1)
    h, w = args["src_height"], args["src_width"]
    frames_orig, padded = [], []
    for _ in range(4):
        y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.float32)[None, None]
        c = jnp.asarray(np.stack([
            rng.integers(0, 256, (h // 2, w // 2)),
            rng.integers(0, 256, (h // 2, w // 2))])[:, None], jnp.float32)
        frames_orig.append((y, c))
        padded.append((y, c))

    res = ca.code_one_gop(tiny_codec, frames_orig, padded, (0, 0, 0, 0),
                          args, 4, 1, args["q_idx"],
                          bin_folder=str(tmp_path))
    bins = [f for f in os.listdir(tmp_path) if f.endswith(".bin")]
    assert bins, "no streams written by the CA path"
    assert all(b > 0 for b in res["bpps"])
    assert all(math.isfinite(p) for p in res["psnrs"])


def test_ca_rd_search_prefers_lower_rd(tiny_codec):
    """The chosen (gop, ds) must not lose (in searched RD) to any option
    the greedy pass fully evaluated — re-derive RD for the winner and one
    alternative on the same frames."""
    import test_pmctf_ca as ca

    args = _args()
    # replicate run_test's synthetic source exactly: default_rng(0),
    # one (y, cb, cr) draw triple per frame, in that order
    rng = np.random.default_rng(0)
    h, w = args["src_height"], args["src_width"]
    frames_orig, padded = [], []
    for _ in range(8):
        y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.float32)[None, None]
        cb = rng.integers(0, 256, (h // 2, w // 2))
        cr = rng.integers(0, 256, (h // 2, w // 2))
        c = jnp.asarray(np.stack([cb, cr])[:, None], jnp.float32)
        frames_orig.append((y, c))
        padded.append((y, c))  # 128x128 needs no padding

    lam = ca.get_cur_lamda(args["q_idx"], tiny_codec.module.get_qp_num())

    def rd_of(gop, ds):
        rd = 0.0
        for sub in range(8 // gop):
            res = ca.code_one_gop(
                tiny_codec, frames_orig[sub * gop:(sub + 1) * gop],
                padded[sub * gop:(sub + 1) * gop], (0, 0, 0, 0), args,
                gop, ds, args["q_idx"])
            rd += sum(res["bpps"]) + lam * sum(
                ca.psnr_to_mse(p) for p in res["psnrs"])
        return rd

    rd_g8 = rd_of(8, 1)
    rd_g4 = rd_of(4, 1)
    # greedy search on the same synthetic source picks the gop that wins
    # this comparison (both options are evaluated before early exit)
    log = ca.run_test(tiny_codec, _args())
    want = 8 if rd_g8 <= rd_g4 else 4
    assert log["gop_choice"][0] == want
