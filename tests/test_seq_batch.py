"""Sequence-batched eval (--seq_batch): CLI-level equivalence test.

SURVEY §2.6 item 2 asks for eval parallelism over sequences AND
q-indices; `run_test_qbatch` codes S sequences x Q rate points on one
vmapped leading axis (element e = s*Q + qi). This test checks that a
sequence coded inside a 2-sequence batch produces the same per-frame
rates/quality as the same sequence coded alone (ref protocol:
test_pMCTF_flex.py:24-570 runs sequences strictly sequentially).
"""

import os

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
    g = np.random.default_rng(3)
    y0 = jnp.asarray(g.integers(0, 256, (1, 1, 64, 64)), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    params = jax.jit(
        lambda: m.init({"params": jax.random.PRNGKey(0)}, y0, y0, 10, dpb,
                       method=PMCTF.full_init_graph))()
    return PMCTFCodec(m, params)


def _write_yuv(path, seed, frames=4, h=64, w=64):
    g = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for _ in range(frames):
            f.write(g.integers(0, 256, (h, w), dtype=np.uint8).tobytes())
            f.write(g.integers(0, 256, (h // 2, w // 2),
                               dtype=np.uint8).tobytes())
            f.write(g.integers(0, 256, (h // 2, w // 2),
                               dtype=np.uint8).tobytes())


def _cur(path):
    return {
        "q_idx": None, "src_height": 64, "src_width": 64,
        "gop_size": 4, "frame_num": 4, "frame_num_seq": 4,
        "write_stream": False, "skip_decoding": False,
        "last_frames": False, "verbose": 0, "synthetic": 0,
        "shard_q": False, "vid_path": path,
    }


def test_seq_batch_matches_single_sequence(tiny_codec, tmp_path):
    import test_pmctf_flex as flex

    pa = os.path.join(tmp_path, "a.yuv")
    pb = os.path.join(tmp_path, "b.yuv")
    _write_yuv(pa, seed=1)
    _write_yuv(pb, seed=2)

    q_list = [4, 16]
    solo_a = flex.run_test_qbatch(tiny_codec, _cur(pa), q_list)[0]
    solo_b = flex.run_test_qbatch(tiny_codec, _cur(pb), q_list)[0]
    both = flex.run_test_qbatch(tiny_codec, [_cur(pa), _cur(pb)], q_list)

    for q in q_list:
        for solo, batched in ((solo_a, both[0]), (solo_b, both[1])):
            np.testing.assert_allclose(
                batched[q]["ave_all_frame_bpp"],
                solo[q]["ave_all_frame_bpp"], rtol=1e-4)
            np.testing.assert_allclose(
                batched[q]["ave_all_frame_psnr"],
                solo[q]["ave_all_frame_psnr"], atol=5e-3)

    # distinct content must yield distinct stats (guards against an
    # element-indexing bug collapsing every sequence onto element 0)
    assert (both[0][q_list[0]]["ave_all_frame_bpp"]
            != both[1][q_list[0]]["ave_all_frame_bpp"])


def test_save_decoded_frame_writes_yuv(tiny_codec, tmp_path):
    """--save_decoded_frame produces a decodable 4:2:0 .yuv of the
    reconstruction (ref: test_pMCTF_flex.py:294-312, 381-391)."""
    import test_pmctf_flex as flex
    from learned_pmctf_tpu.utils.yuv import YUVReader

    p = os.path.join(tmp_path, "src.yuv")
    _write_yuv(p, seed=5)
    dec_dir = os.path.join(tmp_path, "dec")
    os.makedirs(dec_dir)

    cur = _cur(p)
    cur["q_idx"] = 10
    cur["decoded_frame_folder"] = dec_dir
    log = flex.run_test(tiny_codec, cur)
    assert len(log["frame_psnr"]) == 4

    out = os.path.join(dec_dir, "decoded.yuv")
    assert os.path.getsize(out) == 4 * 64 * 64 * 3 // 2
    r = YUVReader(out, 64, 64)
    psnrs = []
    src = YUVReader(p, 64, 64)
    for _ in range(4):
        y, cb, cr = r.read_one_frame()
        ys, _, _ = src.read_one_frame()
        assert y.shape == (64, 64) and cb.shape == (32, 32)
        mse = np.mean((y.astype(np.float64) - ys.astype(np.float64)) ** 2)
        psnrs.append(10 * np.log10(255 ** 2 / max(mse, 1e-9)))
    # reconstruction must resemble the source (not zeros/garbage): the
    # run_test log's Y-ish PSNR and the file's Y PSNR are both finite and
    # the file is not trivially identical to the source
    assert all(np.isfinite(psnrs)) and min(psnrs) > 5.0
