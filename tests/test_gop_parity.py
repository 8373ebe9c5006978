"""End-to-end GOP-loop parity: reference torch pMCTF driven through its
own hierarchical GOP schedule vs PMCTFCodec.estimate_one_stage +
inverse_mctf on identical frames with converted weights.

Module-level parity (test_torch_parity.py) proves each block matches;
this test proves the *codec* matches: the full GOP ladder — stage
indexing (me_num clamping), DPB threading across pairs of a stage,
hp_q_scale application order, chroma MV halving, and the synthesis
recursion — produces the same per-frame bit_H/bit_ME/bit_L and the same
final reconstructions.

ref: test_pMCTF_flex.py:88-357 (the analysis/synthesis GOP loop),
pMCTF/models/video/pMCTF_L.py:525-552 (estimate-path encode_one_stage).
"""

import math
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(__file__), "ref_shims")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF),
                       reason="reference tree not available"),
]


@pytest.fixture(scope="module", autouse=True)
def _f32_convs():
    """Pin f32-equivalent matmul precision (see test_torch_parity.py)."""
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


@pytest.fixture(scope="module")
def both_codecs():
    """(torch_model, PMCTFCodec with converted weights)."""
    for p in (SHIMS, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    torch.manual_seed(0)
    from pMCTF.models.video.pMCTF_L import pMCTF as TorchPMCTF

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec import PMCTFCodec
    from learned_pmctf_tpu.utils.torch_import import (
        convert_pmctf_tree, merge_into_init)

    tm = TorchPMCTF(decomp_levels=4, num_me_stages=2).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unused = convert_pmctf_tree(sd, num_me_stages=2, spynet_luma=True)
    assert not unused

    module = PMCTF(decomp_levels=4, num_me_stages=2, ll_mode="ar",
                   spynet_luma=True, warp_mode="exact")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 64, 64)), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    # jitted init: eager init dispatches every op separately through the
    # axon relay (~60 ms each) — minutes of pure latency on the TPU
    init = jax.jit(
        lambda: module.init({"params": jax.random.PRNGKey(0)}, small, small,
                            10, dpb, method=PMCTF.full_init_graph))()
    params, unmatched = merge_into_init(init, tree)
    assert not unmatched
    return tm, PMCTFCodec(module, params)


def _synthetic_frames(n, h=64, w=64, seed=21):
    """n smooth moving frames (y (1,1,H,W), chroma (2,1,H/2,W/2)) so the
    GOP actually exercises motion estimation, not just noise coding."""
    g = np.random.default_rng(seed)
    base = g.normal(128, 40, (h * 2, w * 2))
    # low-pass the base so motion is trackable
    k = np.ones((5, 5)) / 25.0
    from numpy.lib.stride_tricks import sliding_window_view
    pad = np.pad(base, 2, mode="reflect")
    base = np.einsum("ijkl,kl->ij", sliding_window_view(pad, (5, 5)), k)
    frames = []
    for t in range(n):
        dy, dx = 2 * t, 3 * t
        y = base[dy:dy + h, dx:dx + w]
        y = np.clip(y + g.normal(0, 2, (h, w)), 0, 255).astype(np.float32)
        c = base[dy // 2:dy // 2 + h // 2, dx // 2:dx // 2 + w // 2]
        c = np.stack([np.clip(c + g.normal(0, 2, c.shape), 0, 255),
                      np.clip(255 - c + g.normal(0, 2, c.shape), 0, 255)])
        frames.append((y[None, None].astype(np.float32),
                       c[:, None].astype(np.float32)))
    return frames


def _schedule(gop_size):
    """The reference's analysis schedule: (stage_idx, fi, step, code_lt)."""
    num_stages = int(math.log2(gop_size))
    assert 2 ** num_stages == gop_size
    out = []
    num_pairs = gop_size // 2
    for stage_idx in range(num_stages):
        step = 2 ** stage_idx
        for gi in range(num_pairs):
            out.append((stage_idx, gi * 2 * step, step,
                        stage_idx + 1 == num_stages))
        num_pairs //= 2
    return num_stages, out


def _torch_gop(tm, frames, gop_size, q_index):
    """Reference GOP ladder, verbatim schedule from test_pMCTF_flex.py:
    analysis (estimate-path stage coding, DPB threaded per stage) then
    synthesis (inverse_MCTF, luma + downscaled chroma).

    Drives forward_one_stage directly, composing luma + chroma the way
    encode_one_stage's estimate branch intends (pMCTF_L.py:531-552) —
    that branch itself crashes upstream on result["mv_feature"]
    (pMCTF_L.py:546: forward_one_stage returns "dpb", not flat keys), so
    the intended composition is reproduced here."""
    import torch
    coded = [[torch.tensor(y), torch.tensor(c), None] for y, c in frames]
    num_stages, sched = _schedule(gop_size)
    bits = {}
    with torch.no_grad():
        cur_stage, dpb = -1, None
        for stage_idx, fi, step, code_lt in sched:
            if stage_idx != cur_stage:
                dpb = {"mv_feature": None, "ref_mv_y": None}
                cur_stage = stage_idx
            me_num = min(tm.num_me_stages - 1, stage_idx)
            res = tm.forward_one_stage(
                coded[fi][0], coded[fi + step][0], q_index, code_lt,
                dpb, stage_idx=me_num)
            res_c = tm.forward_one_stage(
                coded[fi][1], coded[fi + step][1], q_index, code_lt,
                dict(dpb), mv_hat=res["mv_hat"], stage_idx=me_num)
            dpb = res["dpb"]
            coded[fi] = [res["L_t"], res_c["L_t"], None]
            coded[fi + step] = [res["H_t"], res_c["H_t"], res["mv_hat"]]
            # bits_total in the reference is a MEAN over the batch dim
            # (pWave.py:308: .sum() / x_hat.size(0)), so its estimate
            # path halves the 2-plane chroma rate — inconsistent with
            # its own write-stream byte counts. Ours sums (stream-byte
            # consistent); scale the torch chroma terms by B=2 so the
            # comparison pins the scheduling, not that known quirk.
            bits[fi + step] = {
                "bit_H": float(res["bit_H"]) + 2 * float(res_c["bit_H"]),
                "bit_ME": float(res["bit_ME"])}
            if code_lt:
                bits[fi] = {"bit_L": float(res["bit_L"])
                            + 2 * float(res_c["bit_L"])}
        for stage_idx, fi, step, _ in reversed(sched):
            me_num = min(tm.num_me_stages - 1, stage_idx)
            l_y, l_c, _ = coded[fi]
            h_y, h_c, mv = coded[fi + step]
            ry, cy = tm.inverse_MCTF(l_y, h_y, mv, stage_idx=me_num)
            rc, cc = tm.inverse_MCTF(l_c, h_c, mv, stage_idx=me_num,
                                     downscale=True)
            coded[fi] = [ry, rc, None]
            coded[fi + step] = [cy, cc, None]
    return bits, [(c[0].numpy(), c[1].numpy()) for c in coded]


def _ours_gop(codec, frames, gop_size, q_index):
    """Same schedule through PMCTFCodec.estimate_one_stage/inverse_mctf
    (exactly what test_pmctf_flex.run_test drives)."""
    coded = [[jnp.asarray(y), jnp.asarray(c), None] for y, c in frames]
    num_stages, sched = _schedule(gop_size)
    bits = {}
    cur_stage, dpb = -1, None
    for stage_idx, fi, step, code_lt in sched:
        if stage_idx != cur_stage:
            dpb = {"mv_feature": None, "ref_mv_y": None}
            cur_stage = stage_idx
        me_num = min(codec.module.num_me_stages - 1, stage_idx)
        res = codec.estimate_one_stage(
            (coded[fi][0], coded[fi][1]),
            (coded[fi + step][0], coded[fi + step][1]),
            code_lt, dpb, stage_idx=me_num, q_index=q_index)
        dpb = res["dpb"]
        coded[fi] = [res["L_t"], res["L_tc"], None]
        coded[fi + step] = [res["H_t"], res["H_tc"], res["mv_hat"]]
        bits[fi + step] = {"bit_H": res["bit_H"], "bit_ME": res["bit_ME"]}
        if code_lt:
            bits[fi] = {"bit_L": res["bit_L"]}
    for stage_idx, fi, step, _ in reversed(sched):
        me_num = min(codec.module.num_me_stages - 1, stage_idx)
        l_y, l_c, _ = coded[fi]
        h_y, h_c, mv = coded[fi + step]
        ry, cy = codec.inverse_mctf(l_y, h_y, mv, stage_idx=me_num)
        rc, cc = codec.inverse_mctf(l_c, h_c, mv, stage_idx=me_num,
                                    downscale=True)
        coded[fi] = [ry, rc, None]
        coded[fi + step] = [cy, cc, None]
    return bits, [(np.asarray(c[0]), np.asarray(c[1])) for c in coded]


@pytest.mark.parametrize("gop_size", [4, 8])
def test_gop_loop_parity(both_codecs, gop_size):
    tm, codec = both_codecs
    frames = _synthetic_frames(gop_size)
    q_index = 10

    ref_bits, ref_rec = _torch_gop(tm, frames, gop_size, q_index)
    our_bits, our_rec = _ours_gop(codec, frames, gop_size, q_index)

    assert set(ref_bits) == set(our_bits)
    for fi in sorted(ref_bits):
        for key, r in ref_bits[fi].items():
            o = our_bits[fi][key]
            rel = abs(o - r) / max(abs(r), 1.0)
            # per-frame rate parity rel 1e-4 (VERDICT r4 item 9): the
            # 6-point BD sweep (docs/bdrate_artifact.json) measures the
            # actual cross-framework rate drift at ~1e-5 relative, so a
            # systematic sub-percent bias can no longer hide in totals
            assert rel < 1e-4, (gop_size, fi, key, o, r, rel)

    for fi, ((ry, rc), (oy, oc)) in enumerate(zip(ref_rec, our_rec)):
        err_y = np.max(np.abs(oy - ry))
        err_c = np.max(np.abs(oc - rc))
        # 255-scale frames through 2-3 temporal levels + spatial codec:
        # f32 torch-CPU vs XLA divergence, amplified by the synthesis
        # recursion. Single-stage parity runs at 5e-3 (test_torch_parity);
        # budget one order of magnitude for the full ladder.
        assert err_y < 5e-2, (gop_size, fi, "luma", err_y)
        assert err_c < 5e-2, (gop_size, fi, "chroma", err_c)
