"""Per-module numerical parity: reference PyTorch model -> torch->flax
weight conversion -> identical inputs through both frameworks.

Builds the reference pMCTF (random init, CPU, eval mode) by importing
/root/reference (with timm/tqdm shims), converts its state_dict with
utils.torch_import.convert_pmctf_tree, and asserts every module family
produces matching outputs. This validates the converter required by
SURVEY.md §5 for BD-rate parity against released checkpoints.

ref: pMCTF/models/pWave.py:26-312, pMCTF/models/video/pMCTF_L.py:29-379.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REF = "/root/reference"
SHIMS = os.path.join(os.path.dirname(__file__), "ref_shims")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")

TOL = 2e-4  # f32 conv stacks, torch-CPU vs XLA


@pytest.fixture(scope="module", autouse=True)
def _f32_convs():
    """Run the flax side at f32 conv precision.

    On TPU the default conv/dot precision is bf16 on the MXU; the codec
    runs that way on purpose (the full-magnitude lifting skip paths are
    depthwise VPU ops and stay f32 — only the 0.1-scaled PU residuals
    carry the bf16 noise). Converter-parity vs torch-CPU-f32, however,
    must not be gated on hardware precision, so these tests pin HIGHEST
    (f32-equivalent) precision for this module only.
    """
    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    yield
    jax.config.update("jax_default_matmul_precision", old)


@pytest.fixture(scope="module")
def pair():
    """(torch_model, flax_module, converted_params)."""
    for p in (SHIMS, REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch
    torch.manual_seed(0)
    from pMCTF.models.video.pMCTF_L import pMCTF as TorchPMCTF

    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.utils.torch_import import (
        convert_pmctf_tree, merge_into_init)

    tm = TorchPMCTF(decomp_levels=4, num_me_stages=2).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unused = convert_pmctf_tree(sd, num_me_stages=2, spynet_luma=True)
    assert not unused, f"unconsumed torch keys: {unused[:10]}"

    module = PMCTF(decomp_levels=4, num_me_stages=2, ll_mode="ar",
                   spynet_luma=True, warp_mode="exact")
    g = np.random.default_rng(0)
    small = jnp.asarray(g.integers(0, 256, (1, 1, 64, 64)), jnp.float32)
    dpb = {"mv_feature": None, "ref_mv_y": None}
    # jitted init: on the TPU, eager init dispatches every op through the
    # relay (~60 ms each — minutes of latency per session); the jitted
    # init graph compiles once and lands in the persistent cache (shared
    # with test_gop_parity's identical model config).
    init = jax.jit(
        lambda: module.init({"params": jax.random.PRNGKey(0)}, small, small,
                            10, dpb, method=PMCTF.full_init_graph))()
    params, unmatched = merge_into_init(init, tree)
    assert not unmatched, f"converted leaves without a home: {unmatched[:10]}"
    return tm, module, params


def _np(t):
    return t.detach().numpy()


def _close(a, b, tol=TOL, what=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, (what, a.shape, b.shape)
    err = np.max(np.abs(a - b))
    assert err <= tol, f"{what}: max err {err:.3e} > {tol}"


def test_key_coverage(pair):
    tm, module, params = pair
    # every torch parameter consumed, every flax leaf written or a known
    # non-parameter (scale_l/h, scale_p/u) — asserted inside the fixture.
    assert params is not None


def test_lifting_2d_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(1)
    x = g.normal(0, 64, (1, 1, 64, 64)).astype(np.float32)

    ref = tm.hp_coder.wavelet_transform.forward_lift_2d(torch.tensor(x))
    ours = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.hp_coder.wavelet.forward_lift_2d(a))
    for band in ("ll", "lh", "hl", "hh"):
        _close(ours[band], _np(ref[band]), what=f"lift2d[{band}]")

    # inverse: backward(forward(x)) parity
    rec_ref = tm.hp_coder.wavelet_transform.backward_lift_2d(
        {k: ref[k] for k in ("ll", "lh", "hl", "hh")})
    rec_ours = module.apply(
        params, {k: ours[k] for k in ("ll", "lh", "hl", "hh")},
        method=lambda m, sb: m.hp_coder.wavelet.backward_lift_2d(sb))
    _close(rec_ours, _np(rec_ref), what="lift2d_inverse")


def test_postprocess_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(2)
    x = g.normal(0, 1, (1, 1, 32, 32)).astype(np.float32)
    ref = tm.hp_coder.dequantModule(torch.tensor(x))
    ours = module.apply(params, jnp.asarray(x),
                        method=lambda m, a: m.hp_coder.dequant(a))
    _close(ours, _np(ref), what="postprocess")


def test_subband_context_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(3)
    x = g.normal(0, 2, (1, 1, 16, 16)).astype(np.float32)

    z32 = torch.zeros((1, 32, 16, 16))
    z3 = torch.zeros((1, 3, 16, 16))
    l1, l2, l3 = tm.hp_coder.context_prediction.context_one_band(
        torch.tensor(x), [z32.clone(), z32.clone()],
        [z32.clone(), z32.clone()], [z3.clone(), z3.clone()])

    def f(m, a):
        states = m.hp_coder.context_prediction.init_states(1, 16, 16, a.dtype)
        return m.hp_coder.context_prediction.step(a, states)

    ctx, states = module.apply(params, jnp.asarray(x), method=f)
    _close(ctx, _np(l3[0]), what="lstm_h3")
    _close(states[0][1], _np(l1[1]), what="lstm_c1")
    _close(states[1][0], _np(l2[0]), what="lstm_h2")


def test_fourstep_fusion_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(4)
    x = g.normal(0, 3, (1, 1, 16, 16)).astype(np.float32)
    ctx = g.normal(0, 1, (1, 1, 16, 16)).astype(np.float32)
    prev = g.normal(0, 3, (1, 1, 8, 8)).astype(np.float32)

    ref = tm.hp_coder.context_fusion["0"]["lh"](
        torch.tensor(x), context=torch.tensor(ctx),
        prev_subband=torch.tensor(prev))
    ours = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.hp_coder.context_fusion["0_lh"](
            a, context=jnp.asarray(ctx), prev_subband=jnp.asarray(prev),
            training=False))
    for i, name in enumerate(("x_res", "x_q", "x_hat", "s_hat")):
        _close(ours[i], _np(ref[i]), what=f"fourstep[{name}]")

    # top level (ctx_ch=1, no prev_subband)
    ref = tm.hp_coder.context_fusion["3"]["hh"](
        torch.tensor(x), context=torch.tensor(ctx))
    ours = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.hp_coder.context_fusion["3_hh"](
            a, context=jnp.asarray(ctx), training=False))
    _close(ours[3], _np(ref[3]), what="fourstep_top[s_hat]")


def test_ar_fusion_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(5)
    x = np.round(g.normal(0, 3, (1, 1, 16, 16))).astype(np.float32)
    ref = tm.hp_coder.context_fusion["3"]["ll"](torch.tensor(x))
    ours = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.hp_coder.context_fusion["ll"](a))
    _close(ours, _np(ref), what="ar_fusion_params")


def test_mv_autoencoder_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(6)
    mv = g.normal(0, 2, (1, 2, 64, 64)).astype(np.float32)
    q = np.float32(1.3)

    y_ref = tm.mv_encoder[1](torch.tensor(mv), None, torch.tensor(q))
    y_ours = module.apply(
        params, jnp.asarray(mv),
        method=lambda m, a: m.mv_encoder[1](a, None, jnp.float32(q)))
    _close(y_ours, _np(y_ref), what="mv_enc")

    z_ref = tm.mv_hyper_prior_encoder[0](y_ref)
    z_ours = module.apply(
        params, y_ours, method=lambda m, a: m.mv_hyper_enc[0](a))
    _close(z_ours, _np(z_ref), tol=5e-4, what="mv_hyper_enc")

    p_ref = tm.mv_hyper_prior_decoder[0](torch.round(z_ref))
    p_ours = module.apply(
        params, jnp.round(z_ours),
        method=lambda m, a: m.mv_hyper_dec[0](a))
    _close(p_ours, _np(p_ref), tol=5e-4, what="mv_hyper_dec")

    mv_hat_ref, feat_ref = tm.mv_decoder[1](y_ref, torch.tensor(q))
    mv_hat_ours, feat_ours = module.apply(
        params, y_ours,
        method=lambda m, a: m.mv_decoder[1](a, jnp.float32(q)))
    _close(mv_hat_ours, _np(mv_hat_ref), tol=5e-4, what="mv_dec")
    _close(feat_ours, _np(feat_ref), tol=5e-4, what="mv_dec_feature")


def test_bit_estimator_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(7)
    z = np.round(g.normal(0, 2, (1, 64, 4, 4))).astype(np.float32)
    ref = tm.mv_bit_est[0](torch.tensor(z))
    ours = module.apply(params, jnp.asarray(z),
                        method=lambda m, a: m.mv_bit_est[0].get_cdf(a))
    _close(ours, _np(ref), what="bit_estimator_cdf")


def test_temporal_filter_parity(pair):
    import torch
    tm, module, params = pair
    g = np.random.default_rng(8)
    x = g.normal(0, 30, (1, 1, 32, 32)).astype(np.float32)
    ref_p = tm.temporal_filtering[0].predict_filter(torch.tensor(x))
    ours_p = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.temporal_filtering[0].predict_filter(a))
    _close(ours_p, _np(ref_p), what="temporal_predict")
    ref_u = tm.temporal_filtering[1].update_filter(torch.tensor(x))
    ours_u = module.apply(
        params, jnp.asarray(x),
        method=lambda m, a: m.temporal_filtering[1].update_filter(a))
    _close(ours_u, _np(ref_u), what="temporal_update")


def test_spynet_parity(pair):
    """Our luma-native SpyNet == reference RGB SpyNet on tiled luma."""
    import torch
    tm, module, params = pair
    g = np.random.default_rng(9)
    a = (g.integers(0, 256, (1, 1, 64, 64)) / 255.0).astype(np.float32)
    b = (g.integers(0, 256, (1, 1, 64, 64)) / 255.0).astype(np.float32)

    with torch.no_grad():
        ref = tm.optic_flow(torch.tensor(np.tile(a, (1, 3, 1, 1))),
                            torch.tensor(np.tile(b, (1, 3, 1, 1))))
    ours = module.apply(params, jnp.asarray(a),
                        method=lambda m, x: m.optic_flow(x, jnp.asarray(b)))
    _close(ours, _np(ref), tol=1e-3, what="spynet_flow")


def test_spynet_large_displacement_exact_vs_fast(pair):
    """exact warp_mode keeps the ME pyramid reference-faithful even when
    intermediate flows exceed the fast warp's ±32 px clamp; fast mode is
    the only divergent config (r3 verdict: fast_warp was hard-coded).

    Surgery: pin the coarsest-level conv5 bias to +12 px in BOTH models —
    the coarse flow then doubles through the upsample ladder (24, 48, 96,
    ... px), far past the clamp, so the intra-pyramid warps matter.
    ref: pMCTF/layers/video/video_net.py:99-121 (exact warp every level).
    """
    import copy
    import torch
    tm, module, params = pair
    BIAS = 12.0
    with torch.no_grad():
        orig = tm.optic_flow.moduleBasic[0].conv5.bias.clone()
        tm.optic_flow.moduleBasic[0].conv5.bias.fill_(BIAS)
    try:
        p2 = copy.deepcopy(jax.tree_util.tree_map(lambda x: x, dict(params)))
        b = p2["params"]["optic_flow"]["basic_0"]["conv5"]["bias"]
        p2["params"]["optic_flow"]["basic_0"]["conv5"]["bias"] = (
            jnp.full_like(b, BIAS))

        # structured imagery (ramps + sinusoids): conv responses to the
        # warped-input difference persist instead of averaging out the
        # way i.i.d. noise does.
        yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
        im1 = (0.5 + 0.3 * np.sin(xx / 6) * np.cos(yy / 9)
               + 0.2 * np.sin((xx + yy) / 17))[None, None].astype(np.float32)
        im2 = (0.5 + 0.3 * np.sin((xx - 5) / 6) * np.cos((yy + 3) / 9)
               + 0.2 * np.sin((xx + yy - 7) / 17))[None, None].astype(np.float32)
        with torch.no_grad():
            ref = tm.optic_flow(torch.tensor(np.tile(im1, (1, 3, 1, 1))),
                                torch.tensor(np.tile(im2, (1, 3, 1, 1))))
        assert float(_np(ref).max()) > 32.0  # the surgery produced big flows

        exact = module.apply(p2, jnp.asarray(im1),
                             method=lambda m, x: m.optic_flow(x, jnp.asarray(im2)))
        _close(exact, _np(ref), tol=2e-3, what="spynet_large_disp_exact")

        from learned_pmctf_tpu.models import PMCTF
        fast_mod = PMCTF(decomp_levels=4, num_me_stages=2, ll_mode="ar",
                         spynet_luma=True, warp_mode="fast")
        fast = fast_mod.apply(p2, jnp.asarray(im1),
                              method=lambda m, x: m.optic_flow(x, jnp.asarray(im2)))
        # measured on this setup: exact err 1.5e-4, fast err 3.8e-2 — the
        # clamp is the only thing separating the two configs.
        assert float(np.max(np.abs(np.asarray(fast) - _np(ref)))) > 1e-2, (
            "fast mode unexpectedly matched past the clamp")
        # wiring: PMCTF.warp_mode drives the pyramid's warp choice
        assert module.bind(params).optic_flow.fast_warp is False
        assert fast_mod.bind(p2).optic_flow.fast_warp is True
    finally:
        with torch.no_grad():
            tm.optic_flow.moduleBasic[0].conv5.bias.copy_(orig)


def test_warp_parity(pair):
    import torch
    from pMCTF.layers.video.video_net import flow_warp as torch_flow_warp
    from learned_pmctf_tpu.ops.warp import flow_warp
    g = np.random.default_rng(10)
    x = g.normal(0, 50, (1, 1, 32, 32)).astype(np.float32)
    mv = g.normal(0, 3, (1, 2, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_flow_warp(torch.tensor(x), torch.tensor(mv))
    _close(flow_warp(jnp.asarray(x), jnp.asarray(mv)), _np(ref),
           tol=1e-3, what="flow_warp")


def test_qp_interpolation_parity(pair):
    import torch
    tm, module, params = pair
    from learned_pmctf_tpu.models.pwave import interp_q_scale
    qp = params["params"]["hp_coder"]["QP"]
    for ridx in (0, 7, 20):
        # reference slices [0:1]/[1:2] (keeps the leading dim); ours
        # indexes [0]/[1] — values must match after squeezing.
        ref = tm.hp_coder.get_one_q_scale(tm.hp_coder.QP, ridx)
        ours = interp_q_scale(qp, jnp.float32(ridx))
        _close(np.asarray(ours).ravel(), _np(ref).ravel(),
               what=f"q_scale[{ridx}]")


def test_pwave_forward_parity(pair):
    """Full image-coder forward: identical x_hat and estimated bits,
    across the variable-rate range (3 q_indices; q is a traced scalar)."""
    import torch
    tm, module, params = pair
    g = np.random.default_rng(11)
    x = g.integers(0, 256, (1, 1, 64, 64)).astype(np.float32)

    for q_index in (0, 10, 20):
        with torch.no_grad():
            ref = tm.hp_coder(torch.tensor(x), q_index)
        ours = module.apply(
            params, jnp.asarray(x),
            method=lambda m, a: m.hp_coder(a, jnp.float32(q_index),
                                           training=False))
        _close(ours["x_hat"], _np(ref["x_hat"]), tol=2e-3,
               what=f"pwave_forward_x_hat[q{q_index}]")
        bits_ref = float(_np(ref["bits_total"]))
        bits_ours = float(ours["bits_total"])
        assert abs(bits_ours - bits_ref) / max(bits_ref, 1.0) < 2e-3, (
            q_index, bits_ours, bits_ref)


def _stage_close(ours, ref_dict, tag, tol_planes, tol_bits):
    """Compare the shared forward_one_stage outputs of both frameworks."""
    for key in ("L_t", "H_t", "mv_hat"):
        if key in ref_dict and ref_dict[key] is not None:
            _close(ours[key], _np(ref_dict[key]), tol=tol_planes,
                   what=f"{tag}[{key}]")
    for key in ("bpp_H", "bpp_me", "bpp_L"):
        if ref_dict.get(key) is None:
            assert ours.get(key) is None, (tag, key)
            continue
        r = float(_np(ref_dict[key]))
        o = float(ours[key])
        assert abs(o - r) <= tol_bits * max(abs(r), 1e-2), (tag, key, o, r)


def test_pmctf_forward_one_stage_parity(pair):
    """Full video-coder stage: luma with empty DPB (adaptor_0 branch),
    luma with populated DPB (adaptor_1 branch), and chroma reusing halved
    MVs — the three call modes of the eval loop. ref: pMCTF_L.py:332-379.
    """
    import torch
    tm, module, params = pair
    g = np.random.default_rng(12)
    h = w = 64
    ref_y = g.integers(0, 256, (1, 1, h, w)).astype(np.float32)
    cur_y = (ref_y + g.normal(0, 8, ref_y.shape)).clip(0, 255).astype(
        np.float32)
    q_index = 10

    def run_torch(dpb_t, mv=None, code_lt=False):
        with torch.no_grad():
            return tm.forward_one_stage(
                torch.tensor(ref_y), torch.tensor(cur_y), q_index,
                code_lt, dpb_t, mv_hat=mv, stage_idx=0)

    def run_ours(dpb_j, mv=None, code_lt=False):
        return module.apply(
            params, jnp.asarray(ref_y), jnp.asarray(cur_y),
            jnp.float32(q_index), code_lt, dpb_j, mv_hat=mv, stage_idx=0,
            training=False)

    # 1) first pair of a stage: empty DPB -> adaptor_0 branch, code_lt
    empty_t = {"mv_feature": None, "ref_mv_y": None}
    ref1 = run_torch(dict(empty_t), code_lt=True)
    ours1 = run_ours(dict(empty_t), code_lt=True)
    _stage_close(ours1, ref1, "stage0", tol_planes=5e-3, tol_bits=5e-3)
    assert ref1.get("me_mse_inv") is not None
    _close(float(ours1["me_mse"]), float(_np(ref1["me_mse"])), tol=1e-2,
           what="stage0[me_mse]")

    # 2) second pair: populated DPB -> adaptor_1 branch + MvEnc context
    dpb_t = {k: v for k, v in ref1["dpb"].items()}
    dpb_j = {k: (None if ours1["dpb"][k] is None else ours1["dpb"][k])
             for k in ours1["dpb"]}
    ref2 = run_torch(dpb_t)
    ours2 = run_ours(dpb_j)
    _stage_close(ours2, ref2, "stage0_dpb", tol_planes=5e-3, tol_bits=5e-3)

    # 3) chroma pass: halved luma MVs, batch 2, no MV bits
    ref_c = g.integers(0, 256, (2, 1, h // 2, w // 2)).astype(np.float32)
    cur_c = (ref_c + g.normal(0, 8, ref_c.shape)).clip(0, 255).astype(
        np.float32)
    with torch.no_grad():
        ref3 = tm.forward_one_stage(
            torch.tensor(ref_c), torch.tensor(cur_c), q_index, False,
            dict(empty_t), mv_hat=ref1["mv_hat"], stage_idx=0)
    ours3 = module.apply(
        params, jnp.asarray(ref_c), jnp.asarray(cur_c),
        jnp.float32(q_index), False, dict(empty_t),
        mv_hat=ours1["mv_hat"], stage_idx=0, training=False)
    _stage_close(ours3, ref3, "stage0_chroma", tol_planes=5e-3,
                 tol_bits=5e-3)
    assert ours3["bpp_me"] is None and ref3["bpp_me"] is None

    # 4) inverse MCTF closes the temporal loop
    with torch.no_grad():
        rec_ref = tm.inverse_MCTF(ref1["L_t"], ref1["H_t"], ref1["mv_hat"],
                                  stage_idx=0)
    rec_ours = module.apply(
        params, ours1["L_t"], ours1["H_t"], ours1["mv_hat"], 0,
        method=lambda m, l, hh, mv, s: m.inverse_mctf(l, hh, mv, s))
    _close(rec_ours[0], _np(rec_ref[0]), tol=1e-2, what="inverse[ref]")
    _close(rec_ours[1], _np(rec_ref[1]), tol=1e-2, what="inverse[cur]")
