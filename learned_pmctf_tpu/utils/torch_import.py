"""PyTorch -> flax parameter conversion for pretrained components.

ref: train_pMCTF_L.py:436-445 (SpyNet checkpoint download + key remap).
Zero-egress container: checkpoints must be provided as local files.
Conv weights stay OIHW (both frameworks agree); only naming changes.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def load_spynet_torch(path: str, luma_mode: bool = False) -> Dict:
    """Convert a sniklaus pytorch-spynet checkpoint to our MESpynet tree.

    torch keys: 'moduleBasic.{L}.moduleBasic.{2j}.weight/bias' (or the
    reference's remapped 'moduleBasic.{L}.conv{j}.weight'); ours:
    basic_{L}/conv{j}/{kernel,bias}.

    luma_mode: fold the 3-channel tiled-luma input into 1 channel by
    summing conv1's weight slices over each RGB group (im1 0:3 -> 0,
    warped im2 3:6 -> 1, flow 6:8 -> 2:4) — exactly equivalent to running
    the RGB net on tiled luma (see models.spynet.MESpynet.luma_mode).
    """
    from .checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    # normalize to conv{j} naming (ref remap, train_pMCTF_L.py:440-444)
    remap = {".moduleBasic.0.": ".conv1.", ".moduleBasic.2.": ".conv2.",
             ".moduleBasic.4.": ".conv3.", ".moduleBasic.6.": ".conv4.",
             ".moduleBasic.8.": ".conv5."}
    normalized = {}
    for k, v in sd.items():
        for old, new in remap.items():
            k = k.replace(old, new)
        normalized[k] = v

    out: Dict = {}
    for k, v in normalized.items():
        parts = k.split(".")
        # expected: moduleBasic.{L}.conv{j}.{weight|bias}
        if len(parts) != 4 or parts[0] != "moduleBasic":
            continue
        level, conv, kind = parts[1], parts[2], parts[3]
        dst = out.setdefault(f"basic_{level}", {}).setdefault(conv, {})
        if kind == "weight":
            w = np.asarray(v, np.float32)  # OIHW in both
            if luma_mode and conv == "conv1":
                w = np.concatenate(
                    [w[:, 0:3].sum(axis=1, keepdims=True),
                     w[:, 3:6].sum(axis=1, keepdims=True),
                     w[:, 6:8]], axis=1)
            dst["kernel"] = w
        else:
            dst["bias"] = np.asarray(v, np.float32)
    return out


# ---------------------------------------------------------------------------
# Full pWave / pMCTF checkpoint conversion
#
# Maps every reference module family (layout documented at
# ref: pMCTF/models/pWave.py:26-85, pMCTF/models/video/pMCTF_L.py:49-111,
# pMCTF/layers/video/layers.py, pMCTF/layers/context_fusion*.py,
# pMCTF/layers/long_context.py, pMCTF/layers/lifting_1d.py:52-101,
# pMCTF/layers/postprocessing.py) onto the flax parameter tree of
# learned_pmctf_tpu.models.{PWave,PMCTF}. Conv weights stay OIHW; biases
# stay (C,). The reference's scale_l/scale_h (lifting) and scale_p/scale_u
# (temporal) tensors are NOT registered parameters there (never saved,
# never optimized), so they keep our init values — which equal the
# reference's constants.
# ---------------------------------------------------------------------------


class _SD:
    """State-dict view with a key prefix; records consumed keys."""

    def __init__(self, sd: Dict, used: set, prefix: str = ""):
        self.sd = sd
        self.used = used
        self.prefix = prefix

    def sub(self, name: str) -> "_SD":
        return _SD(self.sd, self.used, f"{self.prefix}{name}.")

    def arr(self, name: str) -> np.ndarray:
        key = f"{self.prefix}{name}"
        self.used.add(key)
        return np.asarray(self.sd[key], np.float32)

    def has(self, name: str) -> bool:
        return f"{self.prefix}{name}" in self.sd


def _conv(s: _SD, name: str) -> Dict:
    out = {"kernel": s.arr(f"{name}.weight")}
    if s.has(f"{name}.bias"):
        out["bias"] = s.arr(f"{name}.bias")
    return out


def _resblock(s: _SD, name: str) -> Dict:
    """ResBlock / ContextResidual / MaskResidual: conv1+conv2 with residual."""
    return {"conv1": _conv(s, f"{name}.conv1"), "conv2": _conv(s, f"{name}.conv2")}


def _pu(s: _SD, name: str) -> Dict:
    """PredictUpdate CNN. ref: lifting_1d.py:25-49."""
    return {f"conv{j}": _conv(s, f"{name}.conv{j}") for j in range(1, 5)}


def _lift1d(s: _SD) -> Dict:
    """iWave1D. ref: lifting_1d.py:52-101."""
    out = {}
    for ref_name, ours in (("conv_P1", "conv_p1"), ("conv_U1", "conv_u1"),
                           ("conv_P2", "conv_p2"), ("conv_U2", "conv_u2")):
        out[ours] = _conv(s, ref_name)
    for ref_name, ours in (("P_1", "p1"), ("U_1", "u1"),
                           ("P_2", "p2"), ("U_2", "u2")):
        out[ours] = _pu(s, ref_name)
    return out


def _postprocess(s: _SD) -> Dict:
    out = {f"conv{j}": _conv(s, f"conv{j}") for j in range(1, 4)}
    i = 0
    while s.has(f"resBlocks.{i}.conv1.weight"):
        out[f"res{i}"] = _resblock(s, f"resBlocks.{i}")
        i += 1
    return out


def _lstm(s: _SD, name: str) -> Dict:
    return {"conv_in": _conv(s, f"{name}.conv_in"),
            "conv_hidden": _conv(s, f"{name}.conv_hidden")}


def _subband_context(s: _SD, decomp_levels: int) -> Dict:
    out = {f"lstm{j}": _lstm(s, f"LSTM{j}") for j in (1, 2, 3)}
    for j in (1, 2, 3):
        for kind in ("h", "c"):
            for i in range(decomp_levels - 1):
                out[f"up_{kind}{j}_{i}"] = {
                    "Conv2d_0": _conv(s, f"deconv_{kind}{j}.{i}.conv")}
    return out


def _depthconv(s: _SD, name: str) -> Dict:
    """DepthConv. ref: video/layers.py:108-136 (conv1 is Sequential)."""
    out = {"conv1": _conv(s, f"{name}.conv1.0"),
           "depth_conv": _conv(s, f"{name}.depth_conv"),
           "conv2": _conv(s, f"{name}.conv2")}
    if s.has(f"{name}.adaptor.weight"):
        out["adaptor"] = _conv(s, f"{name}.adaptor")
    return out


def _convffn(s: _SD, name: str) -> Dict:
    """ConvFFN (Sequential conv.0 / conv.2). ref: video/layers.py:139-152."""
    return {"up": _conv(s, f"{name}.conv.0"), "down": _conv(s, f"{name}.conv.2")}


def _convffn3(s: _SD, name: str) -> Dict:
    return {"conv": _conv(s, f"{name}.conv"),
            "conv_out": _conv(s, f"{name}.conv_out")}


def _dcb(s: _SD, name: str) -> Dict:
    """DepthConvBlock = Sequential(DepthConv, ConvFFN). ref: video/layers.py:171-181."""
    return {"depth": _depthconv(s, f"{name}.block.0"),
            "ffn": _convffn(s, f"{name}.block.1")}


def _dcb4(s: _SD, name: str) -> Dict:
    return {"depth": _depthconv(s, f"{name}.block.0"),
            "ffn": _convffn3(s, f"{name}.block.1")}


def _rbws(s: _SD, name: str) -> Dict:
    """ResidualBlockWithStride. ref: video/layers.py:46-77."""
    out = {"conv1": _conv(s, f"{name}.conv1"), "conv2": _conv(s, f"{name}.conv2")}
    if s.has(f"{name}.downsample.weight"):
        out["downsample"] = _conv(s, f"{name}.downsample")
    return out


def _rbus(s: _SD, name: str) -> Dict:
    """ResidualBlockUpsample. ref: video/layers.py:80-105."""
    return {"subpel": {"Conv2d_0": _conv(s, f"{name}.subpel_conv.0")},
            "conv": _conv(s, f"{name}.conv"),
            "upsample": {"Conv2d_0": _conv(s, f"{name}.upsample.0")}}


def _fourstep(s: _SD) -> Dict:
    """ContextFusionFourStep. ref: context_fusion_4step.py:23-90."""
    out = {}
    if s.has("conv1_context.weight"):
        out["conv1_context"] = _conv(s, "conv1_context")
        out["hier_enc_0"] = _resblock(s, "y_hierarchical_prior_enc.0")
        out["hier_enc_1"] = _resblock(s, "y_hierarchical_prior_enc.1")
    if s.has("lower_level_subband.1.weight"):
        out["lower_conv"] = _conv(s, "lower_level_subband.1")
    out["hier_out"] = _dcb(s, "y_hierarchical_prior_out")
    for k in (1, 2, 3):
        out[f"spatial_in_{k-1}"] = {
            "layers_0": _conv(s, f"y_spatial_prior_{k}.0"),
            "layers_1": _resblock(s, f"y_spatial_prior_{k}.1"),
        }
        out[f"spatial_out_{k-1}"] = {
            "layers_0": _resblock(s, f"y_spatial_prior_{k}_out.0"),
            "layers_1": _resblock(s, f"y_spatial_prior_{k}_out.1"),
            "layers_2": _conv(s, f"y_spatial_prior_{k}_out.2"),
        }
    return out


def _ar_fusion(s: _SD) -> Dict:
    """ContextFusionSubband (LL AR model). ref: context_fusion.py:56-128."""
    out = {"masked_conv1": _conv(s, "maskedConv1"),
           "masked_conv2": _conv(s, "maskedConv2")}
    for i in range(2):
        out[f"res_blocks_{i}"] = _resblock(s, f"residualBlocks.{i}")
    for i in range(3):
        out[f"head_{i}"] = _conv(s, f"convs.{i}")
    return out


def convert_pwave_tree(sd: Dict, prefix: str = "",
                       decomp_levels: int = 4,
                       used: Optional[set] = None) -> Dict:
    """Reference pWave state_dict (under `prefix`) -> our PWave subtree.

    Expects ll_mode='ar' on our side (the reference's LL model is the
    masked-conv AR net). ref: pMCTF/models/pWave.py:26-85.
    """
    s = _SD(sd, used if used is not None else set(), prefix)
    out = {
        "QP": s.arr("QP"),
        "QP_ll": s.arr("QP_ll"),
        "wavelet": {"lift_h": _lift1d(s.sub("wavelet_transform.lift_h"))},
        "context_prediction": _subband_context(
            s.sub("context_prediction"), decomp_levels),
        "dequant": _postprocess(s.sub("dequantModule")),
        "context_fusion_ll": _ar_fusion(
            s.sub(f"context_fusion.{decomp_levels-1}.ll")),
    }
    for lvl in range(decomp_levels):
        for band in ("lh", "hl", "hh"):
            out[f"context_fusion_{lvl}_{band}"] = _fourstep(
                s.sub(f"context_fusion.{lvl}.{band}"))
    return out


def _mv_enc(s: _SD) -> Dict:
    return {
        "enc_1": {"layers_0": _rbws(s, "enc_1.0"), "layers_1": _dcb(s, "enc_1.1")},
        "enc_2": _rbws(s, "enc_2"),
        "adaptor_0": _dcb(s, "adaptor_0"),
        "adaptor_1": _dcb(s, "adaptor_1"),
        "enc_3_a": _rbws(s, "enc_3.0"),
        "enc_3_b": _dcb(s, "enc_3.1"),
        "enc_3_c": _conv(s, "enc_3.2"),
    }


def _mv_dec(s: _SD) -> Dict:
    return {
        "dec_1": {
            "layers_0": _dcb(s, "dec_1.0"),
            "layers_1": _rbus(s, "dec_1.1"),
            "layers_2": _dcb(s, "dec_1.2"),
            "layers_3": _rbus(s, "dec_1.3"),
            "layers_4": _dcb(s, "dec_1.4"),
        },
        "dec_2": _rbus(s, "dec_2"),
        "dec_3": {
            "layers_0": _dcb(s, "dec_3.0"),
            "layers_1": {"Conv2d_0": _conv(s, "dec_3.1.0")},
        },
    }


def _hyper_enc(s: _SD) -> Dict:
    return {"DepthConvBlock4_0": _dcb4(s, "0"),
            "Conv2d_0": _conv(s, "1"),
            "Conv2d_1": _conv(s, "3")}


def _hyper_dec(s: _SD) -> Dict:
    return {"ResidualBlockUpsample_0": _rbus(s, "0"),
            "ResidualBlockUpsample_1": _rbus(s, "1"),
            "DepthConvBlock4_0": _dcb4(s, "2")}


def _bit_est(s: _SD) -> Dict:
    out = {}
    for j in (1, 2, 3, 4):
        p = {"h": s.arr(f"f{j}.h"), "b": s.arr(f"f{j}.b")}
        if s.has(f"f{j}.a"):
            p["a"] = s.arr(f"f{j}.a")
        out[f"f{j}"] = p
    return out


def convert_pmctf_tree(sd: Dict, num_me_stages: int = 4,
                       decomp_levels: int = 4,
                       spynet_luma: bool = True) -> Dict:
    """Reference pMCTF state_dict -> our PMCTF {"params": ...} tree.

    ref: pMCTF/models/video/pMCTF_L.py:49-111. Per-stage ParameterLists
    (hp_q_scale, mv_y_q_scale_enc/dec) stack into (n_stages, 2, 1, 1, 1)
    tensors. Returns (tree, unused_torch_keys).
    """
    used: set = set()
    s = _SD(sd, used)
    out = {
        "lp_coder": convert_pwave_tree(sd, "lp_coder.", decomp_levels, used),
        "hp_coder": convert_pwave_tree(sd, "hp_coder.", decomp_levels, used),
        "hp_q_scale": np.stack(
            [s.arr(f"hp_q_scale.{i}") for i in range(num_me_stages)]),
        "mv_y_q_scale_enc": np.stack(
            [s.arr(f"mv_y_q_scale_enc.{i}") for i in range(num_me_stages)]),
        "mv_y_q_scale_dec": np.stack(
            [s.arr(f"mv_y_q_scale_dec.{i}") for i in range(num_me_stages)]),
    }
    # SpyNet: reference stores plain RGB weights under optic_flow.
    spy = {}
    lvl = 0
    while s.has(f"optic_flow.moduleBasic.{lvl}.conv1.weight"):
        convs = {}
        for j in range(1, 6):
            w = s.arr(f"optic_flow.moduleBasic.{lvl}.conv{j}.weight")
            if spynet_luma and j == 1:
                w = np.concatenate(
                    [w[:, 0:3].sum(axis=1, keepdims=True),
                     w[:, 3:6].sum(axis=1, keepdims=True),
                     w[:, 6:8]], axis=1)
            convs[f"conv{j}"] = {
                "kernel": w,
                "bias": s.arr(f"optic_flow.moduleBasic.{lvl}.conv{j}.bias")}
        spy[f"basic_{lvl}"] = convs
        lvl += 1
    out["optic_flow"] = spy

    for i in range(num_me_stages):
        out[f"mv_encoder_{i}"] = _mv_enc(s.sub(f"mv_encoder.{i}"))
        out[f"mv_decoder_{i}"] = _mv_dec(s.sub(f"mv_decoder.{i}"))
        out[f"mv_hyper_enc_{i}"] = _hyper_enc(s.sub(f"mv_hyper_prior_encoder.{i}"))
        out[f"mv_hyper_dec_{i}"] = _hyper_dec(s.sub(f"mv_hyper_prior_decoder.{i}"))
        out[f"mv_prior_fusion_adaptor_0_{i}"] = _dcb(
            s, f"mv_y_prior_fusion_adaptor_0.{i}")
        out[f"mv_prior_fusion_adaptor_1_{i}"] = _dcb(
            s, f"mv_y_prior_fusion_adaptor_1.{i}")
        out[f"mv_prior_fusion_{i}"] = {
            f"layers_{j}": _dcb(s, f"mv_y_prior_fusion.{i}.{j}")
            for j in range(2)}
        out[f"mv_spatial_prior_{i}"] = {
            f"layers_{j}": _dcb(s, f"mv_y_spatial_prior.{i}.{j}")
            for j in range(3)}
        for k in (1, 2, 3):
            out[f"mv_spatial_adaptors_{i}_{k-1}"] = _conv(
                s, f"mv_y_spatial_prior_adaptor_{k}.{i}")
        out[f"mv_bit_est_{i}"] = _bit_est(s.sub(f"mv_bit_est.{i}"))
        out[f"temporal_filtering_{i}"] = {
            "p_t": _pu(s, f"temporal_filtering.{i}.P_t"),
            "u_t": _pu(s, f"temporal_filtering.{i}.U_t"),
        }

    unused = [k for k in sd
              if k not in used
              and not k.endswith(".mask")          # masked-conv mask buffers
              and ".lift_v." not in k]             # alias of lift_h (shared)
    return {"params": out}, unused


def merge_into_init(init_params: Dict, converted: Dict):
    """Overwrite leaves of an initialized flax tree with converted values.

    Leaves absent from `converted` keep their init (scale_l/h, scale_p/u —
    not parameters in the reference). Shapes are asserted. Returns
    (params, unmatched_paths) where unmatched_paths lists converted leaves
    that have no home in the init tree (must be empty for a clean import).
    """
    import jax

    flat_conv = {}

    def flatten(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                flatten(prefix + (k,), v)
        else:
            flat_conv[prefix] = node

    flatten((), converted)

    unmatched = set(flat_conv)

    def visit(path, leaf):
        key = tuple(str(p.key) for p in path)
        if key in flat_conv:
            v = np.asarray(flat_conv[key], np.float32)
            assert v.shape == leaf.shape, (key, v.shape, leaf.shape)
            unmatched.discard(key)
            return v.astype(leaf.dtype)
        return leaf

    merged = jax.tree_util.tree_map_with_path(visit, init_params)
    return merged, sorted("/".join(k) for k in unmatched)
