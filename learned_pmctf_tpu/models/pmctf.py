"""pMCTF-L — variable-rate wavelet video coder with temporal lifting (MCTF).

ref: pMCTF/models/video/pMCTF_L.py:29-637. Two pWave instances code the
temporal lowpass/highpass bands; a hierarchical temporal lifting ladder
(learned SpyNet flow, coded MVs via the quad four-part prior, learned
predict/update filters) provides the temporal transform; per-temporal-layer
quality scaling (hp_q_scale) implements the ICIP'25 temporal adaptivity.

Pure flax module: DPB (decoded MV buffer) and all sequencing state is
explicit. Host bitstream orchestration lives in codec/video_codec.py.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.resample import bilinear_downsample, bilinear_upsample
from ..ops.warp import flow_warp, flow_warp_fast
from ..ops.quant import ste_round
from ..entropy.distributions import laplace_bits
from ..entropy.bit_estimator import BitEstimator
from .layers import Conv2d, DepthConvBlock, policy_scope
from .spynet import MESpynet
from .mv_coder import (
    MvEnc,
    MvDec,
    HyperEncoder,
    HyperDecoder,
    four_part_prior_forward,
    separate_prior_enc_dec,
)
from .wavelet import TemporalLifting
from .pwave import PWave, interp_q_scale


class PMCTF(nn.Module):
    """Motion-compensated temporal filtering video codec."""

    bitdepth: int = 8
    decomp_levels: int = 4
    lossy: bool = True
    num_me_stages: int = 2
    quant_stage: bool = True
    ll_mode: str = "fourstep"
    channel_mv: int = 64
    channel_n: int = 64
    features: int = 112      # pWave four-step fusion width
    ar_features: int = 128   # pWave LL model width
    spynet_levels: int = 6
    spynet_luma: bool = True  # 1-channel ME (3x fewer warp gathers)
    # warp used for the CODED temporal lifting: 'exact' (bilinear gather,
    # reference semantics) or 'fast' (gather-free separable warp — measured
    # 65.6 ms -> 5.8 ms per 1080p warp on v5e; deterministic and
    # self-consistent, approximate only for horizontally rough motion
    # fields and |mv| > warp_max_disp). Both sides of the codec use the
    # same mode, so streams stay decodable either way. Default 'exact'
    # (reference semantics — required whenever reference checkpoints are
    # imported for parity/BD-rate measurement); bench/eval configs opt
    # into 'fast' explicitly where throughput matters.
    warp_mode: str = "exact"
    warp_max_disp: int = 32
    # trace all conv stacks with bf16 activations (layers.policy_scope);
    # propagated to both pWave sub-coders
    act_bf16: bool = False

    def setup(self):
        self.dynamic_range = float(2 ** self.bitdepth - 1)  # 255 (ref: pMCTF_L.py:46)
        n_stages = self.num_me_stages
        c_mv, c_n = self.channel_mv, self.channel_n

        self.lp_coder = PWave(self.bitdepth, self.decomp_levels, self.lossy,
                              ll_mode=self.ll_mode, features=self.features,
                              ar_features=self.ar_features,
                              act_bf16=self.act_bf16)
        self.hp_coder = PWave(self.bitdepth, self.decomp_levels, self.lossy,
                              ll_mode=self.ll_mode, features=self.features,
                              ar_features=self.ar_features,
                              act_bf16=self.act_bf16)

        self.optic_flow = MESpynet(levels=self.spynet_levels,
                                   luma_mode=self.spynet_luma,
                                   fast_warp=(self.warp_mode == "fast"),
                                   fast_warp_disp=self.warp_max_disp)

        self.mv_encoder = [MvEnc(2, c_mv) for _ in range(n_stages)]
        self.mv_decoder = [MvDec(2, c_mv) for _ in range(n_stages)]
        self.mv_hyper_enc = [HyperEncoder(c_n, c_mv) for _ in range(n_stages)]
        self.mv_hyper_dec = [HyperDecoder(c_n, c_mv) for _ in range(n_stages)]

        self.mv_prior_fusion_adaptor_0 = [DepthConvBlock(c_mv, c_mv * 2)
                                          for _ in range(n_stages)]
        self.mv_prior_fusion_adaptor_1 = [DepthConvBlock(c_mv * 2, c_mv * 2)
                                          for _ in range(n_stages)]
        self.mv_prior_fusion = [
            nn.Sequential([DepthConvBlock(c_mv * 2, c_mv * 3),
                           DepthConvBlock(c_mv * 3, c_mv * 3)])
            for _ in range(n_stages)
        ]
        self.mv_spatial_prior = [
            nn.Sequential([DepthConvBlock(c_mv * 3, c_mv * 3),
                           DepthConvBlock(c_mv * 3, c_mv * 3),
                           DepthConvBlock(c_mv * 3, c_mv * 2)])
            for _ in range(n_stages)
        ]
        self.mv_spatial_adaptors = [
            [Conv2d(c_mv * 4, c_mv * 3, 1) for _ in range(3)]
            for _ in range(n_stages)
        ]

        init_one = nn.initializers.ones
        self.mv_y_q_scale_enc = self.param("mv_y_q_scale_enc", init_one,
                                           (n_stages, 2, 1, 1, 1))
        self.mv_y_q_scale_dec = self.param("mv_y_q_scale_dec", init_one,
                                           (n_stages, 2, 1, 1, 1))
        self.hp_q_scale = self.param("hp_q_scale", init_one, (n_stages, 2, 1, 1, 1))

        self.mv_bit_est = [BitEstimator(c_mv) for _ in range(n_stages)]
        self.temporal_filtering = [TemporalLifting(lossy=self.lossy)
                                   for _ in range(n_stages)]

    # ---- helpers ---------------------------------------------------------------

    def me_index(self, stage_idx: int) -> int:
        return min(self.num_me_stages - 1, stage_idx)

    def get_mv_y_q(self, q_index, stage_idx: int):
        """Per-stage encoder/decoder MV quant steps. ref: pMCTF_L.py:221-230."""
        enc = interp_q_scale(self.mv_y_q_scale_enc[stage_idx], q_index)
        dec = interp_q_scale(self.mv_y_q_scale_dec[stage_idx], q_index)
        return enc, dec

    def hp_qp_scale(self, q_index, stage_idx: int):
        if not self.quant_stage:
            return None
        s = min(stage_idx, self.num_me_stages - 1)
        return interp_q_scale(self.hp_q_scale[s], q_index)

    def mv_prior_param_decoder(self, mv_z_hat, dpb, me_num: int):
        """Hyper decode + DPB-conditional fusion. ref: pMCTF_L.py:232-241."""
        mv_params = self.mv_hyper_dec[me_num](mv_z_hat)
        ref_mv_y = dpb.get("ref_mv_y")
        if ref_mv_y is None:
            mv_params = self.mv_prior_fusion_adaptor_0[me_num](mv_params)
        else:
            mv_params = jnp.concatenate([mv_params, ref_mv_y], axis=1)
            mv_params = self.mv_prior_fusion_adaptor_1[me_num](mv_params)
        # f32 head: quant-step/scales/means are split from this
        return self.mv_prior_fusion[me_num](mv_params).astype(jnp.float32)

    def _me_input(self, frame):
        """Normalized ME input from the (B,1,H,W) Y plane.

        ref: pMCTF_L.py:247-253 tiles to 3 channels for the RGB-pretrained
        SpyNet; with spynet_luma the tiling is folded into conv1 weights."""
        if self.spynet_luma:
            return frame / self.dynamic_range
        return jnp.tile(frame, (1, 3, 1, 1)) / self.dynamic_range

    # ---- motion ---------------------------------------------------------------

    @policy_scope
    def compute_and_code_motion(self, ref_frame, cur_frame, q_index, dpb,
                                stage_idx: int = 0, me_downsample: int = 1,
                                training: bool = True):
        """Estimate, encode and decode motion. ref: pMCTF_L.py:243-292."""
        me_num = self.me_index(stage_idx)
        mv_y_q_enc, mv_y_q_dec = self.get_mv_y_q(q_index, me_num)

        mv_cur = self._me_input(cur_frame)
        mv_ref = self._me_input(ref_frame)
        if me_downsample > 1:
            mv_cur = bilinear_downsample(mv_cur, me_downsample)
            mv_ref = bilinear_downsample(mv_ref, me_downsample)

        est_mv = self.optic_flow(mv_cur, mv_ref)
        mv_y = self.mv_encoder[me_num](est_mv, dpb.get("mv_feature"), mv_y_q_enc)
        mv_z = self.mv_hyper_enc[me_num](mv_y)
        mv_z_hat = ste_round(mv_z) if training else jnp.round(mv_z)

        mv_params = self.mv_prior_param_decoder(mv_z_hat, dpb, me_num)
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = four_part_prior_forward(
            mv_y, mv_params,
            self.mv_spatial_adaptors[me_num], self.mv_spatial_prior[me_num],
            training=training)

        mv_hat, mv_feature = self.mv_decoder[me_num](mv_y_hat, mv_y_q_dec)
        if me_downsample > 1:
            mv_hat = bilinear_upsample(mv_hat, me_downsample) * me_downsample

        if training and self.has_rng("noise"):
            k1 = self.make_rng("noise")
            k2 = self.make_rng("noise")
            mv_y_for_bit = mv_y_res + jax.lax.stop_gradient(
                jax.random.uniform(k1, mv_y_res.shape, mv_y_res.dtype, -0.5, 0.5))
            mv_z_for_bit = mv_z + jax.lax.stop_gradient(
                jax.random.uniform(k2, mv_z.shape, mv_z.dtype, -0.5, 0.5))
        else:
            mv_y_for_bit = mv_y_q
            mv_z_for_bit = mv_z_hat

        bits_mv_y = laplace_bits(mv_y_for_bit, mv_scales_hat)
        bits_mv_z = self.mv_bit_est[me_num].get_z_bits(mv_z_for_bit)

        pixel_num = ref_frame.shape[2] * ref_frame.shape[3]
        bpp_mv_y = jnp.sum(bits_mv_y, axis=(1, 2, 3)) / pixel_num
        bpp_mv_z = jnp.sum(bits_mv_z, axis=(1, 2, 3)) / pixel_num
        reduce = jnp.mean if training else jnp.sum
        bpp_mv_y = reduce(bpp_mv_y)
        bpp_mv_z = reduce(bpp_mv_z)

        ref_mv = {"mv_feature": mv_feature, "mv_y_hat": mv_y_hat}
        return mv_hat, ref_mv, bpp_mv_y, bpp_mv_z

    # ---- temporal lifting -------------------------------------------------------

    def _tile_mv(self, mv_hat, batch):
        if batch > mv_hat.shape[0]:
            mv_hat = jnp.tile(mv_hat, (batch // mv_hat.shape[0], 1, 1, 1))
        return mv_hat

    def _warp(self, x, mv):
        if self.warp_mode == "fast":
            return flow_warp_fast(x, mv, self.warp_max_disp)
        return flow_warp(x, mv)

    @policy_scope
    def forward_mctf(self, ref_frame, cur_frame, mv_hat, stage_idx: int = 0):
        """H_t = cur - P(warp(ref, mv)); L_t = ref + U(warp(H_t, -mv)).

        ref: pMCTF_L.py:297-312."""
        me_num = self.me_index(stage_idx)
        mv_hat = self._tile_mv(mv_hat, ref_frame.shape[0])
        pred = self._warp(ref_frame, mv_hat)
        if not self.lossy:
            pred = ste_round(pred)
        pred = self.temporal_filtering[me_num].predict_filter(pred)
        h_t = cur_frame - pred

        inv_pred = self._warp(h_t, -mv_hat)
        if not self.lossy:
            inv_pred = ste_round(inv_pred)
        inv_pred = self.temporal_filtering[me_num].update_filter(inv_pred)
        l_t = ref_frame + inv_pred
        return l_t, h_t, pred, inv_pred

    @policy_scope
    def inverse_mctf(self, l_t, h_t, mv_hat, stage_idx: int = 0,
                     downscale: bool = False):
        """Inverse temporal lifting. ref: pMCTF_L.py:314-330."""
        me_num = self.me_index(stage_idx)
        if downscale:
            mv_hat = bilinear_downsample(mv_hat) / 2.0
        mv_hat = self._tile_mv(mv_hat, l_t.shape[0])
        inv_pred = self._warp(h_t, -mv_hat)
        if not self.lossy:
            inv_pred = ste_round(inv_pred)
        inv_pred = self.temporal_filtering[me_num].update_filter(inv_pred)
        ref_frame = l_t - inv_pred
        pred = self._warp(ref_frame, mv_hat)
        if not self.lossy:
            pred = ste_round(pred)
        pred = self.temporal_filtering[me_num].predict_filter(pred)
        cur_frame = h_t + pred
        return ref_frame, cur_frame

    # ---- one temporal stage (training / estimation) -----------------------------

    def __call__(self, ref_frame, cur_frame, q_index, code_lt: bool, dpb,
                 mv_hat=None, stage_idx: int = 0, me_downsample: int = 1,
                 training: bool = True):
        return self.forward_one_stage(ref_frame, cur_frame, q_index, code_lt,
                                      dpb, mv_hat, stage_idx, me_downsample,
                                      training)

    @policy_scope
    def forward_one_stage(self, ref_frame, cur_frame, q_index, code_lt: bool,
                          dpb, mv_hat=None, stage_idx: int = 0,
                          me_downsample: int = 1, training: bool = True):
        """Code one temporal decomposition pair. ref: pMCTF_L.py:332-379."""
        if mv_hat is not None:
            # chroma pass: reuse (halved) luma motion
            bpp_mv_y = bpp_mv_z = None
            ref_mv = {"mv_feature": None, "mv_y_hat": None}
            mv_hat = bilinear_downsample(mv_hat) / 2.0
        else:
            mv_hat, ref_mv, bpp_mv_y, bpp_mv_z = self.compute_and_code_motion(
                ref_frame, cur_frame, q_index, dpb, stage_idx, me_downsample,
                training)

        l_t, h_t, pred, inv_pred = self.forward_mctf(
            ref_frame, cur_frame, mv_hat, stage_idx)

        qp_scale = self.hp_qp_scale(q_index, stage_idx)
        res_h = self.hp_coder(h_t, q_index, qp_scale=qp_scale, training=training)

        me_mse = jnp.mean((pred - cur_frame) ** 2)
        has_mv_bits = bpp_mv_y is not None

        ret = {
            "bpp_mv_y": bpp_mv_y,
            "bpp_mv_z": bpp_mv_z,
            "bpp_me": bpp_mv_y + bpp_mv_z if has_mv_bits else None,
            "me_mse": me_mse,
            "bpp": res_h["bpp_total"] + bpp_mv_y + bpp_mv_z if has_mv_bits
                   else res_h["bpp_total"],
            "bpp_H": res_h["bpp_total"],
            "bit_H": res_h["bits_total"],
            "bit_ME": (bpp_mv_y + bpp_mv_z) * (ref_frame.shape[2] * ref_frame.shape[3])
                      if has_mv_bits else None,
            "mse_H": res_h["mse"],
            "mv_hat": mv_hat,
            "dpb": {"mv_feature": ref_mv["mv_feature"],
                    "ref_mv_y": ref_mv["mv_y_hat"]},
            "H_t": res_h["x_hat"],
        }
        if code_lt:
            res_l = self.lp_coder(l_t, q_index, training=training)
            ret["bpp_L"] = res_l["bpp_total"]
            ret["bit_L"] = res_l["bits_total"]
            ret["mse_L"] = res_l["mse"]
            ret["me_mse_inv"] = jnp.mean((inv_pred - ref_frame) ** 2)
            ret["L_t"] = res_l["x_hat"]
        else:
            ret["L_t"] = l_t
        ret["bit"] = ret["bpp"] * (ref_frame.shape[2] * ref_frame.shape[3])
        return ret

    def full_init_graph(self, ref_frame, cur_frame, q_index, dpb):
        """Initialization-only graph touching EVERY submodule.

        flax creates params lazily on first call; a plain forward at
        stage 0 would leave the per-stage MV/temporal modules of stages
        1..num_me_stages-1 without params. Use
        ``module.init(rngs, ..., method=PMCTF.full_init_graph)``.
        """
        outs = []
        empty = {"mv_feature": None, "ref_mv_y": None}
        for s in range(self.num_me_stages):
            # first pair of a stage: empty DPB -> adaptor_0 paths
            out = self.forward_one_stage(
                ref_frame, cur_frame, q_index, code_lt=(s == 0), dpb=empty,
                stage_idx=s, training=True)
            # subsequent pairs: populated DPB -> adaptor_1 / context paths
            _, _, bpp_y, bpp_z = self.compute_and_code_motion(
                ref_frame, cur_frame, q_index, out["dpb"], stage_idx=s,
                training=True)
            outs.append(out["bpp"] + bpp_y + bpp_z)
        return jnp.stack(outs)

    # ---- jittable sub-graphs for the host bitstream path -------------------------

    @policy_scope
    def mv_latent_planes(self, ref_y, cur_y, dpb, stage_idx: int, q_index,
                         me_downsample: int = 1):
        """Teacher latent for the MV encode-as-decode replay: (mv_y, mv_z_hat).

        Everything downstream — prior, four-part head/body, decoder tail —
        runs through the decoder's own executables during compress
        (codec/video_codec.py), so encoder and decoder are bit-identical by
        construction; this program only produces the quantities the decoder
        never computes. ref: pMCTF_L.py:448-495 compress_mv (the reference
        encodes with the same torch modules it decodes with)."""
        me_num = self.me_index(stage_idx)
        mv_y_q_enc, _ = self.get_mv_y_q(q_index, me_num)

        mv_cur = self._me_input(cur_y)
        mv_ref = self._me_input(ref_y)
        if me_downsample > 1:
            mv_cur = bilinear_downsample(mv_cur, me_downsample)
            mv_ref = bilinear_downsample(mv_ref, me_downsample)

        est_mv = self.optic_flow(mv_cur, mv_ref)
        mv_y = self.mv_encoder[me_num](est_mv, dpb.get("mv_feature"), mv_y_q_enc)
        mv_z = self.mv_hyper_enc[me_num](mv_y)
        return mv_y, jnp.round(mv_z)

    @policy_scope
    def mv_prior_params(self, mv_z_hat, dpb, stage_idx: int):
        me_num = self.me_index(stage_idx)
        return self.mv_prior_param_decoder(mv_z_hat, dpb, me_num)

    def mv_decode_split(self, mv_params):
        """(q_dec, scales quarters, means quarters) for the decode loop."""
        _, q_dec, scales, means = separate_prior_enc_dec(mv_params)
        return q_dec, jnp.split(scales, 4, axis=1), jnp.split(means, 4, axis=1)

    @policy_scope
    def mv_decode_spatial(self, y_hat_so_far, mv_params, stage_idx: int, step: int):
        me_num = self.me_index(stage_idx)
        inp = jnp.concatenate([y_hat_so_far, mv_params], axis=1)
        out = self.mv_spatial_prior[me_num](
            self.mv_spatial_adaptors[me_num][step](inp)).astype(jnp.float32)
        chunks = jnp.split(out, 8, axis=1)
        return chunks[:4], chunks[4:]

    @policy_scope
    def mv_decode_tail(self, mv_y_hat, stage_idx: int, q_index,
                       me_downsample: int = 1):
        me_num = self.me_index(stage_idx)
        _, mv_y_q_dec = self.get_mv_y_q(q_index, me_num)
        mv_hat, mv_feature = self.mv_decoder[me_num](mv_y_hat, mv_y_q_dec)
        if me_downsample > 1:
            mv_hat = bilinear_upsample(mv_hat, me_downsample) * me_downsample
        return mv_hat, mv_feature

    def mv_z_cdf_fn(self, x, stage_idx: int):
        """BitEstimator CDF probe (for table building)."""
        return self.mv_bit_est[self.me_index(stage_idx)].get_cdf(x)

    @staticmethod
    def get_qp_num():
        return PWave.get_qp_num()
