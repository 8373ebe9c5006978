"""pWave++ — end-to-end learned wavelet image coder (pure flax module).

ref: pMCTF/models/pWave.py:26-592. Architecture: 4-level learned 2-D
lifting analysis; per-subband quantization with a learned log-interpolated
QP range (21 rate points from one model); LL subband coded with either an
autoregressive masked-conv model ('ar', reference parity) or a four-step
checkerboard model ('fourstep', TPU-native default — fully parallel
encode, 4 rANS round trips per subband on decode); the lh/hl/hh subbands
coded coarse-to-fine with the LSTM subband context + four-step model;
synthesis + PostProcess enhancement.

The module is pure: the training forward (__call__) is one jittable graph
(q_index is a traced scalar, so a single compilation serves the whole RD
sweep); the host bitstream orchestration lives in codec/image_codec.py and
calls the jittable sub-graph methods defined here.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..ops.quant import ste_round, ste_clamp
from ..entropy.distributions import laplace_bits
from .wavelet import LiftingScheme2D
from .postprocess import PostProcess
from .context import SubbandContext, ContextFusionSubband, ContextFusionFourStep
from .layers import policy_scope

QP_NUM = 21  # rate points; ref: pMCTF/models/pWave.py:227-229
BANDS = ("lh", "hl", "hh")


def interp_q_scale(q_pair, q_index, qp_num: int = QP_NUM):
    """Log-interpolate between learned (min, max) q scales.

    ref: pMCTF/models/pWave.py:209-215. q_index may be a traced scalar.
    """
    min_q = q_pair[0]
    max_q = q_pair[1]
    step = (jnp.log(max_q) - jnp.log(min_q)) / (qp_num - 1)
    return jnp.exp(jnp.log(min_q) + step * q_index)


class PWave(nn.Module):
    """Wavelet image codec: analysis, subband coding, synthesis."""

    bitdepth: int = 8
    decomp_levels: int = 4
    lossy: bool = True
    ll_mode: str = "fourstep"  # 'fourstep' (TPU-native) | 'ar' (reference parity)
    features: int = 112
    ar_features: int = 128
    # trace conv stacks with bf16 activations (see layers.policy_scope)
    act_bf16: bool = False

    def setup(self):
        self.dynamic_range = float(2 ** self.bitdepth)
        self.clip_value = 8192.0 if self.lossy else 32767.0
        self.wavelet = LiftingScheme2D(in_ch=1, bitdepth=self.bitdepth,
                                       lossy=self.lossy)
        self.context_prediction = SubbandContext(
            in_ch=1, decomp_levels=self.decomp_levels)
        self.dequant = PostProcess(in_ch=1, out_ch=1)

        fusion = {}
        for lvl in range(self.decomp_levels):
            ctx_ch = 1 if lvl == self.decomp_levels - 1 else 2
            for band in BANDS:
                fusion[f"{lvl}_{band}"] = ContextFusionFourStep(
                    in_ch=1, ctx_ch=ctx_ch, features=self.features,
                    num_params=2, lossy=self.lossy)
        if self.ll_mode == "ar":
            fusion["ll"] = ContextFusionSubband(
                in_ch=1, features=self.ar_features, num_params=2,
                use_context=False)
        else:
            fusion["ll"] = ContextFusionFourStep(
                in_ch=1, ctx_ch=1, features=self.ar_features, num_params=2,
                use_ctx=False, lossy=self.lossy)
        self.context_fusion = fusion

        init_qp = nn.initializers.constant(1.0 / 16.0)
        self.qp = self.param("QP", init_qp, (2, 1, 1, 1))
        self.qp_ll = self.param("QP_ll", init_qp, (2, 1, 1, 1))

    # ---- q scales -----------------------------------------------------------

    def current_q(self, q_index, qp_scale=None):
        if q_index is None:
            qp, qp_ll = self.qp[-1], self.qp_ll[-1]
        else:
            qp = interp_q_scale(self.qp, q_index)
            qp_ll = interp_q_scale(self.qp_ll, q_index)
        if qp_scale is not None:
            qp = qp * qp_scale
            qp_ll = qp_ll * qp_scale
        return qp, qp_ll

    # ---- transforms -----------------------------------------------------------

    def analysis(self, x) -> Dict[int, Dict[str, jnp.ndarray]]:
        """Multi-level forward lifting. ref: pWave.py:139-148."""
        subbands = {}
        ll = x
        for lvl in range(self.decomp_levels):
            sb = self.wavelet.forward_lift_2d(ll)
            subbands[lvl] = sb
            ll = sb["ll"]
        return subbands

    def synthesis(self, subbands) -> jnp.ndarray:
        """Multi-level inverse lifting. ref: pWave.py:150-157."""
        y = None
        for lvl in range(self.decomp_levels - 1, -1, -1):
            sb = dict(subbands[lvl])
            if y is not None:
                sb["ll"] = y
            y = self.wavelet.backward_lift_2d(sb)
        return y

    def postprocess(self, x_hat):
        if self.lossy:
            return self.dequant(x_hat / self.dynamic_range) * self.dynamic_range
        return x_hat

    def quantize_subband(self, subband, q_scale):
        """Scale + STE clamp (rounding happens in the entropy model).

        ref: pWave.py:184-189.
        """
        if self.lossy:
            return ste_clamp(subband * q_scale, -self.clip_value, self.clip_value)
        return ste_clamp(subband, -self.clip_value, self.clip_value)

    def dequantize_subband(self, subband, q_scale):
        return subband / q_scale if self.lossy else subband

    # ---- training / estimation forward --------------------------------------

    @policy_scope
    def __call__(self, x, q_index=None, qp_scale=None, training: bool = True):
        """Full forward with entropy-estimated rate (no bitstream).

        ref: pWave.py:231-312 forward/forward_one_channel.
        Returns dict with x_hat, per-sample bits, bpp_total, mse.
        """
        q_scale, q_scale_ll = self.current_q(q_index, qp_scale)
        y = self.analysis(x)
        L = self.decomp_levels

        subbands_hat: Dict[int, Dict[str, jnp.ndarray]] = {l: {} for l in range(L)}

        # --- LL subband -----------------------------------------------------
        ll = self.quantize_subband(y[L - 1]["ll"], q_scale_ll)
        if self.ll_mode == "ar":
            ll_hat = ste_round(ll) if training else jnp.round(ll)
            params = self.context_fusion["ll"](ll_hat)
            scales, means = jnp.split(params, 2, axis=1)
            bits_total = jnp.sum(laplace_bits(ll_hat - means, scales), axis=(1, 2, 3))
        else:
            _, ll_q, ll_hat, s_hat = self.context_fusion["ll"](
                ll, training=training)
            bits_total = jnp.sum(laplace_bits(ll_q, s_hat), axis=(1, 2, 3))
        subbands_hat[L - 1]["ll"] = ll_hat

        # --- remaining subbands, coarse to fine ------------------------------
        b, _, h, w = ll.shape
        states = self.context_prediction.init_states(b, h, w, ll.dtype)
        context, states = self.context_prediction.step(ll_hat, states)

        for lvl in range(L - 1, -1, -1):
            for sidx, band in enumerate(BANDS):
                ctx = jnp.split(context, 3, axis=1)[sidx]
                prev = subbands_hat[lvl + 1][band] if lvl < L - 1 else None

                s_curr = self.quantize_subband(y[lvl][band], q_scale)
                _, s_q, s_hat_band, scales = self.context_fusion[f"{lvl}_{band}"](
                    s_curr, context=ctx, prev_subband=prev, training=training)
                subbands_hat[lvl][band] = s_hat_band
                bits_total = bits_total + jnp.sum(
                    laplace_bits(s_q, scales), axis=(1, 2, 3))

                up = lvl - 1 if (band == "hh" and lvl > 0) else None
                context, states = self.context_prediction.step(
                    s_hat_band, states, upsample_level=up)

        # --- dequantize + synthesis -------------------------------------------
        rec = {l: {} for l in range(L)}
        for lvl in range(L):
            for band, sb in subbands_hat[lvl].items():
                q = q_scale_ll if band == "ll" else q_scale
                rec[lvl][band] = self.dequantize_subband(sb, q)
        x_hat = self.synthesis(rec)
        x_hat = self.postprocess(x_hat)

        num_pixels = x.shape[0] * x.shape[2] * x.shape[3]
        return {
            "x_hat": x_hat,
            "bits": bits_total,                      # per-sample
            "bits_total": jnp.sum(bits_total),
            "bpp_total": jnp.sum(bits_total) / num_pixels,
            "mse": jnp.mean((x - x_hat) ** 2),
        }

    @policy_scope
    def spatial_wavelet_dec(self, x, q_index=None, qp_scale=None):
        """Fast approximation skipping entropy modeling (means ignored).

        ref: pWave.py:314-349.
        """
        q_scale, q_scale_ll = self.current_q(q_index, qp_scale)
        y = self.analysis(x)
        L = self.decomp_levels
        rec = {l: {} for l in range(L)}
        for lvl in range(L):
            bands = ("ll",) + BANDS if lvl == L - 1 else BANDS
            for band in bands:
                q = q_scale_ll if band == "ll" else q_scale
                sb = ste_round(self.quantize_subband(y[lvl][band], q))
                rec[lvl][band] = self.dequantize_subband(sb, q)
        return self.postprocess(self.synthesis(rec))

    # ---- jittable sub-graphs for the host coding loops -----------------------

    @policy_scope
    def quantize_planes(self, x, q_index=None, qp_scale=None):
        """Quantized (continuous, pre-round) subbands in coding order.

        These are the teacher inputs for the codec's encode-as-decode
        replay (codec/image_codec.py): everything downstream of
        quantization — context chain, parameter nets, index extraction —
        runs through the SAME jitted sub-graphs during compress as during
        decompress, so encoder and decoder are bit-identical by
        construction. (Evaluating the parameter nets inside a separate
        fused encode program diverges from the decoder's standalone
        programs at the ulp level, which at 1080p symbol counts flips a
        round()/index somewhere and desyncs the range coder.)

        ref: pWave.py:381-459 — the reference encodes with the same
        modules it decodes with; this is the XLA-program equivalent of
        that guarantee.
        """
        q_scale, q_scale_ll = self.current_q(q_index, qp_scale)
        y = self.analysis(x)
        L = self.decomp_levels
        planes = {"ll": self.quantize_subband(y[L - 1]["ll"], q_scale_ll)}
        for lvl in range(L - 1, -1, -1):
            for band in BANDS:
                planes[f"{lvl}_{band}"] = self.quantize_subband(
                    y[lvl][band], q_scale)
        return planes

    # Decoder-side sub-graphs (called by codec/image_codec.py):

    def ctx_init(self, like):
        b, _, h, w = like.shape
        return self.context_prediction.init_states(b, h, w, like.dtype)

    @policy_scope
    def ctx_step(self, subband, states, upsample_level: Optional[int]):
        return self.context_prediction.step(subband, states, upsample_level)

    @policy_scope
    def fusion_hier(self, key: str, context, prev_subband, like):
        module = self.context_fusion[key]
        if isinstance(module, ContextFusionFourStep):
            return module.hier_params(context, prev_subband, like=like)
        raise TypeError("fusion_hier is only defined for four-step models")

    @policy_scope
    def fusion_spatial(self, key: str, x_hat_so_far, ctx_feat, step: int):
        return self.context_fusion[key].spatial_params(x_hat_so_far, ctx_feat, step)

    @policy_scope
    def ar_params(self, partial_rec):
        """AR model parameters on a partial reconstruction (decode loop)."""
        params = self.context_fusion["ll"](partial_rec)
        scales, means = jnp.split(params, 2, axis=1)
        return scales, means

    @policy_scope
    def reconstruct(self, subbands_hat, q_index=None, qp_scale=None):
        """Dequantize + synthesis + postprocess (decode tail)."""
        q_scale, q_scale_ll = self.current_q(q_index, qp_scale)
        L = self.decomp_levels
        rec = {l: {} for l in range(L)}
        for lvl in range(L):
            for band, sb in subbands_hat[lvl].items():
                q = q_scale_ll if band == "ll" else q_scale
                rec[lvl][band] = self.dequantize_subband(sb, q)
        return self.postprocess(self.synthesis(rec))

    @staticmethod
    def get_qp_num():
        return QP_NUM
