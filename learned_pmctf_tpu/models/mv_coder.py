"""Motion-vector autoencoder, hyperprior, and quad four-part prior.

ref: pMCTF/layers/video/video_net.py:124-191 (MvEnc/MvDec/hyper nets) and
pMCTF/layers/video/four_part_prior.py:11-280 (MVCoderQuad).

The four-part prior codes the MV latent in 4 passes over 16 groups
(4 channel quarters x 4 checkerboard phases). Each pass's grouped symbol
plane is dense (the masks partition space across quarters), so the host
rANS sees 4 dense planes per latent — no padding waste, 4 round trips.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.masks import checkerboard_masks
from ..ops.quant import ste_round, lower_bound
from .layers import (
    Conv2d,
    DepthConvBlock,
    DepthConvBlock4,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    SubpelConv,
)


class MvEnc(nn.Module):
    """MV latent encoder: 4x stride-2 with mid-stream quant multiply and
    optional temporal-context adaptor. ref: video_net.py:124-149."""

    in_ch: int = 2
    channels: int = 64

    def setup(self):
        c = self.channels
        self.enc_1 = nn.Sequential([
            ResidualBlockWithStride(self.in_ch, c, stride=2),
            DepthConvBlock(c, c),
        ])
        self.enc_2 = ResidualBlockWithStride(c, c, stride=2)
        self.adaptor_0 = DepthConvBlock(c, c)
        self.adaptor_1 = DepthConvBlock(c * 2, c)
        self.enc_3_a = ResidualBlockWithStride(c, c, stride=2)
        self.enc_3_b = DepthConvBlock(c, c)
        self.enc_3_c = Conv2d(c, c, 3, stride=2)

    def __call__(self, x, context, quant_step):
        out = self.enc_1(x)
        out = out * quant_step
        out = self.enc_2(out)
        if context is None:
            out = self.adaptor_0(out)
        else:
            out = self.adaptor_1(jnp.concatenate([out, context], axis=1))
        # net boundary: the latent is quantized downstream — keep it f32
        # under the bf16 activation policy
        return self.enc_3_c(self.enc_3_b(self.enc_3_a(out))).astype(jnp.float32)


class MvDec(nn.Module):
    """MV latent decoder returning (mv, feature); feature feeds the DPB.

    ref: video_net.py:152-173."""

    out_ch: int = 2
    channels: int = 64

    def setup(self):
        c = self.channels
        self.dec_1 = nn.Sequential([
            DepthConvBlock(c, c),
            ResidualBlockUpsample(c, c, 2),
            DepthConvBlock(c, c),
            ResidualBlockUpsample(c, c, 2),
            DepthConvBlock(c, c),
        ])
        self.dec_2 = ResidualBlockUpsample(c, c, 2)
        self.dec_3 = nn.Sequential([
            DepthConvBlock(c, c),
            SubpelConv(c, self.out_ch, 2, kernel=1),
        ])

    def __call__(self, x, quant_step):
        feature = self.dec_1(x)
        out = self.dec_2(feature)
        out = out * quant_step
        # net boundary (policy-safe dtypes): mv drives the warp; feature
        # enters the DPB
        return (self.dec_3(out).astype(jnp.float32),
                feature.astype(jnp.float32))


class HyperEncoder(nn.Module):
    """ref: video_net.py:176-183."""

    channels_n: int = 64
    channels_in: int = 64

    @nn.compact
    def __call__(self, x):
        x = DepthConvBlock4(self.channels_in, self.channels_n)(x)
        x = Conv2d(self.channels_n, self.channels_n, 3, stride=2)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        # net boundary: z is rounded to symbols — f32 under the policy
        return Conv2d(self.channels_n, self.channels_n, 3,
                      stride=2)(x).astype(jnp.float32)


class HyperDecoder(nn.Module):
    """ref: video_net.py:185-191."""

    channels_n: int = 64
    channels_out: int = 64

    @nn.compact
    def __call__(self, x):
        x = ResidualBlockUpsample(self.channels_n, self.channels_n, 2)(x)
        x = ResidualBlockUpsample(self.channels_n, self.channels_n, 2)(x)
        return DepthConvBlock4(self.channels_n,
                               self.channels_out)(x).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Quad four-part prior (pure functions over provided sub-nets)
# ---------------------------------------------------------------------------

# mask index per (step, channel-quarter); ref: four_part_prior.py:121-173
MASK_SCHEDULE = ((0, 1, 2, 3), (3, 2, 1, 0), (2, 3, 0, 1), (1, 0, 3, 2))


def separate_prior_enc_dec(params):
    """(q_enc, q_dec, scales, means) with LowerBound(0.5) reciprocal quant.

    ref: four_part_prior.py:29-36."""
    quant_step, scales, means = jnp.split(params, 3, axis=1)
    quant_step = lower_bound(quant_step, 0.5)
    return 1.0 / quant_step, quant_step, scales, means


def _mask_process(y, scales, means, mask, training):
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = ste_round(y_res) if training else jnp.round(y_res)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


def four_part_prior_forward(
    y,
    common_params,
    adaptors: Sequence[Callable],
    spatial_prior: Callable,
    training: bool = True,
):
    """Training/estimation forward of the quad prior.

    ref: four_part_prior.py:89-208. adaptors: 3 callables (1x1 convs)
    mapping cat(y_hat_so_far, common) to the spatial-prior input;
    spatial_prior maps that to 8 chunks (scales x4, means x4).

    The real-bitstream encode does NOT use this function: it replays the
    decoder's executables with teacher-forced symbols (see
    codec/video_codec.py _mv_code) so both sides are bit-identical.
    """
    q_enc, q_dec, scales, means = separate_prior_enc_dec(common_params)
    _, _, h, w = y.shape
    masks = checkerboard_masks(h, w, y.dtype)

    y = y * q_enc
    y_quarters = jnp.split(y, 4, axis=1)
    scales_q = jnp.split(scales, 4, axis=1)
    means_q = jnp.split(means, 4, axis=1)

    res_acc = [None] * 4   # per quarter accumulated over steps
    q_acc = [None] * 4
    hat_acc = [None] * 4
    shat_acc = [None] * 4
    y_hat_so_far = None

    for step in range(4):
        step_hats = []
        for i in range(4):
            m = masks[MASK_SCHEDULE[step][i]]
            y_res, y_q, y_hat, s_hat = _mask_process(
                y_quarters[i], scales_q[i], means_q[i], m, training)
            res_acc[i] = y_res if res_acc[i] is None else res_acc[i] + y_res
            q_acc[i] = y_q if q_acc[i] is None else q_acc[i] + y_q
            hat_acc[i] = y_hat if hat_acc[i] is None else hat_acc[i] + y_hat
            shat_acc[i] = s_hat if shat_acc[i] is None else shat_acc[i] + s_hat
            step_hats.append(y_hat)
        y_hat_curr = jnp.concatenate(step_hats, axis=1)
        y_hat_so_far = y_hat_curr if y_hat_so_far is None else y_hat_so_far + y_hat_curr
        if step < 3:
            inp = jnp.concatenate([y_hat_so_far, common_params], axis=1)
            # f32 head: scales/means drive symbol quantization
            out = spatial_prior(adaptors[step](inp)).astype(jnp.float32)
            chunks = jnp.split(out, 8, axis=1)
            scales_q, means_q = chunks[:4], chunks[4:]

    y_hat = jnp.concatenate(hat_acc, axis=1) * q_dec
    y_res = jnp.concatenate(res_acc, axis=1)
    y_q = jnp.concatenate(q_acc, axis=1)
    scales_hat = jnp.concatenate(shat_acc, axis=1)
    return y_res, y_q, y_hat, scales_hat


def four_part_prior_decode_scales(scales_q, masks, step: int):
    """Dense per-step scale plane for rANS decode. ref: four_part_prior.py:233-269."""
    out = 0.0
    for i in range(4):
        out = out + scales_q[i] * masks[MASK_SCHEDULE[step][i]]
    return out


def four_part_prior_scatter(y_q_r, means_q, masks, step: int):
    """Scatter one decoded dense plane into the 4 channel quarters."""
    hats = []
    for i in range(4):
        m = masks[MASK_SCHEDULE[step][i]]
        hats.append((y_q_r + means_q[i]) * m)
    return jnp.concatenate(hats, axis=1)
