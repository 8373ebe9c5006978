"""Context models for subband entropy coding.

Three components (ref: pMCTF/layers/long_context.py, context_fusion.py,
context_fusion_4step.py):

- SubbandContext: 3-layer convolutional LSTM scanned over the subbands in
  coding order, with learned 2x upsampling of hidden/cell states when the
  scan crosses decomposition levels. State is an explicit pytree (no
  module attributes) so the same code serves training, compress and
  decompress.
- ContextFusionSubband: PixelCNN-style autoregressive parameter predictor
  (masked convs). The vectorized call is strictly causal by construction,
  so encoding is a single teacher-forced pass; sequential decode re-runs
  the vectorized network on the partial reconstruction (masked taps make
  the value at the current pixel exact).
- ContextFusionFourStep: DCVC-DC style 4-pass checkerboard prior. Exposes
  jittable sub-graphs (hier_params / spatial_params) so the host coding
  loop needs only 4 rANS round trips per subband.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.masks import checkerboard_masks
from ..ops.quant import ste_round
from ..ops.resample import nearest_upsample
from .layers import Conv2d, MaskedConv2d, ContextResidual, DepthConvBlock


# --------------------------------------------------------------------------
# Inter-subband LSTM context ("long context")
# --------------------------------------------------------------------------

class LSTM2D(nn.Module):
    """Convolutional LSTM with a single shared gate pre-activation.

    ref: pMCTF/layers/long_context.py:8-33 — forget/input/output gates and
    the candidate all derive from the same (conv_in(x) + conv_hidden(h)).
    """

    in_ch: int
    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        # The 1-32ch convs at subband resolution underfill the MXU lanes;
        # run the whole step in fold2 space (4x channels at half res,
        # measured ~2x on the lstm conv shapes in benchmarks/layout_lab3).
        # The gate math is elementwise, so it commutes with the fold
        # permutation — the step is exact modulo float reassociation.
        from ..ops.fold import fold2, unfold2, foldable
        fold = foldable(x)
        if fold:
            x, h, c = fold2(x), fold2(h), fold2(c)
        xh = Conv2d(self.in_ch, self.hidden, 3, name="conv_in")(x, folded=fold) + \
            Conv2d(self.hidden, self.hidden, 3, name="conv_hidden")(h, folded=fold)
        # gate math in f32: under the bf16 activation policy the convs
        # return bf16, but the carried (h, c) states feed the entropy
        # parameter nets across all 13 subbands — keep them full precision
        xh = xh.astype(jnp.float32)
        gate = nn.sigmoid(xh)
        c = gate * c.astype(jnp.float32) + gate * jnp.tanh(xh)
        h = nn.sigmoid(xh) * jnp.tanh(c)
        if fold:
            h, c = unfold2(h), unfold2(c)
        return h, c


class UpsampleModule(nn.Module):
    """Nearest 2x upsample + 3x3 conv for LSTM state growth across levels.

    ref: pMCTF/layers/long_context.py:41-61 (mode='nearest' default).
    """

    channels: int

    @nn.compact
    def __call__(self, x):
        return Conv2d(self.channels, self.channels, 3)(nearest_upsample(x))


class SubbandContext(nn.Module):
    """LSTM context threaded across subbands in coding order.

    State pytree: ((h1,c1), (h2,c2), (h3,c3)) with channel sizes
    (32, 32, 3*in_ch). Produces a 3*in_ch-channel context map after each
    subband; the caller chunks it into per-subband (lh/hl/hh) contexts.
    ref: pMCTF/layers/long_context.py:64-224.
    """

    in_ch: int = 1
    decomp_levels: int = 4
    hidden: int = 32

    def setup(self):
        self.out_ch = 3 * self.in_ch
        self.lstm1 = LSTM2D(self.in_ch, self.hidden)
        self.lstm2 = LSTM2D(self.hidden, self.hidden)
        self.lstm3 = LSTM2D(self.hidden, self.out_ch)
        if self.decomp_levels > 1:
            n = self.decomp_levels - 1
            self.up_h1 = [UpsampleModule(self.hidden) for _ in range(n)]
            self.up_c1 = [UpsampleModule(self.hidden) for _ in range(n)]
            self.up_h2 = [UpsampleModule(self.hidden) for _ in range(n)]
            self.up_c2 = [UpsampleModule(self.hidden) for _ in range(n)]
            self.up_h3 = [UpsampleModule(self.out_ch) for _ in range(n)]
            self.up_c3 = [UpsampleModule(self.out_ch) for _ in range(n)]

    def init_states(self, batch: int, h: int, w: int, dtype=jnp.float32):
        def z(c):
            return jnp.zeros((batch, c, h, w), dtype)
        return ((z(self.hidden), z(self.hidden)),
                (z(self.hidden), z(self.hidden)),
                (z(self.out_ch), z(self.out_ch)))

    def __call__(self, subband, states):
        return self.step(subband, states, upsample_level=None)

    def step(self, subband, states, upsample_level: Optional[int] = None):
        """Feed one (reconstructed) subband; optionally upsample states.

        upsample_level: static int i selecting up_*[i] when the coding
        order crosses from level i+1 to level i (i.e. after 'hh' of a
        level > 0; ref: long_context.py:199-213 forward_one_subband).
        Returns (context, new_states).
        """
        (h1, c1), (h2, c2), (h3, c3) = states
        h1, c1 = self.lstm1(subband, h1, c1)
        h2, c2 = self.lstm2(h1, h2, c2)
        h3, c3 = self.lstm3(h2, h3, c3)
        if upsample_level is not None:
            i = upsample_level
            h1, c1 = self.up_h1[i](h1), self.up_c1[i](c1)
            h2, c2 = self.up_h2[i](h2), self.up_c2[i](c2)
            h3, c3 = self.up_h3[i](h3), self.up_c3[i](c3)
        return h3, ((h1, c1), (h2, c2), (h3, c3))


# --------------------------------------------------------------------------
# Autoregressive (PixelCNN) parameter predictor for the LL subband
# --------------------------------------------------------------------------

# Kernel size of every causal (masked) conv in the AR stack. The host
# wavefront decoder (codec/image_codec.ar_wavefronts) derives its
# anti-diagonal slope t = 2*row + col from this: a causal 3x3 conv can
# reach at most ONE column to the right per row up. A larger masked
# kernel would widen the dependency cone and silently desync the range
# coder — the codec asserts on this constant before taking the
# wavefront path, so the two must change in lockstep.
AR_MASKED_KERNEL = 3


class MaskResidual(nn.Module):
    """Two B-masked 3x3 convs with LeakyReLU(0.2) and a residual.

    ref: pMCTF/layers/context_fusion.py:8-39.
    """

    channels: int

    @nn.compact
    def __call__(self, x):
        y = MaskedConv2d(self.channels, self.channels, AR_MASKED_KERNEL, "B",
                         name="conv1")(x)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = MaskedConv2d(self.channels, self.channels, AR_MASKED_KERNEL, "B",
                         name="conv2")(y)
        return y + x


class ContextFusionSubband(nn.Module):
    """Masked-conv AR entropy parameter predictor (scales, means).

    ref: pMCTF/layers/context_fusion.py:56-128. The full network is
    strictly causal w.r.t. its input (A-mask first, B-masks after), so:
    - training/encode: one vectorized pass, teacher-forced;
    - decode: re-running the vectorized pass on a partial reconstruction
      yields exact parameters at the first not-yet-decoded pixel.
    """

    in_ch: int = 1
    ctx_ch: int = 1
    features: int = 128
    num_params: int = 2
    residual_blocks: int = 2
    use_context: bool = False
    lower_subband: bool = True

    def setup(self):
        self.masked_conv1 = MaskedConv2d(self.in_ch, self.features,
                                         AR_MASKED_KERNEL, "A")
        self.res_blocks = [MaskResidual(self.features)
                           for _ in range(self.residual_blocks)]
        self.masked_conv2 = MaskedConv2d(self.features, self.features,
                                         AR_MASKED_KERNEL, "B")
        self.head = [Conv2d(self.features, self.features, 1),
                     Conv2d(self.features, self.features, 1),
                     Conv2d(self.features, self.num_params, 1)]
        if self.use_context:
            self.conv1_context = Conv2d(self.ctx_ch, self.features, 3)
            if self.ctx_ch > 1 and self.lower_subband:
                self.lower_conv = Conv2d(self.in_ch, self.in_ch, 3)
            self.res_blocks_ctx = [ContextResidual(self.features)
                                   for _ in range(self.residual_blocks)]

    def __call__(self, x, context=None, prev_subband=None):
        y = self.masked_conv1(x)
        conv1 = y
        if self.use_context:
            if prev_subband is not None:
                prev = self.lower_conv(nearest_upsample(prev_subband))
                context = jnp.concatenate([context, prev], axis=1)
            context = self.conv1_context(context)
            y = y + context
        for i in range(self.residual_blocks):
            y = self.res_blocks[i](y)
            if self.use_context:
                context = self.res_blocks_ctx[i](context)
                y = y + context
        y = y + conv1
        y = self.masked_conv2(y)
        y = nn.leaky_relu(y, negative_slope=0.2)
        for i, conv in enumerate(self.head):
            y = conv(y)
            if i < len(self.head) - 1:
                y = nn.leaky_relu(y, negative_slope=0.2)
        # entropy params leave at f32 regardless of the activation policy
        # (bf16 ulp would coarsen means/scales -> symbol granularity)
        return y.astype(jnp.float32)  # (B, num_params, H, W) -> scales, means


# --------------------------------------------------------------------------
# Four-step checkerboard prior (parallel-friendly)
# --------------------------------------------------------------------------

def process_with_mask(y, scales, means, mask, training: bool, lossy: bool = True):
    """Quantize the masked positions around their predicted means.

    ref: pMCTF/layers/context_fusion_4step.py:127-137.
    """
    if not lossy:
        means = ste_round(means)
    scales_hat = scales * mask
    means_hat = means * mask
    y_res = (y - means_hat) * mask
    y_q = ste_round(y_res) if training else jnp.round(y_res)
    y_hat = y_q + means_hat
    return y_res, y_q, y_hat, scales_hat


class ContextFusionFourStep(nn.Module):
    """DCVC-DC style 4-pass spatial prior for wavelet subbands.

    ref: pMCTF/layers/context_fusion_4step.py:23-249. Each pass codes one
    2x2 checkerboard phase; the spatial prior nets condition on the
    reconstruction so far plus the (LSTM + lower-level subband) context.
    """

    in_ch: int = 1
    ctx_ch: int = 1
    features: int = 128
    num_params: int = 2
    use_ctx: bool = True
    lossy: bool = True
    lower_subband: bool = True

    def setup(self):
        if self.use_ctx:
            self.conv1_context = Conv2d(self.ctx_ch, self.features, 3)
            self.hier_enc = [ContextResidual(self.features),
                             ContextResidual(self.features)]
            if self.ctx_ch > 1 and self.lower_subband:
                self.lower_conv = Conv2d(self.in_ch, self.in_ch, 3)
            hier_in = self.features
        else:
            hier_in = self.in_ch
        self.hier_out = DepthConvBlock(hier_in, self.num_params)

        self.spatial_in = [
            nn.Sequential([Conv2d(self.in_ch, self.features, 3),
                           ContextResidual(self.features)])
            for _ in range(3)
        ]
        self.spatial_out = [
            nn.Sequential([ContextResidual(self.features),
                           ContextResidual(self.features),
                           Conv2d(self.features, self.num_params, 1)])
            for _ in range(3)
        ]

    # -- jittable sub-graphs ------------------------------------------------

    def hier_params(self, context=None, prev_subband=None, like=None):
        """Context features + step-0 (scales, means).

        `like` supplies the target shape when use_ctx is False.
        Returns (ctx_feat_or_None, scales_0, means_0).
        """
        if self.use_ctx:
            if prev_subband is not None:
                prev = self.lower_conv(nearest_upsample(prev_subband))
                context = jnp.concatenate([context, prev], axis=1)
            feat = self.conv1_context(context)
            for blk in self.hier_enc:
                feat = blk(feat)
            params = self.hier_out(feat)
        else:
            feat = None
            params = self.hier_out(jnp.zeros_like(like))
        # f32 heads: see ContextFusionSubband.__call__
        scales, means = jnp.split(params.astype(jnp.float32), 2, axis=1)
        return feat, scales, means

    def spatial_params(self, x_hat_so_far, ctx_feat, step: int):
        """(scales, means) for pass `step+1` given the recon so far."""
        y = self.spatial_in[step](x_hat_so_far)
        if ctx_feat is not None:
            y = y + ctx_feat
        params = self.spatial_out[step](y)
        scales, means = jnp.split(params.astype(jnp.float32), 2, axis=1)
        return scales, means

    # -- full passes ----------------------------------------------------------

    def __call__(self, x, context=None, prev_subband=None, write: bool = False,
                 training: bool = True):
        ctx_feat, scales, means = self.hier_params(context, prev_subband, like=x)
        _, _, h, w = x.shape
        masks = checkerboard_masks(h, w, x.dtype)

        x_res_l, x_q_l, s_hat_l = [], [], []
        x_hat_so_far = jnp.zeros_like(x)
        for step in range(4):
            x_res, x_q, x_hat, s_hat = process_with_mask(
                x, scales, means, masks[step], training, self.lossy)
            x_res_l.append(x_res)
            x_q_l.append(x_q)
            s_hat_l.append(s_hat)
            x_hat_so_far = x_hat_so_far + x_hat
            if step < 3:
                scales, means = self.spatial_params(x_hat_so_far, ctx_feat, step)

        if write:
            return tuple(x_q_l) + tuple(s_hat_l) + (x_hat_so_far,)
        x_res = sum(x_res_l)
        x_q = sum(x_q_l)
        s_hat = sum(s_hat_l)
        return x_res, x_q, x_hat_so_far, s_hat

    def compress(self, x, context=None, prev_subband=None):
        return self(x, context, prev_subband, write=True, training=False)
