"""Post-processing / dequantization enhancement nets.

ref: pMCTF/layers/postprocessing.py:20-71.
"""

import jax.numpy as jnp
import flax.linen as nn

from .layers import Conv2d, ResBlock


class PostProcess(nn.Module):
    """iWave++-style dequant net: 6 res blocks @ 64ch + global skip."""

    in_ch: int = 1
    out_ch: int = 1
    channels: int = 64
    num_res: int = 6

    @nn.compact
    def __call__(self, x):
        # The 64-ch convs fill only half the 128 MXU lanes (~22 TF/s in
        # situ at full res); executing the whole net in fold2 space
        # (256 ch at half res) measured 104 -> 91 ms at 1080p (exact
        # kernel transform; batch<=2 gate as for PredictUpdate).
        #
        # PMCTF_PALLAS_POST=1 routes the stack through the fused Pallas
        # conv kernel instead (ops/pallas_conv.py): native 64-ch FLOPs,
        # channels-in-sublanes layout, bias/LeakyReLU/skip fused.
        # Inference-path only (no VJP).
        import os
        if (os.environ.get("PMCTF_PALLAS_POST", "0") == "1"
                and x.shape[-1] % 128 == 0):
            xin = x
            t = jnp.transpose(x, (0, 2, 1, 3))  # N,C,H,W -> N,H,C,W
            t = Conv2d(self.in_ch, self.channels, 3, name="conv1")(
                t, pallas=True)
            conv1 = t
            for i in range(self.num_res):
                t = ResBlock(self.channels, name=f"res{i}")(t, pallas=True)
            t = Conv2d(self.channels, self.channels, 3, name="conv2")(
                t, pallas=True, pallas_res=conv1)
            t = Conv2d(self.channels, self.out_ch, 3, name="conv3")(
                t, pallas=True)
            t = jnp.transpose(t, (0, 2, 1, 3))
            return xin + t.astype(jnp.float32)
        from ..ops.fold import fold_by_mode, unfold_by_mode, fold_mode_wide
        fold = fold_mode_wide(x)
        xin = x
        if fold:
            x = fold_by_mode(x, fold)
        t = Conv2d(self.in_ch, self.channels, 3, name="conv1")(x, folded=fold)
        conv1 = t
        for i in range(self.num_res):
            t = ResBlock(self.channels, name=f"res{i}")(t, folded=fold)
        t = Conv2d(self.channels, self.channels, 3, name="conv2")(t, folded=fold) + conv1
        t = Conv2d(self.channels, self.out_ch, 3, name="conv3")(t, folded=fold)
        if fold:
            t = unfold_by_mode(t, fold)
        # net boundary: cast so the conv_compute_dtype policy never leaks
        # bf16 activations into the codec's f32 signal path
        return xin + t.astype(jnp.float32)


class PostProcessCtx(nn.Module):
    """Contextual variant conditioning on a feature map (recon generation)."""

    in_ch: int = 1
    out_ch: int = 1
    channels: int = 64
    ctx_ch: int = 64

    @nn.compact
    def __call__(self, x, ctx):
        t = Conv2d(self.in_ch + self.ctx_ch, self.channels, 3, name="conv1")(
            jnp.concatenate([ctx, x], axis=1))
        conv1 = t
        for i in range(6):
            t = ResBlock(self.channels, name=f"res{i}")(t)
        feature = Conv2d(self.channels, self.channels, 3, name="conv2")(t) + conv1
        t = Conv2d(self.channels, self.out_ch, 3, name="conv3")(feature)
        return feature, x + t
