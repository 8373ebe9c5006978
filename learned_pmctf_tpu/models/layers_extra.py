"""Auxiliary conv variants from the reference layer library.

These are present-but-unused in the reference's shipped models
(ref: pMCTF/layers/convs.py:10-114 DynamicDWConv/MaskedConv2dDynamicDW,
:141-178 ConditionalConv, :193-250 get_conv3d/MaskedConv3d); provided
here for API completeness of the layer library.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.masks import causal_conv_mask
from .layers import Conv2d, _pair, _default_kernel_init


class DynamicDWConv(nn.Module):
    """Homogeneous dynamic depthwise conv: kernel generated per sample
    from globally pooled features. ref: convs.py:10-61.

    TPU note: implemented as a batched grouped conv via vmap over the
    batch (each sample has its own depthwise kernel).
    """

    dim: int
    kernel_size: int = 3
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        b, c, h, w = x.shape
        red = 1 if self.dim < 4 else self.reduction
        mid = self.dim // red
        k = self.kernel_size

        pooled = jnp.mean(x, axis=(2, 3), keepdims=True)       # (B,C,1,1)
        t = Conv2d(self.dim, mid, 1, use_bias=False, name="reduce")(pooled)
        # reference uses BatchNorm here; with a (B,C,1,1) input this is a
        # per-channel affine at inference — LayerNorm over channels is the
        # jit-friendly stand-in.
        t = nn.LayerNorm(reduction_axes=1, feature_axes=1, name="norm")(t)
        t = nn.relu(t)
        wgen = Conv2d(mid, self.dim * k * k, 1, name="expand")(t)  # (B,C*k*k,1,1)
        kernels = wgen.reshape(b, self.dim, 1, k, k)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))

        def one(xi, ki):
            y = jax.lax.conv_general_dilated(
                xi[None], ki, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=self.dim)
            return y[0]

        y = jax.vmap(one)(x, kernels)
        return y + bias.reshape(1, -1, 1, 1)


class MaskedDynamicDWConv(nn.Module):
    """Causal-masked dynamic depthwise conv. ref: convs.py:64-114."""

    dim: int
    kernel_size: int = 3
    mask_type: str = "A"
    reduction: int = 4

    @nn.compact
    def __call__(self, x):
        b, c, h, w = x.shape
        red = 1 if self.dim < 4 else self.reduction
        mid = self.dim // red
        k = self.kernel_size

        pooled = jnp.mean(x, axis=(2, 3), keepdims=True)
        t = Conv2d(self.dim, mid, 1, use_bias=False, name="reduce")(pooled)
        t = nn.LayerNorm(reduction_axes=1, feature_axes=1, name="norm")(t)
        t = nn.relu(t)
        wgen = Conv2d(mid, self.dim * k * k, 1, name="expand")(t)
        kernels = wgen.reshape(b, self.dim, 1, k, k)
        mask = causal_conv_mask(k, k, self.mask_type, 1, 1)[None]
        kernels = kernels * mask
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))

        def one(xi, ki):
            y = jax.lax.conv_general_dilated(
                xi[None], ki, (1, 1), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                feature_group_count=self.dim)
            return y[0]

        y = jax.vmap(one)(x, kernels)
        return y + bias.reshape(1, -1, 1, 1)


class ConditionalConv(nn.Module):
    """Conv conditioned on a one-hot RD-parameter vector: per-channel
    softplus scaling + bias from two dense layers. ref: convs.py:141-175.
    """

    in_ch: int
    out_ch: int
    kernel: int = 3
    num_lambdas: int = 5
    mask_type: str = ""  # "" = unmasked; "A"/"B" = causal

    @nn.compact
    def __call__(self, x, onehot):
        scaling = nn.softplus(nn.Dense(self.out_ch, name="fc_scaling")(onehot))
        bias = nn.Dense(self.out_ch, name="fc_bias")(onehot)
        if self.mask_type:
            from .layers import MaskedConv2d
            y = MaskedConv2d(self.in_ch, self.out_ch, self.kernel,
                             self.mask_type, name="conv")(x)
        else:
            y = Conv2d(self.in_ch, self.out_ch, self.kernel, use_bias=False,
                       name="conv")(x)
        return scaling[:, :, None, None] * y + bias[:, :, None, None]


class Conv3d(nn.Module):
    """3-D conv on (B, C, D, H, W), optional causal mask over (D, H, W).

    ref: convs.py:193-250 (get_conv3d / MaskedConv3d: D kernel fixed 3,
    center slice gets the 2-D A/B mask, trailing slice zeroed)."""

    in_ch: int
    out_ch: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    groups: int = 1
    mask_type: str = ""  # "" = unmasked

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel
        w = self.param("kernel", _default_kernel_init,
                       (self.out_ch, self.in_ch // self.groups, kd, kh, kw))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        if self.mask_type:
            assert kd == 3
            m2d = causal_conv_mask(kh, kw, self.mask_type,
                                   self.out_ch, self.in_ch // self.groups)
            mask = jnp.stack(
                [jnp.ones_like(m2d), m2d, jnp.zeros_like(m2d)], axis=2)
            w = w * mask
        pad = ((kd - 1) // 2,) * 2, ((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), pad,
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
            feature_group_count=self.groups)
        return y + b.reshape(1, -1, 1, 1, 1)
