"""Neural layer library (flax.linen, NCHW layout).

TPU-native equivalents of the reference's conv primitives and blocks:
ref: pMCTF/layers/layers.py (MaskedConv2d), pMCTF/layers/convs.py
(get_conv2d fixed-init lifting skips), pMCTF/layers/lifting_1d.py:25-49
(PredictUpdate), pMCTF/layers/video/layers.py (DepthConv/ConvFFN/
residual blocks / subpel convs), pMCTF/layers/postprocessing.py (ResBlock).

All convs run through one lax.conv_general_dilated wrapper with
('NCHW','OIHW','NCHW') dimension numbers; XLA picks TPU-friendly layouts
and fuses the elementwise tails. Weight init is truncated normal
(std 0.02), bias zero — matching the reference's _init_weights
(ref: pMCTF/models/pWave.py:89-97).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.masks import causal_conv_mask
from ..ops.fold import fold_weights_by_mode

_default_kernel_init = nn.initializers.truncated_normal(stddev=0.02)

# ---------------------------------------------------------------------------
# Conv compute precision policy.
#
# When set to jnp.bfloat16, every Conv2d casts inputs+kernels to bf16,
# accumulates in f32 on the MXU, and returns the result IN bf16 — the
# activations stay bf16 between convs, halving the HBM traffic of the
# full-resolution stacks (the compute was already bf16 on the MXU by
# default precision; keeping f32 activations is what made earlier bf16
# experiments a wash). The self-contained nets (PredictUpdate,
# PostProcess, SpyNet's MEBasic) cast back to f32 at their return, so
# enabling the policy never changes public output dtypes or coarsens
# entropy-model means/scales; any NEW net traced under the policy must
# do the same at its boundary. Default None = full f32.
#
# The policy is for training/estimate/bench graphs ONLY. Real-bitstream
# codec paths force f32 (see force_f32_activations below): boundary casts
# make outputs f32-typed but cannot make bf16 programs bit-deterministic
# across different program partitions, which the range coder requires
# (SURVEY.md §7.3).
# ---------------------------------------------------------------------------

import contextlib
import functools

_CONV_COMPUTE_DTYPE = [None]

# Trace-time override: real-bitstream codec paths force f32 regardless of
# the module's act_bf16 flag. bf16 results are PROGRAM-STRUCTURE-dependent
# (XLA keeps excess f32 precision inside fusions and rounds only at fusion
# boundaries, so the encoder's fused program and the decoder's standalone
# sub-graphs round at different points) — a bf16 symbol chain can therefore
# never be bit-deterministic between encode and decode, and with DPB
# feedback even a 1-ulp recon slip desyncs the range coder on the next
# frame. act_bf16 stays a training/estimate/bench policy; streams are f32.
_FORCE_F32 = [False]


@contextlib.contextmanager
def conv_compute_dtype(dtype):
    """Context manager: trace conv-heavy graphs at the given MXU dtype."""
    _CONV_COMPUTE_DTYPE.append(dtype)
    try:
        yield
    finally:
        _CONV_COMPUTE_DTYPE.pop()


@contextlib.contextmanager
def force_f32_activations():
    """Disable the bf16 activation policy for graphs traced in this scope
    (see _FORCE_F32 above — bit-determinism requirement of stream paths)."""
    _FORCE_F32.append(True)
    try:
        yield
    finally:
        _FORCE_F32.pop()


def f32_streams(fn):
    """Method decorator for codec entry points that touch real bitstreams:
    every device program traced inside runs the full-f32 activation path."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with force_f32_activations():
            return fn(*args, **kwargs)
    return wrapped


def current_conv_dtype():
    return _CONV_COMPUTE_DTYPE[-1]


def policy_scope(fn):
    """Method decorator: trace under the module's activation policy.

    Modules with `act_bf16 = True` (PWave/PMCTF) get their jittable
    entry points traced with bf16 conv activations (measured -12% on the
    1080p luma pair-coding). Numerically safe for training/estimation:
    the lifting skip convs are policy_exempt (full-magnitude signal stays
    f32) and every latent/parameter head casts back to f32. Real-stream
    codec paths override the flag via force_f32_activations — bf16 is
    not bit-deterministic across program partitions."""
    @functools.wraps(fn)
    def wrapped(self, *args, **kwargs):
        if getattr(self, "act_bf16", False) and not _FORCE_F32[-1]:
            with conv_compute_dtype(jnp.bfloat16):
                return fn(self, *args, **kwargs)
        return fn(self, *args, **kwargs)
    return wrapped


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def conv2d_nchw(x, w, stride=1, padding="SAME", groups=1, exempt=False):
    """Plain NCHW conv with OIHW weights (honors the compute-dtype policy).

    exempt=True bypasses the policy — used by the lifting skip taps,
    which carry the full-magnitude signal and must stay f32 (bf16 ulp at
    |x|~255 is ~1, i.e. a whole pixel step)."""
    s = _pair(stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    cdt = None if exempt else current_conv_dtype()
    if cdt is not None:
        x = x.astype(cdt)
        w = w.astype(cdt)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=s, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if cdt is not None else None,
    )
    return y.astype(cdt) if cdt is not None else y


class Conv2d(nn.Module):
    """2-D convolution on NCHW with optional fixed weight initialization."""

    in_ch: int
    out_ch: int
    kernel: Union[int, Tuple[int, int]] = 3
    stride: int = 1
    padding: Union[str, int, None] = None  # None -> (k-1)//2 "same"
    groups: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    # fixed initial weights (e.g. wavelet lifting taps), shape (O, I/g, kh, kw)
    init_weights: Optional[tuple] = None
    # True: never run under the bf16 compute-dtype policy (full-magnitude
    # signal-path convs, e.g. the lifting skip taps)
    policy_exempt: bool = False

    @nn.compact
    def __call__(self, x, folded=False, pallas=False, pallas_act=None,
                 pallas_res=None):
        """folded: False, or a fold mode (True/"2x2", "w2", "2x2w2")
        — `x` is then a folded-space tensor (4*in_ch channels at
        half resolution); the kernel is folded on the fly (see ops.fold)
        and a folded-space output is returned. Only valid for stride 1,
        groups 1, odd square kernels — the small-channel hot nets
        (PredictUpdate, MEBasic) use this to keep the whole net in folded
        space with one fold/unfold at the boundary.

        pallas: `x` is (N, H, C, W) and the conv runs as the fused Pallas
        kernel (ops/pallas_conv.py) with optional fused activation
        (`pallas_act`) and pre-activation residual add (`pallas_res`).
        Inference-path only (no VJP).
        """
        kh, kw = _pair(self.kernel)
        shape = (self.out_ch, self.in_ch // self.groups, kh, kw)
        if self.init_weights is not None:
            iw = jnp.asarray(self.init_weights, jnp.float32).reshape(shape)
            kinit = lambda key, s, dtype=jnp.float32: iw.astype(dtype)
        else:
            kinit = self.kernel_init or _default_kernel_init
        w = self.param("kernel", kinit, shape)
        if pallas:
            assert (self.stride == 1 and self.groups == 1 and kh == kw == 3
                    and self.padding is None and self.use_bias), self
            from ..ops.pallas_conv import conv3x3_hcw
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            cdt = None if self.policy_exempt else current_conv_dtype()
            if cdt is not None:
                x = x.astype(cdt)
                w = w.astype(cdt)
                if pallas_res is not None:
                    pallas_res = pallas_res.astype(cdt)
            return conv3x3_hcw(x, w, b, act=pallas_act, residual=pallas_res)
        if folded:
            # folded execution always computes 'same' padding — reject any
            # caller that configured explicit padding and would silently
            # get different semantics
            assert (self.stride == 1 and self.groups == 1 and kh == kw
                    and self.padding is None), self
            wf, pad, rep = fold_weights_by_mode(w, folded)
            y = conv2d_nchw(x, wf, 1, pad, 1, exempt=self.policy_exempt)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
                y = y + jnp.repeat(b, rep).reshape(1, -1, 1, 1).astype(y.dtype)
            return y
        pad = self.padding
        if pad is None:
            pad = ((kh - 1) // 2, (kw - 1) // 2)
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        elif isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        y = conv2d_nchw(x, w, self.stride, pad, self.groups,
                        exempt=self.policy_exempt)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.reshape(1, -1, 1, 1).astype(y.dtype)
        return y


class MaskedConv2d(nn.Module):
    """PixelCNN-masked conv (types A/B/C). ref: pMCTF/layers/layers.py:23-51.

    The causal mask is applied to the kernel at call time so gradients see
    the same masked weights.
    """

    in_ch: int
    out_ch: int
    kernel: int = 3
    mask_type: str = "A"

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel)
        w = self.param(
            "kernel", _default_kernel_init,
            (self.out_ch, self.in_ch, kh, kw),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        mask = causal_conv_mask(kh, kw, self.mask_type, self.out_ch, self.in_ch)
        y = conv2d_nchw(x, w * mask, 1, (kh - 1) // 2)
        return y + b.reshape(1, -1, 1, 1)


class PredictUpdate(nn.Module):
    """Small residual CNN used as learned P/U lifting filters.

    ref: pMCTF/layers/lifting_1d.py:25-49 — conv3x3 chain with tanh,
    inner residual connection from conv1, 16 hidden channels.

    16-channel 3x3 convs run at ~4 TFLOP/s on the v5e MXU (lane
    underfill); the whole net therefore executes in fold2 space (64
    channels at half resolution, measured ~1.9x) whenever the input is
    even-sized and folding is enabled (ops.fold.fold_small_convs).
    """

    in_ch: int = 1
    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        from ..ops.fold import fold_by_mode, unfold_by_mode, fold_mode_small
        fold = fold_mode_small(x)
        if fold:
            x = fold_by_mode(x, fold)
        c1 = Conv2d(self.in_ch, self.hidden, 3, name="conv1")(x, folded=fold)
        x = jnp.tanh(c1)
        x = Conv2d(self.hidden, self.hidden, 3, name="conv2")(x, folded=fold)
        x = jnp.tanh(x)
        x = Conv2d(self.hidden, self.hidden, 3, name="conv3")(x, folded=fold)
        x = c1 + x
        y = Conv2d(self.hidden, self.in_ch, 3, name="conv4")(x, folded=fold)
        if fold:
            y = unfold_by_mode(y, fold)
        return y.astype(jnp.float32)  # net boundary: policy-safe dtype


class ResBlock(nn.Module):
    """Residual block with LeakyReLU(0.2). ref: pMCTF/layers/postprocessing.py:6-17."""

    channels: int

    @nn.compact
    def __call__(self, x, folded: bool = False, pallas: bool = False):
        if pallas:
            y = Conv2d(self.channels, self.channels, 3, name="conv1")(
                x, pallas=True, pallas_act="leaky_relu")
            return Conv2d(self.channels, self.channels, 3, name="conv2")(
                y, pallas=True, pallas_res=x)
        y = Conv2d(self.channels, self.channels, 3, name="conv1")(x, folded=folded)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = Conv2d(self.channels, self.channels, 3, name="conv2")(y, folded=folded)
        return x + y


# Same block shape is used for context branches in the fusion models
# (ref: pMCTF/layers/context_fusion.py:42-53).
ContextResidual = ResBlock


def pixel_shuffle(x, r: int):
    """Depth-to-space, torch PixelShuffle semantics (NCHW).

    out[b, c, h*r+i, w*r+j] = in[b, c*r*r + i*r + j, h, w]
    """
    b, c, h, w = x.shape
    oc = c // (r * r)
    x = x.reshape(b, oc, r, r, h, w)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, oc, h * r, w * r)


class SubpelConv(nn.Module):
    """1x1 (or 3x3) conv + pixel shuffle upsampler.

    ref: pMCTF/layers/video/layers.py:27-38.
    """

    in_ch: int
    out_ch: int
    r: int = 2
    kernel: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.in_ch, self.out_ch * self.r ** 2, self.kernel)(x)
        return pixel_shuffle(y, self.r)


class ResidualBlockWithStride(nn.Module):
    """ref: pMCTF/layers/video/layers.py:46-77."""

    in_ch: int
    out_ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.in_ch, self.out_ch, 3, stride=self.stride, name="conv1")(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = Conv2d(self.out_ch, self.out_ch, 3, name="conv2")(y)
        y = nn.leaky_relu(y, negative_slope=0.1)
        if self.stride != 1:
            identity = Conv2d(self.in_ch, self.out_ch, 1, stride=self.stride,
                              name="downsample")(x)
        else:
            identity = x
        return y + identity


class ResidualBlockUpsample(nn.Module):
    """ref: pMCTF/layers/video/layers.py:80-105."""

    in_ch: int
    out_ch: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        y = SubpelConv(self.in_ch, self.out_ch, self.upsample, name="subpel")(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = Conv2d(self.out_ch, self.out_ch, 3, name="conv")(y)
        y = nn.leaky_relu(y, negative_slope=0.1)
        identity = SubpelConv(self.in_ch, self.out_ch, self.upsample, name="upsample")(x)
        return y + identity


class DepthConv(nn.Module):
    """1x1 -> depthwise 3x3 -> 1x1 with residual. ref: video/layers.py:108-136."""

    in_ch: int
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    slope: float = 0.01

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.stride != 1:
            identity = Conv2d(self.in_ch, self.out_ch, 2, stride=2, padding=0,
                              name="adaptor")(x)
        elif self.in_ch != self.out_ch:
            identity = Conv2d(self.in_ch, self.out_ch, 1, name="adaptor")(x)
        y = Conv2d(self.in_ch, self.in_ch, 1, stride=self.stride, name="conv1")(x)
        y = nn.leaky_relu(y, negative_slope=self.slope)
        y = Conv2d(self.in_ch, self.in_ch, self.depth_kernel, groups=self.in_ch,
                   name="depth_conv")(y)
        y = Conv2d(self.in_ch, self.out_ch, 1, name="conv2")(y)
        return y + identity


class ConvFFN(nn.Module):
    """Pointwise FFN with residual. ref: video/layers.py:139-152."""

    in_ch: int
    slope: float = 0.1

    @nn.compact
    def __call__(self, x):
        internal = max(min(self.in_ch * 4, 1024), self.in_ch * 2)
        y = Conv2d(self.in_ch, internal, 1, name="up")(x)
        y = nn.leaky_relu(y, negative_slope=self.slope)
        y = Conv2d(internal, self.in_ch, 1, name="down")(y)
        y = nn.leaky_relu(y, negative_slope=self.slope)
        return x + y


class ConvFFN3(nn.Module):
    """Gated two-branch FFN. ref: video/layers.py:154-168."""

    in_ch: int

    @nn.compact
    def __call__(self, x):
        internal = self.in_ch * 2
        y = Conv2d(self.in_ch, internal * 2, 1, name="conv")(x)
        x1, x2 = jnp.split(y, 2, axis=1)
        y = nn.leaky_relu(x1, negative_slope=0.1) + nn.leaky_relu(x2, negative_slope=0.01)
        return x + Conv2d(internal, self.in_ch, 1, name="conv_out")(y)


class DepthConvBlock(nn.Module):
    """DepthConv + ConvFFN. ref: video/layers.py:171-181."""

    in_ch: int
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = DepthConv(self.in_ch, self.out_ch, self.depth_kernel, self.stride,
                      name="depth")(x)
        return ConvFFN(self.out_ch, name="ffn")(x)


class DepthConvBlock4(nn.Module):
    """DepthConv + ConvFFN3. ref: video/layers.py:184-193."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = DepthConv(self.in_ch, self.out_ch, name="depth")(x)
        return ConvFFN3(self.out_ch, name="ffn")(x)
