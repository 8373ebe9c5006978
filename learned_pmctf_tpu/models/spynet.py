"""SpyNet coarse-to-fine optical flow estimator.

ref: pMCTF/layers/video/video_net.py:74-121. Six pyramid levels; at each
level a 5-conv 7x7 CNN predicts a residual flow on top of the 2x-upsampled
coarser flow applied to the warped reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.resample import avg_pool2, bilinear_upsample
from ..ops.warp import flow_warp, flow_warp_fast
from .layers import Conv2d


class MEBasic(nn.Module):
    """One pyramid-level flow refiner: 8 -> 32 -> 64 -> 32 -> 16 -> 2.

    The 7x7 convs run at ~40 TFLOP/s at these widths; executing the whole
    stack in fold2 space (4x channels at half res, 5x5 folded kernels)
    measured ~2x faster (see ops.fold)."""

    in_ch: int = 8

    @nn.compact
    def __call__(self, x):
        from ..ops.fold import fold2, unfold2, foldable
        fold = foldable(x)
        if fold:
            x = fold2(x)
        x = nn.relu(Conv2d(self.in_ch, 32, 7, name="conv1")(x, folded=fold))
        x = nn.relu(Conv2d(32, 64, 7, name="conv2")(x, folded=fold))
        x = nn.relu(Conv2d(64, 32, 7, name="conv3")(x, folded=fold))
        x = nn.relu(Conv2d(32, 16, 7, name="conv4")(x, folded=fold))
        y = Conv2d(16, 2, 7, name="conv5")(x, folded=fold)
        if fold:
            y = unfold2(y)
        return y.astype(jnp.float32)  # net boundary: policy-safe dtype


class MESpynet(nn.Module):
    """Pyramid flow estimation between im1 (current) and im2 (reference).

    luma_mode (TPU-first redesign): the video coder estimates motion on a
    luma plane tiled to 3 identical channels (ref: pMCTF_L.py:247-253, for
    RGB-pretrained SpyNet compatibility). With luma_mode=True the net runs
    on 1-channel inputs (MEBasic in_ch=4) — mathematically identical to the
    tiled network when conv1's per-RGB weight slices are summed (see
    utils.torch_import.load_spynet_torch(luma_mode=True)), and it cuts the
    warp gathers (the TPU hot spot) and first-conv FLOPs by 3x.
    """

    levels: int = 6
    luma_mode: bool = False
    # fast_warp: use the gather-free separable warp inside the pyramid.
    # The pyramid warps only feed the flow refiner (estimation, not
    # reconstruction), so streams stay decodable either way, but the
    # reference warps with exact bilinear at every level
    # (pMCTF/layers/video/video_net.py:99-121) and real content at frame
    # distance 8-16 exceeds the fast warp's ±fast_warp_disp clamp —
    # default False (reference semantics); PMCTF wires this to its
    # warp_mode so 'fast' opts the whole codec in coherently.
    fast_warp: bool = False
    fast_warp_disp: int = 32

    def setup(self):
        in_ch = 4 if self.luma_mode else 8
        self.basic = [MEBasic(in_ch=in_ch) for _ in range(self.levels)]

    def _warp(self, im, flow):
        if self.fast_warp:
            return flow_warp_fast(im, flow, self.fast_warp_disp)
        return flow_warp(im, flow)

    def __call__(self, im1, im2):
        im1_list = [im1]
        im2_list = [im2]
        for _ in range(self.levels - 1):
            im1_list.append(avg_pool2(im1_list[-1]))
            im2_list.append(avg_pool2(im2_list[-1]))

        b, _, h_c, w_c = im1_list[-1].shape
        flow = jnp.zeros((b, 2, h_c // 2, w_c // 2), im1.dtype)
        for level in range(self.levels):
            flow_up = bilinear_upsample(flow) * 2.0
            idx = self.levels - 1 - level
            inp = jnp.concatenate(
                [im1_list[idx], self._warp(im2_list[idx], flow_up), flow_up],
                axis=1)
            flow = flow_up + self.basic[level](inp)
        return flow
