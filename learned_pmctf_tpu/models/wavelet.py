"""Learned wavelet transforms: spatial 2-D lifting and temporal (MCTF) lifting.

ref: pMCTF/layers/lifting_1d.py:52-233 (iWave1D), pMCTF/layers/
wavelet_transform.py:8-57 (LiftingScheme2D), pMCTF/layers/video/
wavelet_transform_temporal_mctf.py:11-45 (TemporalLifting).

Design notes (TPU-first):
- The fixed skip taps are depthwise 3x1 convs expressed as shift-based
  stencils fused by XLA; the learned P/U residual CNNs dominate the cost.
- Rows and columns share one 1-D lifting module (separable default); the
  column pass transposes H/W, which XLA resolves as a layout assignment.
- The reference's scale_l/scale_h and scale_p/scale_u are plain tensors
  that never reach the optimizer (ref: lifting_1d.py:100-101,
  wavelet_transform_temporal_mctf.py:24-25 — requires_grad=True but not
  registered as Parameters); here they are true learnable flax params.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import flax.linen as nn

from ..ops.lifting import (
    CDF97_COEFFS,
    split_even_odd,
    merge_even_odd,
    reflect_pad_rows,
    haar_forward,
    haar_backward,
)
from ..ops.quant import ste_round
from .layers import Conv2d, PredictUpdate


class LearnedLifting1D(nn.Module):
    """Prediction-first learned lifting along rows (iWave1D).

    Four lifting steps; each = fixed-init learnable 3x1 skip conv +
    0.1-scaled learned CNN residual on the (dynamic-range normalized)
    skip output. Lossless mode rounds each lifting increment (STE).
    """

    in_ch: int = 1
    bitdepth: int = 8
    lossy: bool = True

    def setup(self):
        c = CDF97_COEFFS
        self.dynamic_range = float(2 ** self.bitdepth)

        def skip(name, taps):
            # depthwise 3x1 conv, weights initialized to the wavelet taps;
            # policy_exempt: carries the full-magnitude signal -> stays f32
            # even under the bf16 activation policy
            w = [[[[t] for t in taps]]] * self.in_ch  # (C,1,3,1)
            return Conv2d(self.in_ch, self.in_ch, (3, 1), padding=0,
                          groups=self.in_ch, init_weights=tuple(map(tuple, w)),
                          policy_exempt=True, name=name)

        self.conv_p1 = skip("conv_p1", (0.0, c[0], c[0]))
        self.conv_u1 = skip("conv_u1", (c[1], c[1], 0.0))
        self.conv_p2 = skip("conv_p2", (0.0, c[2], c[2]))
        self.conv_u2 = skip("conv_u2", (c[3], c[3], 0.0))

        self.p1 = PredictUpdate(self.in_ch)
        self.u1 = PredictUpdate(self.in_ch)
        self.p2 = PredictUpdate(self.in_ch)
        self.u2 = PredictUpdate(self.in_ch)

        self.scale_l = self.param("scale_l", lambda k: jnp.float32(c[5]))
        self.scale_h = self.param("scale_h", lambda k: jnp.float32(c[4]))

    def __call__(self, x):
        return self.forward_lift(x)

    def _step(self, target, source, skip_conv, pu_net):
        """target += round?(skip(source) + 0.1 * R * PU(skip(source)/R))."""
        skip_path = skip_conv(reflect_pad_rows(source))
        resid = pu_net(skip_path / self.dynamic_range) * self.dynamic_range
        inc = skip_path + resid * 0.1
        if not self.lossy:
            inc = ste_round(inc)
        return target + inc

    def forward_lift(self, x):
        x_e, x_o = split_even_odd(x)
        x_o = self._step(x_o, x_e, self.conv_p1, self.p1)
        x_e = self._step(x_e, x_o, self.conv_u1, self.u1)
        x_o = self._step(x_o, x_e, self.conv_p2, self.p2)
        x_e = self._step(x_e, x_o, self.conv_u2, self.u2)
        if self.lossy:
            x_e = x_e * self.scale_l
            x_o = x_o * self.scale_h
        return x_e, x_o  # (l, h)

    def _unstep(self, target, source, skip_conv, pu_net):
        skip_path = skip_conv(reflect_pad_rows(source))
        resid = pu_net(skip_path / self.dynamic_range) * self.dynamic_range
        inc = skip_path + resid * 0.1
        if not self.lossy:
            inc = ste_round(inc)
        return target - inc

    def backward_lift(self, l, h):
        if self.lossy:
            l = l / self.scale_l
            h = h / self.scale_h
        l = self._unstep(l, h, self.conv_u2, self.u2)
        h = self._unstep(h, l, self.conv_p2, self.p2)
        l = self._unstep(l, h, self.conv_u1, self.u1)
        h = self._unstep(h, l, self.conv_p1, self.p1)
        return merge_even_odd(l, h)


class LiftingScheme2D(nn.Module):
    """Separable 2-D lifting: rows then columns of both branches.

    ref: pMCTF/layers/wavelet_transform.py:8-57. With haar=True the fixed
    Haar lifting is used (correctness oracle / lossless chroma option).
    """

    in_ch: int = 1
    bitdepth: int = 8
    lossy: bool = True
    non_separable: bool = False
    haar: bool = False

    def setup(self):
        if not self.haar:
            self.lift_h = LearnedLifting1D(self.in_ch, self.bitdepth, self.lossy)
            if self.non_separable:
                self.lift_v = LearnedLifting1D(self.in_ch, self.bitdepth, self.lossy)
            else:
                self.lift_v = self.lift_h

    def _fwd1d(self, x, vertical: bool):
        if self.haar:
            return haar_forward(x, self.lossy)
        lift = self.lift_v if vertical else self.lift_h
        return lift.forward_lift(x)

    def _bwd1d(self, l, h, vertical: bool):
        if self.haar:
            return haar_backward(l, h, self.lossy)
        lift = self.lift_v if vertical else self.lift_h
        return lift.backward_lift(l, h)

    def __call__(self, x):
        return self.forward_lift_2d(x)

    def forward_lift_2d(self, x) -> Dict[str, jnp.ndarray]:
        # filter along H ("rows"), then along W after a transpose
        l, h = self._fwd1d(x, vertical=False)

        lt = l.transpose(0, 1, 3, 2)
        ll, lh = self._fwd1d(lt, vertical=True)
        ll = ll.transpose(0, 1, 3, 2)
        lh = lh.transpose(0, 1, 3, 2)

        ht = h.transpose(0, 1, 3, 2)
        hl, hh = self._fwd1d(ht, vertical=True)
        hl = hl.transpose(0, 1, 3, 2)
        hh = hh.transpose(0, 1, 3, 2)

        return {"ll": ll, "lh": lh, "hl": hl, "hh": hh, "l": l, "h": h}

    def backward_lift_2d(self, subbands: Dict[str, jnp.ndarray]):
        ll = subbands["ll"].transpose(0, 1, 3, 2)
        lh = subbands["lh"].transpose(0, 1, 3, 2)
        l = self._bwd1d(ll, lh, vertical=True).transpose(0, 1, 3, 2)

        hl = subbands["hl"].transpose(0, 1, 3, 2)
        hh = subbands["hh"].transpose(0, 1, 3, 2)
        h = self._bwd1d(hl, hh, vertical=True).transpose(0, 1, 3, 2)

        return self._bwd1d(l, h, vertical=False)


class TemporalLifting(nn.Module):
    """Learned temporal predict/update filters for MCTF.

    ref: pMCTF/layers/video/wavelet_transform_temporal_mctf.py:11-45.
    P_t/U_t are PredictUpdate CNNs with 0.1-scaled residuals applied to
    the motion-compensated frames, plus scalar gains 1/sqrt(2) and 0.5.
    """

    in_ch: int = 1
    lossy: bool = True

    def setup(self):
        self.p_t = PredictUpdate(self.in_ch)
        self.u_t = PredictUpdate(self.in_ch)
        self.scale_p = self.param("scale_p", lambda k: jnp.float32(1.0 / math.sqrt(2.0)))
        self.scale_u = self.param("scale_u", lambda k: jnp.float32(0.5))

    def __call__(self, x):
        return self.predict_filter(x)

    def predict_filter(self, x):
        tmp = self.p_t(x) * 0.1
        if not self.lossy:
            tmp = ste_round(tmp)
        x = x + tmp
        if self.lossy:
            x = x * self.scale_p
        return x

    def update_filter(self, x):
        tmp = self.u_t(x) * 0.1
        if not self.lossy:
            tmp = ste_round(tmp)
        x = x + tmp
        if self.lossy:
            x = x * self.scale_u
        return x
