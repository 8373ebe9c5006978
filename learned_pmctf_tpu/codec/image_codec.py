"""Host bitstream codec for the pWave image coder.

Orchestrates jitted device sub-graphs with host-side rANS:

- compress: ONE device program computes every symbol/index plane for the
  whole image (teacher-forced; strictly-causal models make this exact);
  the host then streams them to the rANS encoder while the device is free
  (ref redesign of pMCTF/models/pWave.py:381-463 — the reference loops
  per subband and per pixel on the GPU side).
- decompress: four-step subbands need 4 rANS round trips each; between
  them small jitted parameter sub-graphs run on device. The AR LL mode
  decodes by anti-diagonal wavefronts (~2H+W round trips instead of the
  reference's per-pixel H*W; ref: pWave.py:557-584, see ar_wavefronts).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy.coder import (
    EntropyCoder,
    GaussianEncoder,
    build_indexes_from_scales,
)
from ..models.context import AR_MASKED_KERNEL, ContextFusionFourStep
from ..models.layers import f32_streams
from ..models.pwave import PWave, BANDS
from ..utils.stream import encode_image, decode_image

PHASES = ((0, 0), (0, 1), (1, 0), (1, 1))


def ar_wavefronts(h: int, w: int):
    """Anti-diagonal wavefronts t = 2*row + col for the AR LL model.

    The masked-conv stack's dependency cone is (row, col) <- {(row, <col),
    (row-k, <= col+k)}: each causal 3x3 layer crossing a row up can shift
    at most one column right. Every pixel on wavefront t therefore depends
    only on pixels with t' < t, so a whole wavefront is decodable from one
    parameter-plane evaluation + ONE rANS call — ~2H+W host round trips
    instead of H*W (e.g. 264 vs 8640 for the 1080p LL band).

    Returns a list of (rows, cols) index arrays, one per non-empty front,
    ordered by t then by row. TPU-first redesign of the reference's
    per-pixel loop (ref: pMCTF/models/pWave.py:557-584).
    """
    fronts = []
    for t in range(2 * (h - 1) + w):
        rows = []
        cols = []
        for r in range(min(h - 1, t // 2), -1, -1):
            c = t - 2 * r
            if 0 <= c < w:
                rows.append(r)
                cols.append(c)
        if rows:
            order = np.argsort(rows)
            fronts.append((np.asarray(rows)[order], np.asarray(cols)[order]))
    return fronts


class PWaveCodec:
    """Host wrapper: (module, params) -> real bitstreams and back."""

    def __init__(self, module: PWave, params, ec_thread: bool = True,
                 stream_part: int = 2):
        self.module = module
        self.params = params
        self.coder = EntropyCoder(ec_thread, stream_part)
        self.em = GaussianEncoder("laplace")
        self.em.update(force=True, entropy_coder=self.coder)
        self._jits: Dict = {}

        # standalone fusion-module defs so decode sub-graphs are jitted
        # once per VARIANT (ll / top-level / lower-level) and shared
        # across all (lvl, band) positions — params passed as arguments.
        common = dict(in_ch=1, num_params=2, lossy=module.lossy)
        self._fusion_defs = {
            "ll": ContextFusionFourStep(ctx_ch=1, use_ctx=False,
                                        features=module.ar_features, **common),
            "top": ContextFusionFourStep(ctx_ch=1, use_ctx=True,
                                         features=module.features, **common),
            "low": ContextFusionFourStep(ctx_ch=2, use_ctx=True,
                                         features=module.features, **common),
        }

    def _fusion_variant(self, key: str) -> str:
        if key == "ll":
            return "ll"
        lvl = int(key.split("_")[0])
        return "top" if lvl == self.module.decomp_levels - 1 else "low"

    def _fusion_params(self, key: str):
        return {"params": self.params["params"][f"context_fusion_{key}"]}

    # ---- jit cache ----------------------------------------------------------

    def _jit(self, key, fn, **jit_kwargs):
        if key not in self._jits:
            self._jits[key] = jax.jit(fn, **jit_kwargs)
        return self._jits[key]

    def update(self, force: bool = False):
        self.em.update(force=force, entropy_coder=self.coder)

    # ---- compression ---------------------------------------------------------

    @f32_streams
    def compress(self, x, q_index: int, qp_scale=None,
                 file_name: Optional[str] = None, sideinfo=None):
        """Encode padded planes x (B,1,H,W); returns encoder-side recon.

        sideinfo = (batch, num_channels, true_height, true_width) for the
        container header (ref: pWave.py:381-459)."""
        qp = None if qp_scale is None else jnp.float32(qp_scale)
        if qp is None:
            fn = self._jit(
                "encode_planes",
                lambda p, x, q: self.module.apply(
                    p, x, q, method=PWave.encode_planes))
            plan, x_hat = fn(self.params, x, jnp.float32(q_index))
        else:
            fn = self._jit(
                "encode_planes_qp",
                lambda p, x, q, qs: self.module.apply(
                    p, x, q, qs, method=PWave.encode_planes))
            plan, x_hat = fn(self.params, x, jnp.float32(q_index), qp)

        self.coder.reset()
        for entry in plan:
            if isinstance(entry["symbols"], (tuple, list)):  # four-step
                for k in range(4):
                    self.coder.encode_with_indexes(
                        np.asarray(entry["symbols"][k]).reshape(-1),
                        np.asarray(entry["indexes"][k]).reshape(-1),
                        self.em._cdf, self.em._cdf_length, self.em._offset)
            else:  # AR: reorder the pixel-major plane to wavefront order.
                # the t = 2r + c slope of ar_wavefronts is only causal for
                # 3x3 masked kernels — fail loudly rather than desync
                assert AR_MASKED_KERNEL == 3, AR_MASKED_KERNEL
                # One encode call PER FRONT, mirroring _decode_ar_ll's call
                # granularity: the multi-substream splitter partitions each
                # call's symbols across parts (csrc/rans_lib.cpp MultiEncoder
                # ::encode), so per-stream contents only match when encoder
                # and decoder chunk the symbol sequence identically.
                syms = np.asarray(entry["symbols"])  # (H, W, B, C)
                idxs = np.asarray(entry["indexes"])
                hh, ww, b, c = syms.shape
                bc = b * c
                flat_s = syms.reshape(hh * ww, bc)
                flat_i = idxs.reshape(hh * ww, bc)
                for rows, cols in ar_wavefronts(hh, ww):
                    f = rows * ww + cols
                    self.coder.encode_with_indexes(
                        flat_s[f].reshape(-1), flat_i[f].reshape(-1),
                        self.em._cdf, self.em._cdf_length, self.em._offset)
        self.coder.flush()
        bit_stream = self.coder.get_encoded_stream()
        if file_name is not None:
            _, num_channels, height, width = sideinfo
            encode_image(height, width, num_channels, bit_stream, file_name)
        return x_hat, bit_stream

    # ---- decompression -------------------------------------------------------

    def _decode_fourstep(self, key: str, shape, context, prev_subband,
                         q_index, qp_scale):
        """Decode one four-step subband; returns the quantized subband.

        Host round-trip budget per subband: 5 device programs + 4 rANS
        calls + 4 index readbacks (the sequential minimum — each pass's
        symbols are needed before the next pass's parameters exist;
        ref: context_fusion_4step.py:196-249 has the same 4-call floor).
        The scatter of pass k, the spatial-prior net of pass k and the
        index extraction of pass k+1 are fused into ONE program so the
        critical path between rANS calls is a single dispatch.
        """
        variant = self._fusion_variant(key)
        fdef = self._fusion_defs[variant]
        fparams = self._fusion_params(key)

        def _extract(scales, k):
            return build_indexes_from_scales(
                scales[:, :, PHASES[k][0]::2, PHASES[k][1]::2])

        def _scatter(xh, vals, m, k):
            return xh.at[:, :, PHASES[k][0]::2, PHASES[k][1]::2].set(
                vals + m[:, :, PHASES[k][0]::2, PHASES[k][1]::2])

        # head: context features + pass-0 params + pass-0 rANS indexes
        def head_fn(p, ctx, prev, like):
            ctx_feat, scales, means = fdef.apply(
                p, ctx, prev, like=like,
                method=ContextFusionFourStep.hier_params)
            return ctx_feat, _extract(scales, 0), means

        head = self._jit(
            ("fs_head", variant, prev_subband is None, context is None),
            head_fn)
        like = jnp.zeros(shape, jnp.float32)
        ctx_feat, idx, means = head(fparams, context, prev_subband, like)

        # body k (k=0..2): scatter pass-k symbols, run spatial prior k,
        # extract pass-(k+1) indexes — one fused program
        def body_fn(p, xh, v, m, cf, k):
            xh = _scatter(xh, v, m, k)
            scales, means2 = fdef.apply(
                p, xh, cf, k, method=ContextFusionFourStep.spatial_params)
            return xh, _extract(scales, k + 1), means2

        tail = self._jit("fs_tail", lambda xh, v, m: _scatter(xh, v, m, 3))

        x_hat = jnp.zeros(shape, jnp.float32)
        for step in range(4):
            vals = self.coder.decode_stream(
                np.asarray(idx), self.em._cdf, self.em._cdf_length,
                self.em._offset)
            vals = jnp.asarray(vals.reshape(idx.shape), jnp.float32)
            if step < 3:
                body = self._jit(
                    ("fs_body", variant, step, ctx_feat is None),
                    lambda p, xh, v, m, cf, s=step: body_fn(p, xh, v, m, cf, s))
                x_hat, idx, means = body(fparams, x_hat, vals, means, ctx_feat)
            else:
                x_hat = tail(x_hat, vals, means)
        return x_hat

    def _decode_ar_ll(self, shape):
        """Wavefront AR decode: one full-plane parameter evaluation + ONE
        rANS call per anti-diagonal front (see ar_wavefronts). Bit-exact
        vs the teacher-forced encoder: the net runs at the SAME full-plane
        shape both sides, and every pixel of front t depends only on
        pixels of earlier fronts (already decoded)."""
        # see the matching assert in compress(): slope assumes 3x3 kernels
        assert AR_MASKED_KERNEL == 3, AR_MASKED_KERNEL
        b, c, h, w = shape

        # Both planes are integer-valued (indexes and ROUNDED means), so
        # they stack into one int32 array — ONE host readback per front
        # instead of two (each readback is a full sync through the tunnel).
        plane_fn = self._jit(
            "ar_plane",
            lambda p, partial: (
                lambda sm: jnp.stack([
                    build_indexes_from_scales(sm[0]),
                    jnp.round(sm[1]).astype(jnp.int32)]))(
                self.module.apply(p, partial, method=PWave.ar_params)))

        partial = np.zeros(shape, np.float32)
        for rows, cols in ar_wavefronts(h, w):
            both = np.asarray(plane_fn(self.params, jnp.asarray(partial)))
            idx_plane = both[0]                 # one host readback per front
            rmeans = both[1].astype(np.float32)
            # (n, b, c): front positions major, batch*channel minor —
            # matches the encoder's per-front symbol order
            idx = idx_plane[:, :, rows, cols].transpose(2, 0, 1)
            vals = self.coder.decode_stream(
                idx.reshape(-1), self.em._cdf, self.em._cdf_length,
                self.em._offset)
            vals = vals.reshape(idx.shape).astype(np.float32)
            partial[:, :, rows, cols] = (
                vals + rmeans[:, :, rows, cols].transpose(2, 0, 1)
            ).transpose(1, 2, 0)
        return jnp.asarray(partial)

    @f32_streams
    def decompress(self, file_name: Optional[str] = None, stream: bytes = None,
                   shape=None, padding: int = 128, q_index: int = 0,
                   qp_scale=None):
        """Decode a bitstream back to planes. ref: pWave.py:467-529."""
        if file_name is not None:
            height, width, num_channels, stream = decode_image(file_name)
        else:
            height, width, num_channels = shape
        self.coder.set_stream(stream)

        p = padding
        new_h = (height + p - 1) // p * p
        new_w = (width + p - 1) // p * p
        L = self.module.decomp_levels
        batch = num_channels

        subbands_hat = {lvl: {} for lvl in range(L)}
        sub_h = new_h // (2 ** L)
        sub_w = new_w // (2 ** L)
        ll_shape = (batch, 1, sub_h, sub_w)

        if self.module.ll_mode == "ar":
            ll_hat = self._decode_ar_ll(ll_shape)
        else:
            ll_hat = self._decode_fourstep("ll", ll_shape, None, None,
                                           q_index, qp_scale)
        subbands_hat[L - 1]["ll"] = ll_hat

        ctx_init = self._jit(
            "ctx_init", lambda p, like: self.module.apply(
                p, like, method=PWave.ctx_init))
        states = ctx_init(self.params, ll_hat)

        step_fns = {}

        def ctx_step(subband, states, up):
            key = ("ctx_step", up, subband.shape)
            if key not in step_fns:
                step_fns[key] = self._jit(
                    key, lambda p, sb, st, u=up: self.module.apply(
                        p, sb, st, u, method=PWave.ctx_step))
            return step_fns[key](self.params, subband, states)

        context, states = ctx_step(ll_hat, states, None)

        for lvl in range(L - 1, -1, -1):
            sh = new_h // (2 ** (lvl + 1))
            sw = new_w // (2 ** (lvl + 1))
            for sidx, band in enumerate(BANDS):
                ctx = jnp.split(context, 3, axis=1)[sidx]
                prev = subbands_hat[lvl + 1][band] if lvl < L - 1 else None
                s_hat = self._decode_fourstep(
                    f"{lvl}_{band}", (batch, 1, sh, sw), ctx, prev,
                    q_index, qp_scale)
                subbands_hat[lvl][band] = s_hat
                up = lvl - 1 if (band == "hh" and lvl > 0) else None
                context, states = ctx_step(s_hat, states, up)

        qp = None if qp_scale is None else jnp.float32(qp_scale)
        if qp is None:
            recon = self._jit(
                ("reconstruct", L),
                lambda p, sb, q: self.module.apply(
                    p, sb, q, method=PWave.reconstruct))
            x_hat = recon(self.params, subbands_hat, jnp.float32(q_index))
        else:
            recon = self._jit(
                ("reconstruct_qp", L),
                lambda p, sb, q, qs: self.module.apply(
                    p, sb, q, qs, method=PWave.reconstruct))
            x_hat = recon(self.params, subbands_hat, jnp.float32(q_index), qp)
        return {"x_hat": x_hat}
