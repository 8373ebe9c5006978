"""Host bitstream codec for the pWave image coder.

Orchestrates jitted device sub-graphs with host-side rANS:

- compress is *decode with teacher-forced symbols*: it replays the exact
  decompress loop — same jitted sub-graph executables, same call order —
  but the per-pass symbol source computes vals = round(y_q - means) from
  the quantized subband (one small device op) instead of pulling them
  from rANS. Because the parameter nets run as the SAME XLA executables
  on both sides, encoder and decoder are bit-identical by construction;
  evaluating them inside a separate fused encode program diverges at the
  ulp level and, at 1080p symbol counts, flips a round()/index somewhere
  and desyncs the range coder (measured: benchmarks/bench_ar.py before
  this design). Unlike decode, encode has no data dependency on rANS, so
  the whole replay chains on-device with ONE bulk readback at the end.
  (ref: pMCTF/models/pWave.py:381-463 — the reference encodes with the
  same torch modules it decodes with; this is the XLA equivalent.)
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


def bulk_fetch_int32(jit, arrays):
    """Fetch many integer-valued device arrays in ONE host round trip.

    Each separate np.asarray(device_array) costs a full tunnel RTT
    (~40-70 ms through the axon relay); a 1080p plane-set's encode plan
    is ~104 arrays, i.e. seconds of pure latency (measured:
    benchmarks/stream_profile_lab.py — compress_luma 10.7 s warm). This
    concatenates everything into one int32 vector on device (values are
    exact integers by construction: rounded symbols, rANS indexes) and
    slices the single readback on host.

    jit: a `_jit(key, fn)`-style cache callable (both codec classes).
    """
    if not arrays:
        return []
    shapes = tuple(tuple(a.shape) for a in arrays)
    fn = jit(("bulk_pack", shapes),
             lambda ts: jnp.concatenate(
                 [jnp.ravel(t).astype(jnp.int32) for t in ts]))
    flat = np.asarray(fn(list(arrays)))
    out, off = [], 0
    for shp in shapes:
        n = int(np.prod(shp))
        out.append(flat[off:off + n].reshape(shp))
        off += n
    return out


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
        self._coder_args = (ec_thread, stream_part)
        self.coder = EntropyCoder(ec_thread, stream_part)
        self.em = GaussianEncoder("laplace")
        self.em.update(force=True, entropy_coder=self.coder)
        self._jits: Dict = {}
        self._jits_lock = __import__("threading").Lock()

        # standalone fusion-module defs so decode sub-graphs are jitted
        # once per VARIANT (ll / top-level / lower-level) and shared
        # across all (lvl, band) positions — params passed as arguments.
        self._zeros_cache: Dict = {}
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
        # lock: concurrent decode workers (see PMCTFCodec decode overlap)
        # may race to populate a key; jax handles concurrent calls of one
        # jitted wrapper, so only the dict insert needs guarding.
        with self._jits_lock:
            if key not in self._jits:
                self._jits[key] = jax.jit(fn, **jit_kwargs)
            return self._jits[key]

    def _zeros(self, shape):
        """Cached device-resident zeros: jnp.zeros outside jit dispatches
        a fill program (~60 ms relay round trip each, dispatch_lab); the
        codec's zero planes are read-only so one per shape suffices."""
        z = self._zeros_cache.get(shape)
        if z is None:
            z = self._jit(("zeros", shape),
                          lambda: jnp.zeros(shape, jnp.float32))()
            self._zeros_cache[shape] = z
        return z

    def make_coder(self) -> EntropyCoder:
        """A fresh EntropyCoder (own native encoder/decoder state) so
        independent streams can be coded concurrently from worker
        threads. CDF tables (self.em) are read-only and shared."""
        return EntropyCoder(*self._coder_args)

    def update(self, force: bool = False):
        self.em.update(force=force, entropy_coder=self.coder)

    # ---- unified subband coding ----------------------------------------------
    #
    # compress and decompress run the SAME jitted executables over the SAME
    # call sequence; the only difference is the symbol source. Decode pulls
    # vals from rANS; encode computes vals = round((teacher - means)[phase])
    # on-device (the exact mirror of the decoder's scatter vals + means) and
    # defers every readback to the streaming pass at the end.

    def _code_fourstep(self, key: str, shape, context, prev_subband,
                       teacher=None, coder=None):
        """Code one four-step subband; returns (subband_hat, plan).

        teacher=None: decode mode — 4 rANS calls + 4 index readbacks (the
        sequential minimum: each pass's symbols are needed before the next
        pass's parameters exist; ref: context_fusion_4step.py:196-249 has
        the same 4-call floor). The scatter of pass k, the spatial-prior
        net of pass k and the index extraction of pass k+1 are fused into
        ONE program so the critical path between rANS calls is a single
        dispatch. plan is None.

        teacher=<quantized subband>: encode mode — the same executables
        replayed with teacher-forced symbols; no host sync at all. plan is
        the list of 4 (vals, idx) device-array pairs in stream order.
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

        # teacher-forced symbols: the mirror of process_with_mask with
        # training=False (context.py:240-252) — round((y - means)[phase]).
        # Computed INSIDE head/body (one output more) instead of as a
        # separate per-step program: each warm dispatch costs ~60 ms of
        # relay round trip (benchmarks/dispatch_lab.py), so the 4 extra
        # programs per subband were ~3 s of a 1080p compress. Decode
        # passes a cached zeros teacher and ignores the output — the
        # executables stay IDENTICAL between encode and decode (the
        # bit-exactness invariant); the teacher only feeds this extra
        # elementwise output, never the scales/means.
        def _vals(t, m, k):
            my, mx = PHASES[k]
            return jnp.round(t[:, :, my::2, mx::2] - m[:, :, my::2, mx::2])

        # head: context features + pass-0 params + pass-0 rANS indexes
        def head_fn(p, ctx, prev, like, t):
            ctx_feat, scales, means = fdef.apply(
                p, ctx, prev, like=like,
                method=ContextFusionFourStep.hier_params)
            return ctx_feat, _extract(scales, 0), means, _vals(t, means, 0)

        head = self._jit(
            ("fs_head2", variant, prev_subband is None, context is None),
            head_fn)
        zeros = self._zeros(shape)
        t_in = zeros if teacher is None else teacher
        ctx_feat, idx, means, tvals = head(
            fparams, context, prev_subband, zeros, t_in)

        # body k (k=0..2): scatter pass-k symbols, run spatial prior k,
        # extract pass-(k+1) indexes (+ teacher symbols) — one program
        def body_fn(p, xh, v, m, cf, t, k):
            xh = _scatter(xh, v, m, k)
            scales, means2 = fdef.apply(
                p, xh, cf, k, method=ContextFusionFourStep.spatial_params)
            return xh, _extract(scales, k + 1), means2, _vals(t, means2, k + 1)

        tail = self._jit("fs_tail", lambda xh, v, m: _scatter(xh, v, m, 3))

        coder = coder or self.coder
        plan = None if teacher is None else []
        x_hat = zeros
        for step in range(4):
            if teacher is None:
                vals = coder.decode_stream(
                    np.asarray(idx), self.em._cdf, self.em._cdf_length,
                    self.em._offset)
                vals = jnp.asarray(vals.reshape(idx.shape), jnp.float32)
            else:
                vals = tvals
                plan.append((vals, idx))
            if step < 3:
                body = self._jit(
                    ("fs_body2", variant, step, ctx_feat is None),
                    lambda p, xh, v, m, cf, t, s=step:
                        body_fn(p, xh, v, m, cf, t, s))
                x_hat, idx, means, tvals = body(
                    fparams, x_hat, vals, means, ctx_feat, t_in)
            else:
                x_hat = tail(x_hat, vals, means)
        return x_hat, plan

    def _ar_plane(self):
        """The ONE executable that computes AR indexes + rounded means.

        Shared verbatim between decode (partial planes, once per
        wavefront) and encode (the full teacher-forced plane, once):
        within one executable, strict causality + exactly-0.0 masked
        weights make the front-t outputs bit-identical between a partial
        plane and the full plane, which is what keeps the range coder in
        sync. Both output planes are integer-valued, so they stack into
        one int32 array — ONE host readback per decode front."""
        return self._jit(
            "ar_plane",
            lambda p, partial: (
                lambda sm: jnp.stack([
                    build_indexes_from_scales(sm[0]),
                    jnp.round(sm[1]).astype(jnp.int32)]))(
                self.module.apply(p, partial, method=PWave.ar_params)))

    def _decode_ar_ll(self, shape, coder=None):
        """Wavefront AR decode: one full-plane parameter evaluation + ONE
        rANS call per anti-diagonal front (see ar_wavefronts)."""
        # the t = 2r + c slope of ar_wavefronts assumes 3x3 masked kernels
        assert AR_MASKED_KERNEL == 3, AR_MASKED_KERNEL
        coder = coder or self.coder
        b, c, h, w = shape
        plane_fn = self._ar_plane()

        partial = np.zeros(shape, np.float32)
        for rows, cols in ar_wavefronts(h, w):
            both = np.asarray(plane_fn(self.params, jnp.asarray(partial)))
            idx_plane = both[0]                 # one host readback per front
            rmeans = both[1].astype(np.float32)
            # (n, b, c): front positions major, batch*channel minor —
            # matches the encoder's per-front symbol order
            idx = idx_plane[:, :, rows, cols].transpose(2, 0, 1)
            vals = coder.decode_stream(
                idx.reshape(-1), self.em._cdf, self.em._cdf_length,
                self.em._offset)
            vals = vals.reshape(idx.shape).astype(np.float32)
            partial[:, :, rows, cols] = (
                vals + rmeans[:, :, rows, cols].transpose(2, 0, 1)
            ).transpose(1, 2, 0)
        return jnp.asarray(partial)

    def _code_planes(self, batch: int, new_h: int, new_w: int, teachers=None,
                     coder=None):
        """The coding-order loop shared by compress and decompress.

        teachers=None decodes from self.coder; teachers=<quantize_planes
        output> replays the same executables teacher-forced and returns
        the stream-order entry list (device arrays only — the caller does
        one bulk readback). Returns (subbands_hat, entries)."""
        L = self.module.decomp_levels
        subbands_hat = {lvl: {} for lvl in range(L)}
        entries = None if teachers is None else []
        ll_shape = (batch, 1, new_h // (2 ** L), new_w // (2 ** L))

        if self.module.ll_mode == "ar":
            if teachers is None:
                ll_hat = self._decode_ar_ll(ll_shape, coder=coder)
            else:
                assert AR_MASKED_KERNEL == 3, AR_MASKED_KERNEL
                ll_int = self._jit("ar_round", jnp.round)(teachers["ll"])
                entries.append(("ar", (ll_int,
                                       self._ar_plane()(self.params, ll_int))))
                ll_hat = ll_int
        else:
            t = None if teachers is None else teachers["ll"]
            ll_hat, plan = self._code_fourstep("ll", ll_shape, None, None, t,
                                               coder=coder)
            if entries is not None:
                entries.append(("fs", plan))
        subbands_hat[L - 1]["ll"] = ll_hat

        ctx_init = self._jit(
            "ctx_init", lambda p, like: self.module.apply(
                p, like, method=PWave.ctx_init))
        states = ctx_init(self.params, ll_hat)

        # the 3-way context split rides inside the ctx_step program (the
        # host-side jnp.split was one more ~60 ms dispatch per subband)
        def ctx_step(subband, states, up):
            def fn(p, sb, st, u=up):
                c, st2 = self.module.apply(p, sb, st, u,
                                           method=PWave.ctx_step)
                return tuple(jnp.split(c, 3, axis=1)), st2
            return self._jit(("ctx_step2", up, subband.shape), fn)(
                self.params, subband, states)

        context, states = ctx_step(ll_hat, states, None)

        for lvl in range(L - 1, -1, -1):
            sh = new_h // (2 ** (lvl + 1))
            sw = new_w // (2 ** (lvl + 1))
            for sidx, band in enumerate(BANDS):
                key = f"{lvl}_{band}"
                ctx = context[sidx]
                prev = subbands_hat[lvl + 1][band] if lvl < L - 1 else None
                t = None if teachers is None else teachers[key]
                s_hat, plan = self._code_fourstep(
                    key, (batch, 1, sh, sw), ctx, prev, t, coder=coder)
                if entries is not None:
                    entries.append(("fs", plan))
                subbands_hat[lvl][band] = s_hat
                up = lvl - 1 if (band == "hh" and lvl > 0) else None
                context, states = ctx_step(s_hat, states, up)
        return subbands_hat, entries

    def _reconstruct(self, subbands_hat, q_index, qp_scale):
        L = self.module.decomp_levels
        qp = None if qp_scale is None else jnp.float32(qp_scale)
        if qp is None:
            recon = self._jit(
                ("reconstruct", L),
                lambda p, sb, q: self.module.apply(
                    p, sb, q, method=PWave.reconstruct))
            return recon(self.params, subbands_hat, jnp.float32(q_index))
        recon = self._jit(
            ("reconstruct_qp", L),
            lambda p, sb, q, qs: self.module.apply(
                p, sb, q, qs, method=PWave.reconstruct))
        return recon(self.params, subbands_hat, jnp.float32(q_index), qp)

    # ---- compression ---------------------------------------------------------

    @f32_streams
    def compress(self, x, q_index: int, qp_scale=None,
                 file_name: Optional[str] = None, sideinfo=None, coder=None):
        """Encode padded planes x (B,1,H,W); returns encoder-side recon.

        sideinfo = (batch, num_channels, true_height, true_width) for the
        container header (ref: pWave.py:381-459). coder: a per-call
        EntropyCoder so independent compresses can run concurrently."""
        qp = None if qp_scale is None else jnp.float32(qp_scale)
        if qp is None:
            fn = self._jit(
                "quantize_planes",
                lambda p, x, q: self.module.apply(
                    p, x, q, method=PWave.quantize_planes))
            planes = fn(self.params, x, jnp.float32(q_index))
        else:
            fn = self._jit(
                "quantize_planes_qp",
                lambda p, x, q, qs: self.module.apply(
                    p, x, q, qs, method=PWave.quantize_planes))
            planes = fn(self.params, x, jnp.float32(q_index), qp)

        b, _, h, w = x.shape
        subbands_hat, entries = self._code_planes(b, h, w, teachers=planes)

        # ONE packed readback for every stream-order payload (see
        # bulk_fetch_int32), then host rANS streaming (device is free)
        order = []
        for kind, payload in entries:
            if kind == "fs":
                for vals, idx in payload:
                    order.extend((vals, idx))
            else:
                ll_int, both = payload
                order.extend((ll_int, both))
        fetched = iter(bulk_fetch_int32(self._jit, order))

        coder = coder or self.coder
        coder.reset()
        for kind, payload in entries:
            if kind == "fs":
                for _ in payload:
                    vals = next(fetched)
                    idx = next(fetched)
                    coder.encode_with_indexes(
                        vals.reshape(-1), idx.reshape(-1),
                        self.em._cdf, self.em._cdf_length, self.em._offset)
            else:  # AR: wavefront order, one encode call PER FRONT —
                # mirrors _decode_ar_ll's call granularity: the
                # multi-substream splitter partitions each call's symbols
                # across parts (csrc/rans_lib.cpp MultiEncoder::encode), so
                # per-stream contents only match when encoder and decoder
                # chunk the symbol sequence identically.
                ll_int = next(fetched)
                both = next(fetched)
                idxs = both[0]
                syms = ll_int - both[1]
                hh, ww = syms.shape[2:]
                for rows, cols in ar_wavefronts(hh, ww):
                    s = syms[:, :, rows, cols].transpose(2, 0, 1)
                    i = idxs[:, :, rows, cols].transpose(2, 0, 1)
                    coder.encode_with_indexes(
                        s.reshape(-1), i.reshape(-1),
                        self.em._cdf, self.em._cdf_length, self.em._offset)
        coder.flush()
        bit_stream = coder.get_encoded_stream()
        if file_name is not None:
            _, num_channels, height, width = sideinfo
            encode_image(height, width, num_channels, bit_stream, file_name)
        x_hat = self._reconstruct(subbands_hat, q_index, qp_scale)
        return x_hat, bit_stream

    # ---- decompression -------------------------------------------------------

    @f32_streams
    def decompress(self, file_name: Optional[str] = None, stream: bytes = None,
                   shape=None, padding: int = 128, q_index: int = 0,
                   qp_scale=None, coder=None):
        """Decode a bitstream back to planes. ref: pWave.py:467-529."""
        if file_name is not None:
            height, width, num_channels, stream = decode_image(file_name)
        else:
            height, width, num_channels = shape
        coder = coder or self.coder
        coder.set_stream(stream)

        p = padding
        new_h = (height + p - 1) // p * p
        new_w = (width + p - 1) // p * p
        subbands_hat, _ = self._code_planes(num_channels, new_h, new_w,
                                            coder=coder)
        x_hat = self._reconstruct(subbands_hat, q_index, qp_scale)
        return {"x_hat": x_hat}
