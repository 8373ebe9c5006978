"""Host bitstream codec for the pMCTF video coder.

Orchestrates MV coding (factorized hyper-latent + quad four-part prior)
and the per-stage L/H band coding through two PWaveCodec instances.

ref: pMCTF/models/video/pMCTF_L.py:398-637 (compress_mv/decompress_mv/
compress_one_stage/decompress_one_stage/encode_one_stage). Encode is a
replay of the decoder's own jitted executables with teacher-forced
symbols (bit-exact by construction, one bulk readback before host rANS);
decode alternates small jitted parameter graphs with 4 rANS round trips.
"""

from __future__ import annotations

import os
import os.path as osp
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..entropy.coder import (
    EntropyCoder,
    GaussianEncoder,
    FactorizedCoder,
    build_bit_estimator_tables,
    build_indexes_from_scales,
)
from ..models.pmctf import PMCTF
from ..models.pwave import PWave
from ..models.mv_coder import (
    MASK_SCHEDULE,
    four_part_prior_decode_scales,
    four_part_prior_scatter,
)
from ..ops.masks import checkerboard_masks
from ..utils.stream import (
    encode_p,
    decode_p,
    get_downsampled_shape,
)
from ..models.layers import f32_streams
from .image_codec import PWaveCodec, bulk_fetch_int32


class PMCTFCodec:
    """Host wrapper for real bitstream encode/decode of pMCTF."""

    def __init__(self, module: PMCTF, params, ec_thread: bool = True,
                 stream_part: int = 2):
        # Defaults enable the production host pipeline: the background-
        # thread rANS encoder overlaps entropy coding with device work
        # (ref: pMCTF/cpp/rans/rans.cpp:174-263) and 2 substreams decode
        # concurrently (byte format per py_rans.cpp:89-118).
        self.module = module
        self.params = params
        self._coder_args = (ec_thread, stream_part)
        self.coder = EntropyCoder(ec_thread, stream_part)
        self.em = GaussianEncoder("laplace")
        self._jits: Dict = {}
        self._jits_lock = threading.Lock()
        self._zeros_cache: Dict = {}
        self._mv_coders: Dict[int, FactorizedCoder] = {}
        # decode-overlap machinery (VERDICT r3 item 3): independent
        # decode units (MV / luma bands / chroma bands, across pairs) run
        # on worker threads with per-unit EntropyCoders, so one unit's
        # host<->device rANS round trips overlap another unit's device
        # programs instead of idling the chip.
        self._decode_pool = None
        self._encode_pool = None
        self._pending_decodes = []

        pw_kwargs = dict(
            bitdepth=module.bitdepth, decomp_levels=module.decomp_levels,
            lossy=module.lossy, ll_mode=module.ll_mode,
            features=module.features, ar_features=module.ar_features)
        self.hp_codec = PWaveCodec(
            PWave(**pw_kwargs), {"params": params["params"]["hp_coder"]},
            ec_thread, stream_part)
        self.lp_codec = PWaveCodec(
            PWave(**pw_kwargs), {"params": params["params"]["lp_coder"]},
            ec_thread, stream_part)

    def _jit(self, key, fn, **kw):
        with self._jits_lock:
            if key not in self._jits:
                self._jits[key] = jax.jit(fn, **kw)
            return self._jits[key]

    def _zeros(self, shape):
        """Cached device zeros (see PWaveCodec._zeros)."""
        z = self._zeros_cache.get(shape)
        if z is None:
            z = self._jit(("zeros", shape),
                          lambda: jnp.zeros(shape, jnp.float32))()
            self._zeros_cache[shape] = z
        return z

    def _pool(self):
        if self._decode_pool is None:
            workers = int(os.environ.get("PMCTF_DECODE_WORKERS", "4"))
            self._decode_pool = ThreadPoolExecutor(
                max_workers=workers, thread_name_prefix="pmctf-dec")
        return self._decode_pool

    def _enc_pool(self):
        # separate pool: encode_one_stage BLOCKS on its two compress
        # futures; sharing the decode pool would queue them behind
        # long-running deferred pair decodes (priority inversion)
        if self._encode_pool is None:
            self._encode_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="pmctf-enc")
        return self._encode_pool

    @f32_streams
    def update(self, force: bool = False):
        """Build all CDF tables. ref: pMCTF_L.py:441-446."""
        self.em.update(force=force, entropy_coder=self.coder)
        self.hp_codec.update(force=force)
        self.lp_codec.update(force=force)
        for stage in range(self.module.num_me_stages):
            if force or stage not in self._mv_coders:
                def cdf_fn(x, s=stage):
                    return self.module.apply(
                        self.params, x, s, method=PMCTF.mv_z_cdf_fn)
                cdf, cdf_len, off = build_bit_estimator_tables(
                    cdf_fn, self.module.channel_mv)
                self._mv_coders[stage] = FactorizedCoder(
                    cdf, cdf_len, off, self.module.channel_mv, self.coder)

    # ---- motion streams -------------------------------------------------------
    #
    # Same encode-as-decode replay as PWaveCodec (see codec/image_codec.py):
    # compress runs the decoder's own prior/head/body/tail executables with
    # teacher-forced symbols computed on-device from the latent, so encoder
    # and decoder parameters are bit-identical by construction. Only the
    # latent program (mv_latent_planes) and the per-step symbol extraction
    # are encoder-side.

    def _mv_code(self, stage: int, mv_params, q_index, me_downsample: int,
                 teacher_y=None, coder=None):
        """Code the MV latent through the quad four-part prior.

        teacher_y=None: decode mode (4 rANS calls, the sequential floor —
        everything between two calls is ONE fused program). Otherwise:
        encode replay of the same executables; returns the 4 (vals, idx)
        device-array pairs in stream order as plan."""
        h, w = mv_params.shape[2], mv_params.shape[3]

        def _idx(sq, k):
            return build_indexes_from_scales(
                four_part_prior_decode_scales(sq, checkerboard_masks(h, w), k))

        # teacher symbols: the dense per-step plane of _mask_process
        # (mv_coder.py:144-150) — each spatial phase carries exactly one
        # channel quarter under MASK_SCHEDULE, so the sum is dense.
        # Computed inside head/body (decode feeds a zero teacher and
        # ignores the output) so encode costs no extra dispatches — see
        # image_codec._code_fourstep for the invariant argument.
        def vals_fn(y, qd, mq, k):
            masks = checkerboard_masks(y.shape[2], y.shape[3], jnp.float32)
            ys = jnp.split(y * (1.0 / qd), 4, axis=1)
            out = 0.0
            for i in range(4):
                m = masks[MASK_SCHEDULE[k][i]]
                out = out + jnp.round((ys[i] - mq[i] * m) * m)
            return out

        def head_fn(p, mp, t):
            q_dec, scales_q, means_q = self.module.apply(
                p, mp, method=PMCTF.mv_decode_split)
            return (q_dec, _idx(tuple(scales_q), 0), tuple(means_q),
                    vals_fn(t, q_dec, means_q, 0))

        zeros = self._zeros((mv_params.shape[0], self.module.channel_mv, h, w))
        t_in = zeros if teacher_y is None else teacher_y
        q_dec, idx, means_q, tvals = self._jit(
            ("mv_head2", stage), head_fn)(self.params, mv_params, t_in)

        def body_fn(p, yh, v, mq, mp, qd, t, k):
            y_hat_curr = four_part_prior_scatter(
                v, tuple(mq), checkerboard_masks(h, w), k)
            yh = y_hat_curr if yh is None else yh + y_hat_curr
            if k == 3:
                return yh
            scales_q, means_q = self.module.apply(
                p, yh, mp, stage, k, method=PMCTF.mv_decode_spatial)
            return (yh, _idx(tuple(scales_q), k + 1), tuple(means_q),
                    vals_fn(t, qd, means_q, k + 1))

        coder = coder or self.coder
        plan = None if teacher_y is None else []
        y_hat_so_far = None
        for step in range(4):
            if teacher_y is None:
                vals = coder.decode_stream(
                    np.asarray(idx), self.em._cdf, self.em._cdf_length,
                    self.em._offset)
                vals = jnp.asarray(vals.reshape(idx.shape), jnp.float32)
            else:
                vals = tvals
                plan.append((vals, idx))
            body = self._jit(
                ("mv_body2", stage, step, y_hat_so_far is None),
                lambda p, yh, v, mq, mp, qd, t, s=step:
                    body_fn(p, yh, v, mq, mp, qd, t, s))
            if step < 3:
                y_hat_so_far, idx, means_q, tvals = body(
                    self.params, y_hat_so_far, vals, means_q, mv_params,
                    q_dec, t_in)
            else:
                y_hat_so_far = body(
                    self.params, y_hat_so_far, vals, means_q, mv_params,
                    q_dec, t_in)

        mv_y_hat = y_hat_so_far * q_dec
        tail = self._jit(
            ("mv_tail", stage, me_downsample),
            lambda p, y, q: self.module.apply(
                p, y, stage, q, me_downsample, method=PMCTF.mv_decode_tail))
        mv_hat, mv_feature = tail(self.params, mv_y_hat, jnp.float32(q_index))
        return {"mv_hat": mv_hat, "mv_feature": mv_feature,
                "mv_y_hat": mv_y_hat, "plan": plan}

    @f32_streams
    def compress_mv(self, ref_y, cur_y, dpb, stage_idx: int = 0,
                    q_index: int = 0, me_downsample: int = 1):
        """ref: pMCTF_L.py:448-495."""
        stage = self.module.me_index(stage_idx)
        lat = self._jit(
            ("mv_latents", stage, me_downsample, dpb["mv_feature"] is None),
            lambda p, r, c, d, q: self.module.apply(
                p, r, c, d, stage, q, me_downsample,
                method=PMCTF.mv_latent_planes))
        mv_y, mv_z_hat = lat(self.params, ref_y, cur_y, dpb,
                             jnp.float32(q_index))

        prior = self._jit(
            ("mv_prior", stage, dpb.get("ref_mv_y") is None),
            lambda p, z, d: self.module.apply(
                p, z, d, stage, method=PMCTF.mv_prior_params))
        mv_params = prior(self.params, mv_z_hat, dpb)

        out = self._mv_code(stage, mv_params, q_index, me_downsample,
                            teacher_y=mv_y)

        # ONE packed readback (see image_codec.bulk_fetch_int32) + host
        # rANS streaming (z symbols are exact integers, so the
        # factorized stream never needs a replay)
        plan = out.pop("plan")
        order = [mv_z_hat] + [a for pair in plan for a in pair]
        fetched = bulk_fetch_int32(self._jit, order)
        self.coder.reset()
        mvc = self._mv_coders[stage]
        self.coder.encode_with_indexes(
            fetched[0].reshape(-1),
            mvc.build_indexes(mv_z_hat.shape).reshape(-1),
            mvc._cdf, mvc._cdf_length, mvc._offset)
        it = iter(fetched[1:])
        for _ in plan:
            vals = next(it)
            idx = next(it)
            self.coder.encode_with_indexes(
                vals.reshape(-1), idx.reshape(-1),
                self.em._cdf, self.em._cdf_length, self.em._offset)
        self.coder.flush()
        out["bit_stream"] = self.coder.get_encoded_stream()
        return out

    @f32_streams
    def decompress_mv(self, stream: bytes, height: int, width: int, dpb,
                      stage_idx: int = 0, q_index: int = 0,
                      me_downsample: int = 1, coder=None):
        """ref: pMCTF_L.py:497-523."""
        stage = self.module.me_index(stage_idx)
        coder = coder or self.coder
        coder.set_stream(stream)
        zh, zw = get_downsampled_shape(int(height), int(width), 64)
        mvc = self._mv_coders[stage]
        mv_z_hat = jnp.asarray(FactorizedCoder(
            mvc._cdf, mvc._cdf_length, mvc._offset, mvc.channels,
            coder).decode_stream((zh, zw)))

        prior = self._jit(
            ("mv_prior", stage, dpb.get("ref_mv_y") is None),
            lambda p, z, d: self.module.apply(
                p, z, d, stage, method=PMCTF.mv_prior_params))
        mv_params = prior(self.params, mv_z_hat, dpb)

        out = self._mv_code(stage, mv_params, q_index, me_downsample,
                            coder=coder)
        out.pop("plan")
        return out

    # ---- one temporal stage ---------------------------------------------------

    def _forward_mctf(self, ref, cur, mv_hat, stage_idx, halve_mv: bool):
        key = ("fwd_mctf", stage_idx, halve_mv, ref.shape)

        def fn(p, r, c, mv):
            if halve_mv:
                from ..ops.resample import bilinear_downsample
                mv = bilinear_downsample(mv) / 2.0
            return self.module.apply(p, r, c, mv, stage_idx,
                                     method=PMCTF.forward_mctf)
        return self._jit(key, fn)(self.params, ref, cur, mv_hat)

    def _hp_qp_scale(self, q_index, stage_idx):
        if not self.module.quant_stage:
            return None
        fn = self._jit(
            ("hp_qp", stage_idx),
            lambda p, q: self.module.apply(
                p, q, stage_idx, method=PMCTF.hp_qp_scale))
        return np.asarray(fn(self.params, jnp.float32(q_index))).item()

    @f32_streams
    def compress_one_stage(self, ref_frame, cur_frame, code_lt: bool, mv_hat,
                           ischroma: bool, sideinfo=None, file_name=None,
                           stage_idx: int = 0, q_index: int = 0,
                           own_coders: bool = False):
        """ref: pMCTF_L.py:398-420. own_coders=True gives each stream a
        fresh EntropyCoder so luma and chroma compress concurrently."""
        l_t, h_t, _, _ = self._forward_mctf(
            ref_frame, cur_frame, mv_hat, stage_idx, halve_mv=ischroma)
        qp_scale = self._hp_qp_scale(q_index, stage_idx)
        h_t_hat, _ = self.hp_codec.compress(
            h_t, q_index, qp_scale=qp_scale, file_name=file_name,
            sideinfo=sideinfo,
            coder=self.hp_codec.make_coder() if own_coders else None)
        l_t_hat = None
        if code_lt:
            file_name_l = file_name.replace(
                osp.basename(file_name), "0_C_main.bin" if ischroma else "0_main.bin")
            l_t_hat, _ = self.lp_codec.compress(
                l_t, q_index, file_name=file_name_l, sideinfo=sideinfo,
                coder=self.lp_codec.make_coder() if own_coders else None)
        return {"L_t": l_t, "H_t": h_t, "H_t_hat": h_t_hat, "L_t_hat": l_t_hat}

    @f32_streams
    def decompress_one_stage(self, file_name: str, code_lt: bool,
                             ischroma: bool, psize: int = 128,
                             q_index: int = 0, stage_idx: int = 0,
                             own_coders: bool = False):
        """ref: pMCTF_L.py:422-439. own_coders=True gives each stream a
        fresh EntropyCoder so this call can run on a worker thread."""
        qp_scale = self._hp_qp_scale(q_index, stage_idx)
        pad = psize // 2 if ischroma else psize
        h_t = self.hp_codec.decompress(
            file_name, padding=pad, q_index=q_index, qp_scale=qp_scale,
            coder=self.hp_codec.make_coder() if own_coders else None)
        l_t = None
        if code_lt:
            file_name_l = file_name.replace(
                osp.basename(file_name), "0_C_main.bin" if ischroma else "0_main.bin")
            l_t = self.lp_codec.decompress(
                file_name_l, padding=pad, q_index=q_index,
                coder=self.lp_codec.make_coder() if own_coders else None)
        return {"L_t": l_t, "H_t": h_t}

    def _submit_pair_decode(self, mv_out, output_path, file_name_c, code_lt,
                            dpb, yshape, psize, stage_idx, q_index,
                            me_downsample, expect):
        """Queue the three independent decode units of one coded pair.

        The MV unit chains through dpb: a standalone decoder would pass
        its own previous decoded {mv_feature, mv_y_hat}; the encode-side
        arrays handed in here are bit-identical to those (verified for
        every pair at drain via the mv_y_hat check)."""
        _, string = decode_p(mv_out)
        f_mv = self._pool().submit(
            self.decompress_mv, string, yshape[0], yshape[1], dpb,
            stage_idx=stage_idx, q_index=q_index,
            me_downsample=me_downsample,
            coder=EntropyCoder(*self._coder_args))
        f_l = self._pool().submit(
            self.decompress_one_stage, output_path, code_lt, ischroma=False,
            psize=psize, q_index=q_index, stage_idx=stage_idx,
            own_coders=True)
        f_c = self._pool().submit(
            self.decompress_one_stage, file_name_c, code_lt, ischroma=True,
            psize=psize, q_index=q_index, stage_idx=stage_idx,
            own_coders=True)
        self._pending_decodes.append(
            {"name": output_path, "code_lt": code_lt,
             "futures": (f_mv, f_l, f_c), "expect": expect})

    def drain_decodes(self, check: bool = True, strict: bool = True):
        """Wait for all deferred pair decodes (decode_async=True).

        check=True also verifies decoded planes == the encoder-side
        reconstructions already returned by encode_one_stage — the replay
        design's bit-exactness invariant — via one small device program +
        scalar readback per band; with strict=True (default) any nonzero
        error raises ValueError. Callers that use decode_async MUST call
        this once per GOP (before reusing the bin folder: the deferred
        decodes re-read the code_lt streams 0_main.bin / 0_C_main.bin by
        name, so encoding another GOP or q-index first would overwrite
        them). Returns a list of per-pair dicts
        {"name", "errs", "max_err", "decoded"} and clears the queue."""
        maxabs = self._jit(
            "maxabs", lambda a, b: jnp.max(jnp.abs(a - b)))

        def err(a, b):
            return float(maxabs(a, b))

        out = []
        pend, self._pending_decodes = self._pending_decodes, []
        for item in pend:
            f_mv, f_l, f_c = item["futures"]
            decoded, dec_l, dec_c = f_mv.result(), f_l.result(), f_c.result()
            errs = {}
            if check:
                exp = item["expect"]
                errs["mv_hat"] = err(decoded["mv_hat"], exp["mv_hat"])
                errs["mv_y_hat"] = err(decoded["mv_y_hat"], exp["mv_y_hat"])
                errs["H_t"] = err(dec_l["H_t"]["x_hat"], exp["H_t"])
                errs["H_tc"] = err(dec_c["H_t"]["x_hat"], exp["H_tc"])
                if item["code_lt"]:
                    errs["L_t"] = err(dec_l["L_t"]["x_hat"], exp["L_t"])
                    errs["L_tc"] = err(dec_c["L_t"]["x_hat"], exp["L_tc"])
            max_err = max(errs.values()) if errs else 0.0
            if strict and max_err != 0.0:
                raise ValueError(
                    f"deferred decode mismatch in {item['name']}: {errs} "
                    "(decoded planes differ from the encoder-side "
                    "reconstruction — bit-exactness invariant violated)")
            out.append({"name": item["name"], "errs": errs,
                        "max_err": max_err,
                        "decoded": {"mv": decoded, "luma": dec_l,
                                    "chroma": dec_c}})
        return out

    def close(self):
        """Shut down the worker pools (and fail loudly on undrained
        deferred decodes — their stream files may already be stale)."""
        if self._pending_decodes:
            pend = len(self._pending_decodes)
            self._pending_decodes = []
            raise RuntimeError(
                f"PMCTFCodec.close() with {pend} undrained deferred "
                "decodes: call drain_decodes() after each GOP")
        for pool in (self._decode_pool, self._encode_pool):
            if pool is not None:
                pool.shutdown(wait=True)
        self._decode_pool = self._encode_pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    @f32_streams
    def encode_one_stage(self, ref_frame, cur_frame, code_lt: bool, dpb,
                         output_path: str, pic_width: int, pic_height: int,
                         psize: int = 128, skip_decoding: bool = False,
                         stage_idx: int = 0, q_index: int = 0,
                         me_downsample: int = 1, decode_async: bool = False):
        """Full stage encode (+ optional decode check). ref: pMCTF_L.py:525-637.

        decode_async=True: the decode of this pair's three independent
        streams (MV, luma bands, chroma bands) is submitted to the worker
        pool; the caller MUST call drain_decodes() once per GOP — it
        raises on any mismatch, and must run before the bin folder's
        code_lt stream names are reused (see drain_decodes). The returned
        planes are the encoder-side reconstructions, which the replay
        design makes bit-identical to the decoded ones (asserted at drain).
        Decode round trips then overlap later pairs' encode programs —
        the chip no longer idles during rANS waits (ref concept:
        pMCTF/cpp/rans/rans.cpp:174-263 overlaps host entropy work)."""
        ref_y, ref_chroma = ref_frame
        cur_y, cur_chroma = cur_frame

        start = time.time()
        mv_out = output_path.replace(".bin", "_mv.bin")
        out_enc = self.compress_mv(ref_y, cur_y, dpb, stage_idx, q_index,
                                   me_downsample)
        encode_p(out_enc["bit_stream"], 0, mv_out)
        mv_hat = out_enc["mv_hat"]
        mv_feature = out_enc["mv_feature"]
        mv_y_hat = out_enc["mv_y_hat"]

        # luma and chroma compress are independent given mv_hat: run them
        # concurrently with per-stream coders — each one's packed bulk
        # readback + host rANS overlaps the other's device programs
        file_name_c = output_path.replace(".bin", "_C_main.bin")
        f_l = self._enc_pool().submit(
            self.compress_one_stage, ref_y, cur_y, code_lt, mv_hat,
            ischroma=False, sideinfo=[1, 1, pic_height, pic_width],
            file_name=output_path, stage_idx=stage_idx, q_index=q_index,
            own_coders=True)
        f_c = self._enc_pool().submit(
            self.compress_one_stage, ref_chroma, cur_chroma, code_lt, mv_hat,
            ischroma=True, sideinfo=[1, 2, pic_height // 2, pic_width // 2],
            file_name=file_name_c, stage_idx=stage_idx, q_index=q_index,
            own_coders=True)
        out_l, out_c = f_l.result(), f_c.result()
        encoding_time = time.time() - start

        bits_h = os.path.getsize(output_path) * 8.0
        bits_me = os.path.getsize(mv_out) * 8.0
        bits_l = os.path.getsize(output_path.replace(
            osp.basename(output_path), "0_main.bin")) * 8.0 if code_lt else None

        bits_h_c = os.path.getsize(file_name_c) * 8.0
        bits_l_c = os.path.getsize(output_path.replace(
            osp.basename(output_path), "0_C_main.bin")) * 8.0 if code_lt else None

        if not skip_decoding and not decode_async:
            start = time.time()
            # the pair's three streams are independent — decode them
            # concurrently with per-unit coders so their rANS round trips
            # overlap each other's device programs
            _, string = decode_p(mv_out)
            f_mv = self._pool().submit(
                self.decompress_mv, string, ref_y.shape[2], ref_y.shape[3],
                dpb, stage_idx=stage_idx, q_index=q_index,
                me_downsample=me_downsample, coder=EntropyCoder(*self._coder_args))
            f_l = self._pool().submit(
                self.decompress_one_stage, output_path, code_lt,
                ischroma=False, psize=psize, q_index=q_index,
                stage_idx=stage_idx, own_coders=True)
            f_c = self._pool().submit(
                self.decompress_one_stage, file_name_c, code_lt,
                ischroma=True, psize=psize, q_index=q_index,
                stage_idx=stage_idx, own_coders=True)
            decoded, out_dec, out_dec_c = (
                f_mv.result(), f_l.result(), f_c.result())
            mv_hat = decoded["mv_hat"]
            mv_feature = decoded["mv_feature"]
            decoding_time = time.time() - start
            l_t_rec = out_dec["L_t"]["x_hat"] if code_lt else out_l["L_t"]
            h_t_rec = out_dec["H_t"]["x_hat"]
            l_tc_rec = out_dec_c["L_t"]["x_hat"] if code_lt else out_c["L_t"]
            h_tc_rec = out_dec_c["H_t"]["x_hat"]
        else:
            if not skip_decoding:  # decode_async: defer to drain_decodes
                self._submit_pair_decode(
                    mv_out, output_path, file_name_c, code_lt, dict(dpb),
                    (ref_y.shape[2], ref_y.shape[3]), psize, stage_idx,
                    q_index, me_downsample,
                    expect={"mv_hat": mv_hat,
                            "mv_y_hat": mv_y_hat,
                            "H_t": out_l["H_t_hat"],
                            "L_t": out_l["L_t_hat"] if code_lt else None,
                            "H_tc": out_c["H_t_hat"],
                            "L_tc": out_c["L_t_hat"] if code_lt else None})
            decoding_time = 0.0
            l_t_rec = out_l["L_t_hat"] if code_lt else out_l["L_t"]
            h_t_rec = out_l["H_t_hat"]
            l_tc_rec = out_c["L_t_hat"] if code_lt else out_c["L_t"]
            h_tc_rec = out_c["H_t_hat"]

        return {
            "L_t": l_t_rec,
            "H_t": h_t_rec,
            "L_tc": l_tc_rec,
            "H_tc": h_tc_rec,
            "bit_H": bits_h + bits_h_c,
            "bit_L": (bits_l + bits_l_c) if code_lt else None,
            "bit_Lc": bits_l_c,
            "bit_Hc": bits_h_c,
            "bit_ME": bits_me,
            "mv_hat": mv_hat,
            "dpb": {"mv_feature": mv_feature, "ref_mv_y": mv_y_hat},
            "decoding_time": decoding_time,
            "encoding_time": encoding_time,
        }

    def estimate_one_stage(self, ref_frame, cur_frame, code_lt: bool, dpb,
                           stage_idx: int = 0, q_index: int = 0,
                           me_downsample: int = 1):
        """Entropy-estimated stage coding (no bitstream), same output dict
        shape as encode_one_stage. ref: pMCTF_L.py:531-552."""
        ref_y, ref_chroma = ref_frame
        cur_y, cur_chroma = cur_frame

        luma = self._jit(
            ("est_luma", stage_idx, code_lt, me_downsample, ref_y.shape,
             dpb["mv_feature"] is None, dpb.get("ref_mv_y") is None),
            lambda p, r, c, d, q: self.module.apply(
                p, r, c, q, code_lt, d, stage_idx=stage_idx,
                me_downsample=me_downsample, training=False))
        result = luma(self.params, ref_y, cur_y, dpb, jnp.float32(q_index))

        chroma = self._jit(
            ("est_chroma", stage_idx, code_lt, ref_chroma.shape),
            lambda p, r, c, mv, q: self.module.apply(
                p, r, c, q, code_lt,
                {"mv_feature": None, "ref_mv_y": None}, mv_hat=mv,
                stage_idx=stage_idx, training=False))
        result_c = chroma(self.params, ref_chroma, cur_chroma,
                          result["mv_hat"], jnp.float32(q_index))

        def val(x):
            return float(x) if x is not None else None

        return {
            "L_t": result["L_t"],
            "H_t": result["H_t"],
            "L_tc": result_c["L_t"],
            "H_tc": result_c["H_t"],
            "bit_L": val(result.get("bit_L", 0)) + val(result_c.get("bit_L", 0))
                     if code_lt else None,
            "bit_H": val(result["bit_H"]) + val(result_c["bit_H"]),
            "bit_Lc": val(result_c.get("bit_L")) if code_lt else None,
            "bit_Hc": val(result_c["bit_H"]),
            "bit_ME": val(result["bit_ME"]),
            "mv_hat": result["mv_hat"],
            "dpb": result["dpb"],
            "decoding_time": 0.0,
            "encoding_time": 0.0,
        }

    @f32_streams
    def inverse_mctf(self, l_t, h_t, mv_hat, stage_idx: int = 0,
                     downscale: bool = False):
        fn = self._jit(
            ("inv_mctf", stage_idx, downscale, l_t.shape),
            lambda p, l, h, mv: self.module.apply(
                p, l, h, mv, stage_idx, downscale,
                method=PMCTF.inverse_mctf))
        return fn(self.params, l_t, h_t, mv_hat)

    # ---- q-batched eval (SURVEY §2.6: eval parallelism over q-indices) -------
    #
    # q_index is a traced scalar, so a whole RD sweep vmaps over a leading
    # Q axis: ONE compiled program per (stage, shape) serves all rate
    # points instead of re-running the sequence per q. fold2 execution is
    # disabled under vmap (its 6-D intermediates get pathological layouts
    # with a mapped axis, the r2-measured OOM); use warp_mode='exact' at
    # 1080p for the same reason.

    def _jit_vmapped(self, key, one_fn):
        from ..ops.fold import fold_small_convs
        if key not in self._jits:
            self._jits[key] = jax.jit(
                jax.vmap(one_fn, in_axes=(None, 0, 0, 0, 0)))
        jfn = self._jits[key]

        def call(*args):
            with fold_small_convs(False):  # trace happens on first call
                return jfn(*args)
        return call

    def estimate_one_stage_multi(self, ref_frame, cur_frame, code_lt: bool,
                                 dpb, q_indices, stage_idx: int = 0):
        """estimate_one_stage over a q batch.

        ref_frame/cur_frame: (y, chroma) with leading Q axis
        ((Q,B,1,H,W)); dpb leaves (Q,...) or None; q_indices (Q,).
        Returns the estimate_one_stage dict with (Q,)-shaped rate entries.
        """
        ref_y, ref_chroma = ref_frame
        cur_y, cur_chroma = cur_frame
        q_vec = jnp.asarray(q_indices, jnp.float32)

        luma = self._jit_vmapped(
            ("est_luma_q", stage_idx, code_lt, ref_y.shape,
             dpb["mv_feature"] is None, dpb.get("ref_mv_y") is None),
            lambda p, r, c, d, q: self.module.apply(
                p, r, c, q, code_lt, d, stage_idx=stage_idx,
                training=False))
        result = luma(self.params, ref_y, cur_y, dpb, q_vec)

        dpb0 = {"mv_feature": None, "ref_mv_y": None}
        chroma = self._jit_vmapped(
            ("est_chroma_q", stage_idx, code_lt, ref_chroma.shape),
            lambda p, r, c, mv, q: self.module.apply(
                p, r, c, q, code_lt, dpb0, mv_hat=mv,
                stage_idx=stage_idx, training=False))
        result_c = chroma(self.params, ref_chroma, cur_chroma,
                          result["mv_hat"], q_vec)

        def arr(x):
            return None if x is None else np.asarray(x)

        return {
            "L_t": result["L_t"],
            "H_t": result["H_t"],
            "L_tc": result_c["L_t"],
            "H_tc": result_c["H_t"],
            "bit_L": arr(result.get("bit_L")) + arr(result_c.get("bit_L"))
                     if code_lt else None,
            "bit_H": arr(result["bit_H"]) + arr(result_c["bit_H"]),
            "bit_ME": arr(result["bit_ME"]),
            "mv_hat": result["mv_hat"],
            "dpb": result["dpb"],
        }

    def inverse_mctf_multi(self, l_t, h_t, mv_hat, stage_idx: int = 0,
                           downscale: bool = False):
        """inverse_mctf with a leading Q axis on every input."""
        fn = self._jit_vmapped(
            ("inv_mctf_q", stage_idx, downscale, l_t.shape),
            lambda p, l, h, mv, _q: self.module.apply(
                p, l, h, mv, stage_idx, downscale,
                method=PMCTF.inverse_mctf))
        qz = jnp.zeros((l_t.shape[0],), jnp.float32)
        return fn(self.params, l_t, h_t, mv_hat, qz)
