"""Fixed-GOP evaluation CLI for pMCTF (q-index sweep, JSON outputs).

ref: test_pMCTF_flex.py:24-570. Same protocol: per-GOP forward MCTF
coding, temporal decoding, YUV-PSNR (6-1-1) / RGB-PSNR / MS-SSIM metrics,
per-sequence JSON dumps and an RD summary. Additions for this container:
--synthetic generates random YUV input so the CLI runs without datasets.

Usage (canonical, mirrors the reference README):
  python test_pmctf_flex.py --model_path ckpt/ --test_config \
      configs/dataset_config.json --force_intra_period 16 \
      --force_frame_num 96 --q_index_num 6 --write_stream 1
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

from learned_pmctf_tpu.utils.eval_json import (
    str2bool, create_folder, generate_log_json, dump_json)
from learned_pmctf_tpu.utils.stream import get_padding_size
from learned_pmctf_tpu.utils.yuv import YUVReader, YUVWriter


def parse_args(argv):
    p = argparse.ArgumentParser(description="pMCTF fixed-GOP evaluation")
    p.add_argument("--force_intra", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--force_frame_num", type=int, default=-1)
    p.add_argument("--last_frames", action="store_true")
    p.add_argument("--force_intra_period", type=int, default=-1)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--test_config", type=str, default=None)
    p.add_argument("--force_root_path", type=str, default=None)
    p.add_argument("--write_stream", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--stream_path", type=str, default="out_bin")
    p.add_argument("--save_decoded_frame", type=str2bool, default=False)
    p.add_argument("--decoded_frame_path", type=str, default="decoded_frames")
    p.add_argument("--output_path", type=str, default="output.json")
    p.add_argument("--verbose", type=int, default=0)
    p.add_argument("--seq_num", type=int, default=-1)
    p.add_argument("--ds_name", type=str, default=None)
    p.add_argument("--lossless", action="store_true")
    # Reference CLI parity: in the reference, two_stage_me is stored on the
    # model but never read (ref: pMCTF/models/video/pMCTF_L.py:113, no other
    # use); ME-stage selection is min(num_me_stages-1, stage_idx). Here the
    # flag enforces its evident intent: at least 2 ME stages.
    p.add_argument("--two_stage_me", action="store_true",
                   help="use a distinct ME network for temporal stage >0 "
                        "(forces num_me_stages >= 2)")
    p.add_argument("--skip_decoding", action="store_true")
    p.add_argument("--decode_async", type=str2bool, default=False,
                   help="overlap pair decodes on worker threads "
                        "(bit-exactness verified after each GOP). Default "
                        "off: measured slightly slower than sync decode at "
                        "1080p (docs/stream_1080p_r4_{sync,async}.log)")
    p.add_argument("--num_me_stages", default=1, type=int)
    p.add_argument("--q_index_num", default=1, type=int)
    p.add_argument("--q_index", default=-1, type=int)
    p.add_argument("--ll_mode", default="fourstep", choices=("fourstep", "ar"))
    # container-friendly extras
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N random frames instead of reading YUV")
    p.add_argument("--synthetic_size", type=str, default="256x256",
                   help="HxW for --synthetic")
    p.add_argument("--features", type=int, default=112)
    p.add_argument("--ar_features", type=int, default=128)
    p.add_argument("--channel_mv", type=int, default=64)
    p.add_argument("--decomp_levels", type=int, default=4)
    p.add_argument("--warp_mode", default="exact", choices=("exact", "fast"),
                   help="temporal-lifting warp: 'exact' = reference bilinear "
                        "semantics (use for parity/BD-rate), 'fast' = "
                        "gather-free separable approximation (throughput)")
    p.add_argument("--q_batch", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="code ALL q-indices in one vmapped batch (estimate "
                        "path only): the sequence is read and coded once, "
                        "with a leading Q axis over rate points")
    p.add_argument("--shard_q", type=str2bool, nargs="?", const=True,
                   default=False,
                   help="with --q_batch on a multi-device mesh: shard the "
                        "leading Q axis over devices so each chip codes its "
                        "own rate points (SURVEY §2.6 eval parallelism)")
    p.add_argument("--seq_batch", type=int, default=0,
                   help="estimate path only: code up to N same-geometry "
                        "sequences together on the vmapped batch axis "
                        "(composes with --q_batch/--shard_q: the leading "
                        "axis becomes sequences x rate points)")
    args = p.parse_args(argv)
    if args.two_stage_me and args.num_me_stages < 2:
        args.num_me_stages = 2
    return args


def build_codec(args):
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.models import PMCTF
    from learned_pmctf_tpu.codec import PMCTFCodec
    from learned_pmctf_tpu.utils.checkpoint import load_checkpoint

    is_torch_ckpt = bool(args.model_path) and args.model_path.endswith(
        (".pth", ".pt", ".pth.tar", ".ckpt"))
    if is_torch_ckpt and args.ll_mode != "ar":
        print("NOTE: reference torch checkpoints use the AR LL model; "
              "forcing --ll_mode ar for parity")
        args.ll_mode = "ar"

    module = PMCTF(
        decomp_levels=args.decomp_levels, lossy=not args.lossless,
        num_me_stages=args.num_me_stages, ll_mode=args.ll_mode,
        features=args.features, ar_features=args.ar_features,
        channel_mv=args.channel_mv, channel_n=args.channel_mv,
        warp_mode=args.warp_mode)

    if is_torch_ckpt and os.path.exists(args.model_path):
        # a reference (PyTorch) checkpoint: convert in place, so BD-rate
        # against the released model is one command (SURVEY §5, ref:
        # README.md:46-50). Parity of the conversion is covered by
        # tests/test_torch_parity.py (module-level + full-model).
        from learned_pmctf_tpu.utils.checkpoint import load_torch_state_dict
        from learned_pmctf_tpu.utils.torch_import import (
            convert_pmctf_tree, merge_into_init)
        sd = load_torch_state_dict(args.model_path)
        tree, unused = convert_pmctf_tree(
            sd, num_me_stages=args.num_me_stages,
            decomp_levels=args.decomp_levels, spynet_luma=True)
        if unused:
            print(f"WARNING: {len(unused)} unconsumed torch keys "
                  f"(first: {unused[:3]})")
        g = np.random.default_rng(0)
        small = jnp.asarray(g.integers(0, 256, (1, 1, 64, 64)), jnp.float32)
        dpb = {"mv_feature": None, "ref_mv_y": None}
        init = module.init({"params": jax.random.PRNGKey(0)}, small, small,
                           10, dpb, method=PMCTF.full_init_graph)
        params, unmatched = merge_into_init(init, tree)
        if unmatched:
            print(f"WARNING: {len(unmatched)} converted leaves without a "
                  f"home (first: {unmatched[:3]})")
        print(f"converted torch checkpoint: {args.model_path}")
    elif args.model_path and os.path.exists(args.model_path):
        params, _, _ = load_checkpoint(args.model_path)
    else:
        g = np.random.default_rng(0)
        ref = jnp.asarray(g.integers(0, 256, (1, 1, 128, 128)), jnp.float32)
        dpb = {"mv_feature": None, "ref_mv_y": None}
        params = jax.jit(
            lambda r: module.init(r, ref, ref, 10, dpb,
                                  method=PMCTF.full_init_graph)
        )({"params": jax.random.PRNGKey(0)})
        # spread QP endpoints so the rate sweep is meaningful untrained
        for coder in ("lp_coder", "hp_coder"):
            params["params"][coder]["QP"] = jnp.array(
                [0.02, 0.5]).reshape(2, 1, 1, 1)
            params["params"][coder]["QP_ll"] = jnp.array(
                [0.02, 0.5]).reshape(2, 1, 1, 1)
        print("WARNING: no checkpoint; using random-initialized model")

    codec = PMCTFCodec(module, params)
    if args.write_stream:
        codec.update(force=True)
    return codec


def run_test(codec, args, logger=print):
    import jax.numpy as jnp

    frame_num_eval = args["frame_num"]
    gop_size = args["gop_size"]
    num_stages = max(1, int(math.log2(gop_size)))
    assert 2 ** num_stages == gop_size, gop_size

    frame_num = frame_num_eval
    if frame_num_eval % gop_size:
        frame_num += gop_size - frame_num_eval % gop_size
    gop_num = frame_num // gop_size
    write_stream = args.get("write_stream", False)
    q_index = args["q_idx"]

    synthetic = args.get("synthetic", 0)
    if synthetic:
        h, w = args["src_height"], args["src_width"]
        rng = np.random.default_rng(0)

        def read_frame(i):
            y = rng.integers(0, 256, (h, w)).astype(np.uint8)
            cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
            cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
            return y, cb, cr
    else:
        start_frame = (args["frame_num_seq"] - frame_num) \
            if args.get("last_frames") else 0
        reader = YUVReader(args["vid_path"], args["src_width"],
                           args["src_height"], start_index=start_frame)

        def read_frame(i):
            return reader.read_one_frame()

    frame_types = [None] * frame_num
    psnrs = [0.0] * frame_num
    msssims = [0.0] * frame_num
    rgb_psnrs = [0.0] * frame_num
    bits = [0.0] * frame_num
    bpp_mv = [0.0] * frame_num
    frame_pixel_num = args["src_height"] * args["src_width"]

    psize = 128
    pl, pr, pt, pb = get_padding_size(args["src_height"], args["src_width"],
                                      p=psize)
    # --save_decoded_frame: write the cropped reconstruction as a planar
    # 4:2:0 .yuv next to the metrics (ref: test_pMCTF_flex.py:294-312 +
    # :381-391 saves decoded frames under decoded_frame_path).
    dec_writer = None
    if args.get("decoded_frame_folder"):
        dec_writer = YUVWriter(
            os.path.join(args["decoded_frame_folder"], "decoded.yuv"))
    start_time = time.time()
    p_frames = 0
    enc_time = dec_time = dec_wait_time = 0.0

    frame_counter = 0
    for gop_idx in range(gop_num):
        frames = [None] * gop_size       # (y, chroma) padded planes
        frames_orig = [None] * gop_size
        mvs = [None] * gop_size

        for i in range(gop_size):
            y, cb, cr = read_frame(frame_counter)
            frame_counter += 1
            y = jnp.asarray(y, jnp.float32)[None, None]
            chroma = jnp.stack([jnp.asarray(cb, jnp.float32),
                                jnp.asarray(cr, jnp.float32)])[:, None]
            frames_orig[i] = (y, chroma)
            y_p = jnp.pad(y, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
            c_p = jnp.pad(chroma, ((0, 0), (0, 0), (pt // 2, pb // 2),
                                   (pl // 2, pr // 2)))
            frames[i] = (y_p, c_p)

        # ANALYSIS: hierarchical forward MCTF coding
        num_pairs = gop_size // 2
        for stage_idx in range(num_stages):
            dpb = {"mv_feature": None, "ref_mv_y": None}
            for gi in range(num_pairs):
                step = 2 ** stage_idx
                fi = gi * 2 * step
                code_lt = (stage_idx + 1) == num_stages
                me_num = min(codec.module.num_me_stages - 1, stage_idx)
                frame_idx = gop_idx * gop_size + fi

                if write_stream:
                    bin_path = os.path.join(args["bin_folder"],
                                            f"{fi + step}.bin")
                    result = codec.encode_one_stage(
                        frames[fi], frames[fi + step], code_lt, dpb,
                        output_path=bin_path,
                        pic_width=args["src_width"],
                        pic_height=args["src_height"], psize=psize,
                        skip_decoding=args.get("skip_decoding", False),
                        stage_idx=me_num, q_index=q_index,
                        decode_async=args.get("decode_async", False))
                else:
                    result = codec.estimate_one_stage(
                        frames[fi], frames[fi + step], code_lt, dpb,
                        stage_idx=me_num, q_index=q_index)
                dpb = result["dpb"]
                frames[fi] = (result["L_t"], result["L_tc"])
                frames[fi + step] = (result["H_t"], result["H_tc"])
                mvs[fi + step] = result["mv_hat"]

                frame_types[frame_idx + step] = 1
                p_frames += 1
                enc_time += result["encoding_time"]
                dec_time += result["decoding_time"]
                curr_bits = float(result["bit_H"]) + float(result["bit_ME"])
                bits[frame_idx + step] = curr_bits
                bpp_mv[frame_idx + step] = float(result["bit_ME"]) / frame_pixel_num
                if code_lt:
                    frame_types[frame_idx] = 0
                    bits[frame_idx] = float(result["bit_L"])
                    bpp_mv[frame_idx] = 0.0
            num_pairs //= 2

        if write_stream and not args.get("skip_decoding", False) \
                and args.get("decode_async", False):
            # overlapped decode: wait for the deferred pair decodes;
            # drain_decodes itself raises if any decoded plane differs
            # from the encoder-side recon the loop above fed forward
            # (the replay design's bit-exactness invariant)
            t0 = time.time()
            codec.drain_decodes()
            dec_wait_time += time.time() - t0

        # SYNTHESIS: temporal decoding
        num_pairs = 1
        for stage_idx in reversed(range(num_stages)):
            me_num = min(codec.module.num_me_stages - 1, stage_idx)
            for gi in reversed(range(num_pairs)):
                step = 2 ** stage_idx
                fi = gi * 2 * step
                l_y, l_c = frames[fi]
                h_y, h_c = frames[fi + step]
                mv = mvs[fi + step]
                ry, cy = codec.inverse_mctf(l_y, h_y, mv, stage_idx=me_num)
                rc, cc = codec.inverse_mctf(l_c, h_c, mv, stage_idx=me_num,
                                            downscale=True)
                frames[fi] = (ry, rc)
                frames[fi + step] = (cy, cc)
            num_pairs *= 2

        # METRICS: one device program + one readback per frame (each
        # python-side float() costs a 40-70 ms sync through the relay)
        for i in range(gop_size):
            frame_idx = gop_idx * gop_size + i
            y_rec, c_rec = frames[i]
            y_org, c_org = frames_orig[i]
            do_ms = y_org.shape[2] > 160 and y_org.shape[3] > 160
            mfn = _frame_metrics_program(pt, pb, pl, pr, do_ms)
            vals = np.asarray(mfn(y_rec[None], c_rec[None],
                                  y_org[None], c_org[None]))[0]
            psnrs[frame_idx] = float(vals[0])
            rgb_psnrs[frame_idx] = float(vals[1])
            msssims[frame_idx] = float(vals[2])
            if args.get("verbose", 0) >= 2:
                logger(f"frame {frame_idx}: bpp "
                       f"{bits[frame_idx] / frame_pixel_num:.4f} "
                       f"yuv-psnr {psnrs[frame_idx]:.3f} "
                       f"rgb-psnr {rgb_psnrs[frame_idx]:.3f}")
            if dec_writer is not None:
                y_np = np.clip(np.rint(np.asarray(y_rec[0, 0])),
                               0, 255).astype(np.uint8)
                y_np = y_np[pt:y_np.shape[0] - pb or None,
                            pl:y_np.shape[1] - pr or None]
                c_np = np.clip(np.rint(np.asarray(c_rec[:, 0])),
                               0, 255).astype(np.uint8)
                c_np = c_np[:, pt // 2:c_np.shape[1] - pb // 2 or None,
                            pl // 2:c_np.shape[2] - pr // 2 or None]
                dec_writer.write_one_frame(y_np, c_np[0], c_np[1])

    test_time = time.time() - start_time
    pad = frame_num - frame_num_eval
    if pad > 0:
        frame_types = frame_types[pad:]
        bits = bits[pad:]
        bpp_mv = bpp_mv[pad:]
        psnrs = psnrs[pad:]
        rgb_psnrs = rgb_psnrs[pad:]
        msssims = msssims[pad:]

    log = generate_log_json(frame_num_eval, frame_types, bits, bpp_mv,
                            psnrs, rgb_psnrs, msssims, frame_pixel_num,
                            test_time)
    if p_frames:
        log["avg_p_encoding_time_ms"] = enc_time / p_frames * 1000
        log["avg_p_decoding_time_ms"] = dec_time / p_frames * 1000
        if args.get("decode_async", False):
            # overlapped decode: per-pair decoding_time is 0 and only the
            # residual drain wait is observable — not comparable with the
            # sequential measurement (sync mode / the reference)
            log["decode_overlapped"] = True
            log["avg_p_decode_wait_ms"] = dec_wait_time / p_frames * 1000
    return log


_METRIC_PROGS = {}


def _frame_metrics_program(pt, pb, pl, pr, do_msssim):
    """Jitted, element-vmapped frame metrics: (N,...) recs + origs ->
    (N, 3) [yuv-psnr(6-1-1), rgb-psnr, ms-ssim]. One compiled program
    (and one host readback) replaces ~6 device round trips per
    (sequence, rate-point, frame) element."""
    key = (pt, pb, pl, pr, do_msssim)
    if key in _METRIC_PROGS:
        return _METRIC_PROGS[key]
    import jax
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.metrics import psnr as jpsnr, ms_ssim
    from learned_pmctf_tpu.ops.color import ycbcr_to_rgb, yuv420_to_444

    def one(y_rec, c_rec, y_org, c_org):
        y_rec = jnp.round(jnp.clip(y_rec, 0, 255))
        c_rec = jnp.round(jnp.clip(c_rec, 0, 255))
        y_hat = y_rec[:, :, pt:y_rec.shape[2] - pb or None,
                      pl:y_rec.shape[3] - pr or None]
        c_hat = c_rec[:, :, pt // 2:c_rec.shape[2] - pb // 2 or None,
                      pl // 2:c_rec.shape[3] - pr // 2 or None]
        y_psnr = jpsnr(y_hat, y_org)
        cb_psnr = jpsnr(c_hat[0:1], c_org[0:1])
        cr_psnr = jpsnr(c_hat[1:2], c_org[1:2])
        rec444 = yuv420_to_444(y_hat, c_hat[0:1], c_hat[1:2])
        org444 = yuv420_to_444(y_org, c_org[0:1], c_org[1:2])
        rec_rgb = jnp.round(ycbcr_to_rgb(rec444))
        org_rgb = jnp.round(ycbcr_to_rgb(org444))
        rgb_psnr = jpsnr(rec_rgb, org_rgb)
        ms = ms_ssim(rec_rgb, org_rgb) if do_msssim \
            else jnp.asarray(0.0, jnp.float32)
        return jnp.stack([(6.0 * y_psnr + cb_psnr + cr_psnr) / 8.0,
                          rgb_psnr, ms])

    fn = jax.jit(jax.vmap(one))
    _METRIC_PROGS[key] = fn
    return fn


def run_test_qbatch(codec, seq_args, q_list, logger=print):
    """Estimate-path eval with sequences × q-indices in one vmapped batch.

    q_index is a traced scalar (SURVEY §7.1), so the whole RD sweep runs
    as ONE program set with a leading axis of S·Q elements (element
    e = s·Q + qi codes sequence s at rate point q_list[qi]) — eval
    parallelism over sequences AND rate points (SURVEY §2.6 item 2).

    seq_args: one per-sequence arg dict, or a list of them with identical
    geometry (height/width/gop/frame count). Returns a list (one entry
    per sequence) of {q_idx: log} dicts like repeated run_test calls,
    but reading and coding every sequence exactly once.
    """
    import jax.numpy as jnp

    if isinstance(seq_args, dict):
        seq_args = [seq_args]
    args = seq_args[0]
    S = len(seq_args)
    Q = len(q_list)
    N = S * Q
    for other in seq_args[1:]:
        assert (other["src_height"], other["src_width"], other["gop_size"],
                other["frame_num"]) == (
            args["src_height"], args["src_width"], args["gop_size"],
            args["frame_num"]), "seq_batch groups must share geometry"
    # element e = s*Q + qi  →  q for element e:
    q_vec = list(np.tile(np.asarray(q_list), S))

    # Optional: shard the batch axis over a device mesh — each device
    # codes its own (sequence, rate-point) elements; all programs below
    # are vmapped over the axis, so the SPMD partitioner splits them
    # along the batch with no collectives.
    shard = None
    if args.get("shard_q"):
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as _P
        from learned_pmctf_tpu.parallel import make_mesh
        nd = _jax.device_count()
        while nd > 1 and N % nd:
            nd -= 1
        if nd > 1:
            shard = NamedSharding(make_mesh(nd), _P("data"))
            logger(f"q_batch sharded: {S} seqs x {Q} rate points over "
                   f"{nd} devices")

    frame_num_eval = args["frame_num"]
    gop_size = args["gop_size"]
    num_stages = max(1, int(math.log2(gop_size)))
    assert 2 ** num_stages == gop_size, gop_size
    frame_num = frame_num_eval
    if frame_num_eval % gop_size:
        frame_num += gop_size - frame_num_eval % gop_size
    gop_num = frame_num // gop_size

    readers = []
    for s, sa in enumerate(seq_args):
        if sa.get("synthetic", 0):
            h, w = sa["src_height"], sa["src_width"]
            rng = np.random.default_rng(s)

            def read_frame(i, rng=rng, h=h, w=w):
                return (rng.integers(0, 256, (h, w)).astype(np.uint8),
                        rng.integers(0, 256, (h // 2, w // 2)).astype(
                            np.uint8),
                        rng.integers(0, 256, (h // 2, w // 2)).astype(
                            np.uint8))
            readers.append(read_frame)
        else:
            start_frame = (sa["frame_num_seq"] - frame_num) \
                if sa.get("last_frames") else 0
            reader = YUVReader(sa["vid_path"], sa["src_width"],
                               sa["src_height"], start_index=start_frame)
            readers.append(lambda i, r=reader: r.read_one_frame())

    frame_types = [None] * frame_num
    per_sq = [{q: {"psnrs": [0.0] * frame_num, "rgb": [0.0] * frame_num,
                   "msssim": [0.0] * frame_num, "bits": [0.0] * frame_num,
                   "bpp_mv": [0.0] * frame_num} for q in q_list}
              for _ in range(S)]
    frame_pixel_num = args["src_height"] * args["src_width"]
    psize = 128
    pl, pr, pt, pb = get_padding_size(args["src_height"], args["src_width"],
                                      p=psize)
    start_time = time.time()
    frame_counter = 0
    for gop_idx in range(gop_num):
        frames = [None] * gop_size
        frames_orig = [None] * gop_size
        mvs = [None] * gop_size
        for i in range(gop_size):
            ys, cbs, crs = zip(*(readers[s](frame_counter)
                                 for s in range(S)))
            frame_counter += 1
            y = jnp.asarray(np.stack(ys), jnp.float32)[:, None, None]
            chroma = jnp.stack([
                jnp.asarray(np.stack(cbs), jnp.float32),
                jnp.asarray(np.stack(crs), jnp.float32)],
                axis=1)[:, :, None]            # (S, 2, 1, h/2, w/2)
            frames_orig[i] = (y, chroma)       # (S, 1, 1, H, W)
            y_p = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (pt, pb), (pl, pr)))
            c_p = jnp.pad(chroma, ((0, 0), (0, 0), (0, 0),
                                   (pt // 2, pb // 2), (pl // 2, pr // 2)))
            # leading axis: each sequence repeated per rate point
            y_q = jnp.repeat(y_p, Q, axis=0)
            c_q = jnp.repeat(c_p, Q, axis=0)
            if shard is not None:
                import jax as _jax
                y_q = _jax.device_put(y_q, shard)
                c_q = _jax.device_put(c_q, shard)
            frames[i] = (y_q, c_q)

        num_pairs = gop_size // 2
        for stage_idx in range(num_stages):
            dpb = {"mv_feature": None, "ref_mv_y": None}
            for gi in range(num_pairs):
                step = 2 ** stage_idx
                fi = gi * 2 * step
                code_lt = (stage_idx + 1) == num_stages
                me_num = min(codec.module.num_me_stages - 1, stage_idx)
                frame_idx = gop_idx * gop_size + fi
                result = codec.estimate_one_stage_multi(
                    frames[fi], frames[fi + step], code_lt, dpb,
                    q_vec, stage_idx=me_num)
                dpb = result["dpb"]
                frames[fi] = (result["L_t"], result["L_tc"])
                frames[fi + step] = (result["H_t"], result["H_tc"])
                mvs[fi + step] = result["mv_hat"]
                frame_types[frame_idx + step] = 1
                for s in range(S):
                    for qi, q in enumerate(q_list):
                        e = s * Q + qi
                        st = per_sq[s][q]
                        st["bits"][frame_idx + step] = float(
                            result["bit_H"][e] + result["bit_ME"][e])
                        st["bpp_mv"][frame_idx + step] = float(
                            result["bit_ME"][e]) / frame_pixel_num
                        if code_lt:
                            st["bits"][frame_idx] = float(result["bit_L"][e])
                if code_lt:
                    frame_types[frame_idx] = 0
            num_pairs //= 2

        num_pairs = 1
        for stage_idx in reversed(range(num_stages)):
            me_num = min(codec.module.num_me_stages - 1, stage_idx)
            for gi in reversed(range(num_pairs)):
                step = 2 ** stage_idx
                fi = gi * 2 * step
                ry, cy = codec.inverse_mctf_multi(
                    frames[fi][0], frames[fi + step][0], mvs[fi + step],
                    stage_idx=me_num)
                rc, cc = codec.inverse_mctf_multi(
                    frames[fi][1], frames[fi + step][1], mvs[fi + step],
                    stage_idx=me_num, downscale=True)
                frames[fi] = (ry, rc)
                frames[fi + step] = (cy, cc)
            num_pairs *= 2

        for i in range(gop_size):
            frame_idx = gop_idx * gop_size + i
            y_org_all, c_org_all = frames_orig[i]
            do_ms = y_org_all.shape[3] > 160 and y_org_all.shape[4] > 160
            mfn = _frame_metrics_program(pt, pb, pl, pr, do_ms)
            y_org_q = jnp.repeat(y_org_all, Q, axis=0)
            c_org_q = jnp.repeat(c_org_all, Q, axis=0)
            if shard is not None:
                import jax as _jax
                y_org_q = _jax.device_put(y_org_q, shard)
                c_org_q = _jax.device_put(c_org_q, shard)
            # ONE device program + ONE readback for every (seq, q) metric
            # of this frame (the per-element python loop costs a 40-70 ms
            # tunnel sync per float through the axon relay)
            vals = np.asarray(mfn(frames[i][0], frames[i][1],
                                  y_org_q, c_org_q))      # (N, 3)
            for s in range(S):
                for qi, q in enumerate(q_list):
                    e = s * Q + qi
                    st = per_sq[s][q]
                    st["psnrs"][frame_idx] = float(vals[e, 0])
                    st["rgb"][frame_idx] = float(vals[e, 1])
                    st["msssim"][frame_idx] = float(vals[e, 2])

    test_time = time.time() - start_time
    pad = frame_num - frame_num_eval
    logs = []
    for s in range(S):
        logs.append({})
        for q in q_list:
            st = per_sq[s][q]
            ft = frame_types[pad:] if pad > 0 else frame_types
            cut = (lambda v: v[pad:]) if pad > 0 else (lambda v: v)
            logs[s][q] = generate_log_json(
                frame_num_eval, ft, cut(st["bits"]), cut(st["bpp_mv"]),
                cut(st["psnrs"]), cut(st["rgb"]), cut(st["msssim"]),
                frame_pixel_num, test_time / N)
    return logs


def main(argv):
    begin = time.time()
    args = parse_args(argv)
    q_index_num_total = 21

    if args.q_index >= 0:
        q_list = [args.q_index]
    else:
        n = args.q_index_num
        q_max = q_index_num_total - 1
        step = int(q_max / n) + 1
        if (n - 1) * step > q_max:
            step -= 1
        q_list = [x * step for x in range(n)]
        q_list[-1] = q_max
    print(f"Testing q_index list: {q_list}")

    codec = build_codec(args)

    if args.synthetic:
        hw = args.synthetic_size.split("x")
        seqs = {"synthetic": {
            "height": int(hw[0]), "width": int(hw[1]),
            "frames": args.synthetic, "gop": args.force_intra_period
            if args.force_intra_period > 0 else 4}}
        config = {"synthetic_ds": {"test": 1, "base_path": ".",
                                   "src_type": "yuv420", "sequences": seqs}}
        root_path = "."
    else:
        with open(args.test_config) as f:
            cfg = json.load(f)
        root_path = args.force_root_path or cfg["root_path"]
        config = cfg["test_classes"]
        if args.ds_name is not None:
            config = {args.ds_name: config[args.ds_name]}
            if args.seq_num >= 0:
                k, v = list(config[args.ds_name]["sequences"].items())[args.seq_num]
                config[args.ds_name]["sequences"] = {k: v}

    use_qbatch = not args.write_stream and (
        (args.q_batch and len(q_list) > 1) or args.seq_batch > 0)
    qbatch_cache = {}

    def make_cur(seq_name, seq, ds):
        cur = {
            "q_idx": None,   # q comes from q_list on the batched path
            "src_height": seq["height"],
            "src_width": seq["width"],
            "gop_size": args.force_intra_period
            if args.force_intra_period > 0 else seq["gop"],
            "frame_num": args.force_frame_num
            if args.force_frame_num > 0 else seq["frames"],
            "frame_num_seq": seq["frames"],
            "write_stream": False,
            "skip_decoding": args.skip_decoding,
            "last_frames": args.last_frames,
            "verbose": args.verbose,
            "synthetic": args.synthetic,
            "shard_q": args.shard_q,
            "vid_path": os.path.join(root_path, ds["base_path"],
                                     seq_name + ".yuv"),
        }
        return cur

    def geom(seq):
        return (seq["height"], seq["width"],
                args.force_intra_period if args.force_intra_period > 0
                else seq["gop"],
                args.force_frame_num if args.force_frame_num > 0
                else seq["frames"])

    res_summary = {"bpp": [], "psnr-rgb": [], "psnr-yuv": [], "quality": [],
                   "ms-ssim-rgb": [], "bpp_mv": []}
    for q_idx in q_list:
        log_result = {}
        for ds_name, ds in config.items():
            if ds["test"] == 0:
                continue
            log_result[ds_name] = {}
            for seq_name, seq in ds["sequences"].items():
                cur = {
                    "q_idx": q_idx,
                    "src_height": seq["height"],
                    "src_width": seq["width"],
                    "gop_size": args.force_intra_period
                    if args.force_intra_period > 0 else seq["gop"],
                    "frame_num": args.force_frame_num
                    if args.force_frame_num > 0 else seq["frames"],
                    "frame_num_seq": seq["frames"],
                    "write_stream": args.write_stream,
                    "skip_decoding": args.skip_decoding,
                    "decode_async": args.decode_async,
                    "last_frames": args.last_frames,
                    "verbose": args.verbose,
                    "synthetic": args.synthetic,
                    "shard_q": args.shard_q,
                    "vid_path": os.path.join(root_path, ds["base_path"],
                                             seq_name + ".yuv"),
                }
                if args.write_stream:
                    bin_folder = os.path.join(args.stream_path, seq_name,
                                              f"q{q_idx}")
                    create_folder(bin_folder, True)
                    cur["bin_folder"] = bin_folder
                if args.save_decoded_frame:
                    dec_folder = os.path.join(args.decoded_frame_path,
                                              seq_name, f"q{q_idx}")
                    create_folder(dec_folder, True)
                    cur["decoded_frame_folder"] = dec_folder
                print(f"CODING {seq_name} q_index={q_idx}")
                if use_qbatch:
                    key = (ds_name, seq_name)
                    if key not in qbatch_cache:
                        members = [(seq_name, seq)]
                        if args.seq_batch > 1:
                            for nm, sq in ds["sequences"].items():
                                if (nm == seq_name
                                        or (ds_name, nm) in qbatch_cache
                                        or len(members) >= args.seq_batch):
                                    continue
                                if geom(sq) == geom(seq):
                                    members.append((nm, sq))
                        if len(members) > 1:
                            print(f"seq_batch: coding {len(members)} "
                                  f"sequences together: "
                                  f"{[m[0] for m in members]}")
                        curs = [make_cur(nm, sq, ds) for nm, sq in members]
                        logs = run_test_qbatch(codec, curs, q_list)
                        for (nm, _), lg in zip(members, logs):
                            qbatch_cache[(ds_name, nm)] = lg
                    res = qbatch_cache[key][q_idx]
                else:
                    res = run_test(codec, cur)
                res["ds_name"] = ds_name
                res["video_path"] = seq_name
                log_result[ds_name][seq_name] = res

            ave = {k: [] for k in (
                "test_time", "ave_p_frame_bpp", "ave_p_frame_psnr",
                "ave_p_frame_psnr_rgb", "ave_p_frame_msssim",
                "ave_all_frame_bpp", "ave_all_frame_bpp_mv",
                "ave_all_frame_psnr", "ave_all_frame_psnr_rgb",
                "ave_all_frame_msssim")}
            for seq_name in ds["sequences"]:
                for k in ave:
                    ave[k].append(log_result[ds_name][seq_name].get(k, 0.0))
            log_result[ds_name]["AVERAGE"] = {
                k: float(np.mean(v)) for k, v in ave.items()}
            avg = log_result[ds_name]["AVERAGE"]
            res_summary["bpp"].append(avg["ave_all_frame_bpp"])
            res_summary["bpp_mv"].append(avg["ave_all_frame_bpp_mv"])
            res_summary["psnr-rgb"].append(avg["ave_all_frame_psnr_rgb"])
            res_summary["psnr-yuv"].append(avg["ave_all_frame_psnr"])
            res_summary["ms-ssim-rgb"].append(avg["ave_all_frame_msssim"])
            res_summary["quality"].append(str(q_idx))

        out_path = args.output_path.replace(".json", f"_qidx{q_idx}.json")
        out_dir = os.path.dirname(out_path)
        if out_dir:
            create_folder(out_dir, True)
        with open(out_path, "w") as fp:
            dump_json(log_result, fp, float_digits=6, indent=2)
        print(f"wrote {out_path}")

    with open(args.output_path.replace(".json", "_summary.json"), "w") as fp:
        dump_json(res_summary, fp, float_digits=6, indent=2)
    print(f"Total elapsed time: {(time.time() - begin) / 60:.1f} min")


if __name__ == "__main__":
    main(sys.argv[1:])
