"""Content-adaptive evaluation CLI: per-chunk search over GOP sizes and
ME downsampling factors with greedy early exit.

ref: test_pMCTF_CA.py:24-660. For each max-GOP chunk the encoder tries
GOP sizes {gop, gop/2, ..., >=4} and ME downsample factors {1,2,4,8},
computes RD = sum(bpp) + lambda * sum(mse), and greedily picks the best
combination (early-exiting as soon as RD increases). Logs gop_choice /
ds_choice / tested_opts per chunk like the reference.
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
from learned_pmctf_tpu.utils.yuv import YUVReader
from test_pmctf_flex import build_codec


def parse_args(argv):
    p = argparse.ArgumentParser(description="pMCTF content-adaptive eval")
    p.add_argument("--force_frame_num", type=int, default=-1)
    p.add_argument("--last_frames", action="store_true")
    p.add_argument("--force_intra_period", type=int, default=16)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--test_config", type=str, default=None)
    p.add_argument("--force_root_path", type=str, default=None)
    p.add_argument("--write_stream", type=str2bool, nargs="?", const=True,
                   default=False)
    p.add_argument("--stream_path", type=str, default="out_bin")
    p.add_argument("--output_path", type=str, default="output_ca.json")
    p.add_argument("--verbose", type=int, default=0)
    p.add_argument("--seq_num", type=int, default=-1)
    p.add_argument("--ds_name", type=str, default=None)
    p.add_argument("--lossless", action="store_true")
    p.add_argument("--skip_decoding", action="store_true")
    p.add_argument("--num_me_stages", default=1, type=int)
    p.add_argument("--q_index", default=0, type=int)
    p.add_argument("--ll_mode", default="fourstep", choices=("fourstep", "ar"))
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_size", type=str, default="256x256")
    p.add_argument("--features", type=int, default=112)
    p.add_argument("--ar_features", type=int, default=128)
    p.add_argument("--channel_mv", type=int, default=64)
    p.add_argument("--decomp_levels", type=int, default=4)
    p.add_argument("--warp_mode", default="exact", choices=("exact", "fast"))
    return p.parse_args(argv)


def get_cur_lamda(q_index: int, qp_num: int):
    """RD lambda for the search. ref: test_pMCTF_CA.py (log interp 1..27)."""
    lam_min, lam_max = 1.0, 27.0
    step = (math.log(lam_max) - math.log(lam_min)) / (qp_num - 1)
    return math.exp(math.log(lam_min) + step * q_index) * 0.003


def psnr_to_mse(p):
    return (255.0 ** 2) / (10 ** (p / 10.0))


def code_one_gop(codec, frames_orig, padded, pads, args, gop_size: int,
                 me_downsample: int, q_index: int, bin_folder=None):
    """Code one (sub-)GOP, return per-frame logs.

    ref: test_pMCTF_CA.py:105-300 code_one_gop."""
    import jax.numpy as jnp
    from learned_pmctf_tpu.utils.metrics import psnr as jpsnr

    pl, pr, pt, pb = pads
    num_stages = max(1, int(math.log2(gop_size)))
    frames = list(padded)
    mvs = [None] * gop_size
    bits = [0.0] * gop_size
    bpp_mv = [0.0] * gop_size
    frame_types = [None] * gop_size
    enc_time = dec_time = 0.0
    p_frames = 0
    pixel_num = args["src_height"] * args["src_width"]

    num_pairs = gop_size // 2
    for stage_idx in range(num_stages):
        dpb = {"mv_feature": None, "ref_mv_y": None}
        for gi in range(num_pairs):
            step = 2 ** stage_idx
            fi = gi * 2 * step
            code_lt = (stage_idx + 1) == num_stages
            me_num = min(codec.module.num_me_stages - 1, stage_idx)
            if bin_folder is not None:
                bin_path = os.path.join(bin_folder, f"{fi + step}.bin")
                result = codec.encode_one_stage(
                    frames[fi], frames[fi + step], code_lt, dpb,
                    output_path=bin_path, pic_width=args["src_width"],
                    pic_height=args["src_height"], psize=128,
                    skip_decoding=args.get("skip_decoding", False),
                    stage_idx=me_num, q_index=q_index,
                    me_downsample=me_downsample)
            else:
                result = codec.estimate_one_stage(
                    frames[fi], frames[fi + step], code_lt, dpb,
                    stage_idx=me_num, q_index=q_index,
                    me_downsample=me_downsample)
            dpb = result["dpb"]
            frames[fi] = (result["L_t"], result["L_tc"])
            frames[fi + step] = (result["H_t"], result["H_tc"])
            mvs[fi + step] = result["mv_hat"]
            frame_types[fi + step] = 1
            p_frames += 1
            enc_time += result["encoding_time"]
            dec_time += result["decoding_time"]
            bits[fi + step] = float(result["bit_H"]) + float(result["bit_ME"])
            bpp_mv[fi + step] = float(result["bit_ME"]) / pixel_num
            if code_lt:
                frame_types[fi] = 0
                bits[fi] = float(result["bit_L"])
        num_pairs //= 2

    num_pairs = 1
    for stage_idx in reversed(range(num_stages)):
        me_num = min(codec.module.num_me_stages - 1, stage_idx)
        for gi in reversed(range(num_pairs)):
            step = 2 ** stage_idx
            fi = gi * 2 * step
            l_y, l_c = frames[fi]
            h_y, h_c = frames[fi + step]
            ry, cy = codec.inverse_mctf(l_y, h_y, mvs[fi + step],
                                        stage_idx=me_num)
            rc, cc = codec.inverse_mctf(l_c, h_c, mvs[fi + step],
                                        stage_idx=me_num, downscale=True)
            frames[fi] = (ry, rc)
            frames[fi + step] = (cy, cc)
        num_pairs *= 2

    psnrs, bpps = [], []
    for i in range(gop_size):
        y_rec, c_rec = frames[i]
        y_org, c_org = frames_orig[i]
        y_rec = jnp.round(jnp.clip(y_rec, 0, 255))
        c_rec = jnp.round(jnp.clip(c_rec, 0, 255))
        y_hat = y_rec[:, :, pt:y_rec.shape[2] - pb or None,
                      pl:y_rec.shape[3] - pr or None]
        c_hat = c_rec[:, :, pt // 2:c_rec.shape[2] - pb // 2 or None,
                      pl // 2:c_rec.shape[3] - pr // 2 or None]
        y_psnr = float(jpsnr(y_hat, y_org))
        cb_psnr = float(jpsnr(c_hat[0:1], c_org[0:1]))
        cr_psnr = float(jpsnr(c_hat[1:2], c_org[1:2]))
        psnrs.append((6.0 * y_psnr + cb_psnr + cr_psnr) / 8.0)
        bpps.append(bits[i] / pixel_num)

    return {"psnrs": psnrs, "bpps": bpps, "bits": bits, "bpp_mv": bpp_mv,
            "frame_types": frame_types, "p_frame_number": p_frames,
            "overall_p_encoding_time": enc_time,
            "overall_p_decoding_time": dec_time}


def run_test(codec, args):
    import jax.numpy as jnp

    frame_num_eval = args["frame_num"]
    gop_size = args["gop_size"]
    frame_num = frame_num_eval
    if frame_num_eval % gop_size:
        frame_num += gop_size - frame_num_eval % gop_size
    gop_num = frame_num // gop_size
    q_index = args["q_idx"]
    qp_num = codec.module.get_qp_num()
    lam = get_cur_lamda(q_index, qp_num)

    synthetic = args.get("synthetic", 0)
    if synthetic:
        h, w = args["src_height"], args["src_width"]
        rng = np.random.default_rng(0)

        def read_frame():
            return (rng.integers(0, 256, (h, w)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8),
                    rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8))
    else:
        start = (args["frame_num_seq"] - frame_num) if args.get("last_frames") else 0
        reader = YUVReader(args["vid_path"], args["src_width"],
                           args["src_height"], start_index=start)

        def read_frame():
            return reader.read_one_frame()

    pads = get_padding_size(args["src_height"], args["src_width"], p=128)
    pl, pr, pt, pb = pads

    test_gops = [gop_size]
    while test_gops[-1] // 2 >= 4:
        test_gops.append(test_gops[-1] // 2)
    # the 6-level SpyNet pyramid needs >=64 px after ME downsampling
    # (the reference grows its padding with ds instead,
    # ref: test_pMCTF_CA.py:121-123; at the UVG resolutions both
    # formulations admit every factor)
    pad_h = args["src_height"] + pt + pb
    pad_w = args["src_width"] + pl + pr
    ds_factors = [d for d in (1, 2, 4, 8)
                  if min(pad_h, pad_w) // d >= 64]

    logs = {k: [0.0] * frame_num for k in
            ("psnrs", "bpps", "bits", "bpp_mv")}
    logs["frame_types"] = [None] * frame_num
    logs["gop_choice"] = []
    logs["ds_choice"] = []
    logs["tested_opts"] = []
    p_frames = 0
    enc_time = dec_time = 0.0

    start_time = time.time()
    for gop_idx in range(gop_num):
        frames_orig = []
        padded = []
        for _ in range(gop_size):
            y, cb, cr = read_frame()
            y = jnp.asarray(y, jnp.float32)[None, None]
            chroma = jnp.stack([jnp.asarray(cb, jnp.float32),
                                jnp.asarray(cr, jnp.float32)])[:, None]
            frames_orig.append((y, chroma))
            y_p = jnp.pad(y, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
            c_p = jnp.pad(chroma, ((0, 0), (0, 0), (pt // 2, pb // 2),
                                   (pl // 2, pr // 2)))
            padded.append((y_p, c_p))

        # greedy (gop, ds) search with early exit
        # ref: test_pMCTF_CA.py:375-421
        all_res = {g: {} for g in test_gops}
        best_gop = -1
        best_ds = None
        tested = 0
        stop = False
        for ds_idx, ds in enumerate(ds_factors):
            cur_gop_idx = 0
            for cur_gop_idx, g in enumerate(test_gops):
                if best_gop >= 0 and cur_gop_idx != best_gop:
                    continue
                tested += 1
                rd = 0.0
                merged = None
                for sub in range(gop_size // g):
                    res = code_one_gop(
                        codec, frames_orig[sub * g:(sub + 1) * g],
                        padded[sub * g:(sub + 1) * g], pads, args, g, ds,
                        q_index,
                        bin_folder=args.get("bin_folder"))
                    rd += sum(res["bpps"]) + lam * sum(
                        psnr_to_mse(p) for p in res["psnrs"])
                    if merged is None:
                        merged = {k: (list(v) if isinstance(v, list) else v)
                                  for k, v in res.items()}
                    else:
                        for k, v in res.items():
                            if isinstance(v, list):
                                merged[k].extend(v)
                            else:
                                merged[k] += v
                merged["rd"] = rd
                all_res[g][ds] = merged
                if best_gop == -1 and cur_gop_idx > 0 and \
                        all_res[test_gops[cur_gop_idx - 1]][ds]["rd"] < rd:
                    best_gop = cur_gop_idx - 1
                    break
                if best_gop >= 0 and ds_idx > 0 and \
                        all_res[test_gops[best_gop]][ds_factors[ds_idx - 1]]["rd"] < rd:
                    best_ds = ds_factors[ds_idx - 1]
                    stop = True
                    break
            if best_gop == -1:
                best_gop = cur_gop_idx
            if stop:
                break
            if ds_idx > 0 and \
                    all_res[test_gops[best_gop]][ds_factors[ds_idx - 1]]["rd"] < \
                    all_res[test_gops[best_gop]][ds]["rd"]:
                best_ds = ds_factors[ds_idx - 1]
                break
        if best_ds is None:
            best_ds = max(d for d in all_res[test_gops[best_gop]])

        best = all_res[test_gops[best_gop]][best_ds]
        logs["gop_choice"].append(test_gops[best_gop])
        logs["ds_choice"].append(best_ds)
        logs["tested_opts"].append(tested)
        fi = gop_idx * gop_size
        for k in ("psnrs", "bpps", "bits", "bpp_mv", "frame_types"):
            logs[k][fi:fi + gop_size] = best[k]
        p_frames += best["p_frame_number"]
        enc_time += best["overall_p_encoding_time"]
        dec_time += best["overall_p_decoding_time"]
        if args.get("verbose", 0) >= 1:
            print(f"GOP {gop_idx}: best gop={test_gops[best_gop]} "
                  f"ds={best_ds} tested={tested}")

    test_time = time.time() - start_time
    pad_n = frame_num - frame_num_eval
    for k in ("psnrs", "bpps", "bits", "bpp_mv", "frame_types"):
        logs[k] = logs[k][pad_n:]

    pixel_num = args["src_height"] * args["src_width"]
    zero = [0.0] * len(logs["bits"])
    log = generate_log_json(
        frame_num_eval, logs["frame_types"], logs["bits"], logs["bpp_mv"],
        logs["psnrs"], zero, zero, pixel_num, test_time,
        gop_choice=logs["gop_choice"], ds_choice=logs["ds_choice"],
        tested_opts=logs["tested_opts"])
    if p_frames:
        log["avg_p_encoding_time_ms"] = enc_time / p_frames * 1000
        log["avg_p_decoding_time_ms"] = dec_time / p_frames * 1000
    return log


def main(argv):
    args = parse_args(argv)
    codec = build_codec(args)

    if args.synthetic:
        hw = args.synthetic_size.split("x")
        config = {"synthetic_ds": {"test": 1, "base_path": ".",
                                   "src_type": "yuv420", "sequences": {
            "synthetic": {"height": int(hw[0]), "width": int(hw[1]),
                          "frames": args.synthetic,
                          "gop": args.force_intra_period}}}}
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

    log_result = {}
    for ds_name, ds in config.items():
        if ds["test"] == 0:
            continue
        log_result[ds_name] = {}
        for seq_name, seq in ds["sequences"].items():
            cur = {
                "q_idx": args.q_index,
                "src_height": seq["height"],
                "src_width": seq["width"],
                "gop_size": args.force_intra_period,
                "frame_num": args.force_frame_num
                if args.force_frame_num > 0 else seq["frames"],
                "frame_num_seq": seq["frames"],
                "skip_decoding": args.skip_decoding,
                "last_frames": args.last_frames,
                "verbose": args.verbose,
                "synthetic": args.synthetic,
                "vid_path": os.path.join(root_path, ds["base_path"],
                                         seq_name + ".yuv"),
            }
            if args.write_stream:
                bin_folder = os.path.join(args.stream_path, seq_name,
                                          f"q{args.q_index}_ca")
                create_folder(bin_folder, True)
                cur["bin_folder"] = bin_folder
            print(f"CA CODING {seq_name} q_index={args.q_index}")
            res = run_test(codec, cur)
            res["ds_name"] = ds_name
            res["video_path"] = seq_name
            log_result[ds_name][seq_name] = res

    out_dir = os.path.dirname(args.output_path)
    if out_dir:
        create_folder(out_dir, True)
    with open(args.output_path, "w") as fp:
        dump_json(log_result, fp, float_digits=6, indent=2)
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main(sys.argv[1:])
