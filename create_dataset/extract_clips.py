"""Shot detection + 32-frame 448x256 clip extraction.

ref: create-dataset/extract_clips.py:9-50 (TransNetV2-based). The vendored
TensorFlow TransNetV2 is replaced by a dependency-free dual-signal shot
detector: per-frame HSV histogram distance + block-SAD, with hysteresis
thresholds. Clips of >= 32 frames inside stable shots are resized to
448x256 and written as PNG sequences in the vimeo-32 layout.

Usage:
  python create_dataset/extract_clips.py --videos DIR --out DIR \
      [--clip_len 32] [--size 448x256]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import subprocess
import sys

import numpy as np
from PIL import Image


def hsv_hist(frame: np.ndarray, bins: int = 16) -> np.ndarray:
    """Per-channel HSV histograms, each normalized to sum 1."""
    img = Image.fromarray(frame).convert("HSV")
    arr = np.asarray(img)
    hist = [np.histogram(arr[..., c], bins=bins, range=(0, 255))[0]
            / arr[..., c].size for c in range(3)]
    return np.concatenate(hist)


def block_sad(a: np.ndarray, b: np.ndarray, block: int = 16) -> float:
    a = a.astype(np.float32).mean(axis=2)
    b = b.astype(np.float32).mean(axis=2)
    h = a.shape[0] // block * block
    w = a.shape[1] // block * block
    d = np.abs(a[:h, :w] - b[:h, :w])
    d = d.reshape(h // block, block, w // block, block).mean(axis=(1, 3))
    return float(np.median(d))


def detect_shots(frames, hist_thresh: float = 0.35, sad_thresh: float = 25.0):
    """Yield (start, end) shot spans over a frame iterator (np arrays)."""
    shots = []
    start = 0
    prev = None
    prev_hist = None
    for i, frame in enumerate(frames):
        if prev is not None:
            hd = float(np.abs(hsv_hist(frame) - prev_hist).sum()) / 6.0
            sd = block_sad(prev, frame)
            if hd > hist_thresh and sd > sad_thresh:
                shots.append((start, i))
                start = i
        prev = frame
        prev_hist = hsv_hist(frame)
        last = i
    shots.append((start, last + 1))
    return shots


def iter_video_frames(path: str, size=None):
    """Decode frames via ffmpeg (rawvideo pipe); falls back to PNG dirs."""
    if osp.isdir(path):
        for p in sorted(os.listdir(path)):
            if p.endswith((".png", ".jpg")):
                img = Image.open(osp.join(path, p)).convert("RGB")
                if size:
                    img = img.resize(size, Image.BILINEAR)
                yield np.asarray(img)
        return
    w, h = size or (448, 256)
    cmd = ["ffmpeg", "-nostdin", "-i", path, "-f", "rawvideo",
           "-pix_fmt", "rgb24", "-s", f"{w}x{h}", "-v", "error", "-"]
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
    frame_bytes = w * h * 3
    while True:
        buf = proc.stdout.read(frame_bytes)
        if len(buf) < frame_bytes:
            break
        yield np.frombuffer(buf, np.uint8).reshape(h, w, 3)
    proc.wait()


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--videos", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--clip_len", type=int, default=32)
    p.add_argument("--size", type=str, default="448x256")
    args = p.parse_args(argv)

    w, h = (int(v) for v in args.size.split("x"))
    videos = sorted(
        osp.join(args.videos, v) for v in os.listdir(args.videos))
    clip_id = 0
    for vid in videos:
        frames = list(iter_video_frames(vid, size=(w, h)))
        if len(frames) < args.clip_len:
            continue
        for start, end in detect_shots(frames):
            for cstart in range(start, end - args.clip_len + 1,
                                args.clip_len):
                folder = osp.join(args.out, "sequences",
                                  f"{clip_id // 1000:05d}",
                                  f"{clip_id % 1000:04d}")
                os.makedirs(folder, exist_ok=True)
                for j in range(args.clip_len):
                    Image.fromarray(frames[cstart + j]).save(
                        osp.join(folder, f"im{j + 1}.png"))
                clip_id += 1
        print(f"{vid}: total clips {clip_id}")
    print(f"extracted {clip_id} clips to {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
