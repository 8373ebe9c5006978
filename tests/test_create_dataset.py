"""End-to-end validation of the dataset-creation pipeline on real imagery.

Synthesizes a multi-shot "video" (PNG frame dir: three shots with hard
cuts, low-frequency textures, in-shot translation), then drives the full
offline pipeline: shot detection + clip extraction -> GIST near-duplicate
exclusion -> exclusion apply -> per-clip SpyNet flow stats.
ref: create-dataset/extract_clips.py, gist_shot_exclusion.py,
average_flow.py (TransNetV2/lear_gist replaced by dependency-free
detectors — see create_dataset/README.md).
"""

import json
import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.join(REPO, "create_dataset"))

W, H = 448, 256
SHOT_LEN = 36


def _shot_texture(seed: int) -> np.ndarray:
    """Low-frequency RGB texture: translation keeps SAD/histograms stable
    within a shot while different seeds produce distinct scenes."""
    rng = np.random.default_rng(seed)
    small = rng.uniform(0, 255, (8, 14, 3)).astype(np.uint8)
    img = Image.fromarray(small).resize((2 * W, H), Image.BILINEAR)
    return np.asarray(img)


def _make_video(video_dir: str) -> None:
    os.makedirs(video_dir, exist_ok=True)
    idx = 0
    for shot, (seed, speed) in enumerate([(0, 3), (1, 2), (2, 0)]):
        tex = _shot_texture(seed)
        for t in range(SHOT_LEN):
            frame = np.roll(tex, shift=speed * t, axis=1)[:, :W]
            Image.fromarray(frame).save(
                osp.join(video_dir, f"f{idx:05d}.png"))
            idx += 1


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("vimeo32")
    video_dir = str(root / "videos" / "synth0")
    out_dir = str(root / "dataset")
    _make_video(video_dir)

    import extract_clips
    extract_clips.main(["--videos", str(root / "videos"),
                        "--out", out_dir, "--clip_len", "32"])
    return root, out_dir


def _clip_folders(out_dir):
    seq = osp.join(out_dir, "sequences")
    return sorted(
        osp.join(seq, a, b)
        for a in os.listdir(seq) for b in os.listdir(osp.join(seq, a)))


def test_extract_clips_respects_shot_boundaries(pipeline_dirs):
    _, out_dir = pipeline_dirs
    clips = _clip_folders(out_dir)
    # three 36-frame shots -> one 32-frame clip per shot, none straddling
    assert len(clips) == 3
    for folder in clips:
        ims = sorted(os.listdir(folder))
        assert len(ims) == 32 and ims[0] == "im1.png"
        frames = [np.asarray(Image.open(osp.join(folder, f)), np.float32)
                  for f in (ims[0], ims[-1])]
        assert frames[0].shape == (H, W, 3)
        # a straddled cut would make first/last frames unrelated scenes;
        # within a shot the texture only translates, so the histogram
        # distance stays tiny
        import extract_clips
        hd = float(np.abs(extract_clips.hsv_hist(frames[0].astype(np.uint8))
                          - extract_clips.hsv_hist(frames[1].astype(np.uint8))
                          ).sum()) / 6.0
        assert hd < 0.2, (folder, hd)


def test_gist_exclusion_flags_duplicate_and_delete_applies(pipeline_dirs):
    _, out_dir = pipeline_dirs
    clips = _clip_folders(out_dir)
    # plant a near-duplicate: copy clip 0 under a new (later) key
    dup = osp.join(out_dir, "sequences", "00099", "0000")
    shutil.copytree(clips[0], dup)

    import gist_shot_exclusion
    excl_json = osp.join(out_dir, "excluded.json")
    gist_shot_exclusion.main(["--data", out_dir, "--out", excl_json])
    with open(excl_json) as f:
        excluded = json.load(f)
    assert "00099/0000" in excluded
    # distinct scenes must NOT be excluded
    originals = {"/".join(c.split("/")[-2:]) for c in clips}
    assert not originals & set(excluded)

    import delete_excluded_shots
    delete_excluded_shots.main(["--data", out_dir, "--excluded", excl_json])
    assert not osp.isdir(dup)
    assert all(osp.isdir(c) for c in clips)


@pytest.mark.slow
def test_average_flow_stats(pipeline_dirs):
    """average_flow runs the framework SpyNet over every clip and writes
    finite per-clip stats (random init — magnitudes are arbitrary but the
    pipeline, shapes and JSON layout are exercised for real)."""
    root, out_dir = pipeline_dirs
    stats_json = str(root / "flow_stats.json")
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "create_dataset", "average_flow.py"),
         "--data", out_dir, "--out", stats_json],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(stats_json) as f:
        stats = json.load(f)
    assert len(stats) == 3
    assert all(np.isfinite(v) and v >= 0 for v in stats.values())
