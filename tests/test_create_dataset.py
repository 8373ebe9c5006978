"""Dataset-creation pipeline validation on synthetic video.

Exercises the offline vimeo-32 pipeline (create_dataset/) end-to-end on a
generated 3-scene video: shot detection must find the histogram+SAD cuts,
clip extraction must respect shot bounds and the 32-frame minimum, GIST
exclusion must flag exactly the near-duplicate clip, and deletion must
apply the exclusion list. ref: create-dataset/extract_clips.py:9-50,
gist_shot_exclusion.py:16-36, delete_excluded_shots.py.
"""

import glob
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _write_scenes(vdir):
    """120 frames: scene A (0-47, bright/red), cut, scene B (48-99,
    dark/blue), cut, scene C (100-119, too short for a clip)."""
    rng = np.random.default_rng(0)
    h, w = 256, 448
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    tex_a = rng.integers(0, 40, (h, w, 3)).astype(np.float32)
    tex_b = rng.integers(0, 40, (h, w, 3)).astype(np.float32)
    for i in range(120):
        if i < 48:
            base = np.stack([np.full_like(xx, 220),
                             (xx * 0.3 + 3 * i) % 80 + 120,
                             np.full_like(xx, 180)], -1) + tex_a
        elif i < 100:
            base = np.stack([np.full_like(xx, 20),
                             (yy * 0.3 + 2 * (i - 48)) % 60,
                             np.full_like(xx, 90)], -1) + tex_b
        else:
            base = np.stack([np.full_like(xx, 100),
                             np.full_like(xx, 180),
                             (xx * 0.2 + 5 * i) % 60 + 60], -1)
        Image.fromarray(np.clip(base, 0, 255).astype(np.uint8)).save(
            osp.join(vdir, f"f{i:04d}.png"))


def _run(script, *args):
    proc = subprocess.run(
        [sys.executable, osp.join(ROOT, "create_dataset", script), *args],
        capture_output=True, text=True, timeout=600, cwd=ROOT)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def test_pipeline_end_to_end(tmp_path):
    vdir = tmp_path / "videos" / "vid1"
    vdir.mkdir(parents=True)
    _write_scenes(str(vdir))
    clips = tmp_path / "clips"

    _run("extract_clips.py", "--videos", str(tmp_path / "videos"),
         "--out", str(clips))
    starts = []
    src0 = np.asarray(Image.open(vdir / "f0000.png"))
    src48 = np.asarray(Image.open(vdir / "f0048.png"))
    folders = sorted(glob.glob(str(clips / "sequences" / "*" / "*")))
    # scene A (48 frames) -> 1 clip; scene B (52) -> 1; scene C (20) -> 0
    assert len(folders) == 2, folders
    im_a = np.asarray(Image.open(osp.join(folders[0], "im1.png")))
    im_b = np.asarray(Image.open(osp.join(folders[1], "im1.png")))
    assert np.array_equal(im_a, src0)
    assert np.array_equal(im_b, src48)
    assert len(glob.glob(osp.join(folders[0], "im*.png"))) == 32

    # near-duplicate of clip 0 -> must be the ONLY exclusion
    dup = osp.join(osp.dirname(folders[0]), "0002")
    os.makedirs(dup)
    rng = np.random.default_rng(1)
    for p in sorted(glob.glob(osp.join(folders[0], "im*.png"))):
        a = np.asarray(Image.open(p)).astype(np.int16)
        a = np.clip(a + rng.integers(-3, 4, a.shape), 0, 255)
        Image.fromarray(a.astype(np.uint8)).save(
            osp.join(dup, osp.basename(p)))

    excl = tmp_path / "excluded.json"
    out = _run("gist_shot_exclusion.py", "--data", str(clips),
               "--out", str(excl))
    assert "1 / 3" in out, out
    assert json.load(open(excl)) == ["00000/0002"]

    _run("delete_excluded_shots.py", "--data", str(clips),
         "--excluded", str(excl))
    assert sorted(osp.basename(f) for f in
                  glob.glob(str(clips / "sequences" / "00000" / "*"))) == \
        ["0000", "0001"]


@pytest.mark.slow
def test_average_flow_stats(tmp_path):
    """average_flow runs the framework SpyNet over every extracted clip
    and writes finite per-clip stats (random init — magnitudes are
    arbitrary, but the real pipeline, shapes and JSON layout are
    exercised). ref: create-dataset/average_flow.py:23-40."""
    vdir = tmp_path / "videos" / "vid1"
    vdir.mkdir(parents=True)
    _write_scenes(str(vdir))
    clips = tmp_path / "clips"
    _run("extract_clips.py", "--videos", str(tmp_path / "videos"),
         "--out", str(clips))

    stats_json = str(tmp_path / "flow_stats.json")
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, osp.join(ROOT, "create_dataset", "average_flow.py"),
         "--data", str(clips), "--out", stats_json],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(stats_json) as f:
        stats = json.load(f)
    assert sorted(stats) == ["00000/0000", "00000/0001"]
    assert all(np.isfinite(v) and v >= 0 for v in stats.values())
