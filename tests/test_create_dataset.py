"""Tests for the offline dataset-creation pipeline pieces."""

import sys
import os.path as osp

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                            "create_dataset"))

from gist import gist_descriptor, gist_distance  # noqa: E402
from extract_clips import detect_shots, block_sad, hsv_hist  # noqa: E402


def test_gist_descriptor_shape_and_discrimination():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 255, (128, 128))
    b = a + rng.normal(0, 2, a.shape)          # near-duplicate
    c = rng.uniform(0, 255, (128, 128))        # different scene
    da, db, dc = (gist_descriptor(x) for x in (a, b, c))
    assert da.shape == (4 * 4 * 32,)

    def norm(d):
        return d / (np.linalg.norm(d) + 1e-9)

    near = gist_distance(norm(da), norm(db))
    far = gist_distance(norm(da), norm(dc))
    assert near < far


def test_shot_detection_finds_cut():
    rng = np.random.default_rng(1)
    scene_a = rng.integers(0, 80, (10, 64, 64, 3)).astype(np.uint8)
    scene_b = rng.integers(170, 255, (10, 64, 64, 3)).astype(np.uint8)
    frames = list(scene_a) + list(scene_b)
    shots = detect_shots(frames)
    assert len(shots) == 2
    assert shots[0] == (0, 10)
    assert shots[1] == (10, 20)


def test_block_sad_zero_for_identical():
    f = np.random.default_rng(2).integers(0, 255, (64, 64, 3)).astype(np.uint8)
    assert block_sad(f, f) == 0.0
    assert hsv_hist(f).shape == (48,)
