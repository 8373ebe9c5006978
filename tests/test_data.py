"""Tests for the dataset loaders and prefetching DataLoader."""

import numpy as np
import pytest
from PIL import Image

from learned_pmctf_tpu.data import VideoFolder, VideoYCbCr, DataLoader


@pytest.fixture()
def vimeo_root(tmp_path):
    """Tiny synthetic vimeo-style tree: 3 septuplet folders."""
    rng = np.random.default_rng(0)
    names = []
    for i in range(3):
        folder = tmp_path / "sequences" / "00001" / f"{i:04d}"
        folder.mkdir(parents=True)
        for j in range(7):
            img = rng.integers(0, 256, (64, 96, 3)).astype(np.uint8)
            Image.fromarray(img).save(folder / f"im{j + 1}.png")
        names.append(f"00001/{i:04d}")
    (tmp_path / "sep_trainlist.txt").write_text("\n".join(names))
    (tmp_path / "sep_testlist.txt").write_text(names[0])
    return str(tmp_path)


def test_video_folder(vimeo_root):
    ds = VideoFolder(vimeo_root, split="train", patch_size=(32, 32))
    assert len(ds) == 3
    y = ds[0]
    assert y.shape == (1, 32, 32)
    assert 0 <= y.min() and y.max() <= 255  # 0..255 range, not 0..1


def test_video_ycbcr_frames_and_curriculum(vimeo_root):
    ds = VideoYCbCr(vimeo_root, split="train", num_frames=2,
                    patch_size=(32, 32))
    frames = ds[0]
    assert len(frames) == 2
    assert frames[0].shape == (3, 32, 32)

    class _L:
        def info(self, *a):
            pass

    ds.update_num_frames(4, _L())
    ds.update_interval(2, _L())
    ds.set_current_interval()
    frames = ds[1]
    assert len(frames) == 4

    ds.use_random_interval()
    interval = ds.set_current_interval()
    assert interval in (1, 2)
    frames = ds[2]
    assert len(frames) == 4


def test_video_ycbcr_long_clip_error(vimeo_root):
    ds = VideoYCbCr(vimeo_root, split="train", num_frames=16,
                    patch_size=(32, 32))
    with pytest.raises(RuntimeError, match="long-clip"):
        ds[0]


def test_dataloader_batches(vimeo_root):
    ds = VideoFolder(vimeo_root, split="train", patch_size=(32, 32))
    loader = DataLoader(ds, batch_size=2, num_workers=2, drop_last=True)
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0].shape == (2, 1, 32, 32)


def test_dataloader_tuple_collate(vimeo_root):
    ds = VideoYCbCr(vimeo_root, split="train", num_frames=2,
                    patch_size=(16, 16))
    loader = DataLoader(ds, batch_size=3, num_workers=2, drop_last=True)
    (batch,) = list(loader)
    assert isinstance(batch, tuple) and len(batch) == 2
    assert batch[0].shape == (3, 3, 16, 16)
