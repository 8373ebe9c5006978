"""Datasets and input pipeline (numpy/PIL based, thread-prefetched)."""

from .vimeo import VideoFolder, VideoYCbCr  # noqa: F401
from .loader import DataLoader  # noqa: F401
