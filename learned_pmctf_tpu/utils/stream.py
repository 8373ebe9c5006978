"""Bitstream container formats (struct-packed headers) and q helpers.

Byte-compatible with the reference containers so stream tooling carries
over. ref: pMCTF/utils/stream_helper.py:23-220.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def get_padding_size(height: int, width: int, p: int = 64):
    """(left, right, top, bottom) zero padding to multiples of p.

    Pads right/bottom only. ref: stream_helper.py:23-32."""
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return 0, new_w - width, 0, new_h - height


def get_downsampled_shape(height: int, width: int, p: int):
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return int(new_h / p + 0.5), int(new_w / p + 0.5)


def get_rounded_q(q_scale: float):
    """Round a q scale to 1/100 steps + its integer index.

    ref: stream_helper.py:41-45."""
    q_scale = float(np.clip(q_scale, 0.01, 655.0))
    q_index = int(np.round(q_scale * 100))
    return q_index / 100, q_index


# ---- container formats -----------------------------------------------------

def encode_image(height: int, width: int, num_channels: int,
                 bit_stream: bytes, output: str):
    """(H, W, C, len) u32 header + payload. ref: stream_helper.py:201-207."""
    with Path(output).open("wb") as f:
        f.write(struct.pack(">4I", height, width, num_channels, len(bit_stream)))
        if bit_stream:
            f.write(struct.pack(f">{len(bit_stream)}s", bit_stream))


def decode_image(inputpath: str):
    with Path(inputpath).open("rb") as f:
        height, width, num_channels, length = struct.unpack(">4I", f.read(16))
        bit_stream = struct.unpack(f">{length}s", f.read(length))[0]
    return height, width, num_channels, bit_stream


def encode_p(string: bytes, mv_y_q_index: int, output: str):
    """MV stream: u16 q index + u32 len + payload. ref: stream_helper.py:181-186."""
    with Path(output).open("wb") as f:
        f.write(struct.pack(">H", mv_y_q_index))
        f.write(struct.pack(">I", len(string)))
        if string:
            f.write(struct.pack(f">{len(string)}s", string))


def decode_p(inputpath: str):
    with Path(inputpath).open("rb") as f:
        (mv_y_q_index,) = struct.unpack(">H", f.read(2))
        (length,) = struct.unpack(">I", f.read(4))
        string = struct.unpack(f">{length}s", f.read(length))[0]
    return mv_y_q_index, string


def encode_i(height: int, width: int, q_index: int, bit_stream: bytes,
             output: str):
    """I-frame stream: (H, W) u32 + q u16 + len u32 + payload.

    ref: stream_helper.py:132-139."""
    with Path(output).open("wb") as f:
        f.write(struct.pack(">2I", height, width))
        f.write(struct.pack(">H", q_index))
        f.write(struct.pack(">I", len(bit_stream)))
        f.write(struct.pack(f">{len(bit_stream)}s", bit_stream))


def decode_i(inputpath: str):
    with Path(inputpath).open("rb") as f:
        height, width = struct.unpack(">2I", f.read(8))
        (q_index,) = struct.unpack(">H", f.read(2))
        (length,) = struct.unpack(">I", f.read(4))
        bit_stream = struct.unpack(f">{length}s", f.read(length))[0]
    return height, width, q_index, bit_stream


def encode_i_b(height: int, width: int, blocksize: int, q_index: int,
               bit_stream: bytes, output: str):
    """Blocked I-frame stream: (H, W, blocksize) u32 + q u16 + len + payload.

    ref: stream_helper.py:103-111."""
    with Path(output).open("wb") as f:
        f.write(struct.pack(">3I", height, width, blocksize))
        f.write(struct.pack(">H", q_index))
        f.write(struct.pack(">I", len(bit_stream or b"")))
        if bit_stream:
            f.write(struct.pack(f">{len(bit_stream)}s", bit_stream))


def decode_i_b(inputpath: str, bitstream: bool = True):
    with Path(inputpath).open("rb") as f:
        height, width, blocksize = struct.unpack(">3I", f.read(12))
        (q_index,) = struct.unpack(">H", f.read(2))
        (length,) = struct.unpack(">I", f.read(4))
        stream = struct.unpack(f">{length}s", f.read(length))[0] \
            if bitstream else None
    return height, width, blocksize, q_index, stream


def encode_i_w(height: int, width: int, q_index: int, bit_streams, output: str):
    """Per-level wavelet streams: (H, W) u32 + q u16 + [len + payload]*.

    ref: stream_helper.py:155-164."""
    with Path(output).open("wb") as f:
        f.write(struct.pack(">2I", height, width))
        f.write(struct.pack(">H", q_index))
        for s in bit_streams:
            f.write(struct.pack(">I", len(s)))
            if s:
                f.write(struct.pack(f">{len(s)}s", s))


def decode_i_w(inputpath: str, decomp_levels: int = 2):
    with Path(inputpath).open("rb") as f:
        height, width = struct.unpack(">2I", f.read(8))
        (q_index,) = struct.unpack(">H", f.read(2))
        streams = []
        for _ in range(decomp_levels):
            (length,) = struct.unpack(">I", f.read(4))
            streams.append(struct.unpack(f">{length}s", f.read(length))[0])
    return height, width, q_index, streams
