"""PyTorch -> flax parameter conversion for pretrained components.

ref: train_pMCTF_L.py:436-445 (SpyNet checkpoint download + key remap).
Zero-egress container: checkpoints must be provided as local files.
Conv weights stay OIHW (both frameworks agree); only naming changes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_spynet_torch(path: str, luma_mode: bool = False) -> Dict:
    """Convert a sniklaus pytorch-spynet checkpoint to our MESpynet tree.

    torch keys: 'moduleBasic.{L}.moduleBasic.{2j}.weight/bias' (or the
    reference's remapped 'moduleBasic.{L}.conv{j}.weight'); ours:
    basic_{L}/conv{j}/{kernel,bias}.

    luma_mode: fold the 3-channel tiled-luma input into 1 channel by
    summing conv1's weight slices over each RGB group (im1 0:3 -> 0,
    warped im2 3:6 -> 1, flow 6:8 -> 2:4) — exactly equivalent to running
    the RGB net on tiled luma (see models.spynet.MESpynet.luma_mode).
    """
    from .checkpoint import load_torch_state_dict

    sd = load_torch_state_dict(path)
    # normalize to conv{j} naming (ref remap, train_pMCTF_L.py:440-444)
    remap = {".moduleBasic.0.": ".conv1.", ".moduleBasic.2.": ".conv2.",
             ".moduleBasic.4.": ".conv3.", ".moduleBasic.6.": ".conv4.",
             ".moduleBasic.8.": ".conv5."}
    normalized = {}
    for k, v in sd.items():
        for old, new in remap.items():
            k = k.replace(old, new)
        normalized[k] = v

    out: Dict = {}
    for k, v in normalized.items():
        parts = k.split(".")
        # expected: moduleBasic.{L}.conv{j}.{weight|bias}
        if len(parts) != 4 or parts[0] != "moduleBasic":
            continue
        level, conv, kind = parts[1], parts[2], parts[3]
        dst = out.setdefault(f"basic_{level}", {}).setdefault(conv, {})
        if kind == "weight":
            w = np.asarray(v, np.float32)  # OIHW in both
            if luma_mode and conv == "conv1":
                w = np.concatenate(
                    [w[:, 0:3].sum(axis=1, keepdims=True),
                     w[:, 3:6].sum(axis=1, keepdims=True),
                     w[:, 6:8]], axis=1)
            dst["kernel"] = w
        else:
            dst["bias"] = np.asarray(v, np.float32)
    return out
