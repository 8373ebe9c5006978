"""PyTorch -> flax parameter conversion for pretrained components.

ref: train_pMCTF_L.py:436-445 (SpyNet checkpoint download + key remap).
Zero-egress container: checkpoints must be provided as local files.
Conv weights stay OIHW (both frameworks agree); only naming changes.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def load_spynet_torch(path: str) -> Dict:
    """Convert a sniklaus pytorch-spynet checkpoint to our MESpynet tree.

    torch keys: 'moduleBasic.{L}.moduleBasic.{2j}.weight/bias' (or the
    reference's remapped 'moduleBasic.{L}.conv{j}.weight'); ours:
    basic_{L}/conv{j}/{kernel,bias}.
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
            dst["kernel"] = np.asarray(v, np.float32)  # OIHW in both
        else:
            dst["bias"] = np.asarray(v, np.float32)
    return out
