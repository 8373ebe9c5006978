"""Checkpoint save/load (orbax) + staged-resume metadata + torch import.

ref: train_pWave.py:161-167 / train_pMCTF_L.py:53-56 (torch.save dicts
{epoch, state_dict, optimizer}); here: orbax PyTreeCheckpointer with the
same logical contents plus the curriculum stage metadata needed for the
staged-resume semantics (ref: train_pMCTF_L.py:374-434).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_checkpoint(path: str, params, opt_state=None, epoch: int = 0,
                    extra: Optional[Dict[str, Any]] = None):
    """Save params (+optimizer state) with orbax; metadata as JSON."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(str(path / "params"), params, force=True)
    if opt_state is not None:
        ckptr.save(str(path / "opt_state"), opt_state, force=True)
    meta = {"epoch": epoch}
    if extra:
        meta.update(extra)
    (path / "meta.json").write_text(json.dumps(meta))


def load_checkpoint(path: str, params_template=None, opt_state_template=None):
    """Load a checkpoint saved by save_checkpoint.

    Returns (params, opt_state_or_None, meta)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    restore = (lambda p, t: ckptr.restore(
        str(p), item=t) if t is not None else ckptr.restore(str(p)))
    params = restore(path / "params", params_template)
    opt_state = None
    if (path / "opt_state").exists() and opt_state_template is not None:
        opt_state = restore(path / "opt_state", opt_state_template)
    meta = {}
    if (path / "meta.json").exists():
        meta = json.loads((path / "meta.json").read_text())
    return params, opt_state, meta


def load_torch_state_dict(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read a reference PyTorch checkpoint into numpy arrays.

    Strips 'module.' prefixes and unwraps 'state_dict'/'net' containers
    (ref: pMCTF/utils/stream_helper.py:48-56). Used for cross-framework
    parity validation against released reference checkpoints.
    """
    import torch

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if "net" in ckpt:
        ckpt = ckpt["net"]
    out = {}
    for k, v in ckpt.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out
