"""Staged MCTF training curriculum helpers.

ref: train_pMCTF_L.py:32-50 (JSON config), pMCTF_L.py:124-189
(freeze/unfreeze + ME-stage cloning), train_pMCTF_L.py:450-501
(stage transitions). Parameter freezing is an optax mask (immutable
pytrees); ME-stage cloning is a pure params-tree copy.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import List

import jax.numpy as jnp


@dataclass
class CurriculumConfig:
    total_epochs: int = 29
    train_lambda: List[float] = field(default_factory=lambda: [1, 27])
    num_stages: int = 10
    lr: List[float] = field(default_factory=list)
    parts: List[str] = field(default_factory=list)
    num_frames: List[int] = field(default_factory=list)
    frame_interval: List[int] = field(default_factory=list)
    num_epochs: List[int] = field(default_factory=list)

    @staticmethod
    def from_json(path: str) -> "CurriculumConfig":
        cfg = json.load(open(path))
        return CurriculumConfig(
            total_epochs=cfg.get("total_epochs", 29),
            train_lambda=cfg.get("train_lambda", [1, 27]),
            num_stages=cfg.get("num_stages", 10),
            lr=cfg.get("lr", []),
            parts=cfg.get("parts", []),
            num_frames=cfg.get("num_frames", []),
            frame_interval=cfg.get("frame_interval", []),
            num_epochs=cfg.get("num_epochs", []),
        )


# trainable-parameter predicates per curriculum part
# (paths are '/'-joined top-level params keys)

def inter_predicate(path: str) -> bool:
    """Motion side only. ref: pMCTF_L.py:164-171 make_inter_trainable."""
    return path.startswith(("temporal_filtering", "mv"))


def mctf_predicate(path: str) -> bool:
    """ref: pMCTF_L.py:157-162 (make_mctf_trainable tail)."""
    return path.startswith(("mv_", "temporal_filtering", "mv"))


def all_predicate(path: str) -> bool:
    """Everything except the pretrained optical flow.
    ref: pMCTF_L.py:173-176."""
    return not path.startswith("optic_flow")


PART_PREDICATES = {
    "Inter": inter_predicate,
    "MCTF": mctf_predicate,
    "All": all_predicate,
}

_CLONE_PREFIXES = (
    "mv_encoder", "mv_decoder", "mv_hyper_enc", "mv_hyper_dec",
    "mv_prior_fusion_adaptor_0", "mv_prior_fusion_adaptor_1",
    "mv_prior_fusion", "mv_spatial_prior", "mv_bit_est",
    "temporal_filtering",
)


def clone_me_stage(params, start_idx: int, copy_idx: int, num_me_stages: int):
    """Initialize ME stages [start_idx, num_me_stages) from copy_idx.

    ref: pMCTF_L.py:132-155 make_mctf_trainable. Returns new params tree.
    """
    p = dict(params["params"]) if "params" in params else dict(params)
    for i in range(start_idx, num_me_stages):
        for prefix in _CLONE_PREFIXES:
            src = f"{prefix}_{copy_idx}"
            dst = f"{prefix}_{i}"
            if src in p:
                p[dst] = p[src]
        for step in range(3):
            src = f"mv_spatial_adaptors_{copy_idx}_{step}"
            dst = f"mv_spatial_adaptors_{i}_{step}"
            if src in p:
                p[dst] = p[src]
        for qname in ("mv_y_q_scale_enc", "mv_y_q_scale_dec"):
            arr = p[qname]
            p[qname] = arr.at[i].set(arr[copy_idx])
    return {"params": p} if "params" in params else p


def load_from_iframe(params, iframe_params):
    """Transplant a trained pWave++ into both lp_coder and hp_coder.

    ref: pMCTF_L.py:381-395 load_from_iframe (incl. the QP shape
    adaptation, trivial here since QP is always (2,1,1,1))."""
    p = dict(params["params"]) if "params" in params else dict(params)
    ip = iframe_params["params"] if "params" in iframe_params else iframe_params
    p["lp_coder"] = ip
    p["hp_coder"] = ip
    return {"params": p} if "params" in params else p
