"""Optimizer factory: AdamW with decay/no-decay groups + trainable masks.

ref: optim_factory.py:20-109 (parameter grouping: 1-D params and biases
excluded from weight decay) and the curriculum's freeze/unfreeze pattern
(ref: pMCTF_L.py:124-189) expressed as optax.masked over immutable
pytrees instead of requires_grad mutation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from flax import traverse_util


def _unwrap(params):
    return params["params"] if isinstance(params, dict) and "params" in params \
        else params


def _rewrap(tree, params):
    return {"params": tree} if isinstance(params, dict) and "params" in params \
        else tree


def decay_mask(params):
    """True where weight decay applies (>=2-D params, not biases)."""
    flat = traverse_util.flatten_dict(_unwrap(params))
    mask = {k: (v.ndim >= 2 and k[-1] != "bias") for k, v in flat.items()}
    return _rewrap(traverse_util.unflatten_dict(mask), params)


def trainable_mask(params, predicate: Callable[[str], bool]):
    """Boolean pytree: predicate over '/'-joined parameter paths.

    Replaces the reference's named_parameters requires_grad toggling
    (e.g. predicate=lambda p: p.startswith('mv_') for inter-only stages).
    """
    flat = traverse_util.flatten_dict(_unwrap(params))
    mask = {k: bool(predicate("/".join(k))) for k in flat}
    return _rewrap(traverse_util.unflatten_dict(mask), params)


def make_optimizer(params, learning_rate, weight_decay: float = 0.05,
                   clip_norm: Optional[float] = 1.0,
                   trainable: Optional[dict] = None):
    """AdamW with selective weight decay, grad clipping, optional freezing.

    learning_rate: float or optax schedule. trainable: boolean pytree
    (from trainable_mask); frozen params receive exactly zero updates and
    accumulate no optimizer state (grads are zeroed before Adam).
    """
    txs = []
    if trainable is not None:
        frozen = jax.tree.map(lambda t: not t, trainable)
        txs.append(optax.masked(optax.set_to_zero(), frozen))
    if clip_norm is not None and clip_norm > 0:
        txs.append(optax.clip_by_global_norm(clip_norm))
    txs.append(optax.scale_by_adam())
    if weight_decay:
        dmask = decay_mask(params)
        if trainable is not None:
            dmask = jax.tree.map(lambda d, t: d and t, dmask, trainable)
        txs.append(optax.add_decayed_weights(weight_decay, mask=dmask))
    txs.append(optax.scale_by_learning_rate(learning_rate))
    if trainable is not None:
        txs.append(optax.masked(optax.set_to_zero(), frozen))
    return optax.chain(*txs)
