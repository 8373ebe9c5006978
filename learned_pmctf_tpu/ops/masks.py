"""Static checkerboard / causal masks.

The four-part 2x2 micro-masks of the DCVC-DC style priors
(ref: pMCTF/layers/context_fusion_4step.py:92-119 and
pMCTF/layers/video/four_part_prior.py:48-75) are static given (H, W):
we build them as traced-constant arrays so XLA folds them into the
surrounding elementwise ops — no device-side cache dict needed.
"""

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _checkerboard_np(height: int, width: int):
    masks = []
    for my, mx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        m = np.zeros((height, width), dtype=np.float32)
        m[my::2, mx::2] = 1.0
        masks.append(m[None, None])  # (1,1,H,W)
    return tuple(masks)


def checkerboard_masks(height: int, width: int, dtype=jnp.float32):
    """The four 2x2-phase masks [(0,0), (0,1), (1,0), (1,1)] as (1,1,H,W).

    Ordering matches the reference micro-masks mask_0..mask_3.
    """
    return tuple(jnp.asarray(m, dtype=dtype) for m in _checkerboard_np(height, width))


@functools.lru_cache(maxsize=16)
def _causal_mask_np(kh: int, kw: int, mask_type: str, out_ch: int, in_ch: int):
    m = np.ones((out_ch, in_ch, kh, kw), dtype=np.float32)
    if mask_type == "C":
        m[:, :, kh // 2:, :] = 0.0
    else:
        m[:, :, kh // 2, kw // 2 + (mask_type == "B"):] = 0.0
        m[:, :, kh // 2 + 1:, :] = 0.0
    return m


def causal_conv_mask(kh: int, kw: int, mask_type: str, out_ch: int, in_ch: int):
    """PixelCNN A/B/C mask for an OIHW conv kernel.

    ref: pMCTF/layers/layers.py:23-51.
    """
    if mask_type not in ("A", "B", "C"):
        raise ValueError(f"invalid mask_type {mask_type!r}")
    return jnp.asarray(_causal_mask_np(kh, kw, mask_type, out_ch, in_ch))
