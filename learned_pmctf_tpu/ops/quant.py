"""Straight-through quantization primitives.

TPU-native equivalents of the reference's autograd Functions
(ref: pMCTF/layers/layers.py:71-93 RoundNoGradient/ClampNoGradient and
pMCTF/layers/video/video_net.py:14-28 LowerBound), expressed with
stop_gradient identities instead of custom autograd classes.
"""

import jax
import jax.numpy as jnp


def ste_round(x):
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def ste_clamp(x, min_val, max_val):
    """Clamp with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.clip(x, min_val, max_val) - x)


@jax.custom_vjp
def lower_bound(x, bound):
    """max(x, bound) with the DCVC LowerBound gradient rule.

    Gradient passes through where x >= bound, or where the incoming
    gradient would push x upwards (g < 0), matching
    ref: pMCTF/layers/video/video_net.py:14-28.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


def quant_ste(x, training: bool = True):
    """Quantize: STE round when training, hard round at inference.

    ref: pMCTF/entropy_models/gaussian_model.py:25-29.
    """
    if training:
        return ste_round(x)
    return jnp.round(x)


def add_uniform_noise(x, key):
    """Additive uniform noise proxy for quantization during training.

    ref: pMCTF/entropy_models/gaussian_model.py:69-72.
    """
    noise = jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)
    return x + jax.lax.stop_gradient(noise)
