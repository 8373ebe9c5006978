"""Differentiable rate estimates for quantized latents.

ref: pMCTF/entropy_models/gaussian_model.py:35-53 (probs_to_bits,
get_y_gaussian_bits, get_y_laplace_bits) — reimplemented with analytic
jnp CDFs instead of torch.distributions.
"""

import math

import jax.numpy as jnp
from jax.scipy.special import erf

_LOG2 = math.log(2.0)


def laplace_cdf(x, scale):
    """CDF of Laplace(0, scale)."""
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / scale)


def gaussian_cdf(x, scale):
    """CDF of Normal(0, scale)."""
    return 0.5 * (1.0 + erf(x / (scale * math.sqrt(2.0))))


def probs_to_bits(probs):
    bits = -jnp.log(probs + 1e-5) / _LOG2
    return jnp.maximum(bits, 0.0)


def laplace_bits(y, scale):
    """Bits to code integer-quantized y under Laplace(0, scale)."""
    scale = jnp.clip(scale, 1e-5, 1e10)
    probs = laplace_cdf(y + 0.5, scale) - laplace_cdf(y - 0.5, scale)
    return probs_to_bits(probs)


def gaussian_bits(y, scale):
    """Bits to code integer-quantized y under Normal(0, scale)."""
    scale = jnp.clip(scale, 1e-5, 1e10)
    probs = gaussian_cdf(y + 0.5, scale) - gaussian_cdf(y - 0.5, scale)
    return probs_to_bits(probs)
