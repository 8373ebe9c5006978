"""Factorized (hyper-)prior bit estimator.

ref: pMCTF/entropy_models/entropy_models.py:58-123 (Bitparm, BitEstimator):
a 4-layer per-channel monotone CDF network. Used for the MV hyper-latent z.
"""

import flax.linen as nn
import jax.numpy as jnp

from .distributions import probs_to_bits


class Bitparm(nn.Module):
    """One monotone CDF layer with per-channel parameters (1,C,1,1)."""

    channels: int
    final: bool = False

    @nn.compact
    def __call__(self, x):
        shape = (1, self.channels, 1, 1)
        init = nn.initializers.normal(stddev=0.01)
        h = self.param("h", init, shape)
        b = self.param("b", init, shape)
        x = x * nn.softplus(h) + b
        if self.final:
            return x
        a = self.param("a", init, shape)
        return x + jnp.tanh(x) * jnp.tanh(a)


class BitEstimator(nn.Module):
    """CDF network: P(Z <= x) per channel; bits via CDF differences."""

    channels: int

    def setup(self):
        self.f1 = Bitparm(self.channels)
        self.f2 = Bitparm(self.channels)
        self.f3 = Bitparm(self.channels)
        self.f4 = Bitparm(self.channels, final=True)

    def __call__(self, x):
        return self.get_cdf(x)

    def get_logits_cdf(self, x):
        return self.f4(self.f3(self.f2(self.f1(x))))

    def get_cdf(self, x):
        return nn.sigmoid(self.get_logits_cdf(x))

    def get_z_bits(self, z):
        """Bits to code integer z. ref: gaussian_model.py:65-67."""
        probs = self.get_cdf(z + 0.5) - self.get_cdf(z - 0.5)
        return probs_to_bits(probs)
