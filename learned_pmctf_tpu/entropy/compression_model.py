"""CompressionModel facade: training-side quantization + bit estimation.

ref: pMCTF/entropy_models/gaussian_model.py:13-72. In the TPU build the
pieces are pure functions (ops.quant / entropy.distributions) and the
host-side coder is a separate object; this class reassembles the familiar
surface for users migrating from the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quant import quant_ste, add_uniform_noise
from .distributions import laplace_bits, gaussian_bits, probs_to_bits
from .coder import EntropyCoder, GaussianEncoder


class CompressionModel:
    """Laplace/Gaussian rate model + (optional) real entropy coder."""

    def __init__(self, y_distribution: str = "laplace",
                 ec_thread: bool = False, stream_part: int = 1):
        assert y_distribution in ("laplace", "gaussian")
        self.y_distribution = y_distribution
        self.ec_thread = ec_thread
        self.stream_part = stream_part
        self.entropy_coder: EntropyCoder | None = None
        self.gaussian_encoder = GaussianEncoder(distribution=y_distribution)

    # ---- differentiable pieces (safe inside jit) ------------------------------

    @staticmethod
    def quant(x, training: bool = True):
        return quant_ste(x, training)

    @staticmethod
    def process(y, means, training: bool = True):
        """Quantize around the predicted mean. ref: gaussian_model.py:59-63."""
        y_q = quant_ste(y, training)
        y_res = y_q - means
        y_hat = y_res + means
        return y_res, y_q, y_hat

    @staticmethod
    def add_noise(x, key):
        return add_uniform_noise(x, key)

    @staticmethod
    def probs_to_bits(probs):
        return probs_to_bits(probs)

    def get_y_bits(self, y, scales):
        if self.y_distribution == "laplace":
            return laplace_bits(y, scales)
        return gaussian_bits(y, scales)

    get_y_laplace_bits = staticmethod(laplace_bits)
    get_y_gaussian_bits = staticmethod(gaussian_bits)

    @staticmethod
    def get_z_bits(z, bit_estimator_apply):
        """bit_estimator_apply: callable x -> CDF (a bound BitEstimator)."""
        probs = bit_estimator_apply(z + 0.5) - bit_estimator_apply(z - 0.5)
        return probs_to_bits(probs)

    # ---- host-side coder ------------------------------------------------------

    def update(self, force: bool = False):
        """Instantiate the entropy coder + CDF tables. ref: :55-57."""
        if self.entropy_coder is None:
            self.entropy_coder = EntropyCoder(self.ec_thread, self.stream_part)
        self.gaussian_encoder.update(force=force,
                                     entropy_coder=self.entropy_coder)
