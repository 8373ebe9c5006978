"""Entropy modeling: differentiable bit estimation + host-side rANS coding."""

from .distributions import (  # noqa: F401
    laplace_cdf,
    gaussian_cdf,
    probs_to_bits,
    laplace_bits,
    gaussian_bits,
)
from .bit_estimator import BitEstimator  # noqa: F401
from .compression_model import CompressionModel  # noqa: F401
from .coder import (  # noqa: F401
    EntropyCoder,
    GaussianEncoder,
    FactorizedCoder,
    build_bit_estimator_tables,
    build_indexes_from_scales,
    SCALE_LEVELS,
)
