"""Training: optimizer factory, train steps, staged MCTF curriculum."""

from .optim import make_optimizer, trainable_mask  # noqa: F401
from .steps import (  # noqa: F401
    make_pwave_train_step,
    make_pmctf_train_step,
    make_pmctf_train_step_split,
    pmctf_gop_loss,
)
