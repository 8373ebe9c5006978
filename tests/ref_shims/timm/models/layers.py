"""timm.models.layers shim: only trunc_normal_ is used by the reference."""
from torch.nn.init import trunc_normal_  # noqa: F401
