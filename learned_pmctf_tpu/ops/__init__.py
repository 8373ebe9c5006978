"""Core tensor ops: lifting transforms, warping, resampling, quantization.

Everything here is a pure jnp function on NCHW arrays, jit/vmap/grad safe.
"""

from .quant import (  # noqa: F401
    ste_round,
    ste_clamp,
    lower_bound,
    quant_ste,
)
from .resample import (  # noqa: F401
    bilinear_upsample,
    bilinear_downsample,
    nearest_upsample,
    avg_pool2,
)
from .warp import flow_warp  # noqa: F401
from .lifting import (  # noqa: F401
    split_even_odd,
    merge_even_odd,
    reflect_pad_rows,
    CDF97_COEFFS,
)
from .masks import checkerboard_masks  # noqa: F401
from .color import (  # noqa: F401
    rgb_to_ycbcr,
    ycbcr_to_rgb,
    yuv420_to_444,
    yuv444_to_420,
    rgb_to_ycbcr_studio,
    ycbcr_to_rgb_studio,
    rgb_to_ycocg_lossless,
    ycocg_to_rgb_lossless,
)
