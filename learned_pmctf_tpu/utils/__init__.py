"""IO, bitstream containers, metrics, logging, schedules, checkpoints."""

from .stream import (  # noqa: F401
    get_padding_size,
    get_downsampled_shape,
    get_rounded_q,
    encode_image,
    decode_image,
    encode_p,
    decode_p,
    encode_i,
    decode_i,
)
from .yuv import YUVReader, YUVWriter, read_yuv_frame, write_yuv_frame  # noqa: F401
from .metrics import psnr, yuv_psnr, ms_ssim  # noqa: F401
from .schedules import cosine_scheduler, get_cur_lambda  # noqa: F401
