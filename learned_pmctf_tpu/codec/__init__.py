"""Host-side bitstream codecs orchestrating device sub-graphs + rANS."""

from .image_codec import PWaveCodec  # noqa: F401
from .video_codec import PMCTFCodec  # noqa: F401
