"""Model zoo: pWave++ image codec, pMCTF-L video codec, motion stack."""

from .layers import (  # noqa: F401
    Conv2d,
    MaskedConv2d,
    PredictUpdate,
    ResBlock,
    ContextResidual,
    DepthConv,
    ConvFFN,
    ConvFFN3,
    DepthConvBlock,
    DepthConvBlock4,
    ResidualBlockWithStride,
    ResidualBlockUpsample,
    SubpelConv,
    pixel_shuffle,
)
from .wavelet import LearnedLifting1D, LiftingScheme2D, TemporalLifting  # noqa: F401
from .postprocess import PostProcess, PostProcessCtx  # noqa: F401
from .context import (  # noqa: F401
    LSTM2D,
    UpsampleModule,
    SubbandContext,
    ContextFusionSubband,
    ContextFusionFourStep,
)
from .pwave import PWave  # noqa: F401
from .spynet import MEBasic, MESpynet  # noqa: F401
from .mv_coder import MvEnc, MvDec, HyperEncoder, HyperDecoder, four_part_prior_forward  # noqa: F401
from .pmctf import PMCTF  # noqa: F401
