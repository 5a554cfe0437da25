from .boundary import BoundaryManager
from .convops import (
    ConvOperator,
    ConvOperator0d,
    ConvOperator1d,
    ConvOperator2d,
    ConvOperatorSpatial,
    direct_conv,
    stencil_shift_add,
)
from .fftconv import fft_conv, spectral_differentiate, spectral_integrate
from .stencils import embed_kernel_3d, stencil_1d, stencil_2d, stencil_time_space

__all__ = [
    "BoundaryManager",
    "ConvOperator",
    "ConvOperator0d",
    "ConvOperator1d",
    "ConvOperator2d",
    "ConvOperatorSpatial",
    "direct_conv",
    "stencil_shift_add",
    "fft_conv",
    "spectral_differentiate",
    "spectral_integrate",
    "embed_kernel_3d",
    "stencil_1d",
    "stencil_2d",
    "stencil_time_space",
]
