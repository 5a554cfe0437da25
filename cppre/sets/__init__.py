"""Set propagation of residual bounds to solution space (layer L7).

Rebuild of `/root/reference/Inverse_residuals/Python/{zonotope.py,
intervalFFT.py, pre_set_prop.py}` (themselves ports of the Julia originals
`Inverse_residuals/SHO/{PRE_set_prop.jl, intervalFFT.jl}`). The reference
propagates per-cell residual intervals through the DFT as explicit 2-D
zonotopes, one Python object per frequency with O(N) generator columns.
Because the DFT, the per-frequency complex multiply, and the inverse DFT
are all linear maps, the entire zonotope pipeline collapses to dense array
arithmetic: centers follow an ordinary fft/ifft, radii follow one
|Re(.)|-contraction over the twiddle tensor — a single jit-able program
(see `interval_fft.propagate_through_deconvolution`).
"""

from .zonotope import Zonotope
from .interval_fft import (
    interval_fft,
    inverse_interval_fft,
    complex_prod,
    real_interval,
    propagate_through_deconvolution,
)
from .pre_set_prop import set_PRE, set_pre_batched

__all__ = [
    "Zonotope",
    "interval_fft",
    "inverse_interval_fft",
    "complex_prod",
    "real_interval",
    "propagate_through_deconvolution",
    "set_PRE",
    "set_pre_batched",
]
