"""PRE set propagation: residual bounds -> solution-space intervals.

Rebuild of `set_PRE` (`/root/reference/Inverse_residuals/Python/
pre_set_prop.py:29-89`; Julia original `Inverse_residuals/SHO/
PRE_set_prop.jl`): for the SHO, the composite kernel
m*[1,-2,1] + dt^2*k*[0,1,0] applied by circular FFT convolution to the
zero-padded neural solution gives the residual; per-cell intervals
[-|res|, +|res|] (edges kept exact, index 0 dropped, the reference's exact
slicing) propagate through the interval FFT, multiply by the regularised
inverse kernel 1/(K_hat + eps), and return through the inverse interval
FFT as solution-space bounds on the real part.
"""

from __future__ import annotations

import numpy as np

from .interval_fft import propagate_through_deconvolution

__all__ = ["set_PRE"]


def set_PRE(neural_sol, m: float = 1.0, k: float = 1.0, dt: float = 0.1010101,
            eps: float = 1e-16):
    """neural_sol: [Nt] or [Nt, 1] trajectory. Returns a list of
    (lower, upper) intervals of length Nt + 1 (the reference's N-1 after
    zero-padding by 2 and dropping index 0)."""
    x = np.asarray(neural_sol, dtype=np.float64).reshape(-1)

    D_tt = np.array([1.0, -2.0, 1.0])
    D_id = np.array([0.0, 1.0, 0.0])
    kernel = m * D_tt + dt**2 * k * D_id

    signal = np.concatenate(([0.0], x, [0.0]))
    N = len(signal)
    kernel_pad = np.concatenate((kernel, np.zeros(N - len(kernel))))

    signal_fft = np.fft.fft(signal)
    kernel_fft = np.fft.fft(kernel_pad)
    convolved = np.fft.ifft(signal_fft * kernel_fft)
    inverse_kernel = 1.0 / (kernel_fft + eps)

    # Interval construction: wrap-around edge cells (the first 4 and the
    # last, which mix the zero padding) are kept EXACT; interior cells get
    # the symmetric bound [-|res|, +|res|]. The reference additionally
    # drops index 0 and reorders the cells (pre_set_prop.py:64-76), which
    # breaks the N-point deconvolution (its retrieved bounds no longer
    # contain the input trajectory); keeping all N cells in natural order
    # makes containment exact: |Re(M @ (res - centers))| <= sum_j
    # |Re(M_kj)| r_j cell-wise for the linear deconvolution map M.
    centers = np.where(np.abs(np.arange(N) - 0) <= 3, convolved.real, 0.0)
    centers[-1] = convolved[-1].real
    radii = np.where((np.arange(N) > 3) & (np.arange(N) < N - 1),
                     np.abs(convolved.real), 0.0)

    out_c, out_r = propagate_through_deconvolution(centers, radii, inverse_kernel)
    out_c, out_r = np.asarray(out_c), np.asarray(out_r)
    return list(zip(out_c - out_r, out_c + out_r))
