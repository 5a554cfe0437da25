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

__all__ = ["set_PRE", "set_pre_batched"]


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


def set_pre_batched(neural_sols, m: float = 1.0, k: float = 1.0,
                    dt: float = 0.1010101, eps: float = 1e-16):
    """Batched TPU-native `set_PRE`: propagate residual bounds for a WHOLE
    prediction set in one jittable graph.

    The reference propagates one trajectory at a time on host
    (`Inverse_residuals/Python/pre_set_prop.py:29-89` inside a Python
    loop); here the interval construction, the interval FFT and the
    deconvolution radius map are dense [B, N] x [N, N] contractions
    shared across the batch, so bounding every CP prediction sample is a
    single device call (f32 on TPU; the SHO kernel's FFT is bounded away
    from 0, so `eps` regularisation behaves identically at f32).

    neural_sols: [B, Nt] (or [Nt]) trajectories.
    Returns (lower, upper), each [B, N] with N = Nt + 2 (the zero-padded
    extent; same cells, in natural order, as `set_PRE`).
    """
    import jax.numpy as jnp

    x = jnp.atleast_2d(jnp.asarray(neural_sols, jnp.float32))
    B, nt = x.shape

    D_tt = np.array([1.0, -2.0, 1.0])
    D_id = np.array([0.0, 1.0, 0.0])
    kernel = m * D_tt + dt**2 * k * D_id

    signal = jnp.pad(x, ((0, 0), (1, 1)))  # [B, N], N = nt + 2
    N = nt + 2
    kernel_pad = np.concatenate((kernel, np.zeros(N - len(kernel))))
    kernel_fft = np.fft.fft(kernel_pad)  # host constant

    convolved = jnp.real(
        jnp.fft.ifft(jnp.fft.fft(signal, axis=-1) * kernel_fft, axis=-1))
    inverse_kernel = 1.0 / (kernel_fft + eps)

    # same cell policy as set_PRE: wrap-around edge cells (first 4, last)
    # exact, interior cells symmetric [-|res|, +|res|]
    idx = jnp.arange(N)
    edge = (idx <= 3) | (idx == N - 1)
    centers = jnp.where(edge, convolved, 0.0)
    radii = jnp.where(edge, 0.0, jnp.abs(convolved))

    out_c, out_r = propagate_through_deconvolution(centers, radii,
                                                   inverse_kernel)
    return out_c - out_r, out_c + out_r
