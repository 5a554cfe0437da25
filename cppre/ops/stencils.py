"""Finite-difference stencil tables (central differences, Taylor-expansion based).

The stencil factory mirrors the reference's tables
(`/root/reference/Utils/ConvOps_0d.py:21-47`, `ConvOps_1d.py:17-80`,
`ConvOps_2d.py:17-63`) but is implemented as plain NumPy data so kernels are
compile-time constants under jit. The reference's 3rd-derivative tables
(`ConvOps_1d.py:38-53`) contain a syntax bug (missing commas between rows) and
would raise at runtime; here they are fixed to the standard central-difference
coefficients and covered by tests.

Conventions
-----------
* 1-D stencils index the *leading* (time-like) axis of the data window; the
  returned array is ordered so that, used as a cross-correlation kernel
  (PyTorch `F.convNd` / `lax.conv_general_dilated` semantics), the entry at
  offset +1 multiplies the sample at t+1. This makes e.g. the first-derivative
  stencil [-1, 0, 1] compute u[t+1] - u[t-1] (un-normalised: no 1/(2*dt)).
* Stencils are *un-scaled*: grid-spacing factors are applied by the caller
  (matching the reference, where e.g. the advection residual folds v*dt/dx
  into the composite kernel).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "stencil_1d",
    "stencil_2d",
    "stencil_time_space",
    "embed_kernel_3d",
]


def stencil_1d(deriv_order: int, taylor_order: int = 2) -> np.ndarray:
    """Central-difference 1-D stencil for d^n/dt^n (reference ConvOps_0d.get_stencil).

    deriv_order 0 is the identity convolution [0,1,0].
    """
    key = (deriv_order, taylor_order)
    if deriv_order == 0:
        return np.array([0.0, 1.0, 0.0], dtype=np.float32)
    table = {
        (1, 2): [-1.0, 0.0, 1.0],
        (1, 4): [1 / 12, -2 / 3, 0.0, 2 / 3, -1 / 12],
        (1, 6): [-1 / 60, 3 / 20, -3 / 4, 0.0, 3 / 4, -3 / 20, 1 / 60],
        (2, 2): [1.0, -2.0, 1.0],
        (2, 4): [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12],
        (2, 6): [1 / 90, -3 / 20, 3 / 2, -49 / 18, 3 / 2, -3 / 20, 1 / 90],
        # 3rd-derivative tables: the reference's are syntactically broken
        # (ConvOps_1d.py:38-53); these are the standard central coefficients.
        (3, 2): [-1 / 2, 1.0, 0.0, -1.0, 1 / 2],
        (3, 4): [1 / 8, -1.0, 13 / 8, 0.0, -13 / 8, 1.0, -1 / 8],
        (4, 2): [1.0, -4.0, 6.0, -4.0, 1.0],
    }
    if key not in table:
        raise ValueError(f"Invalid stencil parameters: deriv_order={deriv_order}, taylor_order={taylor_order}")
    return np.asarray(table[key], dtype=np.float32)


def stencil_2d(deriv_order: int, taylor_order: int = 2) -> np.ndarray:
    """2-D Laplacian-family stencils (reference ConvOps_1d/2d.get_stencil dims==2)."""
    if deriv_order != 2:
        raise ValueError(f"Invalid stencil parameters: 2-D stencils exist only for deriv_order=2, got {deriv_order}")
    if taylor_order == 2:
        return np.array(
            [[0.0, 1.0, 0.0], [1.0, -4.0, 1.0], [0.0, 1.0, 0.0]], dtype=np.float32
        )
    # Higher orders: separable sum of the 1-D second-derivative stencils along
    # rows and columns (matches the reference tables at ConvOps_2d.py:44-61).
    if taylor_order in (4, 6):
        s = stencil_1d(2, taylor_order)
        k = len(s)
        out = np.zeros((k, k), dtype=np.float32)
        out[k // 2, :] += s
        out[:, k // 2] += s
        return out
    raise ValueError(f"Invalid stencil parameters: taylor_order={taylor_order}")


def stencil_time_space(dims: int, deriv_order: int, taylor_order: int = 2) -> np.ndarray:
    """Square 2-D stencil acting on a [Nt, Nx] window (reference ConvOps_1d.get_stencil).

    dims == 1: the 1-D stencil of `stencil_1d` embedded in the centre *column*
    of a square zero matrix (derivative along the leading/time axis; the
    reference writes these tables out literally, e.g. ConvOps_1d.py:26-31).
    dims == 2: the 2-D Laplacian stencil of `stencil_2d`.
    """
    if dims == 1:
        s = stencil_1d(deriv_order, taylor_order)
        k = len(s)
        out = np.zeros((k, k), dtype=np.float32)
        out[:, k // 2] = s
        return out
    if dims == 2:
        return stencil_2d(deriv_order, taylor_order)
    raise ValueError(f"Invalid stencil parameters: dims={dims}")


def embed_kernel_3d(stencil: np.ndarray, axis: int, legacy_y_axis: bool = False) -> np.ndarray:
    """Embed a square 2-D stencil into the central plane of a cubic 3-D kernel.

    For data laid out [BS, Nt, Nx, Ny] (kernel dims ordered [t, x, y]),
      axis 0 ('x' or ('x','y')): stencil spans the (x, y) plane -> kernel[c, :, :]
      axis 1 ('y'):              stencil spans the (t, y) plane -> kernel[:, c, :]
      axis 2 ('t'):              stencil spans the (t, x) plane -> kernel[:, :, c]
    where c = k // 2 is the central slice (the reference hardcodes index 1,
    valid only for k=3; this generalises to any odd k and equals it at k=3).

    **Reference bug, fixed here**: the reference `ConvOps_2d.kernel_3d`
    (ConvOps_2d.py:67-79) embeds the axis-1 ('y') stencil untransposed, so
    its variation axis (stencil rows) lands on kernel axis 0 — TIME. The
    reference's `ConvOperator('y', n)` therefore produces the *identical
    kernel* to `ConvOperator('t', n)` (verified empirically against the
    reference with torch: nonzero kernel indices [0,1,1],[2,1,1] for both),
    silently turning every d/dy in the NS/MHD/JOREK residuals into d/dt.
    Here the axis-1 stencil is transposed so its variation lands on kernel
    axis 2 (y), i.e. 'y' really differentiates along y. Pass
    ``legacy_y_axis=True`` to reproduce the reference's behaviour
    bit-for-bit (used by the parity benchmarks).
    """
    stencil = np.asarray(stencil, dtype=np.float32)
    k = stencil.shape[0]
    c = k // 2
    kernel = np.zeros((k, k, k), dtype=np.float32)
    if axis == 0:
        kernel[c, :, :] = stencil
    elif axis == 1:
        kernel[:, c, :] = stencil if legacy_y_axis else stencil.T
    elif axis == 2:
        kernel[:, :, c] = stencil
    else:
        raise ValueError("Invalid axis. Must be either 0, 1 or 2")
    return kernel
