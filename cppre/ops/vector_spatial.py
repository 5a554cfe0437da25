"""Vector calculus on purely spatial fields [BS, C, Nx, Ny] with boundary handling.

JAX port of `/root/reference/Utils/VectorConvOps_Spatial.py`. Each operator
pads its input with a `BoundaryManager` (default periodic) and applies a
*valid* `ConvOperatorSpatial`, so the output spatial shape equals the input's.
Used by the differentiable compressible-NS right-hand side
(`Active_Learning/CNS.py:5-31`).
"""

from __future__ import annotations

import jax.numpy as jnp

from .boundary import BoundaryManager
from .convops import ConvOperatorSpatial

__all__ = ["dot", "cross", "vectorize", "Gradient", "Laplace", "Divergence", "Curl", "VectorGradient"]


def dot(a, b):
    return a[:, 0:1] * b[:, 0:1] + a[:, 1:2] * b[:, 1:2]


def cross(a, b):
    # reference quirk: '+' instead of '-' (VectorConvOps_Spatial.py:26-27)
    return a[:, 0:1] * b[:, 1:2] + a[:, 1:2] * b[:, 0:1]


def vectorize(a, b):
    return jnp.concatenate((a, b), axis=1)


def _bc(taylor_order, boundary_cond):
    bc = BoundaryManager(kernel_size=(taylor_order + 1, taylor_order + 1))
    bc.set_all_boundaries(bc_type=boundary_cond)
    return bc


class Gradient:
    """scalar -> (2 channels) gradient (VectorConvOps_Spatial.py:33-56)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2, boundary_cond="periodic"):
        self.grad_x = ConvOperatorSpatial(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperatorSpatial(domain[1], order, scale, taylor_order)
        self.bc = _bc(taylor_order, boundary_cond)

    def __call__(self, input_x, input_y=None):
        if input_y is None:
            input_y = input_x
        return jnp.concatenate(
            (self.grad_x(self.bc.pad_signal(input_x)), self.grad_y(self.bc.pad_signal(input_y))),
            axis=1,
        )


class Laplace:
    """Scalar or componentwise vector Laplacian (VectorConvOps_Spatial.py:59-93)."""

    def __init__(self, domain=("x", "y"), order=2, scale=1.0, taylor_order=2, boundary_cond="periodic", scalar=True):
        self.laplace = ConvOperatorSpatial(domain, order, scale, taylor_order)
        self.scalar = scalar
        self.bc = _bc(taylor_order, boundary_cond)

    def __call__(self, input_x, input_y=None):
        padded_x = self.bc.pad_signal(input_x)
        if self.scalar:
            return self.laplace(padded_x)
        if input_y is None:
            input_y = input_x
        padded_y = self.bc.pad_signal(input_y)
        return jnp.concatenate((self.laplace(padded_x), self.laplace(padded_y)), axis=1)


class Divergence:
    """(u, v) -> du/dx + dv/dy (VectorConvOps_Spatial.py:96-115)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2, boundary_cond="periodic"):
        self.grad_x = ConvOperatorSpatial(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperatorSpatial(domain[1], order, scale, taylor_order)
        self.bc = _bc(taylor_order, boundary_cond)

    def __call__(self, input_x, input_y):
        return self.grad_x(self.bc.pad_signal(input_x)) + self.grad_y(self.bc.pad_signal(input_y))


class Curl:
    """(u, v) -> dv/dx - du/dy (VectorConvOps_Spatial.py:119-139)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2, boundary_cond="periodic"):
        self.grad_x = ConvOperatorSpatial(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperatorSpatial(domain[1], order, scale, taylor_order)
        self.bc = _bc(taylor_order, boundary_cond)

    def __call__(self, input_x, input_y):
        return self.grad_x(self.bc.pad_signal(input_y)) - self.grad_y(self.bc.pad_signal(input_x))


class VectorGradient:
    """(du/dx)^2 + (dv/dy)^2 + 2*(du/dy)(dv/dx) (VectorConvOps_Spatial.py:142-164)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2, boundary_cond="periodic"):
        self.grad_x = ConvOperatorSpatial(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperatorSpatial(domain[1], order, scale, taylor_order)
        self.bc = _bc(taylor_order, boundary_cond)

    def __call__(self, input_x, input_y):
        px, py = self.bc.pad_signal(input_x), self.bc.pad_signal(input_y)
        return (
            self.grad_x(px) ** 2
            + self.grad_y(py) ** 2
            + 2 * self.grad_y(px) * self.grad_x(py)
        )
