"""Vector calculus over ConvOperators for 2D+time data [BS, Nt, Nx, Ny].

JAX port of the reference `/root/reference/Utils/VectorConvOps.py`. These are
thin pure compositions of scalar `ConvOperator2d`s — verified equal to
hand-composed operators in the reference (Tests/NS_vector_convops.py:152-219).

Note: the reference's 2-D `cross` uses `a0*b1 + a1*b0` (a `+` where a true 2-D
cross product is `a0*b1 - a1*b0`; VectorConvOps.py:21-22). The residual
pipelines depend on that behaviour, so `cross` reproduces it and
`cross_true` provides the mathematically correct version.
"""

from __future__ import annotations

import jax.numpy as jnp

from .convops import ConvOperator2d

__all__ = ["dot", "cross", "cross_true", "vectorize", "Divergence", "Gradient", "Curl", "Laplace"]


def dot(a, b):
    return a[0] * b[0] + a[1] * b[1]


def cross(a, b):
    # reference quirk: '+' instead of '-' (VectorConvOps.py:21-22)
    return a[0] * b[1] + a[1] * b[0]


def cross_true(a, b):
    return a[0] * b[1] - a[1] * b[0]


def vectorize(a, b):
    return jnp.stack((a, b))


class Divergence:
    """div(u, v) = du/dx + dv/dy (VectorConvOps.py:29-39)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2):
        self.grad_x = ConvOperator2d(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperator2d(domain[1], order, scale, taylor_order)

    def __call__(self, input_x, input_y):
        return self.grad_x(input_x) + self.grad_y(input_y)


class Gradient:
    """grad(f) = stack(df/dx, df/dy) (VectorConvOps.py:41-54)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2):
        self.grad_x = ConvOperator2d(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperator2d(domain[1], order, scale, taylor_order)

    def __call__(self, input_x, input_y=None):
        if input_y is None:
            input_y = input_x
        return jnp.stack((self.grad_x(input_x), self.grad_y(input_y)))


class Curl:
    """curl(u, v) = dv/dx - du/dy (VectorConvOps.py:56-66)."""

    def __init__(self, domain=("x", "y"), order=1, scale=1.0, taylor_order=2):
        self.grad_x = ConvOperator2d(domain[0], order, scale, taylor_order)
        self.grad_y = ConvOperator2d(domain[1], order, scale, taylor_order)

    def __call__(self, input_x, input_y):
        return self.grad_x(input_y) - self.grad_y(input_x)


class Laplace:
    """Componentwise Laplacian (VectorConvOps.py:69-81)."""

    def __init__(self, domain=("x", "y"), order=2, scale=1.0, taylor_order=2):
        self.laplace = ConvOperator2d(domain, order, scale, taylor_order)

    def __call__(self, input_x, input_y=None):
        if input_y is None:
            input_y = input_x
        return jnp.stack((self.laplace(input_x), self.laplace(input_y)))
