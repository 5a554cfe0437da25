"""PI / PISL loss factories over a residual operator.

Specs (`/root/reference/Physics_Informed/Wave_FNO_PI.py:205-257`,
`Wave_FNO_PISL.py:209-220`):
  PI(pred)        = mean(residual(pred)^2)                 (data-free)
  PISL(pred, y)   = mean((residual(pred) - residual(y))^2) (supervised-by-residual)
  combined        = Lp(pred, y) + weight * PISL(pred, y)   (weight = 1000)
`residual_fn` maps the FNO chunk [BS, Nvar, Nx, Ny, step-or-T] to its PRE
(interior-cropped), e.g. a `cppre.residuals` class composed with the
layout permute — exactly the reference's `residual_loss` closure (:208-210).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from ..train.losses import lp_loss

__all__ = ["make_pi_loss", "make_pisl_loss", "make_combined_loss",
           "fno_chunk_residual"]


def fno_chunk_residual(pre_operator) -> Callable:
    """The reference's residual_loss closure (Wave_FNO_PI.py:208-210):
    crop field boundaries of [BS, Nvar, Nx, Ny, T], permute to ConvOps
    layout, apply the composite operator (residual itself uncropped —
    boundary handling happens on the field, not the residual)."""

    def residual(field):
        f = field[:, 0, 1:-1, 1:-1, 1:-1]          # [BS, Nx-2, Ny-2, T-2]
        f = jnp.transpose(f, (0, 3, 1, 2))          # [BS, T-2, Nx-2, Ny-2]
        return pre_operator(f, boundary=True)

    return residual


def make_pi_loss(residual_fn: Callable):
    def pi_loss(pred, target=None):
        return jnp.mean(residual_fn(pred) ** 2)

    return pi_loss


def make_pisl_loss(residual_fn: Callable):
    def pisl_loss(pred, target):
        return jnp.mean((residual_fn(pred) - residual_fn(target)) ** 2)

    return pisl_loss


def make_combined_loss(residual_fn: Callable, weight: float = 1000.0):
    pisl = make_pisl_loss(residual_fn)

    def combined(pred, target):
        return lp_loss(pred, target) + weight * pisl(pred, target)

    return combined
