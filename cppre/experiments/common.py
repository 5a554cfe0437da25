"""Shared experiment utilities: LHS sampling, field stacking, configs.

Replaces the reference's pyDOE `lhs` (`Marginal/Advection_Residuals_CP.py:
168`) and the `stacked_fields`/`unstack_fields` multi-variable conventions
(`Joint/NS_Residuals_CP.py:90-111`).
"""

from __future__ import annotations

import numpy as np

__all__ = ["latin_hypercube", "sample_params", "stacked_fields", "unstack_fields"]


def latin_hypercube(n_dims: int, n_samples: int, seed: int = 0) -> np.ndarray:
    """Latin hypercube design in [0, 1]^d (pyDOE `lhs(d, n)` replacement):
    one sample per row, each dimension stratified into n_samples bins."""
    rng = np.random.RandomState(seed)
    out = np.empty((n_samples, n_dims), dtype=np.float64)
    for d in range(n_dims):
        perm = rng.permutation(n_samples)
        out[:, d] = (perm + rng.rand(n_samples)) / n_samples
    return out


def sample_params(lb, ub, n_samples: int, seed: int = 0) -> np.ndarray:
    """lb + (ub - lb) * lhs(d, n) — the universal reference pattern."""
    lb, ub = np.asarray(lb, dtype=np.float64), np.asarray(ub, dtype=np.float64)
    return (lb + (ub - lb) * latin_hypercube(len(lb), n_samples, seed)).astype(
        np.float32
    )


def stacked_fields(variables):
    """List of [BS, Nt, Nx, Ny] arrays -> [BS, Nvar, Nx, Ny, Nt] FNO layout
    (`Joint/NS_Residuals_CP.py:90-98`)."""
    import jax.numpy as jnp

    stack = [jnp.moveaxis(jnp.asarray(v, jnp.float32), 1, -1) for v in variables]
    return jnp.stack(stack, axis=1)


def unstack_fields(field, axis: int = 1, variable_names=None):
    """[BS, Nvar, Nx, Ny, Nt] -> list of [BS, Nt, Nx, Ny]
    (`Joint/NS_Residuals_CP.py:101-111`)."""
    import jax.numpy as jnp

    n = field.shape[axis]
    if variable_names is not None and len(variable_names) != n:
        raise ValueError("Number of tensors and variable names should match.")
    parts = jnp.split(field, n, axis=axis)
    return [jnp.moveaxis(p.squeeze(axis), -1, 1) for p in parts]
