"""Inductive (split) conformal prediction primitives.

First-class rebuild of the reference's external `Neural_PDE.UQ.inductive_cp`
module, whose semantics are recoverable from in-repo call sites and
re-implementations (see SURVEY.md §2.3):

* ``calibrate``        — split-CP quantile, elementwise over non-batch dims
                         (`Marginal/Advection_Residuals_CP.py:251-252`;
                         scalar when scores are per-sample scalars,
                         `Joint/Advection_Residuals_CP.py:244`);
* ``emp_cov``          — fraction of *cells* inside the marginal sets;
* ``emp_cov_joint``    — fraction of *samples* entirely inside
                         (`Joint/Wave_Residuals_CP.py:303-305`);
* ``modulation_func``  — per-cell std of (a - b) over the calibration axis
                         (`Tests/test_advection_inv_sampling_marginal.py:428`);
* ``ncf_metric_joint`` — per-sample sup-norm of |a - b| / modulation
                         (`Tests/test_advection_inv_sampling_marginal.py:430-433`);
* filtering helpers    — (`Active_Learning/Advection_AL_Marginal.py:169-189`,
                         `Joint/Wave_Residuals_CP.py:303-305`).

All functions are pure jnp and accept NumPy or JAX arrays; everything is
vmap/pjit-transparent, so sharding the calibration batch over a device mesh
parallelises calibration with no code change.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = [
    "calibrate",
    "emp_cov",
    "emp_cov_joint",
    "modulation_func",
    "ncf_metric_joint",
    "filter_sims_within_bounds",
    "filter_sims_joint",
]


def cp_quantile_level(n: int, alpha: float) -> float:
    """The finite-sample-corrected split-CP level ceil((n+1)(1-alpha))/n, capped at 1."""
    return min(math.ceil((n + 1) * (1 - alpha)) / n, 1.0)


def calibrate(scores, n: int | None = None, alpha: float = 0.1):
    """qhat = Quantile(scores; ceil((n+1)(1-alpha))/n) over the batch axis.

    `scores` is [n, *field] (marginal CP: qhat has field shape) or [n]
    (joint CP: scalar qhat). Uses the 'higher' interpolation so the returned
    quantile is an actual calibration score — the convention that yields the
    finite-sample coverage guarantee.
    """
    scores = jnp.asarray(scores)
    if n is None:
        n = scores.shape[0]
    q = cp_quantile_level(n, alpha)
    return jnp.quantile(scores, q, axis=0, method="higher")


def emp_cov(prediction_sets, y_response) -> float:
    """Marginal empirical coverage: mean fraction of cells inside the sets."""
    lower, upper = prediction_sets
    y = jnp.asarray(y_response)
    return float(jnp.mean((y >= lower) & (y <= upper)))


def emp_cov_joint(prediction_sets, y_response) -> float:
    """Joint empirical coverage: fraction of samples *entirely* inside."""
    lower, upper = prediction_sets
    y = jnp.asarray(y_response)
    axes = tuple(range(1, y.ndim))
    inside = jnp.all(y >= lower, axis=axes) & jnp.all(y <= upper, axis=axes)
    return float(jnp.mean(inside))


def modulation_func(a, b=None):
    """Per-cell spread of (a - b) over the calibration axis: std(a - b, axis=0).

    Callers add their own +1e-6 guard where needed
    (`Joint/MHD_Residuals_CP.py:350`).
    """
    a = jnp.asarray(a)
    diff = a if b is None else a - jnp.asarray(b)
    return jnp.std(diff, axis=0)


def ncf_metric_joint(a, b, modulation):
    """Per-sample sup-norm nonconformity: max over non-batch axes of |a-b|/mod."""
    a = jnp.asarray(a)
    diff = a if b is None else a - jnp.asarray(b)
    axes = tuple(range(1, diff.ndim))
    return jnp.max(jnp.abs(diff) / modulation, axis=axes)


def filter_sims_within_bounds(lower_bound, upper_bound, samples, threshold, within=False):
    """Boolean mask of samples whose fraction of cells in (within=True) or out
    (within=False) of the bounds is >= threshold
    (`Active_Learning/Advection_AL_Marginal.py:169-189`).
    """
    samples = jnp.asarray(samples)
    lower = jnp.asarray(lower_bound)
    upper = jnp.asarray(upper_bound)
    if within:
        mask = (samples >= lower) & (samples <= upper)
    else:
        mask = (samples <= lower) | (samples >= upper)
    axes = tuple(range(1, samples.ndim))
    return jnp.mean(mask, axis=axes) >= threshold


def filter_sims_joint(prediction_sets, y_response):
    """Boolean mask of samples entirely inside the joint sets
    (`Joint/Wave_Residuals_CP.py:303-305`)."""
    lower, upper = prediction_sets
    y = jnp.asarray(y_response)
    axes = tuple(range(1, y.ndim))
    return jnp.all(y >= lower, axis=axes) & jnp.all(y <= upper, axis=axes)
