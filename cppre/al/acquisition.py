"""Acquisition functions (reference `Advection_AL_Joint.py:297-331` and the
marginal variant `Advection_AL_Marginal.py:169-220`).

TPU numerics note: candidate rollouts are evaluated at whatever batch size
the candidate pool has, while `cal_scores` come from the calibration batch.
On TPU, different batch shapes round differently at bf16 matmul precision
(see `experiments/base2d.run_2d_cp`); for CP *coverage* this is corrected
by single-call rollouts, but acquisition is a ranking heuristic — the
residual perturbation only jitters the accept/reject margin, it does not
bias which region of parameter space gets acquired, so the looser contract
is acceptable here (and the FNO's f32-precision contractions bound the
jitter)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..cp.inductive import calibrate, filter_sims_joint, filter_sims_within_bounds

__all__ = ["acquire_cp", "acquire_cp_marginal", "acquire_pre", "acquire_rand"]


def acquire_cp(params, pred_residual, cal_scores, modulation, alpha: float = 0.5):
    """Joint-CP rejection: candidates whose residual escapes the
    [-qhat*mod, +qhat*mod] band (:333-338, mask inverted vs
    filter_sims_joint). Returns the rejected parameter rows."""
    qhat = calibrate(jnp.asarray(cal_scores), len(cal_scores), alpha)
    sets = (-qhat * modulation, qhat * modulation)
    inside = np.asarray(filter_sims_joint(sets, jnp.asarray(pred_residual)))
    return np.asarray(params)[~inside]


def acquire_cp_marginal(params, pred_residual, cal_scores, alpha: float = 0.5,
                        threshold: float = 0.5):
    """Marginal-CP rejection (`Advection_AL_Marginal.py:169-220`): per-cell
    qhat from the calibration scores; candidates whose fraction of cells
    OUTSIDE [-qhat, +qhat] exceeds `threshold` are acquired."""
    qhat = calibrate(jnp.asarray(cal_scores), len(cal_scores), alpha)
    mask = np.asarray(filter_sims_within_bounds(
        -qhat, qhat, jnp.asarray(pred_residual), threshold, within=False))
    return np.asarray(params)[mask]


def acquire_pre(params, pred_residual, alpha: float = 0.5,
                largest: bool = True):
    """Rank candidates by mean |residual| and take the (1-alpha) fraction.

    The reference comment says "Descending order of PRE" but its
    `torch.sort` is ascending, so it actually keeps the SMALLEST residuals
    (`Advection_AL_Joint.py:341-346`) — `largest=False` replicates that;
    the default follows the stated intent (largest residuals = most
    informative)."""
    pred_residual = np.asarray(pred_residual)
    mean_res = np.abs(pred_residual).mean(axis=tuple(range(1, pred_residual.ndim)))
    order = np.argsort(mean_res)
    if largest:
        order = order[::-1]
    num = int((1 - alpha) * len(params))
    return np.asarray(params)[order][:num]


def acquire_rand(params, alpha: float = 0.5, seed: int = 0):
    """Random acquisition (with replacement, like the reference's
    np.random.randint; :349-353)."""
    rng = np.random.RandomState(seed)
    num = int((1 - alpha) * len(params))
    return np.asarray(params)[rng.randint(0, len(params), num)]
