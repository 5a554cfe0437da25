"""The active-learning loop (reference `Advection_AL_Joint.py:311-380`).

Per iteration: draw a fresh LHS candidate pool, roll the surrogate out from
the candidates' initial conditions, compute prediction residuals, acquire
the most informative parameters (CP/PRE/RAND), run the numerical solver on
them, append to the training set, fine-tune, evaluate test MSE.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..experiments.common import sample_params
from ..train.loops import fit
from ..train.rollout import validation_AR
from .acquisition import acquire_cp, acquire_cp_marginal, acquire_pre, acquire_rand

__all__ = ["active_learning_loop"]


def active_learning_loop(
    *,
    acq_func: str,                       # 'CP' | 'CP_MARGINAL' | 'PRE' | 'RAND'
    model, params,
    gen_fields: Callable,                # design [n, d] -> (a, u) FNO tensors
    residual_of: Callable,               # rollout pred tensor -> residual array
    lb, ub,
    train_a, train_u,                    # initial training set
    test_a, test_u,
    cal_scores=None, modulation=None,    # joint-CP acquisition (per-sample scores)
    cal_scores_marginal=None,            # marginal-CP acquisition (per-cell scores)
    n_iterations: int = 5,
    n_pred: int = 100,
    alpha: float = 0.5,
    epochs: int = 100,
    batch_size: int = 10,
    step: int = 1,
    T_out: int = 20,
    loss_func=None,
    lr: float = 1e-3,
    seed: int = 0,
    verbose: bool = True,
    train_precision: str = "highest",    # fine-tune fits only; rollouts stay f32
):
    """Returns (params, test_mse_history, sims_sampled_history)."""
    from ..train.losses import mse as mse_loss

    loss_func = loss_func or mse_loss
    # Precision applies to the fine-tuning fits only: the acquisition
    # rollouts and residuals keep the unwrapped f32 apply — the PRE is a
    # near-cancellation bf16 cannot resolve (BASELINE.md "bf16 field
    # storage"), and CP acquisition scores must stay exchangeable with the
    # f32 calibration scores.
    if train_precision == "bf16":
        from ..models import with_activation_dtype

        train_apply = with_activation_dtype(model.apply)
    elif train_precision != "highest":
        from ..models import with_matmul_precision

        train_apply = with_matmul_precision(model.apply, train_precision)
    else:
        train_apply = model.apply
    test_mse, sims_sampled = [], []

    # ONE jitted rollout-eval with params as an ARGUMENT: the per-iteration
    # closures would bake the freshly fine-tuned params in as jaxpr
    # constants and re-compile the AR rollout every iteration (twice: pool
    # + test). Two shape signatures (pool, test) compile once each and are
    # reused across all iterations.
    @jax.jit
    def _rollout_eval(p, a, u):
        return validation_AR(lambda x: model.apply(p, x), a, u, step, T_out)

    _, mse0, _ = _rollout_eval(params, test_a, test_u)
    test_mse.append(float(mse0))

    for ii in range(n_iterations):
        pool = sample_params(lb, ub, n_pred, seed=seed * 100 + ii)
        pool_a, _ = gen_fields(pool)
        pred, _, _ = _rollout_eval(
            params, pool_a, jnp.zeros(pool_a.shape[:-1] + (T_out,)))
        pred_residual = residual_of(pred)

        if acq_func == "CP":
            chosen = acquire_cp(pool, pred_residual, cal_scores, modulation, alpha)
        elif acq_func == "CP_MARGINAL":
            if cal_scores_marginal is None:
                raise ValueError(
                    "CP_MARGINAL needs cal_scores_marginal (per-cell |residual| "
                    "scores, e.g. jnp.abs(res_cal)); the joint cal_scores are "
                    "per-sample sup-norms and would give a scalar qhat")
            chosen = acquire_cp_marginal(pool, pred_residual, cal_scores_marginal, alpha)
        elif acq_func == "PRE":
            chosen = acquire_pre(pool, pred_residual, alpha)
        elif acq_func == "RAND":
            chosen = acquire_rand(pool, alpha, seed=seed * 100 + ii)
        else:
            raise ValueError(f"unknown acquisition {acq_func}")
        if len(chosen) == 0:
            sims_sampled.append(0)
            test_mse.append(test_mse[-1])
            if verbose:
                print(f"iter {ii}: nothing acquired, skipping")
            continue

        new_a, new_u = gen_fields(chosen)
        train_a = jnp.concatenate((train_a, new_a))
        train_u = jnp.concatenate((train_u, new_u))

        params = fit(train_apply, params, train_a, train_u,
                     test_a[:5], test_u[:5], epochs=epochs,
                     batch_size=batch_size, step=step, T_out=T_out,
                     loss_func=loss_func, lr=lr, seed=seed + ii)

        _, mse, _ = _rollout_eval(params, test_a, test_u)
        test_mse.append(float(mse))
        sims_sampled.append(int(len(chosen)))
        if verbose:
            print(f"iter {ii}: sampled {len(chosen)} sims, test MSE {float(mse):.3e}")

    return params, test_mse, sims_sampled
