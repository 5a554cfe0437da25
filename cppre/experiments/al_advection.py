"""Advection active-learning experiment (the BASELINE.md AL numbers' setup).

Reproduces `/root/reference/Active_Learning/Advection_AL_Joint.py`: pretrain
an FNO on an initial LHS design, calibrate joint-CP scores, then run the
CP / PRE / RAND acquisition loops (5 iterations, alpha = 0.5) and report
test-MSE and sims-sampled histories per acquisition function.

Run: ``python -m cppre.experiments.al_advection [CP|PRE|RAND|all]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..al import active_learning_loop
from ..cp.inductive import modulation_func, ncf_metric_joint
from ..models import FNO1d
from ..residuals.advection import PRE_Advection
from ..solvers.advection1d import Advection1D
from ..train.loops import fit
from ..train.losses import mse as mse_loss
from ..train.rollout import validation_AR
from .advection import CONFIG, LB, UB, _gen_fields, _to_convops
from .common import sample_params

AL_CONFIG = dict(CONFIG, n_iterations=5, alpha=0.5, n_pred=100)


def run(acq: str = "all", config: dict | None = None, seed: int = 0,
        verbose: bool = True, train_precision: str = "highest"):
    cfg = dict(AL_CONFIG, **(config or {}))
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    sim = Advection1D(cfg["Nx"], cfg["Nt"], cfg["x_min"], cfg["x_max"], cfg["t_end"])
    pre = PRE_Advection(sim.dt, sim.dx, v=cfg["v"])
    gen = lambda p: _gen_fields(sim, p, T_in, T_out)

    train_a, train_u = gen(sample_params(LB, UB, cfg["n_train"], seed))
    test_a, test_u = gen(sample_params(LB, UB, cfg["n_test"], seed + 1))

    model = FNO1d(T_in=T_in, step=step, modes1=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width"])
    # pretrain at the same precision the AL fine-tune fits will use
    # (rollouts/residuals below stay on the unwrapped f32 apply)
    if train_precision == "bf16":
        from ..models import with_activation_dtype

        train_apply = with_activation_dtype(model.apply)
    elif train_precision != "highest":
        from ..models import with_matmul_precision

        train_apply = with_matmul_precision(model.apply, train_precision)
    else:
        train_apply = model.apply
    params0 = model.init(jax.random.PRNGKey(seed), train_a)
    params0 = fit(train_apply, params0, train_a, train_u, test_a[:10], test_u[:10],
                  epochs=cfg["Epochs"], batch_size=cfg["Batch Size"], step=step,
                  T_out=T_out, loss_func=mse_loss, lr=cfg["Learning Rate"],
                  seed=seed, verbose=False)

    # calibration scores for the CP acquisition (AL_Joint.py:245-260)
    cal_a, cal_u = gen(sample_params(LB, UB, cfg["n_cal"], seed + 2))
    pred_cal, _, _ = validation_AR(lambda x: model.apply(params0, x), cal_a,
                                   cal_u, step, T_out)
    res_out = pre(_to_convops(cal_u))
    res_prd = pre(_to_convops(pred_cal))
    mod = modulation_func(res_out, res_prd) + 1e-6
    scores = ncf_metric_joint(res_out, res_prd, mod)

    funcs = ["CP", "PRE", "RAND"] if acq == "all" else [acq]
    results = {}
    for f in funcs:
        params, mse_hist, sampled = active_learning_loop(
            acq_func=f, model=model, params=params0, gen_fields=gen,
            residual_of=lambda pred: np.asarray(pre(_to_convops(pred))),
            lb=LB, ub=UB, train_a=train_a, train_u=train_u,
            test_a=test_a, test_u=test_u, cal_scores=scores, modulation=mod,
            n_iterations=cfg["n_iterations"], n_pred=cfg["n_pred"],
            alpha=cfg["alpha"], epochs=cfg["Epochs"],
            batch_size=cfg["Batch Size"], step=step, T_out=T_out,
            lr=1e-3, seed=seed, verbose=verbose,
            train_precision=train_precision)
        results[f] = {"test_mse": mse_hist, "sims_sampled": sampled}
        if verbose:
            print(f"{f}: MSE {['%.4g' % m for m in mse_hist]}, sampled {sampled}")
    return results


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "all")
