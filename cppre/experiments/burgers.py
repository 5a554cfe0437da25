"""1-D Burgers CP experiment (BASELINE config #2).

Reproduces `Joint/Burgers_Residuals_CP.py` / `Marginal/Burgers_Residuals_CP.py`:
the nonlinear u u_x term forces the multi-kernel residual form, so unlike
advection no single composite kernel exists. The reference loads offline
data (`Burgers_1d.npz`) and pretrained weights; here data comes from the
spectral solver and the FNO trains in-script.

Run: ``python -m cppre.experiments.burgers [joint|marginal]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import FNO1d
from ..residuals.burgers import PRE_Burgers
from ..solvers.burgers1d import Burgers1D
from ..train.loops import fit
from ..train.losses import lp_loss
from ..train.normalizers import Identity
from ..train.rollout import validation_AR
from .common import sample_params
from .pipeline import joint_cp, marginal_cp

CONFIG = {
    "Case": "Burgers", "Field": "u", "Model": "FNO",
    "Epochs": 100, "Batch Size": 10, "Optimizer": "Adam",
    "Learning Rate": 0.005, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Identity",
    "T_in": 1, "T_out": 20, "Step": 1, "Width": 16, "Modes": 8,
    "Variables": 1, "Loss Function": "LP",
    "n_train": 100, "n_cal": 100, "n_pred": 100,
    # solver setup (`Active_Learning/Burgers_AL_Joint.py:83-96`)
    "Nx": 200, "Nt": 21, "x_min": 0.0, "x_max": 2.0, "t_end": 0.5, "nu": 0.002,
}

LB = np.asarray([-3.0, -3.0, -3.0])  # IC sine-mode coefficients (:203-204)
UB = np.asarray([3.0, 3.0, 3.0])


def run(mode: str = "joint", config: dict | None = None, seed: int = 0,
        verbose: bool = True, train_precision: str = "highest"):
    cfg = dict(CONFIG, **(config or {}))
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    sim = Burgers1D(cfg["Nx"], cfg["Nt"], cfg["x_min"], cfg["x_max"],
                    cfg["t_end"], cfg["nu"])
    pre = PRE_Burgers(sim.dt, sim.dx, nu=cfg["nu"])

    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    u = np.asarray(sim.solve_batch(sample_params(LB, UB, n_total, seed)))
    data = jnp.asarray(u, jnp.float32).transpose(0, 2, 1)[:, None]  # [n,1,Nx,Nt]
    a_all, u_all = data[..., :T_in], data[..., T_in : T_in + T_out]

    tr = slice(0, cfg["n_train"])
    cal = slice(cfg["n_train"], cfg["n_train"] + cfg["n_cal"])
    prd = slice(cfg["n_train"] + cfg["n_cal"], n_total)

    model = FNO1d(T_in=T_in, step=step, modes1=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width"])
    params = model.init(jax.random.PRNGKey(seed), a_all[tr][:1])
    train_apply = model.apply
    if train_precision == "bf16":
        # bf16 activations for SGD; CP rollouts below keep the f32 apply
        from ..models import with_activation_dtype

        train_apply = with_activation_dtype(train_apply)
    elif train_precision != "highest":
        # bf16-MXU training; CP rollouts below keep the package HIGHEST
        from ..models import with_matmul_precision

        train_apply = with_matmul_precision(train_apply, train_precision)
    import time as _time

    _t0 = _time.perf_counter()
    params = fit(train_apply, params, a_all[tr], u_all[tr],
                 a_all[tr][-5:], u_all[tr][-5:], epochs=cfg["Epochs"],
                 batch_size=cfg["Batch Size"], step=step, T_out=T_out,
                 loss_func=lp_loss, lr=cfg["Learning Rate"],
                 scheduler_step=cfg["Scheduler Step"],
                 scheduler_gamma=cfg["Scheduler Gamma"], seed=seed,
                 verbose=verbose)
    train_time = _time.perf_counter() - _t0
    apply_fn = lambda x: model.apply(params, x)

    to_convops = lambda f: jnp.transpose(f, (0, 1, 3, 2))[:, 0]
    # cal + pred rollouts in ONE batched call: per-batch-shape TPU rounding
    # breaks score exchangeability otherwise (see base2d.run_2d_cp)
    pred_both, _, _ = validation_AR(
        apply_fn, jnp.concatenate((a_all[cal], a_all[prd])),
        jnp.concatenate((u_all[cal], u_all[prd])), step, T_out)
    pred_cal, pred_prd = pred_both[: cfg["n_cal"]], pred_both[cfg["n_cal"] :]
    # metrics on the calibration slice only (mirrors base2d.run_2d_cp:
    # results['mse'] is the calibration-rollout MSE, not cal+pred mixed)
    mse = jnp.mean((pred_cal - u_all[cal]) ** 2)
    mae = jnp.mean(jnp.abs(pred_cal - u_all[cal]))
    res_out_cal = pre(to_convops(u_all[cal]))
    res_pred_cal = pre(to_convops(pred_cal))
    res_pred = pre(to_convops(pred_prd))
    res_out_pred = pre(to_convops(u_all[prd]))

    cp_fn = joint_cp if mode == "joint" else marginal_cp
    aer = cp_fn(res_out_cal, res_pred_cal, res_pred, res_out_pred)
    pre_only = cp_fn(res_out_cal, res_pred_cal, res_pred, mode="pre")
    aer_h = joint_cp(res_out_cal, res_pred_cal, res_pred, res_out_pred,
                     holdout_modulation=True) if mode == "joint" else None

    results = {
        "config": cfg, "mode": mode, "mse": float(mse), "mae": float(mae),
        "train_time": train_time,
        "alphas": aer["alphas"], "coverage_aer_pre": aer["coverage"],
        "coverage_pre": pre_only["coverage"], "qhat": np.asarray(aer["qhat"]),
        "coverage_aer_pre_holdout": aer_h["coverage"] if aer_h else None,
    }
    if verbose:
        for a, c1, c2 in zip(results["alphas"], results["coverage_aer_pre"],
                             results["coverage_pre"]):
            print(f"alpha={a:.2f}  cov(AER+PRE)={c1:.3f}  cov(PRE)={c2:.3f}")
    return results


if __name__ == "__main__":
    import sys

    out = run(sys.argv[1] if len(sys.argv) > 1 else "joint")
    from ..utils.plot_tools import save_experiment_artifacts

    save_experiment_artifacts(out, "Plots", "Burgers")
