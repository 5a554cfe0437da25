"""1-D advection CP experiments — the standalone, data-free pipeline.

Reproduces `Marginal/Advection_Residuals_CP.py` (marginal, disc=2 temporal
subsampling) and `Joint/Advection_Residuals_CP.py` (joint, disc=1): generate
LHS-sampled advection solutions on-device, train an FNO_multi1d surrogate,
roll out autoregressively, form the composite-kernel PRE, calibrate
marginal/joint conformal sets, sweep empirical coverage over alpha.

Run: ``python -m cppre.experiments.advection [marginal|joint]``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import FNO1d
from ..residuals.advection import PRE_Advection
from ..solvers.advection1d import Advection1D
from ..train.loops import fit
from ..train.losses import mse as mse_loss
from ..cp.inductive import calibrate
from ..train.rollout import autoregressive_rollout
from .common import sample_params
from .pipeline import joint_cp, marginal_cp

CONFIG = {
    # reference `Marginal/Advection_Residuals_CP.py:15-38`
    "Case": "Advection", "Field": "u", "Model": "FNO",
    "Epochs": 100, "Batch Size": 10, "Optimizer": "Adam",
    "Learning Rate": 0.001, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Identity",
    "T_in": 1, "T_out": 20, "Step": 1, "Width": 16, "Modes": 8,
    "Variables": 1, "Loss Function": "MSE",
    "n_train": 100, "n_test": 100, "n_cal": 100, "n_pred": 100,
    # simulation setup (:85-92)
    "Nx": 200, "Nt": 100, "x_min": 0.0, "x_max": 2.0, "t_end": 0.5, "v": 1.0,
}

LB = np.asarray([0.5, 50.0])   # (pulse centre, sharpness) :150-151
UB = np.asarray([1.0, 200.0])


def _gen_fields(sim: Advection1D, params, T_in: int, T_out: int):
    """Solver batch -> FNO tensors. Mirrors gen_data/data_loader
    (:97-148): crop ghost cells [1:-2], permute to [BS, 1, Nx, Nt]."""
    u = np.asarray(sim.solve_batch(params, CONFIG["v"]))  # [n, Nt, Nx]
    u = u[:, :, 1:-2]
    u = jnp.asarray(u, jnp.float32).transpose(0, 2, 1)[:, None]  # [n,1,Nx,Nt]
    return u[..., :T_in], u[..., T_in : T_in + T_out]


def _to_convops(field):
    """[BS, 1, Nx, Nt] -> [BS, Nt, Nx] (reference permute(0,1,3,2)[:,0])."""
    return jnp.transpose(field, (0, 1, 3, 2))[:, 0]


def run(mode: str = "marginal", config: dict | None = None, seed: int = 0,
        verbose: bool = True):
    cfg = dict(CONFIG, **(config or {}))
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    disc = 2 if mode == "marginal" else 1

    sim = Advection1D(cfg["Nx"], cfg["Nt"], cfg["x_min"], cfg["x_max"], cfg["t_end"])
    dt, dx = sim.dt, sim.dx
    pre = PRE_Advection(dt, dx, v=cfg["v"], disc=disc)

    # --- train ---
    t0 = time.perf_counter()
    train_a, train_u = _gen_fields(sim, sample_params(LB, UB, cfg["n_train"], seed), T_in, T_out)
    model = FNO1d(T_in=T_in, step=step, modes1=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width"])
    params0 = model.init(jax.random.PRNGKey(seed), train_a)
    params = fit(model.apply, params0, train_a, train_u,
                 train_a[-10:], train_u[-10:], epochs=cfg["Epochs"],
                 batch_size=cfg["Batch Size"], step=step, T_out=T_out,
                 loss_func=mse_loss, lr=cfg["Learning Rate"],
                 scheduler_step=cfg["Scheduler Step"],
                 scheduler_gamma=cfg["Scheduler Gamma"], seed=seed,
                 verbose=verbose)
    train_time = time.perf_counter() - t0
    apply_fn = lambda x: model.apply(params, x)

    # --- test + calibration rollouts, ONE batched call ---
    # (TPU kernels round differently per batch shape; scoring cal and test
    # sets from different-shaped rollouts breaks CP exchangeability — see
    # base2d.run_2d_cp. Roll everything out together, split after.)
    test_a, test_u = _gen_fields(sim, sample_params(LB, UB, cfg["n_test"], seed + 1), T_in, T_out)
    cal_a, cal_u = _gen_fields(sim, sample_params(LB, UB, cfg["n_cal"], seed + 2), T_in, T_out)
    # prediction set is IC-only (no targets), reference :240-247
    pred_params = sample_params(LB, UB, cfg["n_pred"], seed + 3)
    pred_a, _ = _gen_fields(sim, pred_params, T_in, T_out)
    n_test, n_cal = cfg["n_test"], cfg["n_cal"]
    pred_all = autoregressive_rollout(
        apply_fn, jnp.concatenate((test_a, cal_a, pred_a)), step, T_out)
    pred_test = pred_all[:n_test]
    pred_cal = pred_all[n_test : n_test + n_cal]
    pred_roll = pred_all[n_test + n_cal :]
    mse = jnp.mean((pred_test - test_u) ** 2)
    mae = jnp.mean(jnp.abs(pred_test - test_u))
    if verbose:
        print(f"Testing Error (MSE): {float(mse):.3e}  (MAE): {float(mae):.3e}")

    res_out_cal = pre(_to_convops(cal_u[..., ::disc]))
    res_pred_cal = pre(_to_convops(pred_cal[..., ::disc]))
    pred_residual = pre(_to_convops(pred_roll[..., ::disc]))

    # --- test residuals for the coverage sweep ---
    res_out_test = pre(_to_convops(test_u[..., ::disc]))
    res_pred_test = pre(_to_convops(pred_test[..., ::disc]))

    cp_fn = marginal_cp if mode == "marginal" else joint_cp
    aer = cp_fn(res_out_cal, res_pred_cal, res_pred_test, res_out_test, mode="aer+pre")
    pre_only = cp_fn(res_out_cal, res_pred_cal, pred_residual, mode="pre")

    # residual-bound inversion back to solution space via deconvolution
    # (`Expts_initial/Advection_Residuals_CP.py:340-352`). The deconvolution
    # is a global FFT, so the sets must be built on the UNCROPPED residual
    # (the boundary crop would shift/distort every deconvolved value).
    res_pred_cal_full = pre(_to_convops(pred_cal[..., ::disc]), boundary=True)
    res_out_cal_full = pre(_to_convops(cal_u[..., ::disc]), boundary=True)
    res_pred_test_full = pre(_to_convops(pred_test[..., ::disc]), boundary=True)
    qhat_full = calibrate(
        jnp.abs(res_out_cal_full - res_pred_cal_full),
        cfg["n_cal"], 0.1)
    u_lower = pre.D.integrate(res_pred_test_full - qhat_full)
    u_upper = pre.D.integrate(res_pred_test_full + qhat_full)

    results = {
        "config": cfg, "mode": mode, "train_time": train_time,
        "mse": float(mse), "mae": float(mae),
        "alphas": aer["alphas"],
        "coverage_aer_pre": aer["coverage"],
        "coverage_pre": pre_only["coverage"],
        "qhat": np.asarray(aer["qhat"]),
        "n_rejected": int(np.sum(np.asarray(pre_only["filter_mask"])))
        if pre_only["filter_mask"] is not None else None,
        "inverted_bounds": (np.asarray(u_lower), np.asarray(u_upper)),
    }
    if verbose:
        for a, c1, c2 in zip(results["alphas"], results["coverage_aer_pre"],
                             results["coverage_pre"]):
            print(f"alpha={a:.2f}  cov(AER+PRE)={c1:.3f}  cov(PRE)={c2:.3f}")
    return results


if __name__ == "__main__":
    import sys

    out = run(sys.argv[1] if len(sys.argv) > 1 else "marginal")
    from ..utils.plot_tools import save_experiment_artifacts

    save_experiment_artifacts(out, "Plots", "Advection")
