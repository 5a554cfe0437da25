"""2-D wave-equation CP experiment (BASELINE config #3).

Reproduces `Joint/Wave_Residuals_CP.py` / `Marginal/Wave_Residuals_CP.py`:
spectral wave solutions on a 64^2 grid, MinMax-normalised FNO_multi2d
surrogate, composite-kernel PRE `D_tt - (c dt/dx)^2 D_xxyy`, joint
(modulated sup-norm) and marginal CP.

Run: ``python -m cppre.experiments.wave [joint|marginal]``.
"""

from __future__ import annotations

import numpy as np

from ..residuals.wave import PRE_Wave
from ..solvers.wave2d_spectral import Wave2D
from .common import sample_params
from .base2d import run_2d_cp

CONFIG = {
    # reference `Joint/Wave_Residuals_CP.py:12-37` (n_* shrunk-able via config)
    "Case": "Wave", "Field": "u", "Model": "FNO",
    "Epochs": 500, "Batch Size": 50, "Optimizer": "Adam",
    "Learning Rate": 0.005, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Min-Max",
    "T_in": 1, "T_out": 20, "Step": 1, "Width_time": 32, "Modes": 16,
    "Variables": 1, "Loss Function": "LP",
    "n_train": 800, "n_test": 200, "n_cal": 1000, "n_pred": 100,
    # simulation setup (:76-90)
    "Nx": 64, "x_min": -1.0, "x_max": 1.0, "tend": 1.0, "c": 1.0, "t_slice": 5,
}

LB = np.asarray([10.0, 0.10, 0.10])  # amplitude, x_pos, y_pos (AL bounds)
UB = np.asarray([50.0, 0.50, 0.50])


def gen_data(cfg: dict, n: int, seed: int = 0):
    """LHS design -> [n, 1, Nx, Ny, Nt_sliced] FNO tensor + (dt_eff, dx)."""
    sim = Wave2D(cfg["Nx"], cfg["x_min"], cfg["x_max"], cfg["tend"], cfg["c"])
    params = sample_params(LB, UB, n, seed)
    u = np.asarray(sim.solve_batch(params))[:, :: cfg["t_slice"]]  # [n, Nt, Nx, Ny]
    u = np.moveaxis(u, 1, -1)[:, None]  # [n, 1, Nx, Ny, Nt]
    return u.astype(np.float32), sim.dt * cfg["t_slice"], sim.dx


def run(mode: str = "joint", config: dict | None = None, seed: int = 0,
        params=None, verbose: bool = True, **cp_kwargs):
    cfg = dict(CONFIG, **(config or {}))
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    data, dt_eff, dx = gen_data(cfg, n_total, seed)
    pre = PRE_Wave(dt_eff, dx, c=cfg["c"])
    # fused Pallas composite-kernel path on TPU; identical XLA math off-TPU
    from ..ops.pallas import wave_residual_fused

    residual_fn = lambda fields: wave_residual_fused(fields[:, 0], pre.D.kernel)
    return run_2d_cp(data=data, residual_fn=residual_fn, cfg=cfg, mode=mode,
                     params=params, seed=seed, verbose=verbose, **cp_kwargs)


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "joint",
        config={"plots_dir": "Plots"})


def discretisation_sweep(data, params, discs=(1, 2, 4), config: dict | None = None,
                         seed: int = 0, verbose: bool = True):
    """Coverage at coarser temporal discretisations (the marginal
    experiment's rebuttal study, `Marginal/Wave_Residuals_CP.py:458-480`):
    re-form the composite kernel with dt*disc, subsample the rollout and
    targets `[..., ::disc]`, and sweep marginal coverage per disc."""
    import jax

    from ..models import FNO2d
    from ..train.normalizers import MinMaxNormalizer
    from ..train.rollout import validation_AR
    from .base2d import _to_convops
    from .pipeline import marginal_cp

    cfg = dict(CONFIG, **(config or {}))
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    sim = Wave2D(cfg["Nx"], cfg["x_min"], cfg["x_max"], cfg["tend"], cfg["c"])
    dt_eff, dx = sim.dt * cfg["t_slice"], sim.dx

    import jax.numpy as jnp

    data = jnp.asarray(data, jnp.float32)
    a_all, u_all = data[..., :T_in], data[..., T_in : T_in + T_out]
    in_n, out_n = MinMaxNormalizer(a_all), MinMaxNormalizer(u_all)
    model = FNO2d(T_in=T_in, step=step, modes1=cfg["Modes"], modes2=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width_time"])
    apply_fn = lambda x: model.apply(params, x)
    n_cal = data.shape[0] // 2
    pred, _, _ = validation_AR(apply_fn, in_n.encode(a_all), out_n.encode(u_all),
                               step, T_out)
    pred = out_n.decode(pred)

    results = {}
    for disc in discs:
        pre = PRE_Wave(dt_eff * disc, dx, c=cfg["c"])
        ro = pre(_to_convops(u_all[..., ::disc])[:, 0])
        rp = pre(_to_convops(pred[..., ::disc])[:, 0])
        out = marginal_cp(ro[:n_cal], rp[:n_cal], rp[n_cal:], ro[n_cal:])
        results[disc] = out["coverage"]
        if verbose:
            print(f"disc={disc}: coverage {out['coverage'].round(3)}")
    return results
