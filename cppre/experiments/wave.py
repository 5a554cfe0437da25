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
        params=None, verbose: bool = True):
    cfg = dict(CONFIG, **(config or {}))
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    data, dt_eff, dx = gen_data(cfg, n_total, seed)
    pre = PRE_Wave(dt_eff, dx, c=cfg["c"])
    residual_fn = lambda fields: pre(fields[:, 0])
    return run_2d_cp(data=data, residual_fn=residual_fn, cfg=cfg, mode=mode,
                     params=params, seed=seed, verbose=verbose)


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "joint")
