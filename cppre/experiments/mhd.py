"""2-D ideal MHD CP experiment (BASELINE config #5a).

Reproduces `Joint/MHD_Residuals_CP.py` / `Marginal/MHD_Residuals_CP.py`:
constrained-transport MHD solutions over 6 fields (rho, u, v, p, Bx, By),
multivariate FNO surrogate, five selectable residual equations, joint CP
with the +1e-6 modulation guard (:350).

Run: ``python -m cppre.experiments.mhd [joint|marginal] [equation]``.
"""

from __future__ import annotations

import numpy as np

from ..solvers.mhd2d_constrained import mhd_solve_batch
from .common import sample_params
from .base2d import run_2d_cp

CONFIG = {
    # reference `Joint/MHD_Residuals_CP.py:14-36`
    "Case": "MHD", "Field": "rho, u, v, p, Bx, By", "Model": "FNO",
    "Epochs": 500, "Batch Size": 5, "Optimizer": "Adam",
    "Learning Rate": 0.005, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Min-Max",
    "T_in": 1, "T_out": 20, "Step": 1, "Width_time": 16, "Modes": 8,
    "Variables": 6, "Loss Function": "LP",
    "n_train": 100, "n_cal": 100, "n_pred": 100,
    # simulation setup (:76-82, 127-140)
    "N": 128, "boxsize": 1.0, "tEnd": 0.5, "dt": 1e-4, "t_slice": 25,
    "equation": "induction",  # reference's default switch (:323)
}

LB = np.asarray([0.5, 0.5, 0.5])  # a, b, c (:206-207)
UB = np.asarray([1.0, 1.0, 1.0])


def gen_data(cfg: dict, n: int, seed: int = 0, lb=None, ub=None):
    """LHS design -> [n, 6, Nx, Ny, Nt] FNO tensor + (dt_eff, dx).

    `lb`/`ub` override the (a, b, c) design box (default: the reference's
    training box LB..UB) — the out-of-distribution loader samples a
    disjoint box (`uq/data_loaders.py::load_mhd`)."""
    params = sample_params(LB if lb is None else np.asarray(lb),
                           UB if ub is None else np.asarray(ub), n, seed)
    fields = mhd_solve_batch(params, cfg["N"], cfg["boxsize"], cfg["tEnd"],
                             dt=cfg["dt"], store_every=cfg["t_slice"])
    data = np.stack([np.moveaxis(np.asarray(f), 1, -1) for f in fields], axis=1)
    dt_eff = cfg["dt"] * cfg["t_slice"]
    dx = cfg["boxsize"] / cfg["N"]
    return data.astype(np.float32), dt_eff, dx


def run(mode: str = "joint", config: dict | None = None, seed: int = 0,
        params=None, verbose: bool = True, **cp_kwargs):
    cfg = dict(CONFIG, **(config or {}))
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    data, dt_eff, dx = gen_data(cfg, n_total, seed)
    # fused Pallas path on TPU for every selectable equation (one VMEM pass
    # over the 6-field block); identical XLA math off-TPU — parity in
    # tests/test_pallas_kernels.py
    from ..ops.pallas import mhd_residual_fused

    res = lambda fields: mhd_residual_fused(fields, equation=cfg["equation"])
    cp_kwargs.setdefault("eps", 1e-6)  # reference's modulation guard (:350)
    return run_2d_cp(data=data, residual_fn=res, cfg=cfg, mode=mode,
                     params=params, seed=seed, verbose=verbose, **cp_kwargs)


if __name__ == "__main__":
    import sys

    mode = sys.argv[1] if len(sys.argv) > 1 else "joint"
    eq = {"equation": sys.argv[2]} if len(sys.argv) > 2 else None
    run(mode, config=dict(eq or {}, plots_dir="Plots"))
