"""2-D Navier-Stokes CP experiment (BASELINE config #4).

Reproduces `Joint/NS_Residuals_CP.py` / `Marginal/NS_Residuals_CP.py`:
spectral NS solutions (u, v, p, w) downsampled `[::t_slice, ::x_slice,
::x_slice]`, multivariate FNO surrogate, continuity/momentum PRE, joint and
marginal CP (marginal adds the periodic-BC residual path).

Run: ``python -m cppre.experiments.ns [joint|marginal]``.
"""

from __future__ import annotations

import numpy as np

from ..residuals.ns import PRE_NS
from ..solvers.ns2d_spectral import NavierStokes2D
from .common import sample_params
from .base2d import run_2d_cp

CONFIG = {
    # reference `Joint/NS_Residuals_CP.py:13-36`
    "Case": "Navier-Stokes", "Field": "u, v, p", "Model": "FNO",
    "Epochs": 500, "Batch Size": 5, "Optimizer": "Adam",
    "Learning Rate": 0.005, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Min-Max",
    "T_in": 1, "T_out": 20, "Step": 1, "Width_time": 16, "Modes": 8,
    "Variables": 3, "Loss Function": "LP",
    "n_train": 100, "n_cal": 100, "n_pred": 100,
    # simulation setup (:77-85, 115-135)
    "N": 400, "tStart": 0.0, "tEnd": 0.5, "dt": 1e-3, "nu": 1e-3, "L": 1.0,
    "t_slice": 10, "x_slice": 4,
    "residual": "momentum",  # or "continuity"
}

LB = np.asarray([0.5, 0.5])  # aa, bb (:200-201)
UB = np.asarray([1.0, 1.0])


def gen_data(cfg: dict, n: int, seed: int = 0):
    """LHS design -> [n, 3, Nx, Ny, Nt] FNO tensor (u, v, p) + grid steps.

    The batched solve runs in sim-chunks: at the reference's N=400 the
    stored full-resolution trajectories are ~130 MB/sim, so a single
    300-sim vmap overflows HBM; each chunk is sliced `[::x_slice]` and
    fetched to host before the next solves (reference slices after solving,
    `Joint/NS_Residuals_CP.py:115-135` — same data, bounded memory)."""
    sim = NavierStokes2D(cfg["N"], cfg["tStart"], cfg["tEnd"], cfg["dt"],
                         cfg["nu"], cfg["L"], store_every=cfg["t_slice"])
    params = sample_params(LB, UB, n, seed)
    xs = cfg["x_slice"]
    n_vars = 4 if cfg.get("Variables", 3) >= 4 else 3
    n_frames = int((cfg["tEnd"] - cfg["tStart"]) / cfg["dt"] / cfg["t_slice"]) + 1
    bytes_per_sim = n_frames * cfg["N"] ** 2 * 4 * 4  # 4 stored fields, f32
    chunk = int(cfg.get("solver_chunk", max(1, int(4e9) // bytes_per_sim)))
    chunk = min(chunk, n)
    # keep every solver vmap batch shape-identical: a final partial chunk
    # would run the tail sims at a different batch shape (subtly different
    # reduction/rounding order on TPU), a weak exchangeability asymmetry in
    # the generated data. Pad the design to a chunk multiple (<= chunk-1
    # throwaway solves) rather than shrinking chunk, which degenerates to
    # batch-1 dispatches for divisor-poor n.
    n_pad = (-n) % chunk
    params_run = np.concatenate([params, params[: n_pad]]) if n_pad else params
    chunks = []
    for i in range(0, len(params_run), chunk):
        out = sim.solve_batch(params_run[i : i + chunk])
        fields = [np.asarray(f[:, :, ::xs, ::xs]) for f in out[:n_vars]]
        chunks.append(np.stack([np.moveaxis(f, 1, -1) for f in fields], axis=1))
    data = np.concatenate(chunks, axis=0)[:n]
    dt_eff = cfg["dt"] * cfg["t_slice"]
    dx = cfg["L"] / cfg["N"] * xs
    return data.astype(np.float32), dt_eff, dx


def run(mode: str = "joint", config: dict | None = None, seed: int = 0,
        params=None, verbose: bool = True, **cp_kwargs):
    cfg = dict(CONFIG, **(config or {}))
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    data, dt_eff, dx = gen_data(cfg, n_total, seed)
    pre = PRE_NS(dt_eff, dx, dx, nu=cfg["nu"])
    res = getattr(pre, f"residual_{cfg['residual']}")
    out = run_2d_cp(data=data, residual_fn=res, cfg=cfg, mode=mode,
                    params=params, seed=seed, verbose=verbose, **cp_kwargs)
    if mode == "marginal" and cfg.get("Variables", 3) >= 4:
        # CP over periodic-BC violation of the vorticity field
        # (`Marginal/NS_Residuals_CP.py:468-499`)
        out["bc_coverage"] = _bc_residual_cp(data, pre, out, cfg, verbose)
    return out


def _bc_residual_cp(data, pre, out, cfg, verbose):
    import jax.numpy as jnp

    from .base2d import _to_convops
    from .pipeline import marginal_coverage_sweep

    # reuse the rollouts run_2d_cp already computed on the same slices
    _, out_norm = out["normalizers"]
    w_cal = _to_convops(out_norm.decode(out["pred_cal"]))[:, -1]   # vorticity
    w_prd = _to_convops(out_norm.decode(out["pred_pred"]))[:, -1]
    scores = jnp.abs(pre.periodic_bc_residual(w_cal))
    bc_pred = pre.periodic_bc_residual(w_prd)
    alphas, cov = marginal_coverage_sweep(scores, bc_pred, None)
    if verbose:
        for a, c in zip(alphas, cov):
            print(f"BC residual: alpha={a:.2f} cov={c:.3f}")
    return cov


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "joint",
        config={"plots_dir": "Plots"})
