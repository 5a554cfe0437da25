"""JOREK reduced-MHD CP experiment (BASELINE config #5b).

Reproduces `Joint/JOREK_residuals_CP.py` / `Marginal/JOREK_residuals_CP.py`:
3 fields (rho, Phi, T) from JOREK multi-blob tokamak simulations,
cylindrical-geometry residuals with R-weighted Poisson brackets, field
normalisation by (1e20, 1e5, 1e6) (:J127-129), NaN scrub (:J131-142),
MinMax-normalised FNO, joint CP. The reference reads a 2000-simulation
offline dataset; `run` accepts such an array (np .npz with key 'fields'
[Nsim, 3, NR, NZ, Nt] + grids), and falls back to a synthetic multi-blob
family for data-free smoke runs.

Run: ``python -m cppre.experiments.jorek [joint|marginal] [data.npz]``.
"""

from __future__ import annotations

import numpy as np


from .base2d import run_2d_cp

CONFIG = {
    # reference `Joint/JOREK_residuals_CP.py:14-36`-style schema
    "Case": "JOREK", "Field": "rho, Phi, T", "Model": "FNO",
    "Epochs": 500, "Batch Size": 5, "Optimizer": "Adam",
    "Learning Rate": 0.005, "Scheduler Step": 100, "Scheduler Gamma": 0.5,
    "Normalisation Strategy": "Min-Max",
    "T_in": 10, "T_out": 40, "Step": 10, "Width_time": 16, "Modes": 8,
    "Variables": 3, "Loss Function": "LP",
    "n_train": 100, "n_cal": 100, "n_pred": 100,
    "equation": "continuity",
    # physical coefficients (:196-199)
    "D": 3.4, "mu": 2.25e-6, "K": 2.25e-7,
    # field normalisation divisors (:127-129)
    "field_norms": (1e20, 1e5, 1e6),
}


def scrub(fields, sim_names=None, bad_list=()):
    """NaN scrub + bad-run deletion (reference :131-142)."""
    from ..utils.validate import scrub_nan_sims

    return scrub_nan_sims(fields, sim_names, bad_list)


def synthetic_blobs(n: int, NR: int = 32, NZ: int = 32, Nt: int = 50,
                    seed: int = 0):
    """Data-free stand-in: advecting/diffusing Gaussian blobs in (R, Z)
    with a rotating potential — shaped like the JOREK multi-blob data."""
    rng = np.random.RandomState(seed)
    R = np.linspace(2.6, 3.4, NR).astype(np.float32)
    Z = np.linspace(-0.4, 0.4, NZ).astype(np.float32)
    t = np.linspace(0, 1, Nt).astype(np.float32)
    RR, ZZ = np.meshgrid(R, Z, indexing="ij")
    out = np.empty((n, 3, NR, NZ, Nt), np.float32)
    for i in range(n):
        r0 = rng.uniform(2.8, 3.2)
        z0 = rng.uniform(-0.2, 0.2)
        w = rng.uniform(0.05, 0.15)
        amp = rng.uniform(0.5, 1.5)
        for j, tt in enumerate(t):
            rc = r0 + 0.1 * np.sin(2 * np.pi * tt)
            zc = z0 + 0.1 * np.cos(2 * np.pi * tt)
            blob = amp * np.exp(-(((RR - rc) ** 2 + (ZZ - zc) ** 2)
                                  / (2 * (w + 0.05 * tt) ** 2)))
            out[i, 0, :, :, j] = 1.0 + blob                      # rho
            out[i, 1, :, :, j] = 0.1 * np.sin(2 * np.pi * tt) * blob  # Phi
            out[i, 2, :, :, j] = 1.0 + 0.5 * blob                # T
    return R, Z, t, out


def run(mode: str = "joint", data_path: str | None = None,
        config: dict | None = None, seed: int = 0, verbose: bool = True,
        **cp_kwargs):
    cfg = dict(CONFIG, **(config or {}))
    if data_path:
        z = np.load(data_path)
        fields, R, Z, t = z["fields"], z["R"], z["Z"], z["t"]
        norms = np.asarray(cfg["field_norms"], np.float32)
        fields = fields / norms[None, :, None, None, None]
        fields, _ = scrub(fields)
    else:
        n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
        R, Z, t, fields = synthetic_blobs(n_total, seed=seed)
    dt = float(t[1] - t[0])
    dR, dZ = float(R[1] - R[0]), float(Z[1] - Z[0])
    # fused Pallas path on TPU (affine R; XLA fallback otherwise/off-TPU),
    # parity vs PRE_JOREK asserted in tests/test_pallas_kernels.py
    from ..ops.pallas import jorek_residual_fused

    res = lambda f: jorek_residual_fused(f, R, Dc=cfg["D"], K=cfg["K"],
                                         equation=cfg["equation"])
    cp_kwargs.setdefault("eps", 1e-6)  # reference's modulation guard
    return run_2d_cp(data=fields, residual_fn=res, cfg=cfg, mode=mode,
                     seed=seed, verbose=verbose, **cp_kwargs)


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "joint",
        sys.argv[2] if len(sys.argv) > 2 else None,
        config={"plots_dir": "Plots"})
