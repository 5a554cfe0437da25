"""Grad-Shafranov CP experiments (EFIT + FreeGSNKE pipelines).

* `run_freegsnke` reproduces `/root/reference/FreeGSNKE/GS_CP.py`: train a
  conditional auto-encoder psi = CAE(coords, params) on a Sobol/LHS family
  of equilibria (here the analytic Solov'ev family instead of the
  unreleased PF-coil JSON), then marginal CP (:308-317) and joint CP with
  modulation (:438-450) over the GS-operator residual.
* `run_efit` reproduces `/root/reference/EFIT/EFIT_cp.py`: marginal CP over
  precomputed (psi_true, psi_pred) pairs — accepts arrays directly (the
  reference reads a 10k-equilibria CSV), with a synthetic default.

Run: ``python -m cppre.experiments.gs [freegsnke|efit]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.cae import ConvAutoencoder
from ..models.inr import INR
from ..residuals.gs import PRE_GradShafranov
from ..solvers.solovev import solovev_batch
from ..train.normalizers import MinMaxNormalizer
from .pipeline import joint_cp, marginal_cp

CONFIG = {
    # reference `FreeGSNKE/GS_CP.py:33-52`-style schema
    "Case": "Grad-Shafranov", "Model": "CAE",
    "Epochs": 200, "Batch Size": 32, "Learning Rate": 1e-3,
    "Normalisation Strategy": "Min-Max",
    "NR": 64, "NZ": 64, "n_total": 512, "n_train": 300,
}


def _train_surrogate(model, coords, params_in, psi, cfg, seed=0, verbose=False):
    p0 = model.init(jax.random.PRNGKey(seed), coords[:1], params_in[:1])
    tx = optax.adam(cfg["Learning Rate"])
    opt_state = tx.init(p0)

    @jax.jit
    def step(p, s, c, pf, target):
        def loss_of(p):
            return jnp.mean((model.apply(p, c, pf) - target) ** 2)

        loss, grads = jax.value_and_grad(loss_of)(p)
        updates, s = tx.update(grads, s)
        return optax.apply_updates(p, updates), s, loss

    n, bs = params_in.shape[0], min(cfg["Batch Size"], params_in.shape[0])
    key = jax.random.PRNGKey(seed)
    p = p0
    for ep in range(cfg["Epochs"]):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n)
        for i in range(0, n - bs + 1, bs):
            idx = perm[i : i + bs]
            p, opt_state, loss = step(p, opt_state, coords[idx], params_in[idx], psi[idx])
        if verbose and ep % 50 == 0:
            print(f"CAE epoch {ep}: loss {float(loss):.3e}")
    return p


def run_freegsnke(config: dict | None = None, seed: int = 0, verbose: bool = True):
    cfg = dict(CONFIG, **(config or {}))
    R, Z, pf, psi = solovev_batch(cfg["n_total"], cfg["NR"], cfg["NZ"], seed=seed)
    dr, dz = float(R[1] - R[0]), float(Z[1] - Z[0])

    RR, ZZ = np.meshgrid(R, Z, indexing="ij")
    coords = jnp.asarray(np.stack([RR, ZZ])[None].repeat(len(pf), 0), jnp.float32)
    psi_t = jnp.asarray(psi[:, None], jnp.float32)  # [n, 1, NR, NZ]
    norm_rz = MinMaxNormalizer(coords)
    norm_psi = MinMaxNormalizer(psi_t)
    coords_e, psi_e = norm_rz.encode(coords), norm_psi.encode(psi_t)
    pf = jnp.asarray(pf)

    n_train = cfg["n_train"]
    # the reference names two interchangeable surrogates: the inline CAE
    # (`GS_CP.py:139-194`) and `Neural_PDE.Models.INR` (:48)
    if cfg.get("Model", "CAE").upper() == "INR":
        model = INR(n_params=pf.shape[1])
    else:
        model = ConvAutoencoder(n_params=pf.shape[1])
    params = _train_surrogate(model, coords_e[:n_train], pf[:n_train],
                              psi_e[:n_train], cfg, seed, verbose)

    pred_e = model.apply(params, coords_e, pf)
    mse = float(jnp.mean((pred_e - psi_e) ** 2))
    psi_pred = norm_psi.decode(pred_e)[:, 0]  # [n, NR, NZ]
    psi_true = jnp.asarray(psi)

    pre = PRE_GradShafranov(R, dr, dz)
    res_pred = pre(psi_pred)
    res_true = pre(psi_true)

    rest = psi.shape[0] - n_train
    ncal = n_train + int(0.5 * rest)
    cal, prd = slice(n_train, ncal), slice(ncal, None)

    marg = marginal_cp(res_true[cal], res_pred[cal], res_pred[prd], res_true[prd])
    joint = joint_cp(res_true[cal], res_pred[cal], res_pred[prd], res_true[prd],
                     eps=1e-6)
    results = {"mse": mse, "alphas": marg["alphas"],
               "coverage_marginal": marg["coverage"],
               "coverage_joint": joint["coverage"]}
    if verbose:
        print(f"{type(model).__name__} MSE {mse:.3e}")
        for a, c1, c2 in zip(results["alphas"], marg["coverage"], joint["coverage"]):
            print(f"alpha={a:.2f}  marginal={c1:.3f}  joint={c2:.3f}")
    return results


def load_efit_csv(path: str, n_grid: int = 33, nrows: int | None = 10000):
    """Reference EFIT dataset ingestion (`EFIT/EFIT_cp.py:36-53`): headerless
    CSV, column 0 an index, then 6 flattened n_grid^2 blocks per row
    (psi_true, psi_pred, pff_true, pff_pred, gs_true, gs_pred). Returns
    (psi_true, psi_pred) as [N, n_grid, n_grid] float32."""
    raw = np.loadtxt(path, delimiter=",", max_rows=nrows, dtype=np.float32)
    raw = np.atleast_2d(raw)[:, 1:]  # drop the index column
    ncell = n_grid * n_grid
    if raw.shape[1] < 2 * ncell:
        raise ValueError(
            f"EFIT CSV rows have {raw.shape[1]} values; expected >= "
            f"{2 * ncell} (psi_true + psi_pred blocks of {ncell})")
    psi_true = raw[:, :ncell].reshape(-1, n_grid, n_grid)
    psi_pred = raw[:, ncell : 2 * ncell].reshape(-1, n_grid, n_grid)
    return psi_true, psi_pred


def run_efit(psi_true=None, psi_pred=None, R=None, dr=None, dz=None,
             alphas=None, seed: int = 0, verbose: bool = True,
             plots_dir: str | None = None, wall=None):
    """Marginal CP over (psi_true, psi_pred) pairs (`EFIT/EFIT_cp.py:36-110`).

    Without arguments, builds a synthetic Solov'ev ensemble with
    surrogate-like perturbed predictions. With `plots_dir`, saves the
    reference's tokamak-wall contour overlay of a prediction residual and
    the per-cell CP bound (`EFIT/EFIT_cp.py:111-160`); `wall` optionally
    supplies the machine polyline [N, 2] (the reference's JET-wall CSV)."""
    if psi_true is not None and (R is None or dr is None or dz is None):
        raise ValueError("run_efit with explicit psi arrays requires R, dr, dz")
    Z = None
    if psi_true is None:
        R, Z, _, psi = solovev_batch(400, 64, 64, seed=seed)
        dr, dz = float(R[1] - R[0]), float(Z[1] - Z[0])
        rng = np.random.RandomState(seed)
        psi_true = psi
        psi_pred = psi + 0.003 * rng.standard_normal(psi.shape).astype(np.float32)
    pre = PRE_GradShafranov(R, dr, dz)
    res_true = pre(jnp.asarray(psi_true))
    res_pred = pre(jnp.asarray(psi_pred))
    n = res_true.shape[0]
    ncal = int(0.6 * n)
    cal, prd = slice(0, ncal), slice(ncal, None)
    out = marginal_cp(res_true[cal], res_pred[cal], res_pred[prd], res_true[prd])
    if verbose:
        for a, c in zip(out["alphas"], out["coverage"]):
            print(f"alpha={a:.2f}  coverage={c:.3f}")
    if plots_dir is not None:
        import os

        from ..cp.inductive import calibrate
        from ..utils.plot_tools import wall_contour_figure

        os.makedirs(plots_dir, exist_ok=True)
        if Z is None:
            nz = np.asarray(psi_true).shape[-1]
            Z = (np.arange(nz) - (nz - 1) / 2.0) * dz
        # the reference's "Residual and Error Bar" overlay: one prediction
        # residual against the per-cell qhat at alpha=0.5
        scores = jnp.abs(res_true[cal] - res_pred[cal])
        q_plot = calibrate(scores, ncal, 0.5)
        fig = wall_contour_figure(
            np.asarray(R).reshape(-1)[1:-1], np.asarray(Z).reshape(-1)[1:-1],
            np.asarray(res_pred[prd][0]), np.asarray(q_plot), wall=wall,
            save_path=os.path.join(plots_dir, "efit_wall_contour.pdf"))
        try:
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception:
            pass
    return out


if __name__ == "__main__":
    import sys

    mode = sys.argv[1] if len(sys.argv) > 1 else "freegsnke"
    run_freegsnke() if mode == "freegsnke" else run_efit()
