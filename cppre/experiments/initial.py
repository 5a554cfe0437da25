"""Offline single-shot CP pipeline (the `Expts_initial` workflow).

Rebuild of the reference's historical pipeline shape
(`/root/reference/Expts_initial/*.py`, readme :1-4): calibration and
prediction data come from a PREVIOUSLY SAVED dataset and a PRETRAINED
surrogate checkpoint (no in-script data generation or training), the
residual is CP-calibrated marginally, and the residual bounds are inverted
back to solution space via deconvolution
(`Expts_initial/Advection_Residuals_CP.py:340-352`).

The per-family Marginal/Joint drivers supersede this flow for data-free
runs; this module is the "bring your own dataset + weights" entry point:

    run_offline(data="wave.npz", ckpt="FNO_Wave_run1",
                residual_fn=PRE_Wave(dt, dx).__call__, cfg={...})

Dataset schema: npz with `fields` [Nsim, Nvar, Nx, Ny, Nt] (the JOREK/EFIT
ingestion convention) — or pass an array directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cp import calibrate, emp_cov
from ..models import FNO2d
from ..train.normalizers import Identity
from ..train.rollout import validation_AR
from ..utils.checkpoint import load_checkpoint, load_norms

__all__ = ["run_offline", "run_initial", "INITIAL_CONFIGS"]


def run_offline(*, data, residual_fn, cfg: dict, ckpt: str | None = None,
                params=None, norms: str | None = None, invert_with=None,
                alphas=None, verbose: bool = True):
    """Offline marginal CP + residual-bound inversion.

    data: array [Nsim, Nvar, Nx, Ny, Nt] or a path to an npz with `fields`.
    ckpt/params: pretrained surrogate (checkpoint path or a params pytree);
    norms: optional `<...>_norms.npz` path (reference normalizer contract).
    invert_with: a ConvOperator whose `.integrate` inverts the residual
    (e.g. `PRE_Wave(...).D`); None skips the inversion stage.
    """
    if isinstance(data, str):
        data = np.load(data)["fields"]
    data = jnp.asarray(data, jnp.float32)
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    n_cal = cfg["n_cal"]

    a_all = data[..., :T_in]
    u_all = data[..., T_in : T_in + T_out]
    if norms is not None:
        in_norm, out_norm = load_norms(norms)
    else:
        in_norm, out_norm = Identity(), Identity()

    model = FNO2d(T_in=T_in, step=step, modes1=cfg["Modes"],
                  modes2=cfg["Modes"], num_vars=cfg["Variables"],
                  width_time=cfg["Width_time"])
    if params is None:
        if ckpt is None:
            raise ValueError("run_offline needs a pretrained surrogate: "
                             "pass `ckpt` (checkpoint path) or `params`")
        template = model.init(jax.random.PRNGKey(0), in_norm.encode(a_all[:1]))
        params = load_checkpoint(ckpt, template)
    apply_fn = lambda x: model.apply(params, x)

    pred_enc, _, _ = validation_AR(
        apply_fn, in_norm.encode(a_all), out_norm.encode(u_all), step, T_out)
    pred = out_norm.decode(pred_enc)

    to_ops = lambda f: jnp.moveaxis(f, -1, 1)[:, :, 0] if f.shape[1] == 1 \
        else jnp.moveaxis(f, -1, 2)
    res_out = residual_fn(to_ops(u_all))
    res_pred = residual_fn(to_ops(pred))

    cal, prd = slice(0, n_cal), slice(n_cal, None)
    # metrics convention (matches base2d.run_2d_cp / burgers.py): decoded
    # space, calibration slice only — never the cal+pred mixture
    mse = jnp.mean((pred[cal] - u_all[cal]) ** 2)
    mae = jnp.mean(jnp.abs(pred[cal] - u_all[cal]))
    scores = jnp.abs(res_out[cal] - res_pred[cal])
    if alphas is None:
        alphas = np.arange(0.05, 0.95 + 1e-9, 0.1)
    coverage = []
    for a in alphas:
        q = calibrate(scores, n_cal, float(a))
        sets = [res_pred[prd] - q, res_pred[prd] + q]
        coverage.append(float(emp_cov(sets, res_out[prd])))

    out = {"mse": float(mse), "mae": float(mae),
           "alphas": np.asarray(alphas), "coverage": np.asarray(coverage)}

    if invert_with is not None:
        # invert the alpha=0.1 residual bounds to solution space
        # (`Expts_initial/Advection_Residuals_CP.py:340-352`): deconvolution
        # is a global FFT, so bounds are built on the UNCROPPED residual
        import inspect

        try:
            has_boundary = "boundary" in inspect.signature(residual_fn).parameters
        except (TypeError, ValueError):
            has_boundary = False
        if not has_boundary:
            import warnings

            warnings.warn(
                "residual_fn has no `boundary` parameter: the inversion "
                "stage will deconvolve the residual on its own (possibly "
                "interior-cropped) grid, not the operator's uncropped "
                "grid — inverted bounds may differ from the "
                "Expts_initial contract near the boundary", stacklevel=2)
        res_pred_full = residual_fn(to_ops(pred), boundary=True) \
            if has_boundary else residual_fn(to_ops(pred))
        q10 = calibrate(scores, n_cal, 0.1)
        qf = q10
        if q10.shape != res_pred_full.shape[1:]:
            # embed the cropped qhat into the full grid (zero halo); the
            # per-axis halo is derived from the crop width, not assumed 1
            full = res_pred_full.shape[1:]
            halos = [(f - c) // 2 for f, c in zip(full, q10.shape)]
            qf = jnp.zeros(full, q10.dtype)
            sl = tuple(slice(h, h + c) for h, c in zip(halos, q10.shape))
            qf = qf.at[sl].set(q10)
        out["inverted_bounds"] = (
            np.asarray(invert_with.integrate(res_pred_full[prd] - qf)),
            np.asarray(invert_with.integrate(res_pred_full[prd] + qf)))

    if verbose:
        for a, c in zip(out["alphas"], out["coverage"]):
            print(f"alpha={a:.2f}  coverage={c:.3f}")
    return out


# ---------------------------------------------------------------------------
# Historical per-family pipelines (`/root/reference/Expts_initial/*.py`).
#
# Each script is the same single-shot skeleton the library factors into the
# family drivers — config dict, data, AR (or single-shot step==T_out)
# rollout, additive-kernel residual, PRE-only marginal CP, coverage sweep —
# at an EARLIER configuration (longer T_in windows, chunked steps, per-file
# cites below). `run_initial` reproduces each at its historical
# configuration; the Advection variant keeps the residual-bound inversion
# (`Expts_initial/Advection_Residuals_CP.py:340-352`) via `invert_residual`.
# ---------------------------------------------------------------------------

INITIAL_CONFIGS = {
    # Expts_initial/Advection_Residuals_CP.py:13-37 (1-D, single-shot 30)
    "Advection": {"T_in": 20, "T_out": 30, "Step": 30, "Width": 32,
                  "Modes": 8, "Variables": 1, "Batch Size": 50,
                  "n_cal": 100, "n_pred": 100},
    # Expts_initial/Burgers_Residuals_CP.py:13-37 (1-D, single-shot 30)
    "Burgers": {"T_in": 20, "T_out": 30, "Step": 30, "Width": 32,
                "Modes": 8, "Variables": 1, "Batch Size": 50,
                "n_cal": 100, "n_pred": 100},
    # Expts_initial/Wave_Residuals_CP.py:13-37 (2-D, chunked step 10)
    "Wave": {"T_in": 20, "T_out": 60, "Step": 10, "Width_time": 32,
             "Modes": 8, "Variables": 1, "Batch Size": 50,
             "n_cal": 100, "n_pred": 100},
    # Expts_initial/NS_Residuals_CP.py:12-36 (4 fields, chunked step 10)
    "Navier-Stokes": {"T_in": 10, "T_out": 40, "Step": 10, "Width_time": 16,
                      "Modes": 8, "Variables": 4, "Batch Size": 50,
                      "n_cal": 100, "n_pred": 100},
    # Expts_initial/MHD_Residuals_CP.py:12-36 (6 fields, chunked step 5)
    "MHD": {"T_in": 10, "T_out": 20, "Step": 5, "Width_time": 16,
            "Modes": 8, "Variables": 6, "Batch Size": 20,
            "n_cal": 100, "n_pred": 100},
    # Expts_initial/JOREK_residuals_CP.py:12-36 (3 fields, chunked step 5)
    "JOREK": {"T_in": 10, "T_out": 40, "Step": 5, "Width_time": 32,
              "Modes": 16, "Variables": 3, "Batch Size": 10,
              "n_cal": 100, "n_pred": 100},
}


def run_initial(case: str, config: dict | None = None, **kw):
    """One historical `Expts_initial` pipeline, by family.

    Delegates to the family driver in marginal mode (the initial scripts'
    CP is marginal PRE-only over `|cal_residual|`,
    `Expts_initial/Wave_Residuals_CP.py:268-300`) at the script's
    configuration, overridable via `config`. Extra kwargs pass through to
    the driver (params=, verbose=, data_path= for JOREK, ...)."""
    from . import advection, burgers, jorek, mhd, ns, wave

    drivers = {"Advection": advection.run, "Burgers": burgers.run,
               "Wave": wave.run, "Navier-Stokes": ns.run, "MHD": mhd.run,
               "JOREK": jorek.run}
    if case not in drivers:
        raise ValueError(f"unknown Expts_initial case {case!r}; "
                         f"one of {sorted(drivers)}")
    cfg = dict(INITIAL_CONFIGS[case], **(config or {}))
    return drivers[case]("marginal", config=cfg, **kw)
