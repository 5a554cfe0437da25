"""Shared 2-D experiment engine: normalize -> train FNO -> rollout -> PRE -> CP.

Factors the common skeleton of `Joint/{Wave,NS,MHD}_Residuals_CP.py` (and
their Marginal twins): MinMax normalisation round-trip (Wave :120-139,
211-214), AR rollout on the calibration/prediction sets, decode, permute to
ConvOps layout, residual, marginal or joint conformal calibration with the
alpha sweep. The reference loads pretrained `.pth` weights; here the driver
trains in-script (or accepts `params` to skip training) since checkpoints
are not portable from torch.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import FNO2d
from ..train.loops import fit
from ..train.losses import lp_loss
from ..train.normalizers import Identity, MinMaxNormalizer
from ..train.rollout import validation_AR
from .pipeline import joint_cp, marginal_cp

__all__ = ["run_2d_cp"]


def _to_convops(field):
    """[BS, Nvar, Nx, Ny, Nt] -> [BS, Nvar, Nt, Nx, Ny] (reference
    permute(0,1,4,2,3); single-var callers then take [:, 0])."""
    return jnp.transpose(field, (0, 1, 4, 2, 3))


def run_2d_cp(
    *,
    data: jnp.ndarray,           # [Nsim, Nvar, Nx, Ny, Nt] full trajectories
    residual_fn: Callable,        # ([BS, Nvar, Nt, Nx, Ny]) -> residual
    cfg: dict,
    mode: str = "joint",
    params=None,                  # pretrained flax params (skips training)
    seed: int = 0,
    eps: float = 0.0,
    verbose: bool = True,
    return_residuals: bool = False,
    mesh=None,                    # jax.sharding.Mesh: dp-shard the CP phase
    fused_forward: bool = False,  # fused Pallas FNO blocks for the rollouts
    fused_train: bool = False,    # fused-forward custom_vjp training path
    train_precision: str = "highest",  # matmul precision for TRAINING only
):
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    n_train, n_cal = cfg.get("n_train", 0), cfg["n_cal"]
    n_pred = cfg["n_pred"]
    data = jnp.asarray(data, jnp.float32)

    a_all = data[..., :T_in]
    u_all = data[..., T_in : T_in + T_out]

    if cfg.get("Normalisation Strategy", "Min-Max") == "Min-Max":
        in_norm = MinMaxNormalizer(a_all)
        out_norm = MinMaxNormalizer(u_all)
    else:
        in_norm, out_norm = Identity(), Identity()

    a_enc, u_enc = in_norm.encode(a_all), out_norm.encode(u_all)

    model = FNO2d(T_in=T_in, step=step, modes1=cfg["Modes"], modes2=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width_time"])
    t0 = time.perf_counter()
    if params is None:
        if n_train <= 0:
            raise ValueError("params not given and n_train == 0")
        tr_a, tr_u = a_enc[:n_train], u_enc[:n_train]
        params = model.init(jax.random.PRNGKey(seed), tr_a[:1])
        if fused_train:
            # every forward leg of the train step (incl. remat recompute)
            # rides the fused Pallas block; backward is exact flax math
            # (models/fused.py::make_fused_train_apply, custom_vjp)
            from ..models.fused import make_fused_train_apply

            train_apply = make_fused_train_apply(model)
        else:
            train_apply = model.apply
        if train_precision == "bf16":
            # bf16 activations + params for SGD only (f32 masters; the
            # training forward is activation-HBM-bound, see BASELINE.md);
            # the CP rollouts below keep the unwrapped f32 apply
            if fused_train:
                raise ValueError(
                    "train_precision='bf16' needs the XLA training path "
                    "(the fused Pallas kernels are f32); drop fused_train")
            from ..models import with_activation_dtype

            train_apply = with_activation_dtype(train_apply)
        elif train_precision != "highest":
            # 1-pass bf16 MXU contractions for SGD only; the CP rollouts
            # below keep the package HIGHEST precision — exchangeability
            # constrains calibration/prediction, not training
            # (models/fno.py::precision_scope)
            from ..models import with_matmul_precision

            train_apply = with_matmul_precision(train_apply, train_precision)
        params = fit(train_apply, params, tr_a, tr_u, tr_a[-5:], tr_u[-5:],
                     epochs=cfg["Epochs"], batch_size=cfg["Batch Size"],
                     step=step, T_out=T_out, loss_func=lp_loss,
                     lr=cfg["Learning Rate"],
                     scheduler_step=cfg["Scheduler Step"],
                     scheduler_gamma=cfg["Scheduler Gamma"],
                     seed=seed, verbose=verbose)
    train_time = time.perf_counter() - t0
    if fused_forward and mesh is not None:
        # fused Pallas rollouts on a dp mesh: pallas_call does not
        # partition under pjit, so the fused apply runs per-shard inside
        # shard_map (parallel/sharding.py::make_sharded_fused_apply;
        # parity vs the unsharded run asserted in tests/test_parallel.py)
        from ..parallel import make_sharded_fused_apply

        apply_fn = make_sharded_fused_apply(model, params, mesh)
    elif fused_forward:
        # inference rollouts through the fused Pallas Fourier blocks
        # (models/fused.py; parity vs model.apply asserted at 7e-7)
        from ..models.fused import make_fused_apply

        apply_fn = make_fused_apply(model, params)
    else:
        apply_fn = lambda x: model.apply(params, x)

    # calibration and prediction splits come from the tail of the data.
    # CRITICAL: both rollouts run in ONE batched call and are split after.
    # TPU kernels tile by batch shape, and different shapes round
    # differently (bf16 matmul noise, amplified by the AR rollout); rolling
    # the two sets out at different batch sizes makes their residual
    # statistics non-exchangeable, which breaks the CP guarantee (observed
    # as total coverage collapse at n_cal=400 vs n_pred=100). One call =
    # identical numerics for every scored sample, by construction.
    cal_sl = slice(n_train, n_train + n_cal)
    pred_sl = slice(n_train + n_cal, n_train + n_cal + n_pred)
    a_cp = jnp.concatenate((a_enc[cal_sl], a_enc[pred_sl]))
    u_cp = jnp.concatenate((u_enc[cal_sl], u_enc[pred_sl]))

    if mesh is not None:
        # dp-shard the whole CP phase declaratively: samples are
        # embarrassingly parallel and every downstream step (AR rollout,
        # PRE, modulation, quantile sweep) is pure jnp, so placing the
        # batch with a 'dp' NamedSharding is sufficient — jit partitions
        # the graph and inserts the (tiny) cross-shard reductions on ICI.
        # Per-sample numerics are shard-size-, not split-, dependent and
        # identical for calibration and prediction samples, so the
        # exchangeability contract above is preserved (parity asserted in
        # tests/test_parallel.py).
        from ..parallel import shard_batch

        # device_put with an even NamedSharding needs dp | batch; the
        # flagship n_cal + n_pred are not multiples of 8, so zero-sample
        # pad before placement and crop after the rollout. Samples are
        # independent along the batch axis, so pad rows never touch real
        # ones, and cal/pred still share the single batched call above.
        dp = mesh.shape["dp"]
        pad = (-a_cp.shape[0]) % dp
        if pad:
            widths = ((0, pad),) + ((0, 0),) * (a_cp.ndim - 1)
            a_cp, u_cp = jnp.pad(a_cp, widths), jnp.pad(u_cp, widths)
        a_cp, u_cp = shard_batch(a_cp, mesh), shard_batch(u_cp, mesh)

    pred_all, _, _ = validation_AR(apply_fn, a_cp, u_cp, step, T_out)
    pred_cal, pred_pred = pred_all[:n_cal], pred_all[n_cal:n_cal + n_pred]
    # metrics on the calibration slice only (the pre-existing contract:
    # results['mse'] is the calibration-rollout MSE, not cal+pred mixed)
    mse = jnp.mean((pred_cal - u_enc[cal_sl]) ** 2)
    mae = jnp.mean(jnp.abs(pred_cal - u_enc[cal_sl]))
    if verbose:
        print(f"Calibration rollout MSE {float(mse):.3e} MAE {float(mae):.3e}")
    res_out_cal = residual_fn(_to_convops(out_norm.decode(u_enc[cal_sl])))
    res_pred_cal = residual_fn(_to_convops(out_norm.decode(pred_cal)))

    res_pred = residual_fn(_to_convops(out_norm.decode(pred_pred)))
    res_out_pred = residual_fn(_to_convops(out_norm.decode(u_enc[pred_sl])))

    if mode == "joint":
        aer = joint_cp(res_out_cal, res_pred_cal, res_pred, res_out_pred, eps=eps)
        pre_only = joint_cp(res_out_cal, res_pred_cal, res_pred, mode="pre", eps=eps)
        # corrected estimator alongside the reference-semantics one: the
        # reference's in-sample modulation breaks exchangeability
        # (`Joint/Wave_Residuals_CP.py:219-220`); the holdout split restores
        # the finite-sample guarantee (see pipeline.joint_cp docstring).
        aer_h = joint_cp(res_out_cal, res_pred_cal, res_pred, res_out_pred,
                         eps=eps, holdout_modulation=True)
        pre_h = joint_cp(res_out_cal, res_pred_cal, res_pred, mode="pre",
                         eps=eps, holdout_modulation=True)
    else:
        aer = marginal_cp(res_out_cal, res_pred_cal, res_pred, res_out_pred)
        pre_only = marginal_cp(res_out_cal, res_pred_cal, res_pred, mode="pre")
        aer_h = pre_h = None

    results = {
        "config": cfg, "mode": mode, "params": params, "apply_fn": apply_fn,
        "pred_cal": pred_cal, "pred_pred": pred_pred,
        "train_time": train_time, "mse": float(mse), "mae": float(mae),
        "alphas": aer["alphas"],
        "coverage_aer_pre": aer["coverage"],
        "coverage_pre": pre_only["coverage"],
        "coverage_aer_pre_holdout": aer_h["coverage"] if aer_h else None,
        "coverage_pre_holdout": pre_h["coverage"] if pre_h else None,
        "qhat": np.asarray(aer["qhat"]),
        "filter_mask": np.asarray(pre_only["filter_mask"])
        if pre_only.get("filter_mask") is not None else None,
        "normalizers": (in_norm, out_norm),
    }
    if return_residuals:  # device arrays, for caller-side diagnostics
        results.update(res_out_cal=res_out_cal, res_pred_cal=res_pred_cal,
                       res_pred=res_pred, res_out_pred=res_out_pred)
    if cfg.get("plots_dir"):  # reference experiments save figures to Plots/
        from ..utils.plot_tools import save_experiment_artifacts

        save_experiment_artifacts(results, cfg["plots_dir"],
                                  cfg.get("Case", "experiment"))
    if verbose:
        for a, c1, c2 in zip(results["alphas"], results["coverage_aer_pre"],
                             results["coverage_pre"]):
            print(f"alpha={a:.2f}  cov(AER+PRE)={c1:.3f}  cov(PRE)={c2:.3f}")
    return results
