"""Serving: a calibrated surrogate as a deployable artifact.

The reference's deployment story stops at experiment scripts — to answer
"can I trust THIS new prediction?" a user re-runs a `# %%` pipeline
(`Joint/Wave_Residuals_CP.py`) end to end. This module packages the
post-experiment state — trained FNO params, normalizer stats, the residual
operator, and the conformal calibration (qhat + modulation at a fixed
alpha) — into one object with a jitted serving path and a save/load
bundle, so calibrate-once / serve-many is a first-class flow:

    srv = CalibratedSurrogate(model, params, residual_fn,
                              step=1, T_out=20,
                              in_normalizer=in_n, out_normalizer=out_n)
    srv.calibrate(cal_a, cal_u, alpha=0.05)       # once
    out = srv.predict(new_a)                      # many
    out["prediction"], out["sets"], out["accept"]
    srv.save("deploy/wave_v1"); CalibratedSurrogate.load("deploy/wave_v1",
                                                         model, residual_fn)

Reference behaviours served: residual prediction sets
(`Joint/Wave_Residuals_CP.py:251-263`, `Marginal/Advection_Residuals_CP.py:
251-252`) and selection/rejection filtering
(`Joint/Advection_Residuals_CP.py:327-336`,
`Active_Learning/Advection_AL_Marginal.py:169-189`).

TPU notes: the serving path (encode -> scan AR rollout -> decode ->
residual -> set test) is one jitted program with the calibration state
passed as arguments, so recalibration never recompiles and repeated
`predict` calls at a fixed batch shape reuse the compiled executable.
Serving batches may differ in size from the calibration batch: with the
truncated-DFT spectral path the FNO forward is batch-shape-independent
(measured max|d| = 0.0 across precisions, BASELINE.md "Precision study"),
so the CP exchangeability contract survives the shape change.
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .cp.inductive import (
    calibrate as cp_calibrate,
    filter_sims_joint,
    filter_sims_within_bounds,
    modulation_func,
    ncf_metric_joint,
)
from .train.rollout import autoregressive_rollout

__all__ = ["CalibratedSurrogate"]


def _to_convops(field):
    """[BS, Nvar, Nx, Ny, Nt] -> [BS, Nvar, Nt, Nx, Ny] (the reference's
    permute(0,1,4,2,3), `Joint/Wave_Residuals_CP.py:216`)."""
    return jnp.transpose(field, (0, 1, 4, 2, 3))


class CalibratedSurrogate:
    """A trained surrogate + conformal calibration, ready to serve.

    Parameters
    ----------
    model : flax module with ``apply(params, x)`` mapping
        ``[B, Nvar, Nx, Ny, T_in] -> [B, Nvar, Nx, Ny, step]`` (``FNO2d``).
    params : trained flax params (or None until :meth:`load`).
    residual_fn : PRE operator over the ConvOps layout
        ``[B, Nvar, Nt, Nx, Ny]`` (a ``cppre.residuals`` class or closure).
    step, T_out : AR rollout contract (reference ``validation_AR``).
    in_normalizer / out_normalizer : encode/decode pair (default Identity).
    mode : 'joint' (per-sample sup-norm sets) or 'marginal' (per-cell).
    score : 'pre' (data-free, |residual(pred)|) or 'aer+pre'
        (|residual(truth) - residual(pred)|, needs truth at calibration).
    layout_fn : prediction -> residual-operator layout (default the 2-D
        permute; 1-D callers pass their own).
    fused : route serving rollouts through the fused Pallas FNO blocks
        where supported (`models.fused.make_fused_apply`).
    mesh : optional ``jax.sharding.Mesh`` with a 'dp' axis — serving
        batches are zero-sample padded to the dp extent, placed with a
        NamedSharding (jit partitions the whole program; with ``fused``
        the Pallas forward runs per-shard inside shard_map), and cropped.
    """

    def __init__(self, model, params, residual_fn: Callable, *, step: int,
                 T_out: int, in_normalizer=None, out_normalizer=None,
                 mode: str = "joint", score: str = "pre",
                 layout_fn: Callable = _to_convops, fused: bool = False,
                 mesh=None):
        if mode not in ("joint", "marginal"):
            raise ValueError(f"unknown mode {mode!r}")
        if score not in ("pre", "aer+pre"):
            raise ValueError(f"unknown score {score!r}")
        from .train.normalizers import Identity

        self.model = model
        self.params = params
        self.residual_fn = residual_fn
        self.step, self.T_out = step, T_out
        self.in_norm = in_normalizer if in_normalizer is not None else Identity()
        self.out_norm = out_normalizer if out_normalizer is not None else Identity()
        self.mode, self.score = mode, score
        self.layout_fn = layout_fn
        self.fused = fused
        self.mesh = mesh        # jax.sharding.Mesh: dp-shard serving batches
        # calibration state (set by calibrate()/load())
        self.alpha = None
        self.qhat = None        # scalar (joint) or field (marginal)
        self.modulation = None  # field (joint) or None (marginal)
        self.scores = None      # calibration scores (recalibrate() source)
        self.threshold = 0.5    # marginal accept: fraction of cells in-bounds
        self._rollout_res = None  # jitted (params, a_raw) -> (pred, residual)

    # -- the one compiled serving program ---------------------------------

    def _build(self):
        step, T_out = self.step, self.T_out
        in_norm, out_norm = self.in_norm, self.out_norm
        layout_fn, residual_fn = self.layout_fn, self.residual_fn
        if self.fused and self.mesh is not None:
            # pallas_call does not partition under pjit: run the fused
            # forward per-shard inside shard_map (parallel/sharding.py)
            from .parallel import make_sharded_fused_apply

            apply_fn = make_sharded_fused_apply(self.model, self.params,
                                                self.mesh)

            def fwd(params, x):  # params threaded for API symmetry
                del params
                return apply_fn(x)
        elif self.fused:
            from .models.fused import make_fused_apply

            apply_fn = make_fused_apply(self.model, self.params)

            def fwd(params, x):
                del params
                return apply_fn(x)
        else:
            model = self.model

            def fwd(params, x):
                return model.apply(params, x)

        @jax.jit
        def rollout_res(params, a_raw):
            a = in_norm.encode(jnp.asarray(a_raw, jnp.float32))
            pred_enc = autoregressive_rollout(
                lambda x: fwd(params, x), a, step, T_out)
            pred = out_norm.decode(pred_enc)
            return pred, residual_fn(layout_fn(pred))

        self._rollout_res = rollout_res

    def _rollout(self, a_raw):
        if self._rollout_res is None:
            self._build()
        if self.mesh is not None:
            # dp-shard the serving batch: pad to a multiple of the dp
            # extent (samples are independent, pad rows never touch real
            # ones), place with a NamedSharding so jit partitions the
            # whole program, crop after
            from .parallel import shard_batch

            a_raw = jnp.asarray(a_raw, jnp.float32)
            b = a_raw.shape[0]
            pad = (-b) % self.mesh.shape["dp"]
            if pad:
                widths = ((0, pad),) + ((0, 0),) * (a_raw.ndim - 1)
                a_raw = jnp.pad(a_raw, widths)
            a_raw = shard_batch(a_raw, self.mesh)
            pred, res = self._rollout_res(self.params, a_raw)
            return pred[:b], res[:b]
        return self._rollout_res(self.params, a_raw)

    # -- calibration -------------------------------------------------------

    def calibrate(self, cal_a, cal_u=None, alpha: float = 0.1,
                  eps: float = 0.0, holdout_modulation: bool = False,
                  threshold: float = 0.5):
        """Fit the conformal state on a calibration set.

        cal_a: [n_cal, Nvar, Nx, Ny, T_in] initial windows (raw units);
        cal_u: matching truth trajectories [n_cal, Nvar, Nx, Ny, T_out] —
        required for score='aer+pre', optional otherwise. Returns self.

        `holdout_modulation=True` (joint mode) estimates the modulation on
        the first half and scores on the second — the corrected estimator
        (see `experiments.pipeline.joint_cp`); default keeps reference
        semantics (`Joint/Wave_Residuals_CP.py:219-220`).
        """
        _, res_pred = self._rollout(cal_a)
        res_out = None
        if self.score == "aer+pre":
            if cal_u is None:
                raise ValueError("score='aer+pre' needs cal_u at calibration")
            res_out = self.residual_fn(
                self.layout_fn(jnp.asarray(cal_u, jnp.float32)))

        if self.mode == "joint":
            if holdout_modulation:
                n_half = res_pred.shape[0] // 2
                mod_pred, score_pred = res_pred[:n_half], res_pred[n_half:]
                mod_out = res_out[:n_half] if res_out is not None else None
                score_out = res_out[n_half:] if res_out is not None else None
            else:
                mod_pred = score_pred = res_pred
                mod_out = score_out = res_out
            if self.score == "aer+pre":
                mod = modulation_func(mod_out, mod_pred) + eps
                scores = ncf_metric_joint(score_out, score_pred, mod)
            else:
                mod = modulation_func(mod_pred, None) + eps
                scores = ncf_metric_joint(score_pred, None, mod)
            self.modulation = mod
        else:
            scores = (jnp.abs(res_out - res_pred) if self.score == "aer+pre"
                      else jnp.abs(res_pred))
            self.modulation = None
        self.scores = scores
        self.qhat = cp_calibrate(scores, scores.shape[0], alpha)
        self.alpha = float(alpha)
        self.threshold = float(threshold)
        self.n_cal = int(scores.shape[0])
        return self

    def recalibrate(self, alpha: float):
        """Move to a new alpha from the stored calibration scores — no
        rollout, no residuals, just a fresh split-CP quantile. Available
        on any calibrated (or loaded) bundle."""
        if self.scores is None:
            raise RuntimeError("no stored calibration scores; call "
                               "calibrate() first (or load a bundle saved "
                               "by this version)")
        self.qhat = cp_calibrate(self.scores, self.scores.shape[0], alpha)
        self.alpha = float(alpha)
        return self

    # -- serving -----------------------------------------------------------

    def _require_calibrated(self):
        if self.qhat is None:
            raise RuntimeError("call calibrate() (or load()) before serving")

    def sets(self, residual):
        """Residual-space prediction sets around `residual` (the serving
        center). PRE-only score: centered at 0 (the physics target);
        AER+PRE: centered at the predicted residual."""
        self._require_calibrated()
        width = (self.qhat * self.modulation if self.mode == "joint"
                 else self.qhat)
        center = (jnp.zeros_like(residual) if self.score == "pre"
                  else jnp.asarray(residual))
        return center - width, center + width

    def predict(self, a):
        """Serve: prediction + PRE + residual sets + accept decision.

        Returns a dict: 'prediction' [B, Nvar, Nx, Ny, T_out] (decoded),
        'residual' (PRE of the prediction), 'sets' (lo, hi) in residual
        space at the calibrated alpha, and 'accept' [B] bool — True where
        the prediction's own residual lies inside the ZERO-centered
        calibrated band (the reference's selection filter tests the
        residual against [-width, +width], never against a band centered
        on itself: `Marginal/Advection_Residuals_CP.py:346-348`,
        `Active_Learning/Advection_AL_Marginal.py:169-189`). This holds
        for both scores — with 'aer+pre' the width is calibrated on
        |res_out - res_pred| but the accept test remains |res_pred| vs
        the band (testing res_pred against sets() centered at res_pred
        would be vacuously true). joint = `filter_sims_joint`, marginal =
        fraction-in-bounds >= threshold. With the 1-alpha guarantee,
        exchangeable new samples are accepted at rate >= 1-alpha under
        the 'pre' score; physics-violating predictions fail the test.
        """
        self._require_calibrated()
        pred, res = self._rollout(a)
        lo, hi = self.sets(res)
        width = (self.qhat * self.modulation if self.mode == "joint"
                 else self.qhat)
        if self.mode == "joint":
            accept = filter_sims_joint((-width, width), res)
        else:
            accept = filter_sims_within_bounds(-width, width, res,
                                               self.threshold, within=True)
        return {"prediction": pred, "residual": res, "sets": (lo, hi),
                "accept": accept}

    # -- persistence -------------------------------------------------------

    def save(self, prefix: str) -> str:
        """Write the deployment bundle: `<prefix>.ckpt` (flax msgpack
        params), `<prefix>_norms.npz` (reference norms contract),
        `<prefix>_cp.npz` (qhat/modulation), `<prefix>_meta.json`."""
        from .utils.checkpoint import save_checkpoint, save_norms

        self._require_calibrated()
        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
        save_checkpoint(prefix, self.params)
        save_norms(prefix, self.in_norm, self.out_norm)
        cp_state = {"qhat": np.asarray(self.qhat)}
        if self.modulation is not None:
            cp_state["modulation"] = np.asarray(self.modulation)
        if self.scores is not None:  # lets a loaded bundle recalibrate()
            cp_state["scores"] = np.asarray(self.scores)
        np.savez(prefix + "_cp.npz", **cp_state)
        meta = {"alpha": self.alpha, "mode": self.mode, "score": self.score,
                "step": self.step, "T_out": self.T_out,
                "threshold": self.threshold,
                "n_cal": getattr(self, "n_cal", None)}
        with open(prefix + "_meta.json", "w") as f:
            json.dump(meta, f, indent=1)
        return prefix

    @classmethod
    def load(cls, prefix: str, model, residual_fn: Callable, *,
             params_template=None, layout_fn: Callable = _to_convops,
             fused: bool = False, mesh=None):
        """Rebuild a serving object from :meth:`save`'s bundle. The flax
        msgpack format needs a `params_template` with the right structure;
        by default one is initialised from the model + bundle shapes."""
        from .utils.checkpoint import load_checkpoint, load_norms

        with open(prefix + "_meta.json") as f:
            meta = json.load(f)
        in_norm, out_norm = load_norms(prefix)
        if params_template is None:
            # FNO params are grid-size-independent (1x1 convs + per-mode
            # spectral weights), so any dummy grid large enough to hold the
            # truncated modes initialises the right pytree structure
            nx = max(2 * getattr(model, "modes1", 4) + 2, 8)
            ny = max(2 * getattr(model, "modes2", 4) + 2, 8)
            dummy = jnp.zeros((1, model.num_vars, nx, ny, model.T_in),
                              jnp.float32)
            params_template = model.init(jax.random.PRNGKey(0), dummy)
        params = load_checkpoint(prefix, params_template)
        srv = cls(model, params, residual_fn, step=meta["step"],
                  T_out=meta["T_out"], in_normalizer=in_norm,
                  out_normalizer=out_norm, mode=meta["mode"],
                  score=meta["score"], layout_fn=layout_fn, fused=fused,
                  mesh=mesh)
        cp_z = np.load(prefix + "_cp.npz")
        srv.qhat = jnp.asarray(cp_z["qhat"])
        srv.modulation = (jnp.asarray(cp_z["modulation"])
                          if "modulation" in cp_z else None)
        srv.scores = (jnp.asarray(cp_z["scores"])
                      if "scores" in cp_z else None)
        srv.alpha = meta["alpha"]
        srv.threshold = meta.get("threshold", 0.5)
        srv.n_cal = meta.get("n_cal")
        return srv
