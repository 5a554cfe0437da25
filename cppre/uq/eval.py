"""UQ-method comparison harness: bootstrap resamples, coverage, timing.

Behavioral spec: `/root/reference/Other_UQ/Evaluation/Eval.py:105-424` —
for each UQ method, over `runs` bootstrap resamples of `n_eval` test sims:
run the method's validation rollout, build mean +- 2*std sets (or -/+ qhat
for AER/PRE), record marginal/joint empirical coverage, L2 and wall-clock,
and report mean +- std per method (:411-424).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cp.inductive import emp_cov, emp_cov_joint
from . import validation as V

__all__ = ["evaluate_uq_methods"]


def _bootstrap_idx(rng, n_total, n_eval):
    return rng.choice(n_total, size=min(n_eval, n_total), replace=False)


def evaluate_uq_methods(
    *,
    methods: Sequence[str],
    model_factory: Callable[[str], tuple],  # uq_name -> (model, params-or-aux)
    test_a,
    test_u,
    step: int,
    T_out: int,
    alpha: float = 0.1,
    samples: int = 10,
    runs: int = 10,
    n_eval: int = 300,
    pre=None,
    seed: int = 0,
    verbose: bool = True,
    on_method_done: Callable[[str, dict], None] | None = None,
    batch_chunk: int | None = None,
    mesh=None,
) -> Dict[str, dict]:
    """Returns {method: {l2, coverage, joint_coverage, eval_time: (mean, std)}}.

    `model_factory(uq)` returns (model, aux) where aux is params
    (Deterministic/Dropout/Bayesian/MLE/AER/PRE), a list of params
    (Ensemble), or a SWAG instance (SWAG).

    `batch_chunk` (optional) evaluates methods in batch pieces of that
    size, concatenating on host — identical statistics, bounded device
    memory. For AER/PRE the pieces carry per-sim scores and the conformal
    quantile is taken once over the concatenated scores (the batch couples
    only at that final quantile, so chunking is exact there too).

    `on_method_done(uq, result)` fires after each method's resample loop
    completes, so long protocols (hours of per-method training on the
    remote chip) can bank partial results: a killed run keeps every
    finished method (reference protocol trains per-method sequentially
    too, `Other_UQ/Evaluation/Eval.py:107-259`).

    `mesh` (optional `jax.sharding.Mesh` with a 'dp' axis) dp-shards every
    validation rollout over the eval batch — samples are embarrassingly
    parallel, so the jitted validator partitions declaratively. Bootstrap
    batches are zero-padded to the dp extent and cropped after (pad rows
    never mix with real ones along the batch axis); L2/MAE are recomputed
    on the cropped mean so padding cannot dilute them. For AER/PRE the
    conformal quantile is computed from the CROPPED rollout inside the
    same jitted call, so pad rows never enter calibration and every real
    sample rides one batched rollout (the exchangeability contract,
    RESULTS.md).
    """
    rng = np.random.default_rng(seed)
    results = {}
    test_a = jnp.asarray(test_a)
    test_u = jnp.asarray(test_u)
    if mesh is not None and batch_chunk:
        raise ValueError("mesh= and batch_chunk= are exclusive: chunking is "
                         "a single-chip memory knob; on a mesh the batch is "
                         "already divided across devices")

    def _pad_shard(x, dp):
        pad_n = (-x.shape[0]) % dp
        if pad_n:
            x = jnp.pad(x, ((0, pad_n),) + ((0, 0),) * (x.ndim - 1))
        from ..parallel import shard_batch

        return shard_batch(x, mesh)

    for uq in methods:
        model, aux = model_factory(uq)

        # ONE jitted validator per method, with the bootstrap arrays and the
        # rng key as ARGUMENTS. The previous per-resample closures baked
        # each resample's (a, u) into the jaxpr as constants, so every
        # resample re-traced and re-compiled the full AR-rollout graph —
        # compile, not rollout math, dominated the reported eval times
        # (the reference's protocol reports eval wall-clock per method,
        # `Other_UQ/Evaluation/Eval.py:411-424`). Statistics are unchanged:
        # same keys, same math, same shapes.
        def _validate_impl(a_p, u_p, key):
            """Per-element validators: (mean, std, mse, mae) for one
            batch piece. Weight-space draws (Bayesian/SWAG) reuse the
            same `key` per piece, so every piece sees the SAME posterior
            samples and chunking is exact; dropout masks are
            activation-shaped, so pieces draw different (equally iid)
            masks — statistically equivalent, not bit-equal."""
            if uq == "Deterministic":
                from ..train.rollout import validation_AR

                mean, mse, mae = validation_AR(
                    lambda x: model.apply(aux, x), a_p, u_p, step, T_out)
                return mean, jnp.zeros_like(mean), mse, mae
            if uq == "Dropout":
                return V.validation_dropout(
                    model, aux, a_p, u_p, step, T_out, samples, key)
            if uq == "Bayesian":
                return V.validation_bayesian(
                    model, aux, a_p, u_p, step, T_out, samples, key)
            if uq == "Ensemble":
                return V.validation_ensemble(
                    model, aux, a_p, u_p, step, T_out)
            if uq == "SWAG":
                return V.validation_swag(
                    model, aux, a_p, u_p, step, T_out, samples, key)
            if uq == "MLE":
                mean, var, mse, mae = V.validation_mle(
                    model, aux, a_p, u_p, step, T_out)
                return mean, jnp.sqrt(var), mse, mae
            raise ValueError(f"unknown UQ method {uq}")

        _validate = jax.jit(_validate_impl)
        if uq in ("AER", "PRE"):
            _v = V.validation_aer if uq == "AER" else V.validation_pre
            _extra = (alpha,) if uq == "AER" else (alpha, pre)
            _validate_cp = jax.jit(
                lambda a_p, u_p: _v(model, aux, a_p, u_p, step, T_out, *_extra))
            _vs = (V.validation_aer_scores if uq == "AER"
                   else V.validation_pre_scores)
            _extra_s = () if uq == "AER" else (pre,)
            _validate_cp_scores = jax.jit(
                lambda a_p, u_p: _vs(model, aux, a_p, u_p, step, T_out,
                                     *_extra_s))

        l2s, covs, jcovs, times = [], [], [], []
        for ii in range(runs):
            idx = _bootstrap_idx(rng, test_a.shape[0], n_eval)
            a, u = test_a[idx], test_u[idx]
            key = jax.random.PRNGKey(seed * 1000 + ii)
            t1 = time.perf_counter()
            qhat = None
            host_scores = None  # chunked AER/PRE: per-sim scores on host

            if uq in ("AER", "PRE") and mesh is None and batch_chunk \
                    and a.shape[0] > batch_chunk:
                # Chunked CP: rollout + per-sim scores in bounded-memory
                # pieces, then ONE conformal quantile over the concatenated
                # scores — identical statistics (the batch couples only at
                # the final per-cell quantile). Unlocks the MHD full
                # protocol: 300 six-variable sims unchunked ResourceExhaust
                # the 16 GB v5e (the [B, V, X, Y, 256] rollout
                # intermediate), ADVICE r03.
                ms, scs, w_mse, w_mae, n_tot = [], [], 0.0, 0.0, 0
                for lo in range(0, a.shape[0], batch_chunk):
                    sl = slice(lo, lo + batch_chunk)
                    m_p, s_p, mse_p, mae_p = _validate_cp_scores(a[sl], u[sl])
                    n_p = int(a[sl].shape[0])
                    ms.append(np.asarray(m_p))
                    scs.append(np.asarray(s_p))
                    w_mse += float(mse_p) * n_p
                    w_mae += float(mae_p) * n_p
                    n_tot += n_p
                mean = np.concatenate(ms)
                host_scores = np.concatenate(scs)
                from ..cp.inductive import calibrate as _calibrate

                qhat = _calibrate(jnp.asarray(host_scores), n_tot, alpha)
                mse, mae = w_mse / n_tot, w_mae / n_tot
            elif uq in ("AER", "PRE"):
                # unchunked: the conformal quantile couples the batch.
                # Under a mesh only the rollout input is padded+sharded;
                # the validator crops the rollout to u's batch before
                # scoring, so pad rows never enter the quantile.
                a_in = a if mesh is None else _pad_shard(a, mesh.shape["dp"])
                mean, qhat, mse, mae = _validate_cp(a_in, u)
                mean = jax.block_until_ready(mean)
                np.asarray(mean)  # force host sync on remote backends
            elif mesh is not None:
                n_real = a.shape[0]
                dp = mesh.shape["dp"]
                mean, std, _, _ = _validate(_pad_shard(a, dp),
                                            _pad_shard(u, dp), key)
                # crop the pad rows and recompute the metrics on the real
                # rows only (the in-validator mse/mae averaged over padded
                # zero-vs-zero rows, diluting them)
                mean = np.asarray(mean)[:n_real]
                std = np.asarray(std)[:n_real]
                u_np = np.asarray(u)
                mse = float(np.mean((mean - u_np) ** 2))
                mae = float(np.mean(np.abs(mean - u_np)))
            elif batch_chunk and a.shape[0] > batch_chunk:
                # Batch chunking bounds device peak memory: the MC-sample
                # rollouts' projection intermediate ([B, V, X, Y, 256]) and
                # the stacked-sample output scale with B; at the MHD 10x150
                # protocol the unchunked footprint ResourceExhausted'd a
                # 16 GB v5e (2026-08-19). Each piece is fetched to host
                # (which also drains the remote dispatch queue) before the
                # next is dispatched.
                ms, ss, w_mse, w_mae, n_tot = [], [], 0.0, 0.0, 0
                for lo in range(0, a.shape[0], batch_chunk):
                    sl = slice(lo, lo + batch_chunk)
                    m_p, s_p, mse_p, mae_p = _validate(a[sl], u[sl], key)
                    n_p = int(a[sl].shape[0])
                    ms.append(np.asarray(m_p))
                    ss.append(np.asarray(s_p))
                    w_mse += float(mse_p) * n_p
                    w_mae += float(mae_p) * n_p
                    n_tot += n_p
                mean, std = np.concatenate(ms), np.concatenate(ss)
                mse, mae = w_mse / n_tot, w_mae / n_tot
            else:
                mean, std, mse, mae = _validate(a, u, key)
                mean = jax.block_until_ready(mean)
                np.asarray(mean)  # force host sync on remote backends
            dt = time.perf_counter() - t1

            if host_scores is not None:
                # Chunked AER/PRE coverage HOST-side (ADVICE r04): the
                # previous path re-ran pre.residual over the FULL
                # concatenated mean on device — an O(full-batch) allocation
                # in the code path whose purpose is bounding device memory.
                q_np = np.asarray(qhat)
                if uq == "PRE":
                    # score = |residual|: score <= qhat is BIT-identical to
                    # -qhat <= residual <= qhat (abs and unary negation are
                    # exact IEEE ops), so the per-chunk scores suffice.
                    inside = host_scores <= q_np
                else:
                    # AER must keep the SET form: mean +- qhat rounds, so
                    # |mean - u| <= qhat differs at exact-boundary cells
                    # (with small n the clipped quantile IS the max score,
                    # putting one sim per cell exactly on the boundary).
                    # Same elementwise f32 arithmetic as emp_cov, in numpy.
                    u_np = np.asarray(u)
                    inside = (u_np >= mean - q_np) & (u_np <= mean + q_np)
                cov = float(inside.mean())
                jcov = float(inside.reshape(inside.shape[0], -1)
                             .all(axis=1).mean())
            elif uq == "PRE":
                res = pre.residual(jnp.transpose(mean, (0, 1, 4, 2, 3)))
                cov = emp_cov((-qhat, qhat), res)
                jcov = emp_cov_joint((-qhat, qhat), res)
            elif uq == "AER":
                sets = (mean - qhat, mean + qhat)
                cov = emp_cov(sets, u)
                jcov = emp_cov_joint(sets, u)
            else:
                sets = (mean - 2 * std, mean + 2 * std)
                cov = emp_cov(sets, u)
                jcov = emp_cov_joint(sets, u)

            l2s.append(float(mse))
            covs.append(float(cov))
            jcovs.append(float(jcov))
            times.append(dt)

        results[uq] = {
            "l2": (float(np.mean(l2s)), float(np.std(l2s))),
            "coverage": (float(np.mean(covs)), float(np.std(covs))),
            "joint_coverage": (float(np.mean(jcovs)), float(np.std(jcovs))),
            "eval_time": (float(np.mean(times)), float(np.std(times))),
        }
        if verbose:
            r = results[uq]
            print(f"{uq:14s} L2 {r['l2'][0]:.3e}±{r['l2'][1]:.1e}  "
                  f"cov {r['coverage'][0]:.3f}±{r['coverage'][1]:.3f}  "
                  f"t {r['eval_time'][0]:.2f}s±{r['eval_time'][1]:.2f}")
        if on_method_done is not None:
            on_method_done(uq, results[uq])
    return results
