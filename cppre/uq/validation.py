"""Per-UQ-method validation rollouts -> (mean, std/qhat, mse, mae).

Behavioral spec: `/root/reference/Other_UQ/Utils/training_utils.py:117-512`.
Each reference validator loops batch=1 over the test set and a Python loop
over MC samples; here the rollout is the shared `lax.scan` and the sample
axis is a sequential `lax.map` over rng keys — one compiled program per
method, the whole test batch at once per sample (see `_mc_rollout` for why
the sample axis must not be vmapped).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..cp.inductive import calibrate
from ..train.rollout import autoregressive_rollout

__all__ = [
    "validation_dropout",
    "validation_ensemble",
    "validation_bayesian",
    "validation_swag",
    "validation_mle",
    "validation_aer",
    "validation_pre",
    "validation_aer_scores",
    "validation_pre_scores",
]


def _metrics(pred, test_u):
    return (
        jnp.mean((pred - test_u) ** 2),
        jnp.mean(jnp.abs(pred - test_u)),
    )


def _mc_rollout(sample_apply: Callable, keys, test_a, step, T_out):
    """Map an AR rollout over per-sample rng keys -> [S, B, ..., T_out].

    The sample axis is a sequential `lax.map`, NOT a `vmap`: one sample's
    rollout over the full eval batch already saturates the MXU, and a
    vmapped sample axis multiplies the rollout's live conv-activation
    footprint S-fold. At the reference-scale protocol (10 samples x 150
    sims; `Other_UQ/Evaluation/Eval.py:121-122`) that is an 18.9 GB (NS) /
    37.7 GB (MHD, 6 variables) single allocation — XLA refused to compile
    it for a 16 GB v5e (on-chip OOM, 2026-08-19). Sequential samples bound
    peak memory at one rollout while keeping a single compiled program.
    """

    def one(key):
        return autoregressive_rollout(lambda x: sample_apply(key, x), test_a, step, T_out)

    return jax.lax.map(one, keys)


def validation_dropout(model, params, test_a, test_u, step, T_out, samples, key):
    """MC dropout: dropout live at eval (training_utils.py:117-155)."""
    keys = jax.random.split(key, samples)
    preds = _mc_rollout(
        lambda k, x: model.apply(params, x, deterministic=False, rngs={"dropout": k}),
        keys, test_a, step, T_out,
    )
    mean, std = preds.mean(axis=0), preds.std(axis=0)
    return (mean, std) + _metrics(mean, test_u)


def validation_bayesian(model, params, test_a, test_u, step, T_out, samples, key):
    """VI posterior sampling: fresh 'bayes' rng per sample
    (training_utils.py:361-399)."""
    keys = jax.random.split(key, samples)
    preds = _mc_rollout(
        lambda k, x: model.apply(params, x, rngs={"bayes": k}),
        keys, test_a, step, T_out,
    )
    mean, std = preds.mean(axis=0), preds.std(axis=0)
    return (mean, std) + _metrics(mean, test_u)


def validation_ensemble(model, params_list: Sequence, test_a, test_u, step, T_out):
    """Deep ensemble: one rollout per member (training_utils.py:157-199).

    The members share one compiled program: their parameter pytrees are
    stacked leaf-wise and the member axis is a sequential `lax.map` (same
    memory rationale as `_mc_rollout`). A Python loop of per-member
    rollouts would trace and compile the scan N_ensemble times per call —
    measured as the dominant cost of the reference-scale eval protocol,
    where every resample re-enters this function."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)

    def one(p):
        return autoregressive_rollout(lambda x: model.apply(p, x), test_a, step, T_out)

    preds = jax.lax.map(one, stacked)
    mean, std = preds.mean(axis=0), preds.std(axis=0)
    return (mean, std) + _metrics(mean, test_u)


def validation_swag(model, swag, test_a, test_u, step, T_out, samples, key,
                    scale: float = 0.5):
    """SWAG: sample parameter pytrees, rollout each
    (training_utils.py:402-442).

    `SWAG.sample` is pure jnp given a key, so the sample axis rides the
    same single-program sequential `lax.map` as MC dropout — the draw
    happens once per key inside the mapped body, then the rollout. The
    previous Python loop re-traced the rollout per sample AND per resample
    (fresh closures defeat the jit cache), which made SWAG ~6.5x slower to
    evaluate than MC dropout at the same sample count (159 s vs 24 s per
    resample on the Wave 10x150 protocol) despite identical rollout math."""
    keys = jax.random.split(key, samples)

    def one(k):
        p = swag.sample(k, scale)
        return autoregressive_rollout(lambda x: model.apply(p, x), test_a, step, T_out)

    preds = jax.lax.map(one, keys)
    mean, std = preds.mean(axis=0), preds.std(axis=0)
    return (mean, std) + _metrics(mean, test_u)


def validation_mle(model, params, test_a, test_u, step, T_out):
    """Heteroscedastic MLE: model emits (mean, log-var) pairs on the last
    axis; the rollout feeds back only the mean (training_utils.py:261-294)."""
    half = step

    def apply_mean(x):
        out = model.apply(params, x)  # [..., 2*step]
        return out

    n = T_out // step

    def body(carry, _):
        out = apply_mean(carry)
        mean, log_var = out[..., :half], out[..., half:]
        carry = jnp.concatenate((carry[..., half:], mean), axis=-1)
        return carry, (mean, log_var)

    _, (means, log_vars) = jax.lax.scan(body, test_a, None, length=n)
    means = _stack_chunks(means, half)
    log_vars = _stack_chunks(log_vars, half)
    var = jnp.exp(log_vars)
    return (means, var) + _metrics(means, test_u)


def _stack_chunks(chunks, step):
    """[n, B, ..., step] -> [B, ..., n*step]."""
    x = jnp.moveaxis(chunks, 0, -2)
    return x.reshape(x.shape[:-2] + (x.shape[-2] * step,))


def validation_aer(model, params, test_a, test_u, step, T_out, alpha):
    """Absolute-error-residual CP: qhat from |pred - truth|
    (training_utils.py:445-475).

    `test_a` may carry zero-padded tail rows (dp-sharded eval pads the
    batch to the mesh extent); the rollout is cropped to `test_u`'s batch
    before scoring, so pad rows never enter the conformal quantile."""
    pred = autoregressive_rollout(lambda x: model.apply(params, x), test_a, step, T_out)
    pred = pred[: test_u.shape[0]]
    scores = jnp.abs(pred - test_u)
    qhat = calibrate(scores, pred.shape[0], alpha)
    return (pred, qhat) + _metrics(pred, test_u)


def validation_pre(model, params, test_a, test_u, step, T_out, alpha, pre):
    """Physics-residual CP: qhat from |PRE(pred)|
    (training_utils.py:481-512). `pre` is a residual class with
    `.residual(fields)` over [B, Nvar, Nt, Nx, Ny]. Pad-row cropping as in
    `validation_aer`."""
    pred = autoregressive_rollout(lambda x: model.apply(params, x), test_a, step, T_out)
    pred = pred[: test_u.shape[0]]
    fields = jnp.transpose(pred, (0, 1, 4, 2, 3))
    scores = jnp.abs(pre.residual(fields))
    qhat = calibrate(scores, pred.shape[0], alpha)
    return (pred, qhat) + _metrics(pred, test_u)


def validation_aer_scores(model, params, test_a, test_u, step, T_out):
    """Chunkable AER leg: per-sim scores WITHOUT the quantile, so large
    eval batches can roll out in bounded-memory pieces and the conformal
    quantile is taken over the concatenated scores afterwards — identical
    statistics to `validation_aer` (the batch only couples at the final
    per-cell quantile)."""
    pred = autoregressive_rollout(lambda x: model.apply(params, x), test_a,
                                  step, T_out)
    pred = pred[: test_u.shape[0]]
    scores = jnp.abs(pred - test_u)
    return (pred, scores) + _metrics(pred, test_u)


def validation_pre_scores(model, params, test_a, test_u, step, T_out, pre):
    """Chunkable PRE leg (see `validation_aer_scores`)."""
    pred = autoregressive_rollout(lambda x: model.apply(params, x), test_a,
                                  step, T_out)
    pred = pred[: test_u.shape[0]]
    fields = jnp.transpose(pred, (0, 1, 4, 2, 3))
    scores = jnp.abs(pre.residual(fields))
    return (pred, scores) + _metrics(pred, test_u)
