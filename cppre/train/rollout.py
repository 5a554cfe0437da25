"""Autoregressive rollout as a `lax.scan` (TPU-native).

The reference rolls out with a Python loop re-feeding step-sized chunks
(`/root/reference/Other_UQ/Utils/training_utils.py:27-45,95-103`):

    for t in range(0, T_out, step):
        im = model(xx)
        pred = cat(pred, im, -1)
        xx = cat(xx[..., step:], im, -1)

Here the loop is a `lax.scan` with static length T_out//step, so the whole
rollout is one compiled graph: no per-step dispatch, XLA pipelines the FNO
steps back-to-back. `validation_AR` evaluates the full batch at once (the
reference iterates batch=1 on a DataLoader purely for GPU memory; on TPU the
batch dimension is where the parallelism is — shard it over the mesh).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["autoregressive_rollout", "validation_AR"]


def autoregressive_rollout(apply_fn: Callable, xx, step: int, T_out: int):
    """Roll `apply_fn` (x -> next `step` frames on the last axis) out to T_out.

    xx: [..., T_in] initial window. Returns pred [..., T_out].
    T_out must be divisible by step (true for every reference config).
    """
    if T_out % step != 0:
        raise ValueError(f"T_out={T_out} not divisible by step={step}")
    n = T_out // step
    if n == 1:
        # single-shot configs (step == T_out, e.g. the Expts_initial 1-D
        # pipelines with step > T_in): the reference's Python loop never
        # re-feeds, so there is no carry to keep shape-stable
        return apply_fn(xx)

    def body(carry, _):
        im = apply_fn(carry)
        carry = jnp.concatenate((carry[..., step:], im), axis=-1)
        return carry, im

    _, preds = lax.scan(body, xx, None, length=n)
    # preds: [n, ..., step] -> [..., n, step] -> [..., T_out]
    preds = jnp.moveaxis(preds, 0, -2)
    return preds.reshape(preds.shape[:-2] + (n * step,))


def validation_AR(apply_fn: Callable, test_a, test_u, step: int, T_out: int):
    """Rollout + MSE/MAE metrics (reference `validation_AR`,
    training_utils.py:86-114). Returns (pred_set, mse, mae)."""
    pred = autoregressive_rollout(apply_fn, test_a, step, T_out)
    mse = jnp.mean((pred - test_u) ** 2)
    mae = jnp.mean(jnp.abs(pred - test_u))
    return pred, mse, mae
