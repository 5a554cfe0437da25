"""Training loops: jit-compiled AR train step + epoch/fit drivers.

Reference semantics (`/root/reference/Other_UQ/Utils/training_utils.py:14-83`):
per batch, the loss is the SUM over rollout chunks of loss_func(im, y_chunk),
backprop through the whole rollout, grad-norm clip at 2.0, optimizer step;
the epoch also reports the full-trajectory loss. The rollout is a `lax.scan`
(see rollout.py) so one `train_step` is a single XLA program.

The optimizer is optax: Adam + StepLR-style staircase decay
(reference per-script `torch.optim.Adam` + `StepLR(step_size, gamma)`,
e.g. `/root/reference/Marginal/Advection_Residuals_CP.py:186-188`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

__all__ = ["TrainState", "make_optimizer", "make_train_step",
           "train_one_epoch_AR", "fit", "resolve_remat_policy"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    apply_fn: Callable = None
    tx: Any = None

    @classmethod
    def create(cls, apply_fn, params, tx):
        return cls(params=params, opt_state=tx.init(params), apply_fn=apply_fn, tx=tx)


def make_optimizer(lr: float, scheduler_step: int = 100, scheduler_gamma: float = 0.5,
                   steps_per_epoch: int = 1, grad_clip: float = 2.0):
    """Adam + staircase decay every `scheduler_step` epochs + global-norm clip."""
    schedule = optax.exponential_decay(
        lr, transition_steps=scheduler_step * steps_per_epoch,
        decay_rate=scheduler_gamma, staircase=True,
    )
    return optax.chain(optax.clip_by_global_norm(grad_clip), optax.adam(schedule))


def _chunked_targets(yy, step: int, T_out: int):
    """[..., T_out] -> [n_chunks, ..., step] for scan consumption."""
    n = T_out // step
    y = yy.reshape(yy.shape[:-1] + (n, step))
    return jnp.moveaxis(y, -2, 0)


def resolve_remat_policy(name):
    """Resolve a remat-policy spec to a `jax.checkpoint` policy callable.

    Accepts None (full rematerialisation — save nothing), a callable
    (passed through), or a string: the short aliases ``"dots"`` /
    ``"dots_no_batch"`` or any attribute name of
    `jax.checkpoint_policies`."""
    if name is None or callable(name):
        return name
    aliases = {"dots": "checkpoint_dots",
               "dots_no_batch": "dots_with_no_batch_dims_saveable"}
    attr = aliases.get(name, name)
    policy = getattr(jax.checkpoint_policies, attr, None)
    if policy is None:
        raise ValueError(f"unknown remat policy {name!r}; one of "
                         f"{sorted(aliases)} or a jax.checkpoint_policies "
                         "attribute name")
    return policy


def rollout_loss(apply_fn, params, xx, yy, step: int, T_out: int, loss_func,
                 remat: bool = True, remat_policy=None):
    """Sum over chunks of loss_func(im, y_chunk) along an AR rollout.

    Returns (total_chunk_loss, pred) — the reference's `loss` accumulator and
    `pred` concatenation (training_utils.py:27-45). With `remat` (default)
    each scan step's activations are rematerialised in the backward pass, so
    training memory is one rollout step instead of T_out/step of them —
    without it the wave config (batch 20, 20 steps, width-32 FNO on 64^2)
    needs ~25 GB of HBM and OOMs a single v5e chip.

    `remat_policy` (with `remat=True`) is the middle ground: a
    `jax.checkpoint_policies` policy (see `resolve_remat_policy`) that SAVES
    selected per-step values — e.g. "dots" keeps every MXU contraction
    output so the backward re-runs none of the matmuls — trading saved-
    activation HBM for the recompute pass. The rollout step is
    activation-HBM-bound (BASELINE.md training roofline), so which side
    wins is an empirical question; `scripts/train_roofline.py [dots]`
    measures it on-chip. Policies change scheduling only, never values.
    """
    ys = _chunked_targets(yy, step, T_out)
    if ys.shape[0] == 1:
        # single-shot (step == T_out): no AR carry (see
        # rollout.autoregressive_rollout) — also supports step > T_in
        im = apply_fn(params, xx)
        return loss_func(im, ys[0]), im

    def body(carry, y):
        xx, acc = carry
        im = apply_fn(params, xx)
        acc = acc + loss_func(im, y)
        xx = jnp.concatenate((xx[..., step:], im), axis=-1)
        return (xx, acc), im

    if remat:
        policy = resolve_remat_policy(remat_policy)
        body = jax.checkpoint(body, policy=policy) if policy is not None \
            else jax.checkpoint(body)
    (_, total), preds = lax.scan(body, (xx, 0.0), ys)
    preds = jnp.moveaxis(preds, 0, -2)
    pred = preds.reshape(preds.shape[:-2] + (ys.shape[0] * step,))
    return total, pred


def make_train_step(apply_fn, tx, step: int, T_out: int, loss_func,
                    remat: bool = True, remat_policy=None):
    """Build the jitted (params, opt_state, xx, yy) -> update function."""

    @jax.jit
    def train_step(params, opt_state, xx, yy):
        def loss_of(p):
            total, pred = rollout_loss(apply_fn, p, xx, yy, step, T_out,
                                       loss_func, remat=remat,
                                       remat_policy=remat_policy)
            return total, pred

        (loss, pred), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        full_loss = loss_func(pred, yy)
        return params, opt_state, loss, full_loss

    return train_step


@partial(jax.jit, static_argnums=(1, 3, 4, 5))
def _eval_loss(params, apply_fn, batch, step, T_out, loss_func):
    xx, yy = batch
    _, pred = rollout_loss(apply_fn, params, xx, yy, step, T_out, loss_func)
    return loss_func(pred, yy)


def train_one_epoch_AR(state: TrainState, train_step, train_a, train_u,
                       test_a, test_u, key, batch_size: int, step: int,
                       T_out: int, loss_func):
    """One epoch over shuffled minibatches; returns (state, train_loss, test_loss).

    Losses are the summed full-trajectory losses over the epoch — divide by
    n_train / n_test at the logging site, as the reference does
    (training_utils.py:83)."""
    n = train_a.shape[0]
    perm = jax.random.permutation(key, n)
    params, opt_state = state.params, state.opt_state
    train_loss = 0.0
    for i in range(0, n - batch_size + 1, batch_size):
        idx = perm[i : i + batch_size]
        params, opt_state, loss, full = train_step(
            params, opt_state, train_a[idx], train_u[idx]
        )
        train_loss += float(full)
    test_loss = float(
        _eval_loss(params, state.apply_fn, (test_a, test_u), step, T_out, loss_func)
    )
    return state._replace(params=params, opt_state=opt_state), train_loss, test_loss


def fit(model_apply, params, train_a, train_u, test_a, test_u, *, epochs: int,
        batch_size: int, step: int, T_out: int, loss_func, lr: float = 5e-3,
        scheduler_step: int = 100, scheduler_gamma: float = 0.5,
        seed: int = 0, verbose: bool = False,
        remat: bool = True, remat_policy=None):
    """Full training driver (the per-script loop, e.g.
    `Marginal/Advection_Residuals_CP.py:194-207`). Returns trained params."""
    steps_per_epoch = max(train_a.shape[0] // batch_size, 1)
    tx = make_optimizer(lr, scheduler_step, scheduler_gamma, steps_per_epoch)
    state = TrainState.create(model_apply, params, tx)
    train_step = make_train_step(model_apply, tx, step, T_out, loss_func,
                                 remat=remat, remat_policy=remat_policy)
    key = jax.random.PRNGKey(seed)
    for ep in range(epochs):
        key, sub = jax.random.split(key)
        state, train_loss, test_loss = train_one_epoch_AR(
            state, train_step, train_a, train_u, test_a, test_u, sub,
            batch_size, step, T_out, loss_func,
        )
        if verbose:
            print(f"epoch {ep}: train {train_loss / train_a.shape[0]:.6f} "
                  f"test {test_loss / test_a.shape[0]:.6f}")
    return state.params
