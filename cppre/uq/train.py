"""Training loops for the UQ variants: ELBO (Bayesian), NLL (MLE), SWAG.

Behavioral specs: ELBO = -(likelihood - KL)/batch with likelihood =
-sum-MSE and mean-reduced KL over the Bayes layers
(`/root/reference/Other_UQ/Utils/loss_utils.py:22-35`); NLL on (mean,
log-var) channel pairs (:6-20); SWAG collects a snapshot each epoch past a
threshold with a constant LR (`Other_UQ/Experiments/Wave_FNO.py:199-201,
246-249`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..models.swag import SWAG
from ..models.variants import bayes_kl_loss
from ..train.loops import TrainState, make_optimizer

__all__ = ["nll_chunk_loss", "make_bayesian_train_step", "make_mle_train_step",
           "fit_swag"]


def nll_chunk_loss(pred, target):
    """Heteroscedastic NLL for a (mean, log-var) chunk: pred [..., 2*s]
    against target [..., s] (loss_utils.py:6-20 with s = 1)."""
    s = target.shape[-1]
    mean, log_var = pred[..., :s], pred[..., s:]
    return jnp.mean((log_var + (mean - target) ** 2 / jnp.exp(log_var)) / 2)


def make_mle_train_step(apply_fn, tx, step: int, T_out: int):
    """AR train step where the model emits 2*step channels and feeds back
    the mean (training_utils.py:297-330)."""

    @jax.jit
    def train_step(params, opt_state, xx, yy):
        n = T_out // step
        ys = jnp.moveaxis(yy.reshape(yy.shape[:-1] + (n, step)), -2, 0)

        def loss_of(p):
            @jax.checkpoint
            def body(carry, y):
                x, acc = carry
                out = apply_fn(p, x)
                acc = acc + nll_chunk_loss(out, y)
                x = jnp.concatenate((x[..., step:], out[..., :step]), axis=-1)
                return (x, acc), None

            (_, total), _ = lax.scan(body, (xx, 0.0), ys)
            return total

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def make_bayesian_train_step(apply_fn, tx, step: int, T_out: int,
                             prior_sigma: float = 0.1):
    """AR train step with the ELBO objective; each forward draws a fresh
    posterior sample via the 'bayes' rng (training_utils.py:297-330)."""

    @jax.jit
    def train_step(params, opt_state, xx, yy, key):
        n = T_out // step
        bs = xx.shape[0]
        ys = jnp.moveaxis(yy.reshape(yy.shape[:-1] + (n, step)), -2, 0)
        keys = jax.random.split(key, n)

        def loss_of(p):
            @jax.checkpoint
            def body(carry, inp):
                y, k = inp
                x, acc = carry
                im = apply_fn(p, x, rngs={"bayes": k})
                likelihood = -jnp.sum((im - y) ** 2)
                kl = bayes_kl_loss(p["params"] if "params" in p else p,
                                   prior_sigma=prior_sigma)
                acc = acc + (-(likelihood - kl) / bs)
                x = jnp.concatenate((x[..., step:], im), axis=-1)
                return (x, acc), None

            (_, total), _ = lax.scan(body, (xx, 0.0), (ys, keys))
            return total

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return train_step


def fit_swag(apply_fn, params, train_a, train_u, *, epochs: int,
             batch_size: int, step: int, T_out: int, loss_func,
             lr: float = 5e-3, swa_start: int | None = None,
             max_num_models: int = 20, seed: int = 0) -> SWAG:
    """Train with constant LR (SWAG uses gamma=1.0, Wave_FNO.py:199-201),
    collecting a SWAG snapshot each epoch >= swa_start (:246-249)."""
    from ..train.loops import make_train_step, train_one_epoch_AR

    if swa_start is None:
        swa_start = max(epochs - max_num_models, epochs // 2)
    steps_per_epoch = max(train_a.shape[0] // batch_size, 1)
    tx = make_optimizer(lr, scheduler_step=epochs + 1, scheduler_gamma=1.0,
                        steps_per_epoch=steps_per_epoch)
    state = TrainState.create(apply_fn, params, tx)
    train_step = make_train_step(apply_fn, tx, step, T_out, loss_func)
    swag = SWAG(params, max_num_models=max_num_models)
    key = jax.random.PRNGKey(seed)
    for ep in range(epochs):
        key, sub = jax.random.split(key)
        state, _, _ = train_one_epoch_AR(
            state, train_step, train_a, train_u, train_a[-2:], train_u[-2:],
            sub, batch_size, step, T_out, loss_func,
        )
        if ep >= swa_start:
            swag.collect_model(state.params)
    return swag
