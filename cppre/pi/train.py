"""Physics-informed training driver.

Reproduces the PI fine-tuning loop (`Wave_FNO_PI.py:234-264`): AR rollout,
PI/PISL loss on the prediction, Adam with StepLR (the reference also offers
LBFGS :220-232 — optax's lbfgs is wired through the same interface).
`loss_on='last'` replicates the reference quirk of penalising only the
final rollout chunk (:257, `loss = residual_loss(im)...` uses the last
`im`); 'full' penalises the whole trajectory.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax import lax

from ..train.loops import TrainState, make_optimizer

__all__ = ["finetune_physics_informed"]


def finetune_physics_informed(apply_fn, params, train_a, train_u, *,
                              loss_fn: Callable, epochs: int, batch_size: int,
                              step: int, T_out: int, lr: float = 5e-3,
                              scheduler_step: int = 100,
                              scheduler_gamma: float = 0.5,
                              loss_on: str = "full", optimizer: str = "Adam",
                              seed: int = 0, verbose: bool = False):
    """loss_fn(pred, target) over FNO-layout tensors; target may be unused
    (pure PI). Returns fine-tuned params."""
    if loss_on == "last" and step < 3:
        # fno_chunk_residual crops the time axis by 1 per side: a last chunk
        # of step < 3 frames leaves an empty axis -> jnp.mean = NaN, which
        # would silently NaN the parameters.
        raise ValueError(
            f"loss_on='last' needs step >= 3 frames for the residual's time "
            f"crop (got step={step}); use loss_on='full'")
    n_chunks = T_out // step
    steps_per_epoch = max(train_a.shape[0] // batch_size, 1)
    if optimizer == "LBFGS":
        tx = optax.lbfgs(learning_rate=1.0)
    else:
        tx = make_optimizer(lr, scheduler_step, scheduler_gamma, steps_per_epoch)
    opt_state = tx.init(params)

    def rollout(p, xx):
        @jax.checkpoint
        def body(carry, _):
            im = apply_fn(p, carry)
            carry = jnp.concatenate((carry[..., step:], im), axis=-1)
            return carry, im

        _, preds = lax.scan(body, xx, None, length=n_chunks)
        full = jnp.moveaxis(preds, 0, -2)
        full = full.reshape(full.shape[:-2] + (n_chunks * step,))
        return full, preds[-1]

    @jax.jit
    def train_step(p, opt_state, xx, yy):
        def loss_of(p):
            full, last = rollout(p, xx)
            pred = last if loss_on == "last" else full
            target = yy[..., -step:] if loss_on == "last" else yy
            return loss_fn(pred, target)

        loss, grads = jax.value_and_grad(loss_of)(p)
        if optimizer == "LBFGS":
            updates, new_opt = tx.update(
                grads, opt_state, p, value=loss, grad=grads,
                value_fn=loss_of)
        else:
            updates, new_opt = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_opt, loss

    key = jax.random.PRNGKey(seed)
    n = train_a.shape[0]
    for ep in range(epochs):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, n)
        ep_loss = 0.0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i : i + batch_size]
            params, opt_state, loss = train_step(params, opt_state,
                                                 train_a[idx], train_u[idx])
            ep_loss += float(loss)
        if verbose:
            print(f"PI epoch {ep}: loss {ep_loss:.6e}")
    return params
