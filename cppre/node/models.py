"""Neural-ODE model and training.

Reference `ODEFunc` (`Inverse_residuals/DHO/DHO_NODE.py:98-129`): a
state-dim -> hidden -> hidden -> state-dim tanh MLP, integrated by
`odeint(neural_ode, state_0, t)` (:237). Here the integrator is
`jax.experimental.ode.odeint` (adaptive dopri5 with `vjp` through the
solution) and training is a jitted full-trajectory MSE descent.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from jax.experimental.ode import odeint

__all__ = ["ODEFunc", "neural_odeint", "fit_node"]


class ODEFunc(nn.Module):
    """dy/dt = MLP(y) (the reference ignores t in forward, DHO_NODE.py:117).

    With ``time_dependent=True`` the MLP input is ``[y, t]`` — the
    non-autonomous form the reference's Bessel NODE uses (its net takes
    ``[y, v, x]``, `Inverse_residuals/Bessel/Bessel_NODE.py:110-130`),
    required whenever the RHS has explicit variable coefficients
    (Bessel, Cauchy-Euler)."""

    hidden_dim: int = 50
    state_dim: int = 2
    time_dependent: bool = False

    @nn.compact
    def __call__(self, t, y):
        if self.time_dependent:
            y = jnp.concatenate([y, jnp.reshape(t, (1,))])
        h = nn.Dense(self.hidden_dim)(y)
        h = nn.tanh(h)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.tanh(h)
        return nn.Dense(self.state_dim)(h)


def neural_odeint(model: ODEFunc, params, y0, t, rtol: float = 1e-6,
                  atol: float = 1e-7):
    """Integrate the NODE from y0 over times t -> [len(t), state_dim]."""
    fn = lambda y, tt: model.apply(params, tt, y)
    return odeint(fn, jnp.asarray(y0, jnp.float32), jnp.asarray(t, jnp.float32),
                  rtol=rtol, atol=atol)


def fit_node(model: ODEFunc, y0, t, target, *, epochs: int = 300,
             lr: float = 1e-2, seed: int = 0, verbose: bool = False):
    """Train the NODE on a target trajectory [len(t), state_dim] by
    full-trajectory MSE (the reference's training loop, DHO_NODE.py:190-240)."""
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros(()), jnp.asarray(y0))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    t = jnp.asarray(t, jnp.float32)
    y0 = jnp.asarray(y0, jnp.float32)
    target = jnp.asarray(target, jnp.float32)

    @jax.jit
    def step(params, opt_state):
        def loss_of(p):
            traj = odeint(lambda y, tt: model.apply(p, tt, y), y0, t)
            return jnp.mean((traj - target) ** 2)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for ep in range(epochs):
        params, opt_state, loss = step(params, opt_state)
        if verbose and ep % 50 == 0:
            print(f"NODE epoch {ep}: loss {float(loss):.3e}")
    return params
