"""UQ model variants: MC-dropout, variational-Bayes last layer, MLE heads.

Behavioral specs:
* Dropout FNO — `FNO2d(dropout_rate=0.1)` (the base class grows the
  reference `FNO_multi2d_Dropout`'s dropout placement,
  `/root/reference/Other_UQ/Bayesian_Models/Dropout_FNO.py:85-188`); MC
  sampling keeps dropout live at eval (`enable_dropout()` :211-215 ==
  calling apply with deterministic=False and a fresh 'dropout' rng).
* Bayesian FNO — variational `BayesLinear` last layers
  (`Bayesian_FNO.py:94-190`: weight_mu ~ U(+-1/sqrt(in)), weight_log_sigma
  = log(prior_sigma), reparameterised sampling in forward :167-174, prior
  N(0, 0.1) on fc1/fc2 :219-220) with the closed-form KL
  (`Other_UQ/Utils/BayesianLoss.py:12-65`).
* MLE FNO — the base FNO with `step*2` outputs, channel 0 = mean and
  channel 1 = log-variance; the AR rollout feeds back only the mean
  (`training_utils.py:261-294`, `Wave_FNO.py:180-182`).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .fno import FNO2d, _FNOBlock2d

__all__ = [
    "BayesDense",
    "FNO2dBayesian",
    "make_dropout_fno",
    "make_mle_fno",
    "bayes_kl_loss",
    "mc_dropout_apply",
]


class BayesDense(nn.Module):
    """Variational linear layer with independent Gaussian weights."""

    features: int
    prior_mu: float = 0.0
    prior_sigma: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        stdv = 1.0 / math.sqrt(in_features)
        w_mu = self.param(
            "weight_mu",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -stdv, stdv),
            (in_features, self.features),
        )
        w_log_sigma = self.param(
            "weight_log_sigma",
            lambda k, s: jnp.full(s, math.log(self.prior_sigma), jnp.float32),
            (in_features, self.features),
        )
        b_mu = self.param(
            "bias_mu",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -stdv, stdv),
            (self.features,),
        )
        b_log_sigma = self.param(
            "bias_log_sigma",
            lambda k, s: jnp.full(s, math.log(self.prior_sigma), jnp.float32),
            (self.features,),
        )
        key = self.make_rng("bayes")
        kw, kb = jax.random.split(key)
        w = w_mu + jnp.exp(w_log_sigma) * jax.random.normal(kw, w_mu.shape)
        b = b_mu + jnp.exp(b_log_sigma) * jax.random.normal(kb, b_mu.shape)
        return x @ w + b


class FNO2dBayesian(nn.Module):
    """FNO_multi2d with Bayesian projection layers (Bayes-last-layer VI).

    Same topology as FNO2d; fc1_time/fc2_time are `BayesDense` with
    prior N(0, 0.1) (`Bayesian_FNO.py:219-220`). Apply with
    rngs={'bayes': key} — a fresh key per forward is one posterior sample.
    """

    T_in: int
    step: int
    modes1: int
    modes2: int
    num_vars: int
    width_time: int
    prior_sigma: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        grid = FNO2d.get_grid(self, x.shape)
        x = jnp.concatenate((x, grid), axis=-1)
        x = nn.Dense(self.width_time, name="fc0_time")(x)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))
        grid_c = jnp.transpose(grid, (0, 4, 1, 2, 3))
        block = lambda name: _FNOBlock2d(
            self.modes1, self.modes2, self.num_vars, self.width_time, name=name
        )
        x0 = block("f0")(x, grid_c)
        x = block("f1")(x0, grid_c)
        x = block("f2")(x, grid_c) + x0
        x1 = block("f3")(x, grid_c)
        x = block("f4")(x1, grid_c)
        x = block("f5")(x, grid_c) + x1
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = BayesDense(256, prior_sigma=self.prior_sigma, name="fc1_time")(x)
        x = nn.gelu(x, approximate=False)
        return BayesDense(self.step, prior_sigma=self.prior_sigma, name="fc2_time")(x)


def make_dropout_fno(T_in, step, modes1, modes2, num_vars, width_time,
                     dropout_rate: float = 0.1) -> FNO2d:
    """FNO_multi2d_Dropout factory (Dropout_FNO.py:113-188)."""
    return FNO2d(T_in=T_in, step=step, modes1=modes1, modes2=modes2,
                 num_vars=num_vars, width_time=width_time,
                 dropout_rate=dropout_rate)


def make_mle_fno(T_in, step, modes1, modes2, num_vars, width_time) -> FNO2d:
    """MLE (heteroscedastic) FNO: step*2 outputs (mean, log-var)
    (`Wave_FNO.py:180-182`)."""
    return FNO2d(T_in=T_in, step=step * 2, modes1=modes1, modes2=modes2,
                 num_vars=num_vars, width_time=width_time)


def bayes_kl_loss(params, prior_mu: float = 0.0, prior_sigma: float = 0.1,
                  reduction: str = "mean") -> jnp.ndarray:
    """Closed-form KL(q || N(prior_mu, prior_sigma)) summed over every
    (weight|bias)_mu / _log_sigma pair in the tree (BayesianLoss.py:12-65)."""
    prior_log_sigma = math.log(prior_sigma)
    total = 0.0
    count = 0

    def walk(node):
        nonlocal total, count
        if isinstance(node, dict):
            for key in node:
                if key.endswith("_mu"):
                    ls_key = key.replace("_mu", "_log_sigma")
                    if ls_key in node:
                        mu, log_sigma = node[key], node[ls_key]
                        kl = prior_log_sigma - log_sigma + (
                            jnp.exp(log_sigma) ** 2 + (mu - prior_mu) ** 2
                        ) / (2 * prior_sigma**2) - 0.5
                        total = total + jnp.sum(kl)
                        count += kl.size
            for v in node.values():
                if isinstance(v, dict):
                    walk(v)

    import flax

    walk(flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params))
    if reduction == "mean" and count:
        return total / count
    return total


def mc_dropout_apply(model, params, x, key, samples: int):
    """MC-dropout ensemble forward: vmap over `samples` dropout masks.
    Returns [samples, ...] stacked predictions (reference enable_dropout +
    loop, `training_utils.py:117-155`)."""
    keys = jax.random.split(key, samples)

    def one(k):
        return model.apply(params, x, deterministic=False, rngs={"dropout": k})

    return jax.vmap(one)(keys)
