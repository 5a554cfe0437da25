"""Loss functions: relative Lp, MSE/MAE, heteroscedastic NLL, ELBO.

Specs: `LpLoss(size_average=False)` is the standard FNO-codebase relative
Lp loss used by every training script
(`/root/reference/Physics_Informed/Wave_FNO_PI.py:214`); `NLL`/`ELBO` from
`/root/reference/Other_UQ/Utils/loss_utils.py:6-35`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["lp_loss", "LpLoss", "mse", "mae", "nll", "elbo"]


def lp_loss(pred, target, p: int = 2, size_average: bool = False):
    """Relative Lp loss per sample: ||pred - target||_p / ||target||_p, then
    mean (size_average=True) or sum (False) over the batch."""
    b = pred.shape[0]
    diff = jnp.reshape(pred - target, (b, -1))
    tgt = jnp.reshape(target, (b, -1))
    diff_norms = jnp.linalg.norm(diff, ord=p, axis=1)
    tgt_norms = jnp.linalg.norm(tgt, ord=p, axis=1)
    rel = diff_norms / tgt_norms
    return jnp.mean(rel) if size_average else jnp.sum(rel)


class LpLoss:
    """Callable matching the reference class: LpLoss(size_average=False)."""

    def __init__(self, d: int = 2, p: int = 2, size_average: bool = True):
        self.d, self.p, self.size_average = d, p, size_average

    def __call__(self, pred, target):
        return lp_loss(pred, target, p=self.p, size_average=self.size_average)


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mae(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def nll(mean, log_var, target):
    """Heteroscedastic Gaussian negative log-likelihood
    (loss_utils.py:6-20): mean over cells of 0.5*(log var + (y-mu)^2/var)."""
    var = jnp.exp(log_var)
    return jnp.mean(0.5 * (log_var + (target - mean) ** 2 / var))


def elbo(likelihood, kl, batch_size):
    """ELBO = -(likelihood - KL)/batch (loss_utils.py:22-35)."""
    return -(likelihood - kl) / batch_size
