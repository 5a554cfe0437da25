"""SWAG (SWA-Gaussian) posterior over flax parameter pytrees.

Behavioral spec: `/root/reference/Other_UQ/Utils/SWAG.py` — running mean and
second moment of the flattened parameter vector (:33-47), FIFO low-rank
deviation matrix capped at `max_num_models` columns (:48-55), and
`sample(scale=0.5)` drawing theta + scale*sqrt(var)*z1 +
scale/sqrt(K-1) * D z2 (:57-84). The reference needs complex-parameter
splitting (:20-31); our FNO stores split re/im weights, so the flattened
vector is plainly real (`jax.flatten_util.ravel_pytree`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

__all__ = ["SWAG"]


class SWAG:
    def __init__(self, params_template, max_num_models: int = 20,
                 var_clamp: float = 1e-6):
        w0, self._unravel = ravel_pytree(params_template)
        self.dim = w0.shape[0]
        self.max_num_models = max_num_models
        self.var_clamp = var_clamp
        self.n_models = 0
        self.theta = None
        self.theta_sq = None
        self.D = None  # [dim, <=K] FIFO deviation columns

    def collect_model(self, params):
        """Fold one parameter snapshot into the running statistics
        (SWAG.py:33-55; called once per epoch past the SWA threshold,
        `Other_UQ/Experiments/Wave_FNO.py:246-249`)."""
        w = np.asarray(ravel_pytree(params)[0])
        if self.theta is None:
            self.theta = w.copy()
            self.theta_sq = w**2
        else:
            self.n_models += 1
            n = self.n_models
            self.theta = (self.theta * n + w) / (n + 1)
            self.theta_sq = (self.theta_sq * n + w**2) / (n + 1)
        dev = (w - self.theta)[:, None]
        if self.D is None:
            self.D = dev
        elif self.D.shape[1] < self.max_num_models:
            self.D = np.concatenate([self.D, dev], axis=1)
        else:
            self.D = np.concatenate([self.D[:, 1:], dev], axis=1)

    def sample(self, key, scale: float = 0.5):
        """Draw one posterior parameter pytree (SWAG.py:57-84)."""
        k1, k2 = jax.random.split(key)
        variance = jnp.clip(
            jnp.asarray(self.theta_sq - self.theta**2), min=self.var_clamp
        )
        w = jnp.asarray(self.theta) + scale * jnp.sqrt(variance) * jax.random.normal(
            k1, (self.dim,)
        )
        if self.D is not None and self.D.shape[1] > 1:
            z2 = jax.random.normal(k2, (self.D.shape[1],))
            w = w + scale / np.sqrt(self.D.shape[1] - 1) * jnp.asarray(self.D) @ z2
        return self._unravel(w)

    # -- persistence (SWAG.py:101-132 keeps a state dict; we keep npz) -----
    def save(self, path: str):
        np.savez(path, theta=self.theta, theta_sq=self.theta_sq, D=self.D,
                 n_models=self.n_models, max_num_models=self.max_num_models,
                 var_clamp=self.var_clamp)

    def load(self, path: str):
        z = np.load(path, allow_pickle=True)
        self.theta = z["theta"]
        self.theta_sq = z["theta_sq"]
        self.D = None if z["D"].ndim == 0 else z["D"]
        self.n_models = int(z["n_models"])
        self.max_num_models = int(z["max_num_models"])
        self.var_clamp = float(z["var_clamp"])
        return self
