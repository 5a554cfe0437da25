"""Data normalizers (reference `Neural_PDE.Utils.processing_utils`).

The reference loads/saves normalizer state as flat `.npz` files holding the
affine coefficients (`np.savez(in_a, in_b, out_a, out_b)`,
`/root/reference/Physics_Informed/Wave_FNO_PI.py:168-175`; load pattern
`/root/reference/Joint/Wave_Residuals_CP.py:131-137` sets `.a`/`.b`
directly). All normalizers here are registered pytrees with the affine form
``encode(x) = a*x + b`` so they pass transparently through jit/vmap/pjit and
serialize to the same `{*_a, *_b}` npz contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["MinMaxNormalizer", "RangeNormalizer", "GaussianNormalizer", "Identity"]


@jax.tree_util.register_pytree_node_class
class _AffineNormalizer:
    """encode(x) = a*x + b ; decode(y) = (y - b) / a."""

    def __init__(self, a, b):
        self.a = jnp.asarray(a, dtype=jnp.float32)
        self.b = jnp.asarray(b, dtype=jnp.float32)

    def encode(self, x):
        return self.a * x + self.b

    def decode(self, y):
        return (y - self.b) / self.a

    def tree_flatten(self):
        return (self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.a, obj.b = children
        return obj

    @classmethod
    def from_ab(cls, a, b):
        obj = cls.__new__(cls)
        obj.a = jnp.asarray(a, dtype=jnp.float32)
        obj.b = jnp.asarray(b, dtype=jnp.float32)
        return obj


class MinMaxNormalizer(_AffineNormalizer):
    """Map the global [min, max] of x onto [low, high] (scalar a, b)."""

    def __init__(self, x, low=0.0, high=1.0):
        x = jnp.asarray(x)
        mn, mx = jnp.min(x), jnp.max(x)
        a = (high - low) / (mx - mn)
        b = -a * mx + high
        super().__init__(a, b)


class RangeNormalizer(_AffineNormalizer):
    """Per-cell [min, max] over the batch axis onto [low, high]."""

    def __init__(self, x, low=0.0, high=1.0):
        x = jnp.asarray(x)
        mn = jnp.min(x, axis=0)
        mx = jnp.max(x, axis=0)
        a = (high - low) / (mx - mn)
        b = -a * mx + high
        super().__init__(a, b)


class GaussianNormalizer(_AffineNormalizer):
    """Standardize by global mean/std: encode = (x - mean) / (std + eps)."""

    def __init__(self, x, eps=1e-5):
        x = jnp.asarray(x)
        std = jnp.std(x) + eps
        super().__init__(1.0 / std, -jnp.mean(x) / std)


class Identity(_AffineNormalizer):
    def __init__(self, x=None):
        super().__init__(1.0, 0.0)
