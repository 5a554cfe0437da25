"""Conditional convolutional auto-encoder for Grad-Shafranov surrogates.

Rebuild of the reference `ConvAutoencoder` (`/root/reference/FreeGSNKE/
GS_CP.py:139-194`; the external `Neural_PDE.Models.INR` fills the same
role): encode the (R, Z) coordinate grid, bottleneck through a dense layer,
concatenate the PF-coil parameter vector (12 values), decode to psi(R, Z).
Adapted to a power-of-2 grid (64x64) so down/up-sampling is exact on TPU
tiles instead of the reference's 33x33 odd shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["ConvAutoencoder"]


class ConvAutoencoder(nn.Module):
    """(coords [B, 2, N, N], params [B, n_params]) -> psi [B, 1, N, N]."""

    in_channels: int = 2
    out_channels: int = 1
    n_params: int = 12
    latent: int = 256
    base: int = 16

    @nn.compact
    def __call__(self, coords, params):
        x = jnp.moveaxis(coords, 1, -1)  # NHWC
        n = x.shape[1]
        # encoder: 3 stride-2 conv blocks (N -> N/8)
        for mult in (1, 2, 4):
            x = nn.Conv(self.base * mult, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        enc_shape = x.shape[1:]
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(self.latent)(x))
        x = jnp.concatenate([x, params], axis=-1)
        x = nn.relu(nn.Dense(int(np.prod(enc_shape)))(x))
        x = x.reshape((x.shape[0],) + enc_shape)
        # decoder: 3 stride-2 transposed convs back to N
        for mult in (2, 1, 1):
            x = nn.ConvTranspose(self.base * mult, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_channels, (1, 1))(x)
        return jnp.moveaxis(x, -1, 1)
