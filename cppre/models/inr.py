"""Conditioned coordinate-network INR for Grad-Shafranov surrogates.

Rebuild of the external `Neural_PDE.Models.INR` named by the reference
FreeGSNKE experiment (`/root/reference/FreeGSNKE/GS_CP.py:48`; the executed
fallback is the inline CAE at :139-194): an implicit neural representation
psi(R, Z | coil params) — a coordinate MLP over (R, Z) conditioned on the
PF-coil parameter vector.

TPU-first design: the grid is flattened to a [B, N*N, coord] point batch so
every layer is one large batched matmul on the MXU (N*N >= 1024 rows per
sample) instead of a per-pixel loop; Fourier positional features counter
the spectral bias of plain MLPs on coordinate inputs (Tancik et al. 2020,
public technique). Call signature matches `ConvAutoencoder` so the two
surrogates are drop-in interchangeable in `experiments/gs.run_freegsnke`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

__all__ = ["INR"]


class INR(nn.Module):
    """(coords [B, 2, NR, NZ], params [B, n_params]) -> psi [B, 1, NR, NZ]."""

    n_params: int = 12
    width: int = 128
    depth: int = 4
    n_freqs: int = 8  # Fourier-feature octaves per coordinate

    @nn.compact
    def __call__(self, coords, params):
        b, c, nr, nz = coords.shape
        pts = coords.reshape(b, c, nr * nz).transpose(0, 2, 1)  # [B, P, 2]

        # Fourier features: [sin, cos](2^k * pi * x) per octave and coord
        freqs = (2.0 ** np.arange(self.n_freqs)).astype(np.float32) * np.pi
        ang = pts[..., None] * freqs  # [B, P, 2, F]
        feat = jnp.concatenate(
            [pts, jnp.sin(ang).reshape(b, nr * nz, -1),
             jnp.cos(ang).reshape(b, nr * nz, -1)], axis=-1)

        # conditioning: broadcast the coil parameters to every point
        cond = jnp.broadcast_to(params[:, None, :],
                                (b, nr * nz, params.shape[-1]))
        x = jnp.concatenate([feat, cond], axis=-1)
        for _ in range(self.depth):
            x = nn.gelu(nn.Dense(self.width)(x))
        psi = nn.Dense(1)(x)  # [B, P, 1]
        return psi.transpose(0, 2, 1).reshape(b, 1, nr, nz)
