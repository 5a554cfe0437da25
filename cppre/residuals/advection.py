"""1-D advection PRE: u_t + v u_x = 0 as one additive composite kernel.

Reference: `Marginal/Advection_Residuals_CP.py:155-164` (composite kernel
`D.kernel = D_t.kernel + (v*disc*dt/dx) * D_x.kernel`, temporal subsampling
`disc`), `Joint/Advection_Residuals_CP.py:154-161` (disc = 1).
Data layout [BS, Nt, Nx]; interior crop [..., 1:-1, 1:-1].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.convops import ConvOperator1d

__all__ = ["PRE_Advection"]


class PRE_Advection:
    def __init__(self, dt: float, dx: float, v: float = 1.0, disc: int = 1):
        D_t = ConvOperator1d("t", 1)
        D_x = ConvOperator1d("x", 1)
        self.D = ConvOperator1d()
        self.D.kernel = jnp.asarray(D_t.kernel) + (v * disc * dt / dx) * jnp.asarray(
            D_x.kernel
        )

    def residual(self, uu, boundary: bool = False):
        """uu: [BS, Nt, Nx] (already permuted from FNO layout)."""
        res = self.D(uu)
        return res if boundary else res[..., 1:-1, 1:-1]

    __call__ = residual
