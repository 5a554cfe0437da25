"""2-D wave PRE: u_tt - (c dt/dx)^2 (u_xx + u_yy) as one composite kernel.

Reference: `Other_UQ/Evaluation/PRE_estimations.py:5-21` (PRE_Wave) and
`Joint/Wave_Residuals_CP.py:170-184`. Data layout [BS, Nt, Nx, Ny] (the
class also accepts the FNO layout [BS, Nvar=1, Nt, Nx, Ny] and drops the
variable axis, matching the reference's `uu[:, 0]`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.convops import ConvOperator2d

__all__ = ["PRE_Wave"]


class PRE_Wave:
    def __init__(self, dt: float, dx: float, c: float = 1.0):
        D_tt = ConvOperator2d("t", 2)
        D_xx_yy = ConvOperator2d(("x", "y"), 2)
        self.D = ConvOperator2d()
        self.D.kernel = jnp.asarray(D_tt.kernel) - (c * dt / dx) ** 2 * jnp.asarray(
            D_xx_yy.kernel
        )

    def residual(self, uu, boundary: bool = False):
        if uu.ndim == 5:  # [BS, 1, Nt, Nx, Ny] FNO-permuted layout
            uu = uu[:, 0]
        res = self.D(uu)
        return res if boundary else res[..., 1:-1, 1:-1, 1:-1]

    __call__ = residual
