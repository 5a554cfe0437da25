"""Grad-Shafranov PRE: the GS operator residual for tokamak equilibria.

Reference: `EFIT/EFIT_cp.py:64-73` == `FreeGSNKE/GS_CP.py:272-298`:
    Delta* psi = D_RR(psi) dz^2 - (1/R) D_R(psi) dz^2 dr + D_ZZ(psi) dr^2
(norms=True, grid-scaled) or the unscaled form (norms=False). psi enters as
[BS, Nt, NR, NZ] (a singleton time axis is fine — the operators act on the
spatial planes; EFIT uses a dummy time dim).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.convops import ConvOperator2d

__all__ = ["PRE_GradShafranov"]


class PRE_GradShafranov:
    def __init__(self, R, dr: float, dz: float, legacy_y_axis: bool = False):
        self.R = jnp.asarray(R)
        if self.R.ndim == 1:
            self.R = self.R[:, None]
        self.dr, self.dz = dr, dz
        self.D_R = ConvOperator2d("x", 1)
        self.D_RR = ConvOperator2d("x", 2)
        self.D_ZZ = ConvOperator2d("y", 2, legacy_y_axis=legacy_y_axis)

    def residual(self, psi, boundary: bool = False, norms: bool = True):
        """psi: [BS, NR, NZ] (or [BS, Nt, NR, NZ] with a real time axis).

        The crop removes one spatial cell per side. (The reference crops
        `[..., 1:-1, 1:-1, 1:-1]` including the time axis, which on its own
        EFIT data — psi [N, 1, 33, 33] — slices the singleton axis to
        length zero; since the GS operator is purely spatial, only the
        spatial halo is invalid and only it is cropped here.)"""
        squeeze = psi.ndim == 3
        if squeeze:
            psi = psi[:, None]  # dummy time axis; all stencils live in the
            # t-centre plane so SAME conv over Nt=1 is exact
        if norms:
            res = (self.D_RR(psi) * self.dz**2
                   - (1 / self.R) * self.D_R(psi) * self.dz**2 * self.dr
                   + self.D_ZZ(psi) * self.dr**2)
        else:
            res = self.D_RR(psi) - (1 / self.R) * self.D_R(psi) + self.D_ZZ(psi)
        if not boundary:
            res = res[..., 1:-1, 1:-1]
        return res[:, 0] if squeeze else res

    __call__ = residual
