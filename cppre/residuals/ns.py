"""2-D incompressible Navier-Stokes PRE: continuity + momentum + periodic BC.

Reference: `Joint/NS_Residuals_CP.py:222-240` (continuity, momentum),
`Other_UQ/Evaluation/PRE_estimations.py:24-50` (PRE_NS momentum), and the
boundary-condition residual `Marginal/NS_Residuals_CP.py:468-495`.
Fields enter as [BS, Nvar, Nt, Nx, Ny] with Nvar = (u, v, p) — the
`stacked_fields` convention permuted for ConvOps.

Note the framework default corrects the reference's D_y bug (see
`cppre.ops.stencils.embed_kernel_3d`); pass ``legacy_y_axis=True`` for
bit-parity with reference residual values.
"""

from __future__ import annotations

from ..ops.convops import ConvOperator2d

__all__ = ["PRE_NS"]


class PRE_NS:
    def __init__(self, dt: float, dx: float, dy: float, nu: float = 0.001,
                 legacy_y_axis: bool = False):
        self.dt, self.dx, self.dy, self.nu = dt, dx, dy, nu
        self.D_t = ConvOperator2d("t", 1)
        self.D_x = ConvOperator2d("x", 1)
        self.D_y = ConvOperator2d("y", 1, legacy_y_axis=legacy_y_axis)
        self.D_xx_yy = ConvOperator2d(("x", "y"), 2)

    @staticmethod
    def _crop(res, boundary):
        return res if boundary else res[..., 1:-1, 1:-1, 1:-1]

    def residual_continuity(self, fields, boundary: bool = False):
        """div u = 0 in stencil form: D_x(u) + (dx/dy) D_y(v)
        (`Joint/NS_Residuals_CP.py:222-228`)."""
        u, v = fields[:, 0], fields[:, 1]
        res = self.D_x(u) + (self.dx / self.dy) * self.D_y(v)
        return self._crop(res, boundary)

    def residual_momentum(self, fields, boundary: bool = False):
        """Scaled momentum residual summed over components
        (`Joint/NS_Residuals_CP.py:231-240`)."""
        u, v, p = fields[:, 0], fields[:, 1], fields[:, 2]
        dt, dx, dy, nu = self.dt, self.dx, self.dy, self.nu
        res_x = (self.D_t(u) * dx * dy + u * self.D_x(u) * dt * dy
                 + v * self.D_y(u) * dt * dx - nu * self.D_xx_yy(u) * dt
                 + self.D_x(p) * dt * dy)
        res_y = (self.D_t(v) * dx * dy + u * self.D_x(v) * dt * dx
                 + v * self.D_y(v) * dt * dy - nu * self.D_xx_yy(v) * dt
                 + self.D_y(p) * dt * dx)
        return self._crop(res_x, boundary) + self._crop(res_y, boundary)

    # PRE_estimations.py uses the momentum residual as "the" NS residual
    residual = residual_momentum

    def periodic_bc_residual(self, field, wall: str = "right"):
        """CP over boundary-condition violation: difference between opposite
        walls of a periodic field [BS, Nt, Nx, Ny], scaled by dx
        (`Marginal/NS_Residuals_CP.py:468-478`)."""
        if wall == "top":
            res = field[..., 0, :] - field[..., -1, :]
        elif wall == "bottom":
            res = field[..., -1, :] - field[..., 0, :]
        elif wall == "left":
            res = field[..., :, 0] - field[..., :, -1]
        elif wall == "right":
            res = field[..., :, -1] - field[..., :, 0]
        else:
            raise ValueError(f"unknown wall {wall}")
        return res * self.dx

    __call__ = residual_momentum
