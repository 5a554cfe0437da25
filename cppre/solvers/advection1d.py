"""1-D linear advection solver: u_t + v u_x = 0, periodic, Gaussian pulse IC.

Rebuild of `Neural_PDE.Numerical_Solvers.Advection.Advection_1D` (API from
call sites, `/root/reference/Marginal/Advection_Residuals_CP.py:83-130`):
`Advection_1d(Nx, Nt, x_min, x_max, t_end)` exposing `.dt`, `.dx`,
`.initializeU(xc, amp)` / `.u`, and `.solve(xc, amp, v)` returning
`(x, t, u_soln, u_exact)` with `u_soln` shaped [Nt, Nx] — a first-order
upwind finite-difference solution plus the exact advected profile.

The IC is a Gaussian pulse `u0 = exp(-amp * (x - xc)^2)` (amp in [50, 200] is
the sharpness, xc in [0.5, 1.0] the centre — the LHS bounds at
`Marginal/Advection_Residuals_CP.py:150-151`). The time loop is a `lax.scan`;
`advection_solve_batch` vmaps it over an [n, 2] parameter design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Advection1D", "advection_solve", "advection_solve_batch"]


def _gaussian_ic(x, xc, amp):
    return jnp.exp(-amp * (x - xc) ** 2)


@partial(jax.jit, static_argnums=(3, 4))
def advection_solve(params, v, grid, Nx: int, Nt: int):
    """Upwind FD + exact solution. params = (xc, amp); grid = (x, dx, dt).

    Returns (u_soln [Nt, Nx], u_exact [Nt, Nx]).
    """
    xc, amp = params[0], params[1]
    x, dx, dt = grid
    u0 = _gaussian_ic(x, xc, amp)
    cfl = v * dt / dx

    def step(u, t):
        # first-order upwind (v > 0), periodic wrap
        u_new = u - cfl * (u - jnp.roll(u, 1))
        return u_new, u_new

    _, us = jax.lax.scan(step, u0, jnp.arange(1, Nt))
    u_soln = jnp.concatenate((u0[None], us), axis=0)

    t = jnp.arange(Nt) * dt
    L = x[-1] - x[0] + dx
    # exact: profile advected with periodic wrapping
    xs = jnp.mod(x[None, :] - v * t[:, None] - x[0], L) + x[0]
    u_exact = _gaussian_ic(xs, xc, amp)
    return u_soln, u_exact


class Advection1D:
    """OO wrapper matching the reference solver's surface."""

    def __init__(self, Nx: int, Nt: int, x_min: float, x_max: float, t_end: float):
        self.Nx, self.Nt = Nx, Nt
        self.x_min, self.x_max, self.t_end = x_min, x_max, t_end
        self.x = np.linspace(x_min, x_max, Nx, dtype=np.float32)
        self.dx = float(self.x[1] - self.x[0])
        self.dt = t_end / (Nt - 1)
        self.t = np.arange(Nt, dtype=np.float32) * self.dt
        self.u = None

    def initializeU(self, xc: float, amp: float):
        self.u = np.asarray(_gaussian_ic(jnp.asarray(self.x), xc, amp))
        return self.u

    def solve(self, xc: float, amp: float, v: float):
        grid = (jnp.asarray(self.x), self.dx, self.dt)
        u_soln, u_exact = advection_solve(
            jnp.asarray([xc, amp], dtype=jnp.float32), v, grid, self.Nx, self.Nt
        )
        return self.x, self.t, np.asarray(u_soln), np.asarray(u_exact)

    def solve_batch(self, params, v: float):
        """[n, 2] (xc, amp) design -> u_soln [n, Nt, Nx] on-device (vmap)."""
        grid = (jnp.asarray(self.x), self.dx, self.dt)
        fn = jax.vmap(lambda p: advection_solve(p, v, grid, self.Nx, self.Nt)[0])
        return fn(jnp.asarray(params, dtype=jnp.float32))


def advection_solve_batch(params, v, Nx, Nt, x_min, x_max, t_end):
    """Functional batch API: params [n, 2] -> (x, t, u [n, Nt, Nx])."""
    sim = Advection1D(Nx, Nt, x_min, x_max, t_end)
    return sim.x, sim.t, sim.solve_batch(params, v)
