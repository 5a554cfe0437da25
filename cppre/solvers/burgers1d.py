"""1-D viscous Burgers: u_t + u u_x = nu u_xx, periodic, Fourier pseudospectral.

Rebuild of `Neural_PDE.Numerical_Solvers.Burgers.Burgers_1D` (API from call
sites: `Burgers_1D(Nx, Nt, x_min, x_max, t_end, nu)`, `.solve() ->
(u_soln [Nt, Nx], x, dt)`; `/root/reference/Active_Learning/
Burgers_AL_Joint.py:83-107`, nu = 0.002 :91). The IC is a 3-mode sine sum
`u0 = a sin(pi x) + b sin(2 pi x) + c sin(3 pi x)` with (a, b, c) drawn from
the LHS box [-3, 3]^3 (`Burgers_AL_Joint.py:203-204`).

Scheme: exact viscous integrating factor in spectral space + RK4 on the
dealiased nonlinear term, `lax.scan` over time, vmap over the design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Burgers1D", "burgers_solve_batch"]


@partial(jax.jit, static_argnums=(2, 3, 4))
def _burgers_solve(params, grid, Nx: int, Nt: int, substeps: int = 1):
    a, b, c = params[0], params[1], params[2]
    x, k, dealias, dt, nu = grid
    u0 = (
        a * jnp.sin(np.pi * x)
        + b * jnp.sin(2 * np.pi * x)
        + c * jnp.sin(3 * np.pi * x)
    )

    h = dt / substeps  # internal (stable) step; frames stored every dt
    ik = 1j * k
    E = jnp.exp(-nu * k**2 * h)
    E2 = jnp.exp(-nu * k**2 * h / 2.0)

    def nonlinear(u_hat):
        u = jnp.real(jnp.fft.ifft(u_hat))
        return -0.5 * ik * jnp.fft.fft(u * u) * dealias

    def substep(u_hat):
        # RK4 with integrating factor (classic ETD-RK style splitting)
        k1 = nonlinear(u_hat)
        k2 = nonlinear(E2 * (u_hat + h / 2 * k1))
        k3 = nonlinear(E2 * u_hat + h / 2 * k2)
        k4 = nonlinear(E * u_hat + h * E2 * k3)
        return E * u_hat + h / 6 * (E * k1 + 2 * E2 * (k2 + k3) + k4)

    def step(u_hat, _):
        u_next = jax.lax.fori_loop(0, substeps, lambda i, uh: substep(uh), u_hat)
        return u_next, jnp.real(jnp.fft.ifft(u_next))

    u0_hat = jnp.fft.fft(u0)
    _, us = jax.lax.scan(step, u0_hat, None, length=Nt - 1)
    return jnp.concatenate((u0[None], us), axis=0)


class Burgers1D:
    """OO wrapper matching the reference solver's surface."""

    def __init__(self, Nx: int, Nt: int, x_min: float, x_max: float,
                 t_end: float, nu: float, substeps: int | None = None,
                 u_max_bound: float = 10.0):
        self.Nx, self.Nt, self.nu = Nx, Nt, nu
        self.x = np.linspace(x_min, x_max, Nx, endpoint=False, dtype=np.float32)
        self.dx = float(self.x[1] - self.x[0])
        self.dt = t_end / (Nt - 1)
        if substeps is None:
            # advective CFL <= 0.4 at the worst-case amplitude bound
            substeps = max(1, int(np.ceil(self.dt * u_max_bound / (0.4 * self.dx))))
        self.substeps = substeps
        k = 2 * np.pi * np.fft.fftfreq(Nx, d=self.dx)
        dealias = (np.abs(np.fft.fftfreq(Nx)) < 1.0 / 3.0).astype(np.float32)
        self._grid = (
            jnp.asarray(self.x),
            jnp.asarray(k, dtype=jnp.float32),
            jnp.asarray(dealias),
            self.dt,
            nu,
        )

    def solve(self, a: float = 1.0, b: float = 1.0, c: float = 1.0):
        u = _burgers_solve(
            jnp.asarray([a, b, c], dtype=jnp.float32), self._grid, self.Nx, self.Nt,
            self.substeps,
        )
        return np.asarray(u), self.x, self.dt

    def solve_batch(self, params):
        fn = jax.vmap(lambda p: _burgers_solve(p, self._grid, self.Nx, self.Nt, self.substeps))
        return fn(jnp.asarray(params, dtype=jnp.float32))


def burgers_solve_batch(params, Nx, Nt, x_min, x_max, t_end, nu):
    sim = Burgers1D(Nx, Nt, x_min, x_max, t_end, nu)
    return sim.solve_batch(params), sim.x, sim.dt
