"""2-D wave equation, Fourier pseudospectral: u_tt = c^2 (u_xx + u_yy).

Rebuild of `Neural_PDE.Numerical_Solvers.Wave.Wave_2D_Spectral` (API from
call sites: `Wave_2D(Nx, x_min, x_max, tend, c)` with `.dt`, `.dx`,
`.initialise(Lambda, aa, bb)` / `.vv`, `.solve([Lambda, aa, bb])` returning
`(x, y, t, u [Nt, Nx, Ny])`; `/root/reference/Joint/Wave_Residuals_CP.py:
76-118`, `Active_Learning/Wave_AL_Joint.py:124`). IC is a Gaussian bump
`u0 = exp(-Lambda ((x-aa)^2 + (y-bb)^2))` at rest (u_t(0) = 0); parameter
bounds (amplitude/sharpness 10..50, centres 0.1..0.5) from
`Active_Learning/Wave_AL_Joint.py:217-218`.

Scheme: leapfrog in time, exact spectral Laplacian (periodic). 101 time
frames over [0, tend] so the experiments' `t_slice=5` yields 21 frames =
T_in 1 + T_out 20 (`Joint/Wave_Residuals_CP.py:85`). The time loop is a
`lax.scan`; `wave_solve_batch` vmaps over the LHS design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Wave2D", "wave_solve_batch"]

_NT = 101  # time frames incl. t=0


def _laplacian_fft(u, k2):
    return jnp.real(jnp.fft.ifft2(-k2 * jnp.fft.fft2(u)))


@partial(jax.jit, static_argnums=(2,))
def _wave_solve(params, grid, Nt: int):
    Lambda, aa, bb = params[0], params[1], params[2]
    X, Y, k2, dt, c = grid
    u0 = jnp.exp(-Lambda * ((X - aa) ** 2 + (Y - bb) ** 2))

    # leapfrog bootstrap: u(-dt) = u(dt) for u_t(0)=0 => first step is
    # u1 = u0 + (c dt)^2/2 * lap(u0)
    lap0 = _laplacian_fft(u0, k2)
    u1 = u0 + 0.5 * (c * dt) ** 2 * lap0

    def step(carry, _):
        um1, u = carry
        u_next = 2.0 * u - um1 + (c * dt) ** 2 * _laplacian_fft(u, k2)
        return (u, u_next), u_next

    _, us = jax.lax.scan(step, (u0, u1), None, length=Nt - 2)
    return jnp.concatenate((u0[None], u1[None], us), axis=0)


class Wave2D:
    """OO wrapper matching the reference solver's surface."""

    def __init__(self, Nx: int, x_min: float, x_max: float, tend: float,
                 c: float, dt_scale: float = 1.0):
        """dt_scale < 1 refines the leapfrog step (Nt grows accordingly)
        while keeping the [0, tend] horizon — for time-convergence studies;
        the default reproduces the reference's 101-frame grid."""
        self.Nx = Nx
        self.x_min, self.x_max = x_min, x_max
        self.tend, self.c = tend, c
        self.x = np.linspace(x_min, x_max, Nx, endpoint=False, dtype=np.float32)
        self.y = self.x.copy()
        self.dx = float(self.x[1] - self.x[0])
        self.Nt = int(round((_NT - 1) / dt_scale)) + 1
        self.dt = tend / (self.Nt - 1)
        self.t = np.arange(self.Nt, dtype=np.float32) * self.dt
        L = x_max - x_min
        k = 2 * np.pi * np.fft.fftfreq(Nx, d=self.dx)
        kx, ky = np.meshgrid(k, k, indexing="ij")
        self._k2 = jnp.asarray(kx**2 + ky**2, dtype=jnp.float32)
        X, Y = np.meshgrid(self.x, self.y, indexing="ij")
        self._X, self._Y = jnp.asarray(X), jnp.asarray(Y)
        self.vv = None
        # leapfrog + spectral Laplacian stability: c*dt*k_max < 2
        assert c * self.dt * float(np.max(np.abs(k))) * np.sqrt(2) < 2.0, "unstable dt"

    def _grid(self):
        return (self._X, self._Y, self._k2, self.dt, self.c)

    def initialise(self, Lambda: float, aa: float, bb: float):
        self.vv = np.asarray(
            jnp.exp(-Lambda * ((self._X - aa) ** 2 + (self._Y - bb) ** 2))
        )
        return self.vv

    def solve(self, Lambda: float = 20.0, aa: float = 0.25, bb: float = 0.25):
        u = _wave_solve(
            jnp.asarray([Lambda, aa, bb], dtype=jnp.float32), self._grid(), self.Nt
        )
        return self.x, self.y, self.t, np.asarray(u)

    def solve_batch(self, params):
        """[n, 3] (Lambda, aa, bb) -> u [n, Nt, Nx, Ny] on-device."""
        fn = jax.vmap(lambda p: _wave_solve(p, self._grid(), self.Nt))
        return fn(jnp.asarray(params, dtype=jnp.float32))

    def solve_from(self, u0):
        """Integrate from an arbitrary at-rest initial field [Nx, Ny]
        (e.g. analytic standing waves for solver validation)."""
        u0 = jnp.asarray(u0, jnp.float32)
        lap0 = _laplacian_fft(u0, self._k2)
        u1 = u0 + 0.5 * (self.c * self.dt) ** 2 * lap0

        def step(carry, _):
            um1, u = carry
            u_next = (2.0 * u - um1
                      + (self.c * self.dt) ** 2 * _laplacian_fft(u, self._k2))
            return (u, u_next), u_next

        _, us = jax.lax.scan(step, (u0, u1), None, length=self.Nt - 2)
        return np.asarray(jnp.concatenate((u0[None], u1[None], us), axis=0))


def wave_solve_batch(params, Nx, x_min, x_max, tend, c):
    sim = Wave2D(Nx, x_min, x_max, tend, c)
    return sim.x, sim.y, sim.t, sim.solve_batch(params)
