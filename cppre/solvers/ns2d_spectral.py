"""2-D incompressible Navier-Stokes, vorticity-streamfunction pseudospectral.

Rebuild of `Neural_PDE.Numerical_Solvers.Navier_Stokes.NS_2D_spectral` (API
from call sites: `Navier_Stokes_2d(N, tStart, tEnd, dt, nu, L, aa, bb)` with
`.solve() -> (u, v, p, w, x, t, err)`, fields [Nt, N, N];
`/root/reference/Joint/NS_Residuals_CP.py:74-85,115-135` — N=400, dt=1e-3,
nu=1e-3, tEnd=0.5, then sliced `[::10, ::4, ::4]`).

The IC is a periodic double-vortex streamfunction parameterised by the LHS
design (aa, bb) in [0.5, 1]^2 ("parametrisation of initial Vx/Vy",
`Joint/NS_Residuals_CP.py:82-83,200-201`):
    psi0 = (aa/(2 pi)) sin(2 pi x/L) sin(2 pi y/L)
         + (bb/(2 pi)) cos(2 pi x/L) cos(2 pi y/L),
    u = d(psi)/dy, v = -d(psi)/dx   (divergence-free by construction).

Scheme: vorticity equation w_t + u.grad(w) = nu lap(w); exact viscous
integrating factor + RK4 on the 2/3-dealiased advection term; streamfunction
by spectral Poisson solve; pressure recovered per stored frame from
lap(p) = 2 (u_x v_y - u_y v_x); `err` is max |div(u)| over stored frames.
Time loop is `lax.scan` storing every `store_every`-th frame (the reference
stores every step and slices after — storing sliced frames directly keeps
the [Nt, 400, 400] trajectory in HBM).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NavierStokes2D", "ns_solve", "ns_solve_batch"]


def _make_grid(N: int, L: float):
    x = np.linspace(0.0, L, N, endpoint=False, dtype=np.float32)
    dx = float(x[1] - x[0])
    k = 2 * np.pi * np.fft.fftfreq(N, d=dx)
    kx, ky = np.meshgrid(k, k, indexing="ij")
    k2 = kx**2 + ky**2
    k2_inv = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    kcut = np.max(np.abs(k)) * 2.0 / 3.0
    dealias = ((np.abs(kx) < kcut) & (np.abs(ky) < kcut)).astype(np.float32)
    return x, dx, kx, ky, k2, k2_inv, dealias


@partial(jax.jit, static_argnums=(2, 3, 4))
def _ns_solve(params, grid, N: int, n_steps: int, store_every: int):
    aa, bb = params[0], params[1]
    X, Y, kx, ky, k2, k2_inv, dealias, dt, nu, L = grid
    two_pi = 2 * jnp.pi / L
    psi0 = (aa / two_pi) * jnp.sin(two_pi * X) * jnp.sin(two_pi * Y) + (
        bb / two_pi
    ) * jnp.cos(two_pi * X) * jnp.cos(two_pi * Y)
    psi0_hat = jnp.fft.fft2(psi0)
    w0_hat = k2 * psi0_hat  # w = -lap(psi)

    ikx, iky = 1j * kx, 1j * ky
    E = jnp.exp(-nu * k2 * dt)
    E2 = jnp.exp(-nu * k2 * dt / 2.0)

    def velocity(w_hat):
        psi_hat = w_hat * k2_inv
        u = jnp.real(jnp.fft.ifft2(iky * psi_hat))
        v = jnp.real(jnp.fft.ifft2(-ikx * psi_hat))
        return u, v

    def nonlinear(w_hat):
        u, v = velocity(w_hat)
        wx = jnp.real(jnp.fft.ifft2(ikx * w_hat))
        wy = jnp.real(jnp.fft.ifft2(iky * w_hat))
        return -jnp.fft.fft2(u * wx + v * wy) * dealias

    def rk4_step(w_hat):
        k1 = nonlinear(w_hat)
        k2_ = nonlinear(E2 * (w_hat + dt / 2 * k1))
        k3 = nonlinear(E2 * w_hat + dt / 2 * k2_)
        k4 = nonlinear(E * w_hat + dt * E2 * k3)
        return E * w_hat + dt / 6 * (E * k1 + 2 * E2 * (k2_ + k3) + k4)

    def fields_of(w_hat):
        u, v = velocity(w_hat)
        ux = jnp.real(jnp.fft.ifft2(ikx * jnp.fft.fft2(u)))
        uy = jnp.real(jnp.fft.ifft2(iky * jnp.fft.fft2(u)))
        vx = jnp.real(jnp.fft.ifft2(ikx * jnp.fft.fft2(v)))
        vy = jnp.real(jnp.fft.ifft2(iky * jnp.fft.fft2(v)))
        rhs = 2.0 * (ux * vy - uy * vx)
        p = jnp.real(jnp.fft.ifft2(-jnp.fft.fft2(rhs) * k2_inv))
        w = jnp.real(jnp.fft.ifft2(jnp.fft.fft2(vx - uy)))
        div_err = jnp.max(jnp.abs(ux + vy))
        return u, v, p, w, div_err

    def outer(w_hat, _):
        w_hat = jax.lax.fori_loop(0, store_every, lambda i, wh: rk4_step(wh), w_hat)
        return w_hat, fields_of(w_hat)

    n_store = n_steps // store_every
    u0, v0, p0, ww0, e0 = fields_of(w0_hat)
    _, (us, vs, ps, ws, errs) = jax.lax.scan(outer, w0_hat, None, length=n_store)

    u = jnp.concatenate((u0[None], us), axis=0)
    v = jnp.concatenate((v0[None], vs), axis=0)
    p = jnp.concatenate((p0[None], ps), axis=0)
    w = jnp.concatenate((ww0[None], ws), axis=0)
    err = jnp.maximum(e0, jnp.max(errs))
    return u, v, p, w, err


class NavierStokes2D:
    """OO wrapper matching the reference solver's surface."""

    def __init__(self, N: int, tStart: float, tEnd: float, dt: float,
                 nu: float, L: float, aa: float = 1.0, bb: float = 1.0,
                 store_every: int = 1):
        self.N, self.dt, self.nu, self.L = N, dt, nu, L
        self.tStart, self.tEnd = tStart, tEnd
        self.aa, self.bb = aa, bb
        self.store_every = store_every
        self.n_steps = max(int(round((tEnd - tStart) / dt)), store_every)
        x, dx, kx, ky, k2, k2_inv, dealias = _make_grid(N, L)
        self.x, self.dx = x, dx
        X, Y = np.meshgrid(x, x, indexing="ij")
        self._grid = (
            jnp.asarray(X), jnp.asarray(Y),
            jnp.asarray(kx, jnp.float32), jnp.asarray(ky, jnp.float32),
            jnp.asarray(k2, jnp.float32), jnp.asarray(k2_inv, jnp.float32),
            jnp.asarray(dealias), dt, nu, L,
        )
        self.t = np.arange(self.n_steps // store_every + 1) * dt * store_every

    def solve(self, aa: float | None = None, bb: float | None = None):
        p = jnp.asarray(
            [self.aa if aa is None else aa, self.bb if bb is None else bb],
            dtype=jnp.float32,
        )
        u, v, pr, w, err = _ns_solve(p, self._grid, self.N, self.n_steps, self.store_every)
        return (np.asarray(u), np.asarray(v), np.asarray(pr), np.asarray(w),
                self.x, self.t, float(err))

    def solve_batch(self, params):
        """[n, 2] -> (u, v, p, w) each [n, Nt, N, N] on-device."""
        fn = jax.vmap(
            lambda p: _ns_solve(p, self._grid, self.N, self.n_steps, self.store_every)[:4]
        )
        return fn(jnp.asarray(params, dtype=jnp.float32))


def ns_solve(params, N, tStart, tEnd, dt, nu, L, store_every=1):
    sim = NavierStokes2D(N, tStart, tEnd, dt, nu, L, store_every=store_every)
    return sim.solve(params[0], params[1])


def ns_solve_batch(params, N, tStart, tEnd, dt, nu, L, store_every=1):
    sim = NavierStokes2D(N, tStart, tEnd, dt, nu, L, store_every=store_every)
    return sim.solve_batch(params), sim.x, sim.t
