"""2-D ideal MHD, finite-volume with constrained transport (div B = 0).

Rebuild of `Neural_PDE.Numerical_Solvers.MHD.ConstrainedMHD_2D` (API from
call sites: `solve(N, boxsize, tEnd, a, b, c) -> (rho, u, v, p, bx, by, dt,
x, err)`, fields [Nt, N, N]; `/root/reference/Joint/MHD_Residuals_CP.py:
74-140` — N=128, boxsize=1, tEnd=0.5, dt=1e-4, t_slice=25, LHS design
(a, b, c) in [0.5, 1]^3 :206-207).

The IC is a parameterised Orszag-Tang vortex (gamma = 5/3, mu0 = 1):
    rho = (25/9) c,  p_gas = (5/3) c,
    v   = a (-sin(2 pi y),  sin(2 pi x)),
    B   = (b/sqrt(4 pi)) (-sin(2 pi y),  sin(4 pi x)).
The returned `p` is the TOTAL pressure p_gas + |B|^2/2 — the reference's
energy residual recovers p_gas as `p - 0.5 |B|^2`
(`Joint/MHD_Residuals_CP.py:247-256`, SURVEY.md §2.4).

Scheme: 2nd-order MUSCL-Hancock finite volume with Rusanov fluxes for the
hydro+induction system, and constrained transport of face-centred B via
corner EMFs so div B stays at machine precision (`err` = max |div B| dx).
Periodic domain. Fixed dt (the script's 1e-4); the time loop is a
`lax.scan` storing every `store_every`-th frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mhd_solve", "mhd_solve_batch"]

GAMMA = 5.0 / 3.0


def _roll(f, sx, sy):
    return jnp.roll(jnp.roll(f, sx, axis=0), sy, axis=1)


def _grad(f, dx):
    """Central-difference gradients (periodic)."""
    fx = (_roll(f, -1, 0) - _roll(f, 1, 0)) / (2 * dx)
    fy = (_roll(f, 0, -1) - _roll(f, 0, 1)) / (2 * dx)
    return fx, fy


def _get_conserved(rho, vx, vy, P_gas, bx, by):
    mx, my = rho * vx, rho * vy
    E = P_gas / (GAMMA - 1) + 0.5 * rho * (vx**2 + vy**2) + 0.5 * (bx**2 + by**2)
    return rho, mx, my, E


def _get_primitive(rho, mx, my, E, bx, by):
    vx, vy = mx / rho, my / rho
    P_gas = (GAMMA - 1) * (E - 0.5 * rho * (vx**2 + vy**2) - 0.5 * (bx**2 + by**2))
    return vx, vy, P_gas


def _max_speed(rho, vx, vy, P_gas, bx, by):
    b2 = bx**2 + by**2
    cf2 = (GAMMA * P_gas + b2) / rho  # fast-speed bound
    return jnp.sqrt(vx**2 + vy**2) + jnp.sqrt(jnp.maximum(cf2, 0.0))


def _flux_x(rho, vx, vy, P_gas, bx, by):
    """Ideal-MHD flux in x for (rho, mx, my, E, by)."""
    Pt = P_gas + 0.5 * (bx**2 + by**2)
    E = P_gas / (GAMMA - 1) + 0.5 * rho * (vx**2 + vy**2) + 0.5 * (bx**2 + by**2)
    f_rho = rho * vx
    f_mx = rho * vx**2 + Pt - bx**2
    f_my = rho * vx * vy - bx * by
    f_E = (E + Pt) * vx - bx * (vx * bx + vy * by)
    f_by = by * vx - bx * vy  # = -Ez
    return f_rho, f_mx, f_my, f_E, f_by


def _rusanov_x(qL, qR):
    """Rusanov flux at x-interfaces. q = (rho, vx, vy, P_gas, bx, by)."""
    fL = _flux_x(*qL)
    fR = _flux_x(*qR)
    sL = _max_speed(*qL)
    sR = _max_speed(*qR)
    smax = jnp.maximum(sL, sR)
    uL = _get_conserved(*qL)
    uR = _get_conserved(*qR)
    consL = uL + (qL[5],)  # add by as a conserved for the 1-D x-sweep
    consR = uR + (qR[5],)
    return tuple(
        0.5 * (fl + fr) - 0.5 * smax * (cr - cl)
        for fl, fr, cl, cr in zip(fL, fR, consL, consR)
    )


def _interface_states_x(prims, dx, dt):
    """MUSCL: slope-extrapolated L/R states at x-interfaces (between cell
    i-1 and i, stored at index i). With the script's dt = 1e-4 (CFL ~ 0.03)
    spatial reconstruction dominates the error, so no Hancock half-step."""
    grads = [_grad(f, dx) for f in prims]
    qL = tuple(_roll(f + 0.5 * dx * gx, 1, 0) for f, (gx, gy) in zip(prims, grads))
    qR = tuple(f - 0.5 * dx * gx for f, (gx, gy) in zip(prims, grads))
    return qL, qR, prims, grads


def _swap(q):
    """Swap x<->y roles: (rho, vx, vy, P, bx, by) -> (rho, vy, vx, P, by, bx),
    with all fields transposed."""
    rho, vx, vy, P, bx, by = (f.T for f in q)
    return (rho, vy, vx, P, by, bx)


@partial(jax.jit, static_argnums=(1, 2, 3))
def _mhd_run(params, N: int, n_steps: int, store_every: int, dx=None, dt=None):
    a, b, c = params[0], params[1], params[2]
    dx = 1.0 / N if dx is None else dx
    x = (jnp.arange(N) + 0.5) * dx
    X, Y = jnp.meshgrid(x, x, indexing="ij")
    two_pi = 2 * jnp.pi

    rho0 = (25.0 / 9.0) * c * jnp.ones((N, N))
    vx0 = -a * jnp.sin(two_pi * Y)
    vy0 = a * jnp.sin(two_pi * X)
    P0 = (5.0 / 3.0) * c * jnp.ones((N, N))
    B0 = b / jnp.sqrt(4 * jnp.pi)
    # face-centred B from a vector potential Az so div B = 0 exactly:
    # Az = B0 (cos(2 pi y)/(2 pi) + cos(4 pi x)/(4 pi))
    # bx_face at (i-1/2, j): dAz/dy ; by_face at (i, j-1/2): -dAz/dx
    xf = jnp.arange(N) * dx  # face coordinates
    Xf, Yc = jnp.meshgrid(xf, x, indexing="ij")
    Xc, Yf = jnp.meshgrid(x, xf, indexing="ij")
    Az = lambda xx, yy: B0 * (jnp.cos(two_pi * yy) / two_pi + jnp.cos(2 * two_pi * xx) / (2 * two_pi))
    # exact face-averaged derivative via difference of Az at corners
    Azc = Az(Xf, Yf)  # corner values at (i-1/2, j-1/2)
    bxf0 = (jnp.roll(Azc, -1, axis=1) - Azc) / dx  # dAz/dy on x-faces
    byf0 = -(jnp.roll(Azc, -1, axis=0) - Azc) / dx  # -dAz/dx on y-faces

    def cell_B(bxf, byf):
        bx = 0.5 * (bxf + jnp.roll(bxf, -1, axis=0))
        by = 0.5 * (byf + jnp.roll(byf, -1, axis=1))
        return bx, by

    bx0, by0 = cell_B(bxf0, byf0)
    U0 = _get_conserved(rho0, vx0, vy0, P0, bx0, by0)

    def step(state):
        (rho_c, mx, my, E), bxf, byf = state
        bx, by = cell_B(bxf, byf)
        vx, vy, P = _get_primitive(rho_c, mx, my, E, bx, by)
        prims = (rho_c, vx, vy, P, bx, by)

        # x-sweep fluxes
        qL, qR, _, _ = _interface_states_x(prims, dx, dt)
        Fx = _rusanov_x(qL, qR)  # (rho, mx, my, E, by) fluxes at x-faces

        # y-sweep via transpose symmetry
        primsT = _swap(prims)
        qLT, qRT, _, _ = _interface_states_x(primsT, dx, dt)
        FyT = _rusanov_x(qLT, qRT)
        # un-swap: fluxes for (rho, my, mx, E, bx) at y-faces (transposed)
        Fy = tuple(f.T for f in FyT)
        Gy = (Fy[0], Fy[2], Fy[1], Fy[3], Fy[4])  # (rho, mx, my, E, bx-flux)

        def div_x(F):
            return (jnp.roll(F, -1, axis=0) - F) / dx

        def div_y(F):
            return (jnp.roll(F, -1, axis=1) - F) / dx

        rho_n = rho_c - dt * (div_x(Fx[0]) + div_y(Gy[0]))
        mx_n = mx - dt * (div_x(Fx[1]) + div_y(Gy[1]))
        my_n = my - dt * (div_x(Fx[2]) + div_y(Gy[2]))
        E_n = E - dt * (div_x(Fx[3]) + div_y(Gy[3]))

        # Constrained transport: corner EMF Ez from the induction fluxes.
        # Fx[4] = (by vx - bx vy) at x-faces = -Ez ; Gy[4] = (bx vy - by vx)
        # at y-faces = +Ez. Average the four adjacent face values to corners.
        emf_x = -Fx[4]  # Ez sampled at x-faces
        emf_y = Gy[4]   # Ez sampled at y-faces
        Ez = 0.25 * (emf_x + _roll(emf_x, 0, 1) + emf_y + _roll(emf_y, 1, 0))
        # Faraday: d(bxf)/dt = -dEz/dy at x-faces, d(byf)/dt = +dEz/dx
        bxf_n = bxf - dt * (jnp.roll(Ez, -1, axis=1) - Ez) / dx
        byf_n = byf + dt * (jnp.roll(Ez, -1, axis=0) - Ez) / dx

        return (rho_n, mx_n, my_n, E_n), bxf_n, byf_n

    def observe(state):
        (rho_c, mx, my, E), bxf, byf = state
        bx, by = cell_B(bxf, byf)
        vx, vy, P = _get_primitive(rho_c, mx, my, E, bx, by)
        Pt = P + 0.5 * (bx**2 + by**2)
        divB = (jnp.roll(bxf, -1, axis=0) - bxf + jnp.roll(byf, -1, axis=1) - byf) / dx
        return rho_c, vx, vy, Pt, bx, by, jnp.max(jnp.abs(divB)) * dx

    def outer(state, _):
        state = jax.lax.fori_loop(0, store_every, lambda i, s: step(s), state)
        return state, observe(state)

    n_store = n_steps // store_every
    obs0 = observe((U0, bxf0, byf0))
    _, obs = jax.lax.scan(outer, (U0, bxf0, byf0), None, length=n_store)
    out = tuple(jnp.concatenate((o0[None], os), axis=0) for o0, os in zip(obs0[:6], obs[:6]))
    err = jnp.maximum(obs0[6], jnp.max(obs[6]))
    return out + (err,)


def mhd_solve(N: int, boxsize: float, tEnd: float, a: float, b: float, c: float,
              dt: float = 1e-4, store_every: int = 25):
    """Reference-shaped entry point: returns (rho, u, v, p, bx, by, dt, x, err).

    Stored frames are every `store_every * dt` apart (the reference stores
    every step and slices `[::25]` after; storing sliced frames directly is
    equivalent and keeps the trajectory in memory)."""
    dx = boxsize / N
    n_steps = int(round(tEnd / dt))
    params = jnp.asarray([a, b, c], dtype=jnp.float32)
    run = partial(_mhd_run, dx=dx, dt=dt)
    rho, u, v, p, bx, by, err = run(params, N, n_steps, store_every)
    x = (np.arange(N) + 0.5) * dx
    return (np.asarray(rho), np.asarray(u), np.asarray(v), np.asarray(p),
            np.asarray(bx), np.asarray(by), dt, x, float(err))


def mhd_solve_batch(params, N: int, boxsize: float, tEnd: float,
                    dt: float = 1e-4, store_every: int = 25):
    """[n, 3] design -> stacked fields [n, Nt, N, N] each, on-device."""
    dx = boxsize / N
    n_steps = int(round(tEnd / dt))
    run = partial(_mhd_run, dx=dx, dt=dt)
    fn = jax.vmap(lambda p: run(p, N, n_steps, store_every)[:6])
    return fn(jnp.asarray(params, dtype=jnp.float32))
