"""NODE experiment drivers: train -> PRE residual -> marginal CP -> inversion.

Reproduces the reference NODE studies' skeleton for all four problems:
  sho | dho          — constant-coefficient composite kernels
                       (`Inverse_residuals/DHO/DHO_NODE.py`,
                       `Inverted_bounds/SHO.py`)
  bessel             — variable-coefficient residual, non-autonomous NODE
                       (`Inverse_residuals/Bessel/Bessel_NODE.py:373-389`
                       residual analysis; :340-371 trajectory families)
  cauchy_euler       — variable-coefficient residual (the reference's
                       `Cauchy_Euler/Cauchy_Euler_NODE` is an empty
                       placeholder; this driver applies the Bessel
                       pipeline to the Cauchy-Euler problem)

Each mode: fit a NODE to a trajectory, roll out a calibration and a
prediction family over random ICs, compute ConvOps_0d residuals on the
position channel, calibrate per-cell (marginal) CP bounds, and check the
inversion round-trip `integrate(differentiate(x))` (DHO_NODE.py:537-548;
for the variable-coefficient problems the round-trip runs through the
leading-order constant-coefficient operator D_tt — the reference's own
`analyze_residuals` stops at a "simplified placeholder" for inversion,
Bessel_NODE.py:520-526).

Run: ``python -m cppre.node.experiments [sho|dho|bessel|cauchy_euler]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cp.inductive import calibrate, emp_cov
from ..ops.convops import ConvOperator0d
from .models import ODEFunc, fit_node, neural_odeint
from .problems import (
    bessel_residual,
    bessel_state,
    cauchy_euler_residual,
    cauchy_euler_state,
    dho_residual_kernel,
    dho_solution,
    sho_residual_kernel,
    sho_solution,
)

__all__ = ["run", "PROBLEMS"]

PROBLEMS = ("sho", "dho", "bessel", "cauchy_euler")

# Cauchy-Euler coefficients for the driver: a=1, b=1 gives the bounded
# oscillatory branch y = c1*cos(ln t) + c2*sin(ln t) on t > 0.
_CE_A, _CE_B = 1.0, 1.0


def _trajectories(problem: str, n: int, t, seed: int = 0):
    """Family of trajectories over random ICs/coefficients -> [n, Nt, 2].

    sho/dho: [x0, v0] ~ U (the reference samples ICs per experiment);
    bessel:  amplitude ~ U(0.5, 1.5) on A*J_0 (Bessel_NODE.py:353-360);
    cauchy_euler: (c1, c2) ~ U on the oscillatory closed form.
    """
    rng = np.random.RandomState(seed)
    if problem in ("sho", "dho"):
        x0s = rng.uniform(0.5, 1.5, n)
        v0s = rng.uniform(-0.5, 0.5, n)
        sol = sho_solution if problem == "sho" else dho_solution
        xs = np.stack([sol(t, x0, v0) for x0, v0 in zip(x0s, v0s)])
        vs = np.gradient(xs, t, axis=1)
        return np.stack([xs, vs], axis=-1).astype(np.float32)
    if problem == "bessel":
        amps = rng.uniform(0.5, 1.5, n)
        return np.stack([bessel_state(t, amp) for amp in amps])
    if problem == "cauchy_euler":
        c1s = rng.uniform(0.5, 1.5, n)
        c2s = rng.uniform(-0.5, 0.5, n)
        return np.stack([cauchy_euler_state(t, c1, c2, _CE_A, _CE_B)
                         for c1, c2 in zip(c1s, c2s)])
    raise ValueError(f"unknown problem {problem!r} (one of {PROBLEMS})")


def _domain(problem: str, Nt: int, t_end: float | None):
    """Time grid per problem: the variable-coefficient problems start away
    from their t=0 singularity (the reference starts Bessel at 0.01 for
    n>0, Bessel_NODE.py:551-553; Cauchy-Euler is singular at 0)."""
    if problem in ("sho", "dho"):
        return np.linspace(0.0, 10.0 if t_end is None else t_end,
                           Nt).astype(np.float32)
    if problem == "bessel":
        return np.linspace(0.5, 12.0 if t_end is None else t_end,
                           Nt).astype(np.float32)
    return np.linspace(1.0, 8.0 if t_end is None else t_end,
                       Nt).astype(np.float32)


def _residuals(problem: str, t, fields):
    """Per-cell PRE on the position channel -> [n, L_interior]."""
    dt = float(t[1] - t[0])
    if problem in ("sho", "dho"):
        D = (sho_residual_kernel(dt) if problem == "sho"
             else dho_residual_kernel(dt))
        return D(fields)[..., 2:-2], D
    if problem == "bessel":
        res = jax.vmap(lambda y: bessel_residual(y, t))(fields)
    else:
        res = jax.vmap(lambda y: cauchy_euler_residual(y, t, _CE_A, _CE_B))(
            fields)
    # leading-order operator for the inversion round-trip
    return res[..., 3:-3], ConvOperator0d(order=2)


def run(problem: str = "sho", n_train: int = 4, n_cal: int = 32, n_pred: int = 16,
        Nt: int = 100, t_end: float | None = None, epochs: int = 300,
        alpha: float = 0.1, seed: int = 0, verbose: bool = True):
    if problem not in PROBLEMS:
        raise ValueError(f"unknown problem {problem!r} (one of {PROBLEMS})")
    t = _domain(problem, Nt, t_end)
    time_dependent = problem in ("bessel", "cauchy_euler")

    train = _trajectories(problem, n_train, t, seed)
    model = ODEFunc(hidden_dim=50, state_dim=2, time_dependent=time_dependent)
    # fit on the first trajectory (reference trains single-IC NODEs)
    params = fit_node(model, train[0, 0], t, train[0], epochs=epochs, seed=seed,
                      verbose=verbose)

    cal = _trajectories(problem, n_cal, t, seed + 1)
    pred = _trajectories(problem, n_pred, t, seed + 2)

    def rollout(states):
        return jnp.stack([neural_odeint(model, params, s[0], t) for s in states])

    cal_pred = rollout(cal)
    pred_pred = rollout(pred)

    res_cal, D = _residuals(problem, t, cal_pred[..., 0])
    res_pred, _ = _residuals(problem, t, pred_pred[..., 0])

    scores = jnp.abs(res_cal)
    qhat = calibrate(scores, n_cal, alpha)
    coverage = emp_cov((-qhat, qhat), res_pred)

    # inversion round-trip: integrate(differentiate(x)) ~ x away from edges
    # (the roundtrip trims k//2 cells per side; align on the shared interior)
    x = jnp.asarray(cal[:1, :, 0])
    recovered = D.integrate(D.differentiate(x))
    L = recovered.shape[-1] - 6
    roundtrip_err = float(jnp.abs(recovered[0, 3 : 3 + L] - x[0, 3 : 3 + L]).max())

    results = {
        "problem": problem,
        "mse": float(jnp.mean((pred_pred[..., 0] - jnp.asarray(pred[..., 0])) ** 2)),
        "coverage": float(coverage), "alpha": alpha,
        "qhat": np.asarray(qhat), "roundtrip_err": roundtrip_err,
    }
    if verbose:
        print(f"{problem}: NODE MSE {results['mse']:.3e}, "
              f"coverage {coverage:.3f} (1-alpha = {1-alpha}), "
              f"inversion roundtrip err {roundtrip_err:.3e}")
    return results


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "sho")
