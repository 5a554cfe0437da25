"""NODE experiment driver: train -> PRE residual -> marginal CP -> inversion.

Reproduces the reference NODE studies' skeleton (`Inverse_residuals/DHO/
DHO_NODE.py`, `Inverted_bounds/SHO.py`): fit a NODE to a family of
trajectories, compute ConvOps_0d residuals on held-out predictions,
calibrate per-cell CP bounds, and propagate residual bounds back to
solution space via `integrate` (deconvolution) / `sets.set_PRE`.

Run: ``python -m cppre.node.experiments [sho|dho]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cp.inductive import calibrate, emp_cov
from .models import ODEFunc, fit_node, neural_odeint
from .problems import dho_residual_kernel, dho_solution, sho_residual_kernel, sho_solution

__all__ = ["run"]


def _trajectories(problem: str, n: int, t, seed: int = 0):
    """Family of trajectories over random initial conditions
    ([x0, v0] ~ U; reference samples ICs per experiment)."""
    rng = np.random.RandomState(seed)
    x0s = rng.uniform(0.5, 1.5, n)
    v0s = rng.uniform(-0.5, 0.5, n)
    sol = sho_solution if problem == "sho" else dho_solution
    xs = np.stack([sol(t, x0, v0) for x0, v0 in zip(x0s, v0s)])
    # velocity by finite difference for the NODE state
    vs = np.gradient(xs, t, axis=1)
    states = np.stack([xs, vs], axis=-1)  # [n, Nt, 2]
    return states.astype(np.float32)


def run(problem: str = "sho", n_train: int = 4, n_cal: int = 32, n_pred: int = 16,
        Nt: int = 100, t_end: float = 10.0, epochs: int = 300, alpha: float = 0.1,
        seed: int = 0, verbose: bool = True):
    t = np.linspace(0.0, t_end, Nt).astype(np.float32)
    dt = float(t[1] - t[0])
    D = (sho_residual_kernel(dt) if problem == "sho"
         else dho_residual_kernel(dt))

    train = _trajectories(problem, n_train, t, seed)
    model = ODEFunc(hidden_dim=50, state_dim=2)
    # fit on the first trajectory (reference trains single-IC NODEs)
    params = fit_node(model, train[0, 0], t, train[0], epochs=epochs, seed=seed,
                      verbose=verbose)

    cal = _trajectories(problem, n_cal, t, seed + 1)
    pred = _trajectories(problem, n_pred, t, seed + 2)

    def rollout(states):
        return jnp.stack([neural_odeint(model, params, s[0], t) for s in states])

    cal_pred = rollout(cal)
    pred_pred = rollout(pred)

    res_cal = D(cal_pred[..., 0])[..., 2:-2]  # position channel, crop edges
    res_pred = D(pred_pred[..., 0])[..., 2:-2]

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
