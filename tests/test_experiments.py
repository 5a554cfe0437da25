"""End-to-end experiment tests (reduced sizes): the coverage diagonal is the
behavioural oracle (SURVEY.md §4.2) — a correct CP implementation must give
empirical coverage tracking 1 - alpha."""

import numpy as np
import pytest


def test_advection_marginal_end_to_end():
    from cppre.experiments.advection import run

    r = run("marginal", config={"Epochs": 10, "n_train": 30, "n_test": 40,
                                 "n_cal": 60, "n_pred": 20}, verbose=False)
    assert r["mse"] < 0.2
    ideal = 1 - r["alphas"]
    # AER+PRE marginal coverage must track the diagonal within binomial noise
    assert np.all(r["coverage_aer_pre"] >= ideal - 0.12)
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.1


def test_advection_joint_end_to_end():
    from cppre.experiments.advection import run

    r = run("joint", config={"Epochs": 10, "n_train": 30, "n_test": 40,
                              "n_cal": 60, "n_pred": 20}, verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.2


def test_residual_small_on_exact_solution():
    """The PRE of a well-resolved exact advection solution must be far
    smaller than that of a perturbed one (the premise of the method)."""
    import jax.numpy as jnp

    from cppre.residuals.advection import PRE_Advection
    from cppre.solvers.advection1d import Advection1D

    sim = Advection1D(200, 100, 0.0, 2.0, 0.5)
    x, t, u, ue = sim.solve(0.7, 100.0, 1.0)
    pre = PRE_Advection(sim.dt, sim.dx, v=1.0)
    r_exact = np.abs(np.asarray(pre(jnp.asarray(ue)[None]))).mean()
    rng = np.random.default_rng(0)
    r_noisy = np.abs(
        np.asarray(pre(jnp.asarray(ue + 0.3 * rng.standard_normal(ue.shape))[None]))
    ).mean()
    assert r_exact < 0.2 * r_noisy
