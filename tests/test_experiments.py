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


# --- remaining §2.4 pipelines: reduced-size asserted coverage diagonals ----
# (joint coverage counts whole samples, so at n_pred = 20-30 the binomial
# noise is ~0.1; tolerances below are diagonal +- noise, same as advection)


def test_burgers_joint_end_to_end():
    from cppre.experiments.burgers import run

    r = run("joint", config={"Epochs": 25, "Nx": 100,
                             "n_train": 30, "n_cal": 60, "n_pred": 30},
            verbose=False)
    # CP's guarantee is model-agnostic — a partly-trained surrogate still
    # must produce the diagonal; the MSE bound is only a sanity check
    assert r["mse"] < 3.0
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.2


def test_ns_marginal_end_to_end_with_periodic_bc():
    """NS marginal CP incl. the vorticity periodic-BC residual path
    (`Marginal/NS_Residuals_CP.py:468-495`)."""
    from cppre.experiments.ns import run

    r = run("marginal", config={"Epochs": 8, "N": 64, "x_slice": 2,
                                "tEnd": 0.2, "Variables": 4, "Modes": 8,
                                "Width_time": 8, "Batch Size": 10,
                                "n_train": 20, "n_cal": 40, "n_pred": 20},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.all(r["coverage_aer_pre"] >= ideal - 0.15)
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.12
    # BC-residual CP is PRE-only (scores |bc residual|): valid coverage
    assert r["bc_coverage"] is not None
    assert np.all(r["bc_coverage"] >= ideal - 0.2)


def test_mhd_joint_end_to_end_equation_switch():
    """MHD joint CP through the fused induction path AND a second equation
    through the ConvOps path (the reference's equation selector,
    `Joint/MHD_Residuals_CP.py:323-348`)."""
    from cppre.experiments.mhd import run

    import jax.numpy as jnp

    from cppre.residuals.mhd import PRE_MHD

    small = {"Epochs": 8, "N": 32, "tEnd": 0.1, "dt": 2.5e-4, "t_slice": 20,
             "Modes": 8, "Width_time": 8, "Batch Size": 10,
             "n_train": 20, "n_cal": 40, "n_pred": 20}
    r = run("joint", config=dict(small, equation="induction"), verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.25
    # the holdout-modulation estimator must also be reported
    assert r["coverage_aer_pre_holdout"] is not None
    # equation selector: every equation produces a finite residual on real
    # trajectories (full pipelines per equation are redundant — CP is
    # identical; only the residual definition changes, covered by parity
    # tests against the torch reference)
    rng = np.random.default_rng(0)
    fields = jnp.asarray(rng.standard_normal((2, 6, 9, 12, 12)), np.float32)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    for eq in PRE_MHD.EQUATIONS:
        out = pre.residual(fields, equation=eq)
        assert np.all(np.isfinite(np.asarray(out))), eq


def test_jorek_joint_end_to_end():
    from cppre.experiments.jorek import run

    r = run("joint", config={"Epochs": 8, "Batch Size": 10,
                             "n_train": 20, "n_cal": 40, "n_pred": 20},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.25
