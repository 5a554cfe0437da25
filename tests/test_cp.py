"""Conformal-prediction core: quantile convention, coverage guarantee
(binomial CI), joint metrics, and filters (SURVEY.md §4 rebuild implications)."""

import numpy as np
import jax.numpy as jnp

from cppre.cp import (
    calibrate,
    emp_cov,
    emp_cov_joint,
    filter_sims_joint,
    filter_sims_within_bounds,
    modulation_func,
    ncf_metric_joint,
)


def test_calibrate_quantile_convention():
    scores = np.arange(1, 101, dtype=np.float32)  # 1..100
    # n=100, alpha=0.1 -> level ceil(101*0.9)/100 = 0.91; numpy 'higher'
    # interpolation takes order statistic ceil(q*(n-1))+1 = 92 — the standard
    # conformal implementation (conservative: >= the 91st order statistic the
    # finite-sample bound needs)
    q = float(calibrate(scores, n=100, alpha=0.1))
    assert q == 92.0
    assert q == float(np.quantile(scores, 0.91, method="higher"))
    # alpha so small the level caps at 1 -> max score
    q = float(calibrate(scores, n=100, alpha=0.001))
    assert q == 100.0


def test_calibrate_elementwise_field_shape():
    scores = np.random.default_rng(0).random((50, 7, 9)).astype(np.float32)
    q = calibrate(scores, n=50, alpha=0.2)
    assert q.shape == (7, 9)


def test_marginal_coverage_guarantee():
    """coverage >= 1 - alpha within binomial CI on synthetic scores."""
    rng = np.random.default_rng(1)
    n_cal, n_test = 500, 2000
    for alpha in (0.1, 0.3, 0.5):
        cal = np.abs(rng.standard_normal(n_cal)).astype(np.float32)
        test = np.abs(rng.standard_normal(n_test)).astype(np.float32)
        q = float(calibrate(cal, n=n_cal, alpha=alpha))
        cov = float(np.mean(test <= q))
        # realised coverage is Beta-distributed over the calibration draw and
        # binomial over the test draw: 4-sigma slack over both
        slack = 4 * np.sqrt(alpha * (1 - alpha) * (1 / n_cal + 1 / n_test))
        assert cov >= (1 - alpha) - slack, (alpha, cov)


def test_joint_coverage_guarantee():
    """Full joint pipeline: modulation + sup-norm scores + scalar qhat."""
    rng = np.random.default_rng(2)
    n_cal, n_test, nt, nx = 300, 1000, 6, 8
    cal = rng.standard_normal((n_cal, nt, nx)).astype(np.float32) * np.linspace(0.5, 2.0, nx)
    test = rng.standard_normal((n_test, nt, nx)).astype(np.float32) * np.linspace(0.5, 2.0, nx)
    zeros = np.zeros_like(cal)
    mod = modulation_func(cal, zeros)
    scores = ncf_metric_joint(cal, zeros, mod)
    assert scores.shape == (n_cal,)
    for alpha in (0.1, 0.3):
        q = float(calibrate(scores, n=n_cal, alpha=alpha))
        sets = [-q * np.asarray(mod), q * np.asarray(mod)]
        cov = emp_cov_joint(sets, test)
        slack = 4 * np.sqrt(alpha * (1 - alpha) / n_test)
        assert cov >= (1 - alpha) - slack, (alpha, cov)
        # and not wildly over-covering
        assert cov <= 1.0


def test_emp_cov_marginal():
    y = np.array([[0.0, 2.0], [1.0, 5.0]])
    sets = [np.full_like(y, -1.0), np.full_like(y, 1.5)]
    assert emp_cov(sets, y) == 0.5


def test_modulation_is_std_over_batch():
    a = np.random.default_rng(3).random((20, 4, 5)).astype(np.float32)
    b = np.zeros_like(a)
    np.testing.assert_allclose(np.asarray(modulation_func(a, b)), a.std(axis=0), rtol=1e-5)


def test_filters():
    samples = np.array([
        [[0.0, 0.0], [0.0, 0.0]],   # fully inside
        [[5.0, 5.0], [5.0, 5.0]],   # fully outside
        [[0.0, 5.0], [0.0, 0.0]],   # 25% outside
    ], dtype=np.float32)
    lower, upper = -np.ones((2, 2)), np.ones((2, 2))
    outside = np.asarray(filter_sims_within_bounds(lower, upper, samples, threshold=0.5))
    np.testing.assert_array_equal(outside, [False, True, False])
    inside = np.asarray(filter_sims_within_bounds(lower, upper, samples, threshold=0.9, within=True))
    np.testing.assert_array_equal(inside, [True, False, False])
    joint = np.asarray(filter_sims_joint([lower, upper], samples))
    np.testing.assert_array_equal(joint, [True, False, False])
