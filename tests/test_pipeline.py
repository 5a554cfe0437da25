"""CP pipeline engine tests: vectorized sweep == per-alpha reference loop."""

import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import (
    calibrate,
    emp_cov,
    emp_cov_joint,
    modulation_func,
    ncf_metric_joint,
)
from cppre.experiments.pipeline import (
    DEFAULT_ALPHAS,
    joint_cp,
    joint_coverage_sweep,
    marginal_cp,
    marginal_coverage_sweep,
)


def _data(seed=0, n_cal=60, n_test=40, shape=(9, 11)):
    rng = np.random.default_rng(seed)
    res_out_cal = rng.standard_normal((n_cal,) + shape).astype(np.float32)
    res_pred_cal = res_out_cal + 0.1 * rng.standard_normal((n_cal,) + shape).astype(np.float32)
    res_out = rng.standard_normal((n_test,) + shape).astype(np.float32)
    res_pred = res_out + 0.1 * rng.standard_normal((n_test,) + shape).astype(np.float32)
    return res_out_cal, res_pred_cal, res_out, res_pred


def test_marginal_sweep_matches_reference_loop():
    """The vmapped sweep must equal the reference's per-alpha Python loop
    (Marginal/Advection_Residuals_CP.py:273-285)."""
    roc, rpc, ro, rp = _data()
    scores = np.abs(roc - rpc)
    alphas, cov = marginal_coverage_sweep(scores, rp, ro)
    for a, c in zip(alphas, cov):
        qhat = calibrate(scores, len(scores), float(a))
        expected = emp_cov((rp - np.asarray(qhat), rp + np.asarray(qhat)), ro)
        assert abs(c - expected) < 1e-6


def test_joint_sweep_matches_reference_loop():
    roc, rpc, ro, rp = _data()
    mod = np.asarray(modulation_func(roc, rpc)) + 1e-6
    scores = np.asarray(ncf_metric_joint(roc, rpc, mod))
    alphas, cov = joint_coverage_sweep(scores, mod, rp, ro)
    for a, c in zip(alphas, cov):
        qhat = float(calibrate(scores, len(scores), float(a)))
        expected = emp_cov_joint((rp - qhat * mod, rp + qhat * mod), ro)
        assert abs(c - expected) < 1e-6


def test_marginal_cp_coverage_guarantee():
    """Exchangeable cal/test scores => coverage >= 1 - alpha (within
    binomial noise) at every level. This is the CP behavioural oracle
    (SURVEY.md §4.2)."""
    roc, rpc, ro, rp = _data(seed=1, n_cal=200, n_test=200)
    out = marginal_cp(roc, rpc, rp, ro, alpha=0.1)
    slack = 0.05
    assert np.all(out["coverage"] >= (1 - out["alphas"]) - slack)


def test_joint_cp_modes_and_masks():
    roc, rpc, ro, rp = _data(seed=2)
    out = joint_cp(roc, rpc, rp, ro, alpha=0.1, eps=1e-6)
    assert out["filter_mask"].shape == (rp.shape[0],)
    assert out["modulation"].shape == rp.shape[1:]
    pre_out = joint_cp(roc, rpc, rp, mode="pre", eps=1e-6)
    assert pre_out["coverage"].shape == out["coverage"].shape


def test_joint_cp_holdout_modulation_restores_guarantee():
    """In-sample modulation (reference semantics) undercovers on
    noise-dominated exchangeable residuals; holdout_modulation=True must
    restore coverage >= 1 - alpha (within binomial noise)."""
    rng = np.random.default_rng(0)
    cells = (10, 24, 24)
    scale = 0.5 + rng.random(cells).astype(np.float32)
    draw = lambda n: (scale * rng.standard_normal((n,) + cells)).astype(np.float32)
    covs_in, covs_h = [], []
    for _ in range(4):
        res_cal, res_prd = draw(160), draw(160)
        zero = np.zeros_like(res_cal)
        out_in = joint_cp(res_cal, zero, res_prd, np.zeros_like(res_prd),
                          alphas=np.asarray([0.1]))
        out_h = joint_cp(res_cal, zero, res_prd, np.zeros_like(res_prd),
                         alphas=np.asarray([0.1]), holdout_modulation=True)
        covs_in.append(float(out_in["coverage"][0]))
        covs_h.append(float(out_h["coverage"][0]))
    assert np.mean(covs_h) >= 0.86  # ~0.9 target with binomial slack
    assert np.mean(covs_h) > np.mean(covs_in)  # holdout strictly helps here
