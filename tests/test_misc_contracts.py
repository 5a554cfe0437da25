"""Direct unit tests for small contract-level helpers that are otherwise
only exercised indirectly through the experiment drivers."""

import math

import jax.numpy as jnp
import numpy as np
import pytest


def test_cp_quantile_level_convention():
    """ceil((n+1)(1-alpha))/n capped at 1 — the split-CP finite-sample
    correction (`Neural_PDE.UQ.inductive_cp.calibrate`, SURVEY §2.3)."""
    from cppre.cp.inductive import cp_quantile_level

    assert cp_quantile_level(100, 0.1) == math.ceil(101 * 0.9) / 100
    assert cp_quantile_level(5, 0.01) == 1.0  # cap: level would exceed 1
    # monotone in alpha
    levels = [cp_quantile_level(50, a) for a in (0.05, 0.1, 0.2, 0.5)]
    assert levels == sorted(levels, reverse=True)


def test_latin_hypercube_stratification():
    """One sample per bin per dimension (pyDOE lhs replacement,
    `Marginal/Advection_Residuals_CP.py:168`)."""
    from cppre.experiments.common import latin_hypercube, sample_params

    x = latin_hypercube(3, 32, seed=4)
    assert x.shape == (32, 3)
    assert (x > 0).all() and (x < 1).all()
    for d in range(3):
        bins = np.floor(x[:, d] * 32).astype(int)
        assert sorted(bins) == list(range(32))  # exactly one sample per bin
    p = sample_params([1.0, -2.0], [2.0, 0.0], 16, seed=1)
    assert p.shape == (16, 2)
    assert (p[:, 0] >= 1).all() and (p[:, 0] <= 2).all()
    assert (p[:, 1] >= -2).all() and (p[:, 1] <= 0).all()


def test_stacked_unstack_fields_roundtrip():
    """The FNO<->ConvOps layout bridge (`Joint/NS_Residuals_CP.py:90-111`):
    stack to [BS, Nvar, Nx, Ny, Nt], unstack back to [BS, Nt, Nx, Ny]."""
    from cppre.experiments.common import stacked_fields, unstack_fields

    rng = np.random.default_rng(0)
    vs = [rng.standard_normal((2, 5, 6, 7)).astype(np.float32)
          for _ in range(3)]
    f = stacked_fields(vs)
    assert f.shape == (2, 3, 6, 7, 5)
    back = unstack_fields(f)
    for orig, rec in zip(vs, back):
        np.testing.assert_array_equal(np.asarray(rec), orig)
    with pytest.raises(ValueError, match="variable names"):
        unstack_fields(f, variable_names=["u", "v"])


def test_nll_elbo_values():
    """Hand-computed oracle for the MLE / VI objectives
    (`Other_UQ/Utils/loss_utils.py:6-35`)."""
    from cppre.train.losses import elbo, nll

    mean = jnp.array([0.0, 1.0])
    log_var = jnp.array([0.0, math.log(4.0)])
    target = jnp.array([1.0, 3.0])
    # cells: 0.5*(0 + 1/1) and 0.5*(log4 + 4/4)
    expect = 0.5 * ((0 + 1) + (math.log(4) + 1)) / 2
    np.testing.assert_allclose(float(nll(mean, log_var, target)), expect,
                               rtol=1e-6)
    assert float(elbo(10.0, 4.0, 3)) == pytest.approx(-(10.0 - 4.0) / 3)


def test_checkpoint_name_and_config_schema():
    from cppre.utils.checkpoint import checkpoint_name
    from cppre.utils.config import validate_config

    assert checkpoint_name("FNO", "Wave", "cyclic-muntin") == \
        "FNO_Wave_cyclic-muntin"
    cfg = {"T_in": 1, "T_out": 20, "Step": 1}
    assert validate_config(cfg) is cfg
    with pytest.raises(KeyError, match="T_out"):
        validate_config({"T_in": 1, "Step": 1})


def test_spectral_differentiate_matches_convop():
    """The manual-FFT differentiate path agrees with the ConvOperator
    correlation path on a smooth field (ConvOps_1d.differentiate,
    reference :178-283)."""
    from cppre.ops import ConvOperator1d

    x = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    u = jnp.asarray(np.sin(x)[None, None, :].repeat(5, 1), jnp.float32)
    D = ConvOperator1d("x", 1)
    ref = D(u)
    out = D.differentiate(u, correlation=True)
    # compare away from the wrap-around boundary
    np.testing.assert_allclose(np.asarray(out)[..., 2:-2],
                               np.asarray(ref)[..., 2:-2], atol=1e-4)


def test_plot_tools_smoke(tmp_path):
    """Figure helpers render and save (the reference's only output
    artifact, `Utils/plot_tools.py`)."""
    import matplotlib

    matplotlib.use("Agg")
    from cppre.utils.plot_tools import coverage_figure, subplots_1d, subplots_2d

    vals = [np.random.default_rng(0).random((8, 8)) for _ in range(2)]
    fig = subplots_2d(vals, ["a", "b"])
    fig.savefig(tmp_path / "s2.png")
    fig1 = subplots_1d(np.arange(8), {"u": np.random.default_rng(1).random((3, 8))},
                       indices=[0, 2])
    fig1.savefig(tmp_path / "s1.png")
    alphas = np.linspace(0.05, 0.95, 5)
    figc = coverage_figure(alphas, {"PRE": 1 - alphas})
    figc.savefig(tmp_path / "cov.png")
    assert (tmp_path / "s2.png").stat().st_size > 0
    assert (tmp_path / "cov.png").stat().st_size > 0
