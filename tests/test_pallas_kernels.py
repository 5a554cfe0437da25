"""Pallas fused-stencil kernels: parity vs the ConvOps reference paths.

On CPU the compiled path is exercised through the Pallas interpreter
(interpret=True); the compiled TPU path is covered by bench.py on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppre.ops.convops import direct_conv
from cppre.ops.pallas import fused_stencil_residual, ns_momentum_residual_fused
from cppre.ops.stencils import embed_kernel_3d, stencil_time_space
from cppre.residuals.ns import PRE_NS


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((3, 10, 20, 24)), jnp.float32)


def _composite_kernel():
    return (embed_kernel_3d(stencil_time_space(1, 2), 2)
            - 0.3 * embed_kernel_3d(stencil_time_space(2, 2), 0))


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_stencil_matches_convops(field, interpret):
    k = _composite_kernel()
    ref = direct_conv(field, k)[..., 1:-1, 1:-1, 1:-1]
    out = fused_stencil_residual(field, k, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fused_stencil_abs(field):
    k = _composite_kernel()
    ref = jnp.abs(direct_conv(field, k)[..., 1:-1, 1:-1, 1:-1])
    out = fused_stencil_residual(field, k, take_abs=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_ns_momentum_matches_pre_ns(interpret):
    rng = np.random.default_rng(1)
    fields = jnp.asarray(rng.standard_normal((2, 3, 10, 20, 24)), jnp.float32)
    dt, dx, dy, nu = 0.01, 0.02, 0.03, 1e-3
    pre = PRE_NS(dt, dx, dy, nu=nu)
    ref = pre.residual_momentum(fields)
    out = ns_momentum_residual_fused(fields, dt, dx, dy, nu, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_joint_cp_scores_match_reference_path(interpret):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas.stencil_kernels import ns_joint_cp_scores_fused

    rng = np.random.default_rng(2)
    truth = jnp.asarray(rng.standard_normal((6, 3, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    dt, dx, dy, nu = 0.01, 0.02, 0.02, 1e-3
    pre = PRE_NS(dt, dx, dy, nu=nu)
    ro, rp = pre.residual_momentum(truth), pre.residual_momentum(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = ns_joint_cp_scores_fused(truth, pred, dt, dx, dy, nu, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


@pytest.mark.parametrize("interpret", [None, True])
def test_joint_cp_scores_bf16_diff_staging(interpret):
    """`diff_dtype=bfloat16` halves the staged-diff HBM traffic; the
    moments (and hence the modulation) stay exact f32, only the scored
    |diff| is rounded (~2^-9 relative). Scores must match the f32 staging
    to bf16 resolution, be routing-independent (the XLA fallback casts at
    the same point as the Pallas kernel), and the CP guarantee is
    untouched because calibration and prediction samples scored in one
    call see the identical rounding law."""
    from cppre.ops.pallas.stencil_kernels import ns_joint_cp_scores_fused

    rng = np.random.default_rng(7)
    truth = jnp.asarray(rng.standard_normal((6, 3, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    dt, dx, dy, nu = 0.01, 0.02, 0.02, 1e-3
    s32 = ns_joint_cp_scores_fused(truth, pred, dt, dx, dy, nu,
                                   interpret=interpret)
    s16 = ns_joint_cp_scores_fused(truth, pred, dt, dx, dy, nu,
                                   interpret=interpret,
                                   diff_dtype=jnp.bfloat16)
    assert s16.dtype == jnp.float32  # scores themselves stay f32
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32), rtol=1e-2)
    # bf16 staging must agree across routings (Pallas vs XLA fallback)
    s16_xla = ns_joint_cp_scores_fused(truth, pred, dt, dx, dy, nu,
                                       interpret=None,
                                       diff_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s16_xla),
                               rtol=1e-5)


def test_chunked_diff_stats_matches_whole_block():
    from cppre.ops.pallas.stencil_kernels import (
        ns_joint_cp_diff_stats,
        ns_joint_cp_diff_stats_chunked,
    )

    rng = np.random.default_rng(3)
    t = jnp.asarray(rng.standard_normal((4, 3, 13, 16, 24)), jnp.float32)
    p = t + 0.1 * jnp.asarray(rng.standard_normal(t.shape), jnp.float32)
    d1, s1, q1 = ns_joint_cp_diff_stats(t, p, 0.01, 0.02, 0.02)
    # uneven chunking (13-2=11 interior frames in blocks of 4 -> 4,4,3)
    d2, s2, q2 = ns_joint_cp_diff_stats_chunked(
        t, p, 0.01, 0.02, 0.02, t_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-6)


@pytest.mark.parametrize(
    "equation", ["continuity", "momentum", "energy", "induction", "gauss"])
def test_mhd_chunked_diff_stats_matches_whole_block(equation):
    from cppre.ops.pallas.stencil_kernels import (
        _joint_cp_diff_stats,
        _mhd_math,
        mhd_joint_cp_diff_stats_chunked,
    )

    rng = np.random.default_rng(5)
    # offset away from zero so 1/rho in the momentum equation is tame
    t = jnp.asarray(rng.standard_normal((3, 6, 11, 16, 24)) + 2.0, jnp.float32)
    p = t + 0.1 * jnp.asarray(rng.standard_normal(t.shape), jnp.float32)
    nt, nx, ny = t.shape[2:]
    d1, s1, q1 = _joint_cp_diff_stats(
        t, p, lambda f: _mhd_math(equation, f, nt, nx, ny), interpret=True)
    d2, s2, q2 = mhd_joint_cp_diff_stats_chunked(
        t, p, equation, t_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    # rtol, not atol: momentum's 1/rho^2 cells push sumsq to ~1e6, where
    # f32 reduction-order noise is ~0.5 absolute (rel ~1e-7)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               rtol=2e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2),
                               rtol=2e-6, atol=1e-5)


def test_wave_chunked_diff_stats_matches_whole_block():
    from cppre.ops.pallas.stencil_kernels import (
        _joint_cp_diff_stats,
        _taps,
        _valid_shift_add,
        wave_joint_cp_diff_stats_chunked,
    )
    from cppre.ops.stencils import embed_kernel_3d, stencil_2d

    kernel = (embed_kernel_3d(np.asarray(stencil_2d(2)), 2)
              - 0.25 * embed_kernel_3d(np.asarray(stencil_2d(2)), 0))
    rng = np.random.default_rng(6)
    t = jnp.asarray(rng.standard_normal((3, 11, 16, 24)), jnp.float32)
    p = t + 0.1 * jnp.asarray(rng.standard_normal(t.shape), jnp.float32)
    taps = _taps(kernel)
    nt, nx, ny = t.shape[1:]
    d1, s1, q1 = _joint_cp_diff_stats(
        t[:, None], p[:, None],
        lambda f: _valid_shift_add(f[0], taps, (nt - 2, nx - 2, ny - 2)),
        interpret=True)
    d2, s2, q2 = wave_joint_cp_diff_stats_chunked(
        t, p, kernel, t_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_mhd_induction_matches_pre_mhd(interpret):
    from cppre.ops.pallas import mhd_induction_residual_fused
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(4)
    fields = jnp.asarray(rng.standard_normal((2, 6, 9, 16, 24)), jnp.float32)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ref = pre.residual_induction(fields)
    out = mhd_induction_residual_fused(fields, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_mhd_joint_cp_scores_match_reference_path(interpret):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import mhd_induction_joint_cp_scores_fused
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(5)
    truth = jnp.asarray(rng.standard_normal((6, 6, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ro, rp = pre.residual_induction(truth), pre.residual_induction(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = mhd_induction_joint_cp_scores_fused(truth, pred, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


@pytest.mark.parametrize("interpret", [None, True])
def test_fused_wave_joint_cp_scores_match_reference_path(interpret):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import wave_joint_cp_scores_fused, wave_residual_fused
    from cppre.residuals.wave import PRE_Wave

    rng = np.random.default_rng(6)
    truth = jnp.asarray(rng.standard_normal((6, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    pre = PRE_Wave(0.01, 0.02, c=1.0)
    ro, rp = pre(truth), pre(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = wave_joint_cp_scores_fused(truth, pred, pre.D.kernel, interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)
    # residual alias parity too
    np.testing.assert_allclose(
        np.asarray(wave_residual_fused(truth, pre.D.kernel, interpret=interpret)),
        np.asarray(ro), atol=2e-6)


@pytest.mark.parametrize("equation", ["continuity", "momentum", "energy",
                                      "induction", "gauss"])
@pytest.mark.parametrize("interpret", [None, True])
def test_fused_mhd_all_equations_match_pre_mhd(equation, interpret):
    """Every selectable MHD residual (`Joint/MHD_Residuals_CP.py:225-278`)
    has a fused path matching the ConvOps reference implementation."""
    from cppre.ops.pallas import mhd_residual_fused
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(10)
    fields = jnp.asarray(rng.standard_normal((2, 6, 8, 12, 16)), jnp.float32)
    fields = fields.at[:, 0].add(3.0)  # keep rho away from 0 (momentum 1/rho)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ref = pre.residual(fields, equation=equation)
    out = mhd_residual_fused(fields, equation=equation, interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


# --------------------------- flat-layout kernels ---------------------------


@pytest.mark.parametrize("interpret", [None, True])
def test_flat_ns_joint_cp_scores_match_reference_path(interpret):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import ns_joint_cp_scores_flat

    rng = np.random.default_rng(11)
    truth = jnp.asarray(rng.standard_normal((6, 3, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    dt, dx, dy, nu = 0.01, 0.02, 0.02, 1e-3
    pre = PRE_NS(dt, dx, dy, nu=nu)
    ro, rp = pre.residual_momentum(truth), pre.residual_momentum(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = ns_joint_cp_scores_flat(truth, pred, dt, dx, dy, nu,
                                  interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


def test_flat_two_kernel_route_matches_paired(monkeypatch):
    """Shapes whose paired blocks exceed VMEM route through the residual +
    diff/stats two-kernel composition — same scores."""
    from cppre.ops.pallas import flat_kernels as fk

    rng = np.random.default_rng(12)
    truth = jnp.asarray(rng.standard_normal((5, 3, 8, 16, 20)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    paired = fk.ns_joint_cp_scores_flat(truth, pred, 0.01, 0.02, 0.02, 1e-3,
                                        interpret=True)
    monkeypatch.setattr(fk, "_paired_vmem_est", lambda *a: 10**12)
    twok = fk.ns_joint_cp_scores_flat(truth, pred, 0.01, 0.02, 0.02, 1e-3,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(twok), np.asarray(paired), rtol=1e-6)
    # and shapes too large for either route fall back to the XLA path
    monkeypatch.setattr(fk, "_twokernel_vmem_est", lambda *a: 10**12)
    monkeypatch.setattr(fk, "_on_tpu", lambda: True)
    # interpret=None + forced routing estimates: must take xla_fallback
    xla = fk.ns_joint_cp_scores_flat(truth, pred, 0.01, 0.02, 0.02, 1e-3,
                                     interpret=None)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(paired), rtol=2e-3)


@pytest.mark.parametrize("equation", ["continuity", "momentum", "energy",
                                      "induction", "gauss"])
def test_flat_mhd_joint_cp_scores_all_equations(equation):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import mhd_joint_cp_scores_flat
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(13)
    truth = jnp.asarray(rng.standard_normal((5, 6, 8, 12, 16)), jnp.float32)
    truth = truth.at[:, 0].add(3.0)  # rho away from 0
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ro = pre.residual(truth, equation=equation)
    rp = pre.residual(pred, equation=equation)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = mhd_joint_cp_scores_flat(truth, pred, equation=equation,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


@pytest.mark.parametrize("interpret", [None, True])
def test_flat_wave_joint_cp_scores_match_reference_path(interpret):
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import wave_joint_cp_scores_flat
    from cppre.residuals.wave import PRE_Wave

    rng = np.random.default_rng(14)
    truth = jnp.asarray(rng.standard_normal((6, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    pre = PRE_Wave(0.01, 0.02, c=1.0)
    ro, rp = pre(truth), pre(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = wave_joint_cp_scores_flat(truth, pred, pre.D.kernel,
                                    interpret=interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


def test_flat_wave_scores_corner_tap_kernel():
    """Kernels with corner taps (x and y offsets together, e.g. a D_xy
    cross term) need the widened flat-window margin ny+1 — previously an
    out-of-bounds slice crash."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import wave_joint_cp_scores_flat
    from cppre.ops.convops import direct_conv

    rng = np.random.default_rng(21)
    truth = jnp.asarray(rng.standard_normal((5, 8, 12, 16)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    k = np.zeros((3, 3, 3), np.float32)
    k[1, 1, 1] = -2.0
    k[1, 0, 0] = k[1, 2, 2] = 1.0   # diagonal (corner) taps
    k[2, 1, 1] = 0.5
    ro = direct_conv(truth, k)[..., 1:-1, 1:-1, 1:-1]
    rp = direct_conv(pred, k)[..., 1:-1, 1:-1, 1:-1]
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = wave_joint_cp_scores_flat(truth, pred, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)


def test_flat_wave_scores_wide_kernel_routes_to_fused():
    """Non-3x3x3 composites (e.g. a 4th-order 5x5x5 wave stencil) are
    outside the flat tap expansion: they must route to the generic fused
    path (any odd kernel) instead of crashing on the 3x3x3 assert."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import wave_joint_cp_scores_flat
    from cppre.ops.convops import direct_conv

    rng = np.random.default_rng(23)
    truth = jnp.asarray(rng.standard_normal((4, 10, 14, 18)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape), jnp.float32)
    k = np.zeros((5, 5, 5), np.float32)
    # 4th-order accurate D_xx along each axis, additively composed
    c4 = np.array([-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], np.float32)
    k[:, 2, 2] += c4
    k[2, :, 2] -= 0.5 * c4
    k[2, 2, :] -= 0.5 * c4
    ro = direct_conv(truth, k)[..., 2:-2, 2:-2, 2:-2]
    rp = direct_conv(pred, k)[..., 2:-2, 2:-2, 2:-2]
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = wave_joint_cp_scores_flat(truth, pred, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-3)
    # the generic fused path itself must also handle the 5-wide kernel as a
    # PALLAS kernel (interpret=True runs the real block specs): the paired
    # one-pass kernel's out_shape is derived from the kernel extent, not
    # hardcoded to the 3-wide crop
    from cppre.ops.pallas import wave_joint_cp_scores_fused

    got_pl = wave_joint_cp_scores_fused(truth, pred, k, interpret=True)
    np.testing.assert_allclose(np.asarray(got_pl), np.asarray(expected),
                               rtol=2e-3)


@pytest.mark.parametrize("interpret", [None, True])
def test_single_pass_scores_match_reference_path(interpret):
    """VMEM-stash single-pass scores (no staged-diff HBM round-trip) must
    match the modulation_func + ncf_metric_joint composition exactly like
    the two-pass kernel does — for NS momentum and MHD induction math."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas.stencil_kernels import (
        mhd_induction_joint_cp_scores_fused, ns_joint_cp_scores_fused)
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(11)
    truth = jnp.asarray(rng.standard_normal((6, 3, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape),
                                     jnp.float32)
    dt, dx, dy, nu = 0.01, 0.02, 0.02, 1e-3
    pre = PRE_NS(dt, dx, dy, nu=nu)
    ro, rp = pre.residual_momentum(truth), pre.residual_momentum(pred)
    mod = modulation_func(ro, rp) + 1e-6
    expected = ncf_metric_joint(ro, rp, mod)
    got = ns_joint_cp_scores_fused(truth, pred, dt, dx, dy, nu,
                                   interpret=interpret, single_pass=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-3)

    t6 = jnp.asarray(rng.standard_normal((5, 6, 8, 16, 24)), jnp.float32)
    p6 = t6 + 0.1 * jnp.asarray(rng.standard_normal(t6.shape), jnp.float32)
    pre_m = PRE_MHD(1.0, 1.0, 1.0)
    ro6, rp6 = pre_m.residual_induction(t6), pre_m.residual_induction(p6)
    mod6 = modulation_func(ro6, rp6) + 1e-6
    exp6 = ncf_metric_joint(ro6, rp6, mod6)
    got6 = mhd_induction_joint_cp_scores_fused(t6, p6, interpret=interpret,
                                               single_pass=True)
    np.testing.assert_allclose(np.asarray(got6), np.asarray(exp6), rtol=2e-3)


def test_single_pass_matches_two_pass_exactly():
    """In interpret mode the single-pass and two-pass kernels share the
    residual math and f32 moment arithmetic — scores must agree to float
    tolerance, pinning that the stash path introduces no extra rounding."""
    from cppre.ops.pallas.stencil_kernels import ns_joint_cp_scores_fused

    rng = np.random.default_rng(12)
    truth = jnp.asarray(rng.standard_normal((4, 3, 8, 16, 24)), jnp.float32)
    pred = truth + 0.1 * jnp.asarray(rng.standard_normal(truth.shape),
                                     jnp.float32)
    two = ns_joint_cp_scores_fused(truth, pred, 0.01, 0.02, 0.02, 1e-3,
                                   interpret=True)
    one = ns_joint_cp_scores_fused(truth, pred, 0.01, 0.02, 0.02, 1e-3,
                                   interpret=True, single_pass=True)
    np.testing.assert_allclose(np.asarray(one), np.asarray(two), rtol=1e-6)


def test_single_pass_fit_arithmetic():
    """The documented flagship fit matrix (VERDICT r04 #7): MHD fits the
    VMEM stash; NS and Wave do not (tile padding puts the NS stash at
    ~101 MiB and Wave's bs=200 at ~125 MiB before blocks/temporaries)."""
    from cppre.ops.pallas.stencil_kernels import single_pass_fits

    assert single_pass_fits((100, 6, 21, 64, 64))        # MHD flagship
    assert not single_pass_fits((100, 3, 21, 100, 100))  # NS flagship
    assert not single_pass_fits((200, 1, 21, 64, 64))    # wave flagship


def test_vmem_cap_consistent_with_granted_limit():
    """Routing invariant: any estimate admitted to the Pallas path
    (<= _VMEM_CAP) must receive a vmem_limit covering the worst observed
    temporaries ratio (1.75x + 4 MiB) WITHIN the hardware ceiling —
    otherwise shapes in the gap compile with a limit below their real
    need and fail in Mosaic instead of taking the XLA fallback."""
    from cppre.ops.pallas.stencil_kernels import (_VMEM_CAP, _VMEM_HW_LIMIT,
                                                  _vmem_params)

    params = _vmem_params(_VMEM_CAP)
    assert params is not None
    limit = params.vmem_limit_bytes
    assert limit <= _VMEM_HW_LIMIT
    assert limit >= int(_VMEM_CAP * 1.75)  # granted covers the model ratio


def test_routing_decision_boundaries():
    """The measured routing pins (BASELINE.md roofline + bench_scaling):
    flagship shapes take the paired one-pass kernel, mid shapes the
    composed per-tensor route, and shapes whose single trajectory exceeds
    VMEM the DMA-chunked kernel (composed when no chunked math exists)."""
    from cppre.ops.pallas.stencil_kernels import routing_decision

    assert routing_decision((100, 3, 21, 100, 100)) == "paired"   # NS bench
    assert routing_decision((100, 6, 21, 64, 64)) == "paired"     # MHD flagship
    assert routing_decision((200, 1, 21, 64, 64)) == "paired"     # wave flagship
    assert routing_decision((50, 3, 21, 256, 256)) == "composed"
    assert routing_decision((12, 3, 21, 512, 512)) == "chunked"
    assert routing_decision((25, 6, 21, 256, 256)) == "chunked"
    assert routing_decision((12, 3, 21, 512, 512), has_chunked=False) == \
        "composed"


def test_samples_per_block_parity():
    """Packing g samples per grid step (per-program-overhead amortisation
    for small wave/MHD blocks) must not change the diff or the moments;
    non-dividing or oversize g silently falls back to g=1."""
    from cppre.ops.pallas.stencil_kernels import (
        _joint_cp_diff_stats,
        _ns_momentum_math,
    )

    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.standard_normal((8, 3, 9, 16, 24)), jnp.float32)
    p = t + 0.01 * jnp.asarray(rng.standard_normal(t.shape), jnp.float32)
    nt, nx, ny = t.shape[2:]
    mf = lambda f: _ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                     0.01, 0.01, 0.01, 1e-3)
    d1, s1, q1 = _joint_cp_diff_stats(t, p, mf, interpret=True)
    for g in (2, 4, 3, 8):  # 3 does not divide 8 -> falls back to g=1
        d2, s2, q2 = _joint_cp_diff_stats(t, p, mf, interpret=True,
                                          samples_per_block=g)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-10)
        np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-10)


def test_wave_scores_forward_samples_per_block():
    """wave_joint_cp_scores_fused must actually FORWARD samples_per_block
    to the paired kernel (regression: it used to accept and silently drop
    the argument, so wave g-sweeps measured g=1 three times) — scores
    match g=1 within f32 accumulation-order noise."""
    from cppre.ops import ConvOperator
    from cppre.ops.pallas import wave_joint_cp_scores_fused

    rng = np.random.default_rng(5)
    t = jnp.asarray(rng.standard_normal((8, 9, 16, 16)), jnp.float32)
    p = t + 0.01 * jnp.asarray(rng.standard_normal(t.shape), jnp.float32)
    D_tt, D_xxyy, D = (ConvOperator("t", 2), ConvOperator(("x", "y"), 2),
                       ConvOperator())
    D.kernel = D_tt.kernel - 0.25 * D_xxyy.kernel
    s1 = wave_joint_cp_scores_fused(t, p, D.kernel, interpret=True)
    for g in (2, 4):
        sg = wave_joint_cp_scores_fused(t, p, D.kernel, interpret=True,
                                        samples_per_block=g)
        np.testing.assert_allclose(np.asarray(sg), np.asarray(s1),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("num_vars,nx,modes,width",
                         [(1, 64, 16, 16), (2, 16, 4, 8)])
def test_fused_fno_block_forward_parity(num_vars, nx, modes, width):
    """fno2d_forward_fused == FNO2d.apply (the TurboFNO-style fused
    inference path, ops/pallas/fno_block.py) at a flagship-like and a
    multi-variable shape, interpret mode."""
    from cppre.models import FNO2d, fno2d_forward_fused

    m = FNO2d(T_in=1, step=1, modes1=modes, modes2=modes,
              num_vars=num_vars, width_time=width)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, num_vars, nx, nx, 1)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(fno2d_forward_fused(m, v, x))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-5 * max(scale, 1.0))


def test_fused_fno_block_nyquist_modes():
    """m2 == Ny//2+1 includes the Nyquist bin, whose Hermitian expansion
    weight is 1 (not 2) — the fused kernel folds it into the inverse-y
    table; parity against FNO2d.apply pins that fold."""
    from cppre.models import FNO2d, fno2d_forward_fused

    m = FNO2d(T_in=1, step=1, modes1=4, modes2=5, num_vars=1, width_time=8)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 8, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(fno2d_forward_fused(m, v, x))
    np.testing.assert_allclose(out, ref, atol=3e-5)


@pytest.mark.parametrize("equation", ["continuity", "temperature"])
@pytest.mark.parametrize("interpret", [None, True])
def test_fused_jorek_matches_pre_jorek(equation, interpret):
    """Fused JOREK PRE (in-kernel iota R rebuild) == PRE_JOREK for both
    cylindrical residuals; scores match the cp reference path; the
    DMA-chunked instance matches the whole-block kernel; non-affine R
    grids fall back to the XLA lowering."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import (jorek_joint_cp_scores_fused,
                                  jorek_residual_fused)
    from cppre.ops.pallas.stencil_kernels import (
        jorek_joint_cp_diff_stats_chunked,
    )
    from cppre.residuals.jorek import PRE_JOREK

    rng = np.random.default_rng(8)
    nx, ny = 16, 24
    R = np.linspace(1.0, 2.0, nx).astype(np.float32)
    fields = jnp.asarray(rng.standard_normal((4, 3, 9, nx, ny)) + 2.0,
                         jnp.float32)
    pre = PRE_JOREK(R, dt=0.01, dR=0.02, dZ=0.02)
    ref = np.asarray(pre.residual(fields, equation))
    out = np.asarray(jorek_residual_fused(fields, R, equation=equation,
                                          interpret=interpret))
    np.testing.assert_allclose(out, ref, atol=1e-4 * max(np.abs(ref).max(), 1))

    if equation == "continuity" and interpret:
        pred = fields + 0.05 * jnp.asarray(
            rng.standard_normal(fields.shape), jnp.float32)
        ro, rp = pre.residual(fields, equation), pre.residual(pred, equation)
        mod = modulation_func(ro, rp) + 1e-6
        expected = np.asarray(ncf_metric_joint(ro, rp, mod))
        got = np.asarray(jorek_joint_cp_scores_fused(fields, pred, R,
                                                     equation=equation))
        np.testing.assert_allclose(got, expected, rtol=1e-4)
        d2, s2, q2 = jorek_joint_cp_diff_stats_chunked(
            fields, pred, R, equation=equation, t_block=3, interpret=True)
        np.testing.assert_allclose(np.asarray(ro - rp), np.asarray(d2),
                                   atol=1e-4)
        # non-affine grid: falls back to the XLA path, same shape
        nb = jorek_residual_fused(fields, R**2, equation=equation)
        assert nb.shape == ref.shape


@pytest.mark.parametrize("num_vars,nx,ny,modes,width",
                         [(1, 10, 12, 4, 8), (2, 25, 25, 6, 8)])
def test_fused_fno_block_non_aligned_nx_parity(num_vars, nx, ny, modes,
                                               width):
    """Non-8-aligned Nx (the NS flagship is 100x100) rides the fused path
    via sublane zero-padding + zeroed DFT-table rows; parity vs
    FNO2d.apply pins that the pad lanes never leak into real rows."""
    from cppre.models import FNO2d, fno2d_forward_fused, fused_supported

    m = FNO2d(T_in=1, step=1, modes1=modes, modes2=modes,
              num_vars=num_vars, width_time=width)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((3, num_vars, nx, ny, 1)),
                    jnp.float32)
    assert fused_supported(m, x.shape)
    v = m.init(jax.random.PRNGKey(2), x)
    ref = np.asarray(m.apply(v, x))
    out = np.asarray(fno2d_forward_fused(m, v, x))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=3e-5 * max(scale, 1.0))


def test_fused_supported_vmem_and_alignment_routing():
    """The NS flagship grid (100x100, width 32) must now be supported;
    oversize grids whose per-step working set exceeds the scoped-VMEM
    ceiling must route to model.apply instead of failing Mosaic compile."""
    from cppre.models import FNO2d, fused_supported

    m = FNO2d(T_in=1, step=1, modes1=8, modes2=8, num_vars=3, width_time=32)
    assert fused_supported(m, (100, 3, 100, 100, 1))
    big = FNO2d(T_in=1, step=1, modes1=8, modes2=8, num_vars=1,
                width_time=32)
    assert not fused_supported(big, (4, 1, 512, 512, 1))


def test_jorek_non_affine_r_grid_routes_to_xla_with_parity():
    """Non-affine major-radius grids (real tokamak npz data can carry
    them) must route jorek_joint_cp_scores_fused AND the chunked
    diff-stats instance to the XLA PRE_JOREK path — previously these
    crashed unpacking _jorek_affine(R) == None — with results matching
    the cp reference computation on the same non-uniform grid."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import jorek_joint_cp_scores_fused
    from cppre.ops.pallas.stencil_kernels import (
        jorek_joint_cp_diff_stats_chunked,
    )
    from cppre.residuals.jorek import PRE_JOREK

    rng = np.random.default_rng(13)
    nx, ny = 12, 16
    R = np.linspace(1.0, 2.0, nx).astype(np.float32) ** 2  # non-affine
    truth = jnp.asarray(rng.standard_normal((4, 3, 7, nx, ny)) + 2.0,
                        jnp.float32)
    pred = truth + 0.05 * jnp.asarray(rng.standard_normal(truth.shape),
                                      jnp.float32)
    pre = PRE_JOREK(R, 1.0, 1.0, 1.0)
    ro, rp = pre.residual(truth, "continuity"), pre.residual(pred, "continuity")
    mod = modulation_func(ro, rp) + 1e-6
    expected = np.asarray(ncf_metric_joint(ro, rp, mod))
    got = np.asarray(jorek_joint_cp_scores_fused(truth, pred, R))
    np.testing.assert_allclose(got, expected, rtol=1e-4)

    diff, s, sq = jorek_joint_cp_diff_stats_chunked(truth, pred, R)
    np.testing.assert_allclose(np.asarray(diff), np.asarray(ro - rp),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s),
                               np.asarray(jnp.sum(ro - rp, axis=0)),
                               atol=1e-5)


@pytest.mark.parametrize("nx,ny", [(16, 16), (10, 12)])
def test_fused_train_apply_grad_parity(nx, ny):
    """make_fused_train_apply: the fused Pallas forward with the XLA-block
    custom_vjp must match model.apply in BOTH value and gradient (the vjp
    rule is the flax block itself), including through a remat'd AR
    rollout-loss step — the training-path pass-fusion of VERDICT r2 #5."""
    from cppre.models import FNO2d, make_fused_train_apply
    from cppre.train.loops import rollout_loss

    m = FNO2d(T_in=2, step=2, modes1=4, modes2=4, num_vars=1, width_time=8)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 1, nx, ny, 2)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((3, 1, nx, ny, 4)), jnp.float32)
    v = m.init(jax.random.PRNGKey(5), x)
    fused_apply = make_fused_train_apply(m)

    loss_fn = lambda p, a: jnp.mean((a - p) ** 2)

    def loss_ref(params):
        return rollout_loss(m.apply, params, x, y, 2, 4, loss_fn)[0]

    def loss_fused(params):
        return rollout_loss(fused_apply, params, x, y, 2, 4, loss_fn)[0]

    l_ref, g_ref = jax.value_and_grad(loss_ref)(v)
    l_fus, g_fus = jax.value_and_grad(loss_fused)(v)
    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-4)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fus)
    scale = np.abs(np.asarray(flat_r)).max()
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               atol=5e-4 * max(scale, 1.0))


def test_fused_block_bwd_kernel_matches_xla_vjp():
    """fno_block2d_bwd_fused: every output (dx, spectral/mlp/bypass weight
    grads incl. cross-batch+variable accumulation, dx3) must match jax.vjp
    of the flax block math. B=3, V=2 pins the grid-accumulation paths."""
    from cppre.models.fused import _bias_branch, _block_xla
    from cppre.ops.pallas.fno_block import fno_block2d_bwd_fused

    from cppre.models import FNO2d

    m1 = m2 = 4
    w, nv, nx, ny = 8, 2, 16, 16
    model = FNO2d(T_in=1, step=1, modes1=m1, modes2=m2, num_vars=nv,
                  width_time=w)
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((3, nv, nx, ny, 1)), jnp.float32)
    v = model.init(jax.random.PRNGKey(3), x)
    bp = v["params"]["f0"]
    grid_c = jnp.transpose(model.get_grid(x.shape)[:1], (0, 4, 1, 2, 3))
    x3 = _bias_branch(bp, grid_c)
    z = jnp.asarray(rng.standard_normal((3, w, nv, nx, ny)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((3, w, nv, nx, ny)), jnp.float32)

    _, vjp = jax.vjp(lambda a, b, c: _block_xla(a, b, c, m1, m2), z, bp, x3)
    dz_ref, dbp_ref, dx3_ref = vjp(g)

    outs = fno_block2d_bwd_fused(z, g, bp, x3, m1, m2, interpret=True)
    from cppre.models.fused import _bwd_grads_to_tree

    dz, dbp, dx3 = _bwd_grads_to_tree(bp, outs, m1)

    def close(a, b, what):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a, b, atol=2e-4 * scale, err_msg=what)

    close(dz, dz_ref, "dz")
    close(dx3, dx3_ref, "dx3")
    for path in [("SpectralConv2d_0", "weights1_re"),
                 ("SpectralConv2d_0", "weights1_im"),
                 ("SpectralConv2d_0", "weights2_re"),
                 ("SpectralConv2d_0", "weights2_im")]:
        close(dbp[path[0]][path[1]], dbp_ref[path[0]][path[1]], str(path))
    for mod, layer in [("_ChannelMLP_0", "Dense_0"), ("_ChannelMLP_0", "Dense_1"),
                       ("_Channel1x1_0", "Dense_0")]:
        close(dbp[mod][layer]["kernel"], dbp_ref[mod][layer]["kernel"],
              f"{mod}.{layer}.kernel")
        close(dbp[mod][layer]["bias"], dbp_ref[mod][layer]["bias"],
              f"{mod}.{layer}.bias")


@pytest.mark.parametrize("ny,step", [(16, 1), (12, 2)])
def test_fused_projection_fwd_and_bwd_parity(ny, step):
    """projection2d_fused (+ its backward kernel): value and all gradients
    vs the XLA fc1->gelu->fc2 head, incl. non-8-aligned Ny via padding."""
    from cppre.models.fused import (_fused_projection, _projection_xla)

    rng = np.random.default_rng(31)
    w, wp, nx = 8, 24, 10
    z = jnp.asarray(rng.standard_normal((3, 2, nx, ny, w)), jnp.float32)
    fc1 = {"kernel": jnp.asarray(rng.standard_normal((w, wp)), jnp.float32),
           "bias": jnp.asarray(rng.standard_normal(wp), jnp.float32)}
    fc2 = {"kernel": jnp.asarray(rng.standard_normal((wp, step)), jnp.float32),
           "bias": jnp.asarray(rng.standard_normal(step), jnp.float32)}

    ref = np.asarray(_projection_xla(z, fc1, fc2))
    out = np.asarray(_fused_projection(z, fc1, fc2, True, "pallas"))
    np.testing.assert_allclose(out, ref, atol=3e-5 * max(np.abs(ref).max(), 1))

    def loss_pallas(z_, fc1_, fc2_):
        return jnp.sum(jnp.sin(_fused_projection(z_, fc1_, fc2_, True,
                                                 "pallas")))

    def loss_ref(z_, fc1_, fc2_):
        return jnp.sum(jnp.sin(_projection_xla(z_, fc1_, fc2_)))

    g = jax.grad(loss_pallas, argnums=(0, 1, 2))(z, fc1, fc2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(z, fc1, fc2)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = max(np.abs(np.asarray(b)).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4 * scale)
