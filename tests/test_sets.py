"""Set-propagation tests: zonotope algebra, interval-FFT equivalence,
set_PRE containment."""

import numpy as np

from cppre.sets import (
    Zonotope,
    complex_prod,
    interval_fft,
    inverse_interval_fft,
    propagate_through_deconvolution,
    real_interval,
    set_PRE,
)


def test_zonotope_algebra():
    z1 = Zonotope([0.0, 0.0], [[1.0, 0.0], [0.0, 1.0]])
    z2 = Zonotope([1.0, -1.0], [[0.5], [0.0]])
    s = z1 + z2
    assert s.generators.shape == (2, 3)
    np.testing.assert_allclose(s.center, [1.0, -1.0])
    lo, hi = (2.0 * z1).interval_hull()
    np.testing.assert_allclose(lo, [-2.0, -2.0])
    np.testing.assert_allclose(hi, [2.0, 2.0])
    rot90 = [[0.0, -1.0], [1.0, 0.0]]
    zr = z2.linear_map(rot90)
    np.testing.assert_allclose(zr.center, [1.0, 1.0])
    assert z1.contains([0.5, 0.5]) and not z1.contains([1.5, 0.0])
    v = Zonotope([0.0, 0.0], [[1.0], [0.0]]).vertices()
    assert len(v) == 2


def test_interval_fft_exact_on_degenerate_intervals():
    """Zero-radius intervals must reproduce the plain FFT exactly."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8)
    zs = interval_fft([(v, v) for v in x])
    ref = np.fft.fft(x)
    for h, z in enumerate(zs):
        np.testing.assert_allclose(z.center, [ref[h].real, ref[h].imag], atol=1e-9)
        np.testing.assert_allclose(np.abs(z.generators).sum(), 0.0, atol=1e-12)


def test_vectorized_matches_object_pipeline():
    """The dense contraction must equal the explicit zonotope pipeline."""
    rng = np.random.default_rng(1)
    N = 8
    c = rng.standard_normal(N)
    r = np.abs(rng.standard_normal(N)) * 0.3
    C = rng.standard_normal(N) + 1j * rng.standard_normal(N)

    zs = interval_fft(list(zip(c - r, c + r)))
    zs = [complex_prod(z, C[h]) for h, z in enumerate(zs)]
    back = inverse_interval_fft(zs)
    obj_intervals = [real_interval(z) for z in back]

    oc, orad = propagate_through_deconvolution(c, r, C)
    for (lo, hi), cc, rr in zip(obj_intervals, np.asarray(oc), np.asarray(orad)):
        assert abs(lo - (cc - rr)) < 1e-3
        assert abs(hi - (cc + rr)) < 1e-3


def test_set_pre_bounds_contain_solution():
    """SHO: the propagated solution-space set must contain the padded
    input trajectory (the deconvolution inverts the residual exactly for
    zero-radius edge cells; interior +-|res| intervals contain 0-residual,
    i.e. the feasible set contains the true solution)."""
    t = np.arange(40) * 0.1010101
    x = np.cos(t)  # SHO solution m=k=1
    bounds = set_PRE(x)
    assert len(bounds) == len(x) + 2  # zero-padded signal [0, x, 0]
    lower = np.array([b[0] for b in bounds])
    upper = np.array([b[1] for b in bounds])
    assert np.all(upper >= lower)
    padded = np.concatenate(([0.0], x, [0.0]))
    inside = (padded >= lower - 1e-5) & (padded <= upper + 1e-5)
    assert inside.all(), f"containment violated at {np.where(~inside)}"
    # bounds must be informative, not vacuous
    assert np.median(upper - lower) < 10 * np.abs(x).max()


def test_set_pre_batched_matches_per_sample():
    """The batched jittable set propagation must reproduce the per-sample
    host `set_PRE` bounds (f32 device vs f64 host: ~1e-4 of the bound
    scale) and keep containment for every batch row."""
    import jax
    import jax.numpy as jnp

    from cppre.sets import set_pre_batched

    t = np.arange(40) * 0.1010101
    trajs = np.stack([np.cos(t), np.sin(t), np.cos(1.3 * t) * 0.7])
    lower, upper = jax.jit(set_pre_batched)(jnp.asarray(trajs))
    lower, upper = np.asarray(lower), np.asarray(upper)
    assert lower.shape == (3, len(t) + 2)
    for b in range(trajs.shape[0]):
        ref = set_PRE(trajs[b])
        ref_lo = np.array([r[0] for r in ref])
        ref_up = np.array([r[1] for r in ref])
        scale = max(np.abs(ref_up).max(), 1e-6)
        np.testing.assert_allclose(lower[b], ref_lo, atol=2e-4 * scale,
                                   rtol=1e-4)
        np.testing.assert_allclose(upper[b], ref_up, atol=2e-4 * scale,
                                   rtol=1e-4)
        padded = np.concatenate(([0.0], trajs[b], [0.0]))
        inside = (padded >= lower[b] - 1e-4) & (padded <= upper[b] + 1e-4)
        assert inside.all(), f"batch row {b}: containment violated"
