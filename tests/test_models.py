"""FNO model tests: shapes, parameter structure, spectral-layer semantics.

Mirrors the reference spec `/root/reference/Other_UQ/Bayesian_Models/
Base_FNO.py` (I/O contract :206, block topology :164-170).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppre.models import FNO1d, FNO2d, SpectralConv1d, SpectralConv2d
from cppre.models.fno import count_params


def test_fno1d_io_contract():
    m = FNO1d(T_in=1, step=1, modes1=8, num_vars=1, width_time=16)
    x = jnp.ones((4, 1, 197, 1))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (4, 1, 197, 1)


def test_fno2d_io_contract():
    m = FNO2d(T_in=20, step=5, modes1=8, modes2=8, num_vars=3, width_time=16)
    x = jnp.ones((2, 3, 32, 32, 20))
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == (2, 3, 32, 32, 5)


def test_spectral_conv_matches_dense_complex_math():
    """Split-complex einsum must equal the naive complex einsum."""
    key = jax.random.PRNGKey(1)
    m = SpectralConv2d(in_channels=4, out_channels=4, num_vars=1, modes1=3, modes2=3)
    x = jax.random.normal(key, (2, 4, 1, 16, 16))
    p = m.init(key, x)
    out = m.apply(p, x)

    w1 = p["params"]["weights1_re"] + 1j * p["params"]["weights1_im"]
    w2 = p["params"]["weights2_re"] + 1j * p["params"]["weights2_im"]
    x_ft = jnp.fft.rfft2(x, axes=(-2, -1))
    out_ft = jnp.zeros((2, 4, 1, 16, 9), dtype=jnp.complex64)
    out_ft = out_ft.at[..., :3, :3].set(
        jnp.einsum("bivxy,iovxy->bovxy", x_ft[..., :3, :3], w1)
    )
    out_ft = out_ft.at[..., -3:, :3].set(
        jnp.einsum("bivxy,iovxy->bovxy", x_ft[..., -3:, :3], w2)
    )
    expected = jnp.fft.irfft2(out_ft, s=(16, 16), axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_spectral_conv_low_pass():
    """With all modes retained and identity-like weights, output is a
    band-limited projection: constant inputs pass through unchanged up to
    weight scaling."""
    m = SpectralConv1d(in_channels=1, out_channels=1, num_vars=1, modes1=4)
    x = jnp.ones((1, 1, 1, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    # constant signal has only the k=0 mode: out = Re(w[0]) * x
    w0 = p["params"]["weights1_re"][0, 0, 0, 0]
    np.testing.assert_allclose(np.asarray(out), float(w0), rtol=1e-5)


def test_count_params_positive_and_jit_roundtrip():
    m = FNO1d(T_in=1, step=1, modes1=4, num_vars=1, width_time=8)
    x = jnp.ones((2, 1, 64, 1))
    p = m.init(jax.random.PRNGKey(0), x)
    assert count_params(p) > 0
    jit_apply = jax.jit(m.apply)
    np.testing.assert_allclose(
        np.asarray(jit_apply(p, x)), np.asarray(m.apply(p, x)), atol=1e-6
    )


def test_spectral_dft_matches_fft_path():
    """The TPU-native truncated-DFT-by-matmul spectral path must equal the
    jnp.fft reference path (same params) to f32 roundoff, including odd
    grids and the 2*m1 == nx no-overlap corner case."""
    import jax
    import jax.numpy as jnp

    from cppre.models import FNO1d, FNO2d

    rng = np.random.default_rng(3)
    for nx, ny, m in [(16, 16, 4), (32, 25, 8), (16, 16, 8)]:
        a = jnp.asarray(rng.standard_normal((2, 2, nx, ny, 2)), jnp.float32)
        kw = dict(T_in=2, step=1, modes1=m, modes2=m, num_vars=2, width_time=8)
        md = FNO2d(**kw)
        mf = FNO2d(**kw, spectral_impl="fft")
        p = md.init(jax.random.PRNGKey(0), a)
        od, of = md.apply(p, a), mf.apply(p, a)
        rel = float(jnp.abs(od - of).max() / jnp.abs(of).max())
        assert rel < 1e-5, (nx, ny, m, rel)
    a1 = jnp.asarray(rng.standard_normal((2, 1, 40, 2)), jnp.float32)
    kw1 = dict(T_in=2, step=1, modes1=8, num_vars=1, width_time=8)
    m1d, m1f = FNO1d(**kw1), FNO1d(**kw1, spectral_impl="fft")
    p1 = m1d.init(jax.random.PRNGKey(1), a1)
    rel = float(jnp.abs(m1d.apply(p1, a1) - m1f.apply(p1, a1)).max())
    assert rel < 1e-5


def test_precision_scope_rebinds_and_restores():
    """`with_matmul_precision` must reach trace time (the wrapped apply is
    traced under the scope -> the lowered HLO carries the requested
    operand precision) and restore the package global afterwards —
    training wants DEFAULT-bf16 MXU passes while the CP phase keeps
    HIGHEST (models/fno.py::precision_scope)."""
    import jax
    import jax.numpy as jnp

    from cppre.models import FNO2d, with_matmul_precision
    from cppre.models import fno as fno_mod

    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=1, width_time=8)
    a = jnp.zeros((2, 1, 16, 16, 1), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), a)

    assert fno_mod.PRECISION == jax.lax.Precision.HIGHEST
    fast = with_matmul_precision(m.apply, "default")
    hlo_fast = jax.jit(fast).lower(v, a).as_text()
    assert fno_mod.PRECISION == jax.lax.Precision.HIGHEST  # restored
    hlo_slow = jax.jit(m.apply).lower(v, a).as_text()
    # the HIGHEST trace pins operand_precision on its dots; the default
    # trace must not (that's the whole point of the knob)
    assert "HIGHEST" in hlo_slow
    assert "HIGHEST" not in hlo_fast
    # math agreement on CPU (precision only affects TPU MXU tiling)
    d = float(jnp.abs(jax.jit(fast)(v, a) - jax.jit(m.apply)(v, a)).max())
    assert d < 1e-5
