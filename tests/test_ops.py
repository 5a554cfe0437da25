"""Operator-library correctness: stencils, conv paths, FFT agreement,
integrate∘differentiate round-trip, dense-matrix cross-check, and 1e-6 parity
vs the PyTorch semantics (torch runs on CPU as the behavioural oracle).

Asserted versions of the reference's plot-oracle scripts (SURVEY.md §4):
tolerances 5e-5 mean / 1e-4 max for FFT-vs-direct follow
`Utils/fft_conv_pytorch/utils.py:29-33`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cppre.ops import (
    ConvOperator0d,
    ConvOperator1d,
    ConvOperator2d,
    direct_conv,
    fft_conv,
    stencil_1d,
    stencil_2d,
    stencil_shift_add,
    stencil_time_space,
    embed_kernel_3d,
)
from cppre.ops.findiff_matrix import (
    finite_difference_matrix_1d,
    finite_difference_matrix_2d,
)


def test_stencil_tables():
    np.testing.assert_allclose(stencil_1d(1, 2), [-1, 0, 1])
    np.testing.assert_allclose(stencil_1d(2, 2), [1, -2, 1])
    np.testing.assert_allclose(stencil_1d(2, 4), [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], rtol=1e-6)
    np.testing.assert_allclose(stencil_1d(2, 6), [1 / 90, -3 / 20, 3 / 2, -49 / 18, 3 / 2, -3 / 20, 1 / 90], rtol=1e-6)
    np.testing.assert_allclose(stencil_2d(2, 2), [[0, 1, 0], [1, -4, 1], [0, 1, 0]])
    # sum of all stencil weights of a derivative is 0 (annihilates constants)
    for order, taylor in [(1, 2), (1, 4), (2, 2), (2, 4), (2, 6), (3, 2), (3, 4)]:
        assert abs(stencil_1d(order, taylor).sum()) < 1e-6
    # first-moment condition: 1st derivative stencil recovers slope
    s = stencil_1d(1, 4)
    offsets = np.arange(len(s)) - len(s) // 2
    np.testing.assert_allclose((s * offsets).sum(), 1.0, rtol=1e-6)


def test_kernel_3d_embedding():
    s = np.arange(9, dtype=np.float32).reshape(3, 3)
    for axis, plane in [(0, (1, slice(None), slice(None))),
                        (2, (slice(None), slice(None), 1))]:
        k = embed_kernel_3d(s, axis)
        np.testing.assert_array_equal(k[plane], s)
        assert k.sum() == s.sum()
    # axis 1 ('y'): stencil is transposed so its variation axis lands on
    # kernel axis 2 (y) — the reference's untransposed embedding is the
    # D_y == D_t bug (see embed_kernel_3d docstring).
    k = embed_kernel_3d(s, 1)
    np.testing.assert_array_equal(k[:, 1, :], s.T)
    np.testing.assert_array_equal(embed_kernel_3d(s, 1, legacy_y_axis=True)[:, 1, :], s)


def test_shift_add_equals_xla_conv():
    rng = np.random.default_rng(0)
    for ndim, shape in [(1, (4, 33)), (2, (3, 20, 31)), (3, (2, 10, 12, 14))]:
        field = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        kernel = rng.standard_normal((3,) * ndim).astype(np.float32)
        fast = stencil_shift_add(field, kernel)
        # force the XLA conv path by passing a traced kernel
        slow = jax.jit(lambda f, k: direct_conv(f, k))(field, jnp.asarray(kernel))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), atol=1e-5)


def test_direct_conv_matches_torch():
    """1e-6 parity with the reference's F.convNd same-pad cross-correlation."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    # 1d/2d/3d like ConvOps_0d/1d/2d
    cases = [
        ((5, 40), (3,), F.conv1d),
        ((4, 24, 30), (3, 3), F.conv2d),
        ((2, 10, 16, 18), (3, 3, 3), F.conv3d),
    ]
    for shape, kshape, conv_fn in cases:
        field = rng.standard_normal(shape).astype(np.float32)
        kernel = rng.standard_normal(kshape).astype(np.float32)
        ours = np.asarray(direct_conv(jnp.asarray(field), kernel))
        t = conv_fn(
            torch.tensor(field).unsqueeze(1),
            torch.tensor(kernel)[None, None],
            padding=tuple(k // 2 for k in kshape),
        ).squeeze(1).numpy()
        np.testing.assert_allclose(ours, t, rtol=1e-6, atol=3e-6)


def test_fft_conv_matches_direct():
    """Spectral path agrees with direct at the reference tolerances."""
    rng = np.random.default_rng(2)
    for shape, kshape in [((5, 41), (3,)), ((3, 25, 31), (3, 3)), ((2, 11, 13, 15), (3, 3, 3))]:
        field = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        kernel = rng.standard_normal(kshape).astype(np.float32)
        direct = np.asarray(direct_conv(field, kernel))
        spec = np.asarray(
            fft_conv(field[:, None], jnp.asarray(kernel)[None, None],
                     padding=tuple(k // 2 for k in kshape))[:, 0]
        )
        err = np.abs(direct - spec)
        assert err.mean() < 5e-5, err.mean()
        assert err.max() < 1e-4, err.max()


def test_fft_conv_matches_reference_torch_fftconv():
    """Bit-level semantics (even-pad, conjugation, crop) vs a torch transcript
    of the reference fft_conv (independent re-derivation, not imported)."""
    torch = pytest.importorskip("torch")

    def ref_fft_conv(signal, kernel, padding):
        import torch.nn.functional as f
        n = signal.ndim - 2
        pads = [p for p in padding[::-1] for p in (p, p)]
        signal = f.pad(signal, pads)
        signal_size = signal.size()
        if signal.size(-1) % 2 != 0:
            signal = f.pad(signal, [0, 1])
        kernel_padding = [
            pad
            for i in reversed(range(2, signal.ndim))
            for pad in [0, signal.size(i) - kernel.size(i)]
        ]
        padded_kernel = f.pad(kernel, kernel_padding)
        dims = tuple(range(2, signal.ndim))
        s_fr = torch.fft.rfftn(signal.float(), dim=dims)
        k_fr = torch.fft.rfftn(padded_kernel.float(), dim=dims)
        k_fr.imag *= -1
        out = torch.fft.irfftn(s_fr * k_fr, dim=dims)
        crop = [slice(None), slice(None)] + [
            slice(0, signal_size[i] - kernel.size(i) + 1, 1) for i in range(2, signal.ndim)
        ]
        return out[crop]

    rng = np.random.default_rng(3)
    for shape, kshape in [((2, 1, 41), (3,)), ((2, 1, 24, 31), (3, 3)), ((1, 1, 11, 13, 15), (3, 3, 3))]:
        sig = rng.standard_normal(shape).astype(np.float32)
        ker = rng.standard_normal(kshape).astype(np.float32)
        pad = tuple(k // 2 for k in kshape)
        ours = np.asarray(fft_conv(jnp.asarray(sig), jnp.asarray(ker)[None, None], padding=pad))
        theirs = ref_fft_conv(torch.tensor(sig), torch.tensor(ker)[None, None], pad).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_composite_kernel_additivity():
    """Per-term kernels vs additive composite kernel (Tests/test_wave.py:144-176)."""
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((2, 12, 16, 16)), dtype=jnp.float32)
    c, dt, dx = 0.7, 0.01, 0.03
    D_tt = ConvOperator2d("t", 2)
    D_xxyy = ConvOperator2d(("x", "y"), 2)
    per_term = D_tt(u) - (c * dt / dx) ** 2 * D_xxyy(u)
    D = ConvOperator2d()
    D.kernel = D_tt.kernel - (c * dt / dx) ** 2 * D_xxyy.kernel
    composite = D(u)
    np.testing.assert_allclose(np.asarray(per_term), np.asarray(composite), atol=1e-5)


def test_convop_1d_domains():
    """ConvOps_1d: 't' differentiates rows (time), 'x' columns (space)."""
    nt, nx = 32, 48
    t = np.linspace(0, 2 * np.pi, nt)
    x = np.linspace(0, 2 * np.pi, nx)
    u = jnp.asarray(np.sin(t)[:, None] * np.cos(x)[None, :], dtype=jnp.float32)[None]
    dt, dx = t[1] - t[0], x[1] - x[0]
    D_t = ConvOperator1d("t", 1)
    D_x = ConvOperator1d("x", 1)
    dudt = np.asarray(D_t(u))[0] / (2 * dt)
    dudx = np.asarray(D_x(u))[0] / (2 * dx)
    expected_t = np.cos(t)[:, None] * np.cos(x)[None, :]
    expected_x = -np.sin(t)[:, None] * np.sin(x)[None, :]
    interior = (slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(dudt[interior], expected_t[interior], atol=1e-2)
    np.testing.assert_allclose(dudx[interior], expected_x[interior], atol=1e-2)


def test_integrate_differentiate_roundtrip():
    """integrate inverts the spectral conv (Tests/test_wave.py:298-314).

    Exact inversion requires a kernel with no spectral zeros; pure derivative
    kernels annihilate constants (zero DC response) so their deconvolution is
    only a visual-quality inverse in the reference. Both contracts asserted:
    tight recovery for a zero-free kernel, bounded error for the Laplacian on
    a compact Gaussian (the reference's example, ConvOps_2d.py:340-346).
    """
    nt, nx, ny = 20, 32, 32
    tt, xx, yy = np.meshgrid(
        np.linspace(-1, 1, nt), np.linspace(-1, 1, nx), np.linspace(-1, 1, ny), indexing="ij"
    )
    u_np = np.exp(-(tt**2 + xx**2 + yy**2) / 0.08).astype(np.float32)
    u = jnp.asarray(u_np)[None]
    interior = (slice(4, -4), slice(4, -4), slice(4, -4))

    # identity + 0.2*D_tt: spectrum in [0.2, 1] -> exact inversion
    ident = embed_kernel_3d(np.float32([[0, 0, 0], [0, 1, 0], [0, 0, 0]]), 2)
    D = ConvOperator2d()
    D.kernel = ident + 0.2 * np.asarray(ConvOperator2d("t", 2).kernel)
    rec = np.asarray(D.integrate(D.spectral_convolution(u), slice_pad=True))[0]
    assert np.abs(rec[interior] - u_np[interior]).max() < 1e-4

    # Laplacian (zero DC): recovery up to low-mode leakage, like the reference
    D2 = ConvOperator2d(("x", "y"), 2)
    diff = D2.differentiate(u, correlation=True, slice_pad=True)
    rec2 = np.asarray(D2.integrate(diff, correlation=False, slice_pad=True))[0]
    assert np.abs(rec2[interior] - u_np[interior]).max() < 0.3


def test_conv_matches_dense_matrix():
    """Conv-FD vs dense FD-matrix multiply (Tests/test_wave.py:212-296)."""
    rng = np.random.default_rng(6)
    nx, ny = 12, 14
    field = rng.standard_normal((nx, ny)).astype(np.float32)
    stencil = stencil_2d(2, 2)
    mat = finite_difference_matrix_2d(nx, ny, stencil)
    via_matrix = (mat @ field.reshape(-1)).reshape(nx, ny)
    via_conv = np.asarray(stencil_shift_add(jnp.asarray(field)[None], stencil))[0]
    np.testing.assert_allclose(via_conv, via_matrix, rtol=1e-4, atol=1e-5)


def test_convop_0d_integrate_quirk():
    """ConvOps_0d.integrate drops padding and crops (ConvOps_0d.py:200-232):
    round-trip recovers the signal up to k//2 cells and edge effects."""
    t = np.linspace(0, 4 * np.pi, 200)
    sig = jnp.asarray(np.sin(t), dtype=jnp.float32)[None]
    D = ConvOperator0d(order=2)
    diff = D.differentiate(sig, correlation=True, slice_pad=True)
    rec = D.integrate(diff, correlation=False)
    rec = np.asarray(rec)[0]
    ref = np.asarray(sig)[0]
    # quirk contract: output is k-1 shorter and shifted by one sample
    # (the reference example compensates by plotting retrieved[1:-1],
    # ConvOps_0d.py:282-287)
    assert rec.shape[0] == ref.shape[0] - 2
    err = np.abs(rec[5:-5] - ref[6:-6])
    assert err.max() < 0.1, err.max()


def test_operators_jittable_and_vmappable():
    u = jnp.ones((2, 8, 10, 12))
    D = ConvOperator2d("t", 2)

    @jax.jit
    def f(op, field):
        return op(field)

    out = f(D, u)  # operator as a pytree argument (kernel traced)
    assert out.shape == u.shape
    out2 = jax.jit(lambda field: D(field))(u)  # closed over (kernel constant)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # grad through the kernel (physics-informed path)
    def loss(op, field):
        return jnp.sum(op(field) ** 2)
    g = jax.grad(lambda k: loss(ConvOperator2d.tree_unflatten(("direct",), (k,)), u))(jnp.asarray(D.kernel))
    assert g.shape == D.kernel.shape


def test_y_domain_differentiates_along_y():
    """Regression for the reference bug where ConvOperator('y', n) produced
    the same kernel as ConvOperator('t', n) (ConvOps_2d.py:67-79 embeds the
    axis-1 stencil untransposed). Here 'y' must really differentiate along
    the last axis, and legacy mode must reproduce the reference kernel."""
    import jax.numpy as jnp
    import numpy as np
    from cppre.ops.convops import ConvOperator2d

    nt, nx, ny = 8, 8, 10
    yy = jnp.broadcast_to(jnp.linspace(0.0, 1.0, ny), (1, nt, nx, ny))
    tt = jnp.broadcast_to(jnp.linspace(0.0, 1.0, nt)[:, None, None], (1, nt, nx, ny))

    D_y = ConvOperator2d("y", 1)
    dy = 1.0 / (ny - 1)
    interior = np.asarray(D_y(yy))[0, 2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(interior, 2 * dy, rtol=1e-4)
    # and it must NOT respond to time variation
    np.testing.assert_allclose(np.asarray(D_y(tt))[0, 2:-2, 2:-2, 2:-2], 0.0, atol=1e-6)

    # legacy mode reproduces the reference's (buggy) t-equal kernel
    D_y_legacy = ConvOperator2d("y", 1, legacy_y_axis=True)
    D_t = ConvOperator2d("t", 1)
    np.testing.assert_array_equal(np.asarray(D_y_legacy.kernel), np.asarray(D_t.kernel))


def test_bare_invalid_stencil_leaves_kernel_none():
    """ConvOperator(('x','y'), 1) has no stencil table entry; the reference
    silently constructs a kernel-less operator (ConvOps_2d.py:98-125)."""
    from cppre.ops.convops import ConvOperator2d

    op = ConvOperator2d(("x", "y"), 1)
    assert op.kernel is None


def test_vector_differentiate_matches_torch_reference():
    """Variable-coefficient `differentiate(vector=...)` parity vs the
    reference implementation (`Inverse_residuals/tests/
    vector_residuals_test.py:32-85`). Note: the reference's Fourier-space
    triple product is a circular convolution with the vector, NOT pointwise
    multiplication — it does not compute x*dy/dx (its own plot-based test
    shows a large discrepancy); we reproduce it bit-for-bit, and the correct
    variable-coefficient form is simply `vector * D(field)`."""
    import torch
    import torch.nn.functional as F
    import jax.numpy as jnp
    from cppre.ops.convops import ConvOperator0d

    x = np.linspace(0, np.pi, 100, dtype=np.float32)
    y = np.sin(x).astype(np.float32)
    k = np.array([-1.0, 0.0, 1.0], dtype=np.float32)

    # torch reference path
    field = torch.tensor(y)[None, None]
    padded = F.pad(field, (1, 1))
    f_fft = torch.fft.rfftn(padded, dim=(2,))
    pk = F.pad(torch.tensor(k)[None, None], (0, padded.size(2) - 3))
    k_fft = torch.fft.rfftn(pk, dim=(2,))
    pv = F.pad(torch.tensor(x)[None, None], (1, 1))
    v_fft = torch.fft.rfftn(pv, dim=(2,))
    k_fft.imag *= -1
    out = torch.fft.irfftn(f_fft * k_fft * v_fft, dim=(2,))[:, :, : padded.size(2) - 2]
    ref = out[0, 0].numpy()

    D = ConvOperator0d(order=1)
    ours = np.asarray(D.differentiate(jnp.asarray(y)[None], vector=jnp.asarray(x)[None],
                                      correlation=True))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-2, rtol=1e-4)


def test_vector_differentiate_per_sample_batch():
    """Regression: a batched per-sample `vector` must apply each sample's
    own coefficients (previously sample 0's vector leaked to all samples)."""
    import jax.numpy as jnp
    from cppre.ops.convops import ConvOperator0d

    x = np.linspace(0, np.pi, 64, dtype=np.float32)
    y1 = np.sin(x).astype(np.float32)
    y2 = np.cos(x).astype(np.float32)
    v1 = x
    v2 = 2.0 * x
    D = ConvOperator0d(order=1)
    batched = np.asarray(D.differentiate(
        jnp.stack([jnp.asarray(y1), jnp.asarray(y2)]),
        vector=jnp.stack([jnp.asarray(v1), jnp.asarray(v2)]),
        correlation=True))
    single_0 = np.asarray(D.differentiate(jnp.asarray(y1)[None],
                                          vector=jnp.asarray(v1)[None],
                                          correlation=True))[0]
    single_1 = np.asarray(D.differentiate(jnp.asarray(y2)[None],
                                          vector=jnp.asarray(v2)[None],
                                          correlation=True))[0]
    np.testing.assert_allclose(batched[0], single_0, atol=1e-4)
    np.testing.assert_allclose(batched[1], single_1, atol=1e-4)


def test_fft_conv_groups_match_torch():
    """Grouped FFT conv vs torch F.conv2d(groups=...) — upstream semantics
    (the reference's vendored copy accepts `groups` but ignores it,
    `fft_conv.py:115`; documented deviation)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(7)
    sig = rng.standard_normal((2, 6, 12, 14)).astype(np.float32)
    ker = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)  # groups=2
    ours = np.asarray(fft_conv(jnp.asarray(sig), jnp.asarray(ker), groups=2,
                               padding=1))
    theirs = F.conv2d(torch.tensor(sig), torch.tensor(ker), groups=2,
                      padding=1).numpy()
    assert np.abs(ours - theirs).mean() < 5e-5
    assert np.abs(ours - theirs).max() < 1e-3


def test_fftconv_module_wrappers():
    """FFTConv1d/2d layer surface (reference _FFTConv, fft_conv.py:134-211):
    init/apply with weight+bias params, grouped, matches direct conv."""
    import torch
    import torch.nn.functional as F

    from cppre.ops.fftconv import FFTConv1d, FFTConv2d

    layer = FFTConv2d(in_channels=4, out_channels=6, kernel_size=3,
                      padding=1, groups=2)
    params = layer.init(0)
    assert params["weight"].shape == (6, 2, 3, 3)
    assert params["bias"].shape == (6,)
    rng = np.random.default_rng(8)
    sig = rng.standard_normal((2, 4, 10, 12)).astype(np.float32)
    out = np.asarray(layer.apply(params, jnp.asarray(sig)))
    ref = F.conv2d(torch.tensor(sig), torch.tensor(np.asarray(params["weight"])),
                   bias=torch.tensor(np.asarray(params["bias"])),
                   padding=1, groups=2).numpy()
    assert np.abs(out - ref).max() < 1e-3

    l1 = FFTConv1d(in_channels=2, out_channels=2, kernel_size=5, bias=False)
    p1 = l1.init(1)
    sig1 = rng.standard_normal((3, 2, 20)).astype(np.float32)
    out1 = np.asarray(l1.apply(p1, jnp.asarray(sig1)))
    ref1 = F.conv1d(torch.tensor(sig1),
                    torch.tensor(np.asarray(p1["weight"]))).numpy()
    assert np.abs(out1 - ref1).max() < 1e-3

    with pytest.raises(ValueError):
        FFTConv2d(in_channels=5, out_channels=4, kernel_size=3, groups=2)


def test_integrate_matches_dense_matrix_inverse():
    """Deconvolution cross-check vs dense linear algebra (VERDICT r2 item 5;
    reference `Utils/FinDiff_MM.py:100` + `Tests/MM_FinDiff.py`): recover u
    from the residual two independent ways — `np.linalg.inv` of the dense FD
    operator matrix, and `spectral_integrate`'s eps-regularised FFT
    deconvolution — and assert they agree away from the boundary (where the
    zero-extension matrix and the zero-padded circular FFT differ) for
    kernels whose spectrum is bounded away from the eps nullspace."""
    # --- 1-D (ConvOps_0d world): SHO-style composite m*D_tt + dt^2*k*I ----
    n = 64
    t = np.linspace(0, 4 * np.pi, n)
    u = np.exp(-((t - 2 * np.pi) ** 2) / 2.0).astype(np.float32)
    for base in (np.float32([0, 1, 0]) + 0.2 * np.float32([1, -2, 1]),
                 np.float32([1, -2, 1]) + 5.0 * np.float32([0, 1, 0])):
        D = ConvOperator0d()
        D.kernel = jnp.asarray(base)
        M = finite_difference_matrix_1d(n, base)
        r = np.asarray(D.spectral_convolution(jnp.asarray(u)[None]))[0]
        np.testing.assert_allclose(r, M @ u, atol=1e-5)  # forward parity
        u_mat = np.linalg.inv(M) @ r
        u_fft = np.asarray(D.integrate(jnp.asarray(r)[None], slice_pad=True))[0]
        # 0d integrate crops k-1 cells and shifts by one (the reference's
        # pad-discard quirk, ConvOps_0d.py:200-232): u_fft[i] ~ u[i+1]
        m = 8
        a = u_fft[m : len(u_fft) - m]
        b = u_mat[m + 1 : m + 1 + len(a)]
        assert np.abs(a - b).max() < 1e-4

    # --- 2-D (ConvOps_1d world): identity + 0.2 * Laplacian --------------
    nt, nx = 20, 24
    tt, xx = np.meshgrid(np.linspace(-1, 1, nt), np.linspace(-1, 1, nx),
                         indexing="ij")
    u2 = np.exp(-(tt**2 + xx**2) / 0.3).astype(np.float32)
    ident = np.zeros((3, 3), np.float32)
    ident[1, 1] = 1.0
    k2 = ident + 0.2 * np.asarray(stencil_2d(2, 2), np.float32)
    D2 = ConvOperator1d()
    D2.kernel = jnp.asarray(k2)
    M2 = finite_difference_matrix_2d(nt, nx, k2)
    r2 = np.asarray(D2.spectral_convolution(jnp.asarray(u2)[None]))[0]
    np.testing.assert_allclose(r2, (M2 @ u2.ravel()).reshape(nt, nx), atol=1e-5)
    u_mat2 = (np.linalg.inv(M2) @ r2.ravel()).reshape(nt, nx)
    u_fft2 = np.asarray(D2.integrate(jnp.asarray(r2)[None], slice_pad=True))[0]
    m = 6  # boundary-leakage margin on the small grid
    assert np.abs(u_fft2[m:-m, m:-m] - u_mat2[m:-m, m:-m]).max() < 5e-3
