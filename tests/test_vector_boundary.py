"""Vector-calculus and boundary-condition tests.

Asserted versions of `Tests/test_convops.py` (vector ops vs hand-composed
scalar operators on a 2-D Gaussian) and `Tests/NS_vector_convops.py`
(NS residual: scalar-composed vs vector-op-composed), plus the
BoundaryManager pad-mode contract (`Utils/boundary_conditions.py:80-182`).
"""

import jax.numpy as jnp
import numpy as np

from cppre.ops.boundary import BoundaryManager
from cppre.ops.convops import ConvOperator2d, ConvOperatorSpatial
from cppre.ops.vector import Curl, Divergence, Gradient, Laplace, cross, cross_true, dot
from cppre.ops import vector_spatial as vs


def _gaussian_field(nt=8, nx=24, ny=24):
    x = np.linspace(-1, 1, nx)
    y = np.linspace(-1, 1, ny)
    X, Y = np.meshgrid(x, y, indexing="ij")
    g = np.exp(-5 * (X**2 + Y**2)).astype(np.float32)
    return jnp.asarray(np.broadcast_to(g, (1, nt, nx, ny)).copy())


def test_vector_ops_equal_hand_composed():
    """Laplace/Divergence/Gradient/Curl == compositions of scalar
    ConvOperators (Tests/test_convops.py:29-93)."""
    u = _gaussian_field()
    v = 2.0 * u
    D_x = ConvOperator2d("x", 1)
    D_y = ConvOperator2d("y", 1)
    D_lap = ConvOperator2d(("x", "y"), 2)

    np.testing.assert_allclose(np.asarray(Divergence()(u, v)),
                               np.asarray(D_x(u) + D_y(v)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Curl()(u, v)),
                               np.asarray(D_x(v) - D_y(u)), atol=1e-5)
    g = Gradient()(u)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(D_x(u)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(D_y(u)), atol=1e-5)
    lap = Laplace()(u)
    np.testing.assert_allclose(np.asarray(lap[0]), np.asarray(D_lap(u)), atol=1e-5)


def test_ns_residual_scalar_vs_vector_composition():
    """Full NS momentum residual assembled from vector ops equals the
    scalar-composed form (Tests/NS_vector_convops.py:152-219)."""
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2, 8, 20, 20)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 8, 20, 20)), jnp.float32)
    p = jnp.asarray(rng.standard_normal((2, 8, 20, 20)), jnp.float32)
    dt, dx, dy, nu = 0.01, 0.05, 0.05, 1e-3
    D_t = ConvOperator2d("t", 1)
    D_x = ConvOperator2d("x", 1)
    D_y = ConvOperator2d("y", 1)
    D_lap = ConvOperator2d(("x", "y"), 2)

    # scalar-composed
    res_x = (D_t(u) * dx * dy + u * D_x(u) * dt * dy + v * D_y(u) * dt * dx
             - nu * D_lap(u) * dt + D_x(p) * dt * dy)
    # vector-composed
    grad_u = Gradient()(u, u)
    res_x_vec = (D_t(u) * dx * dy
                 + dot((u * dt * dy, v * dt * dx), (grad_u[0], grad_u[1]))
                 - nu * Laplace()(u)[0] * dt + Gradient()(p)[0] * dt * dy)
    np.testing.assert_allclose(np.asarray(res_x), np.asarray(res_x_vec), atol=1e-4)


def test_cross_quirk_and_true_cross():
    a = (jnp.asarray([1.0]), jnp.asarray([2.0]))
    b = (jnp.asarray([3.0]), jnp.asarray([4.0]))
    assert float(cross(a, b)[0]) == 1 * 4 + 2 * 3   # reference '+' quirk
    assert float(cross_true(a, b)[0]) == 1 * 4 - 2 * 3


def test_boundary_manager_pad_modes():
    bm = BoundaryManager(kernel_size=3)
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4))

    bm.set_all_boundaries("dirichlet", value=7.0)
    p = np.asarray(bm.pad_signal(x))[0, 0]
    assert p.shape == (5, 6)
    assert (p[0] == 7.0).all() and (p[:, 0] == 7.0).all()

    bm.set_all_boundaries("periodic")
    p = np.asarray(bm.pad_signal(x))[0, 0]
    np.testing.assert_array_equal(p[1:-1, 0], np.asarray(x)[0, 0][:, -1])

    bm.set_all_boundaries("neumann")
    p = np.asarray(bm.pad_signal(x))[0, 0]
    np.testing.assert_array_equal(p[1:-1, 0], np.asarray(x)[0, 0][:, 0])

    bm.set_all_boundaries("symmetric")
    p = np.asarray(bm.pad_signal(x))[0, 0]
    np.testing.assert_array_equal(p[1:-1, 0], np.asarray(x)[0, 0][:, 1])

    # per-side independence
    bm.set_all_boundaries("periodic")
    bm.set_boundary_type("left", "dirichlet", value=-1.0)
    p = np.asarray(bm.pad_signal(x))[0, 0]
    assert (p[1:-1, 0] == -1.0).all()


def test_boundary_apply_convolution_shape_preserving():
    bm = BoundaryManager(kernel_size=3)
    bm.set_all_boundaries("periodic")
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 8, 8)), jnp.float32)
    k = np.asarray([[0, 1, 0], [1, -4, 1], [0, 1, 0]], np.float32)
    out = bm.apply_convolution(x, k)
    assert out.shape == x.shape
    # constant field: periodic Laplacian is exactly zero
    c = jnp.ones((1, 1, 8, 8))
    np.testing.assert_allclose(np.asarray(bm.apply_convolution(c, k)), 0.0, atol=1e-6)


def test_spatial_vector_ops_shapes_and_gradients():
    """VectorConvOps_Spatial: shape preservation via pad+valid conv and a
    linear-field gradient check."""
    nx = 16
    x = np.linspace(0, 1, nx, dtype=np.float32)
    X = np.broadcast_to(x[:, None], (nx, nx))
    f = jnp.asarray(X)[None, None]  # [1, 1, nx, nx], f = x
    grad = vs.Gradient(scale=1.0, boundary_cond="neumann")(f)
    assert grad.shape == (1, 2, nx, nx)
    dx = x[1] - x[0]
    interior = np.asarray(grad)[0, 0, 2:-2, 2:-2]
    np.testing.assert_allclose(interior, dx, rtol=1e-4)  # pre-divided [-1/2,0,1/2]
    div = vs.Divergence()(f, f)
    assert div.shape == (1, 1, nx, nx)
