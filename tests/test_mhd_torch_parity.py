"""BASELINE.json target: 2-D MHD residuals match the PyTorch reference to
1e-6 rel-tol.

An independent torch transcript of the reference MHD energy residual
(`/root/reference/Joint/MHD_Residuals_CP.py:247-256`) — F.conv3d with the
reference's own kernels, INCLUDING its D_y == D_t quirk — is compared
against `PRE_MHD(..., legacy_y_axis=True)` on random multi-field data.
The corrected default (true y-derivatives) is asserted to differ, proving
the legacy switch actually gates the behaviour.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp
import torch.nn.functional as F

from cppre.residuals.mhd import PRE_MHD

GAMMA = 5.0 / 3.0


def _ref_kernel(domain):
    """The reference kernel_3d embedding (ConvOps_2d.py:17-79), verbatim
    semantics: dims-1 stencils in the centre column, axis mapping
    t->2, x->0, y->1 with NO transpose (the D_y == D_t quirk)."""
    s1 = torch.tensor([[0.0, -1.0, 0.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    k = torch.zeros(3, 3, 3)
    if domain == "t":
        k[:, :, 1] = s1
    elif domain == "x":
        k[1, :, :] = s1
    elif domain == "y":
        k[:, 1, :] = s1  # untransposed: varies along t — the quirk
    return k


def _conv(f, k):
    return F.conv3d(f.unsqueeze(1), k[None, None], padding=1).squeeze(1)


def test_mhd_energy_residual_matches_reference_to_1e6():
    rng = np.random.default_rng(0)
    fields = rng.standard_normal((3, 6, 10, 16, 16)).astype(np.float32)

    # --- torch transcript of the reference residual_energy ---
    t = torch.tensor(fields)
    rho, u, v, p, Bx, By = (t[:, i] for i in range(6))
    D_t = lambda f: _conv(f, _ref_kernel("t"))
    D_x = lambda f: _conv(f, _ref_kernel("x"))
    D_y = lambda f: _conv(f, _ref_kernel("y"))
    p_gas = p - 0.5 * (Bx**2 + By**2)
    res = (D_t(rho) + u * D_x(p) + v * D_y(p)
           + (GAMMA - 2) * (u * Bx + v * By) * (D_x(Bx) + D_y(By))
           + (GAMMA * p_gas + By**2) * D_x(u)
           + (GAMMA * p_gas + Bx**2) * D_y(v)
           - Bx * By * (D_y(u) + D_x(v)))
    expected = res[..., 1:-1, 1:-1, 1:-1].numpy()

    # --- ours, in reference-compatibility mode ---
    pre_legacy = PRE_MHD(0.01, 0.01, 0.01, legacy_y_axis=True)
    ours = np.asarray(pre_legacy.residual_energy(jnp.asarray(fields)))
    scale = np.abs(expected).max()
    np.testing.assert_allclose(ours, expected, rtol=1e-6, atol=1e-6 * scale)

    # the corrected default must NOT equal the quirked reference
    pre_fixed = PRE_MHD(0.01, 0.01, 0.01)
    fixed = np.asarray(pre_fixed.residual_energy(jnp.asarray(fields)))
    assert np.abs(fixed - expected).max() > 1e-3 * scale
