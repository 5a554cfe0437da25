"""Numerical parity: flax FNO_multi2d vs the reference torch implementation
with IDENTICAL weights.

The reference model (`/root/reference/Other_UQ/Bayesian_Models/Base_FNO.py`)
is imported and *executed* as the behavioural oracle (never copied); the
flax model's parameters are transplanted into it and the forwards compared.
This pins the whole architecture — grid features, lift, 6 spectral blocks
with skip adds, split-complex einsums, GELU variants, projection — to the
reference at float32 tolerance.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/Other_UQ/Bayesian_Models")

from cppre.models import FNO2d


def _dense_to_linear(linear, params):
    linear.weight.data = torch.tensor(np.asarray(params["kernel"]).T)
    linear.bias.data = torch.tensor(np.asarray(params["bias"]))


def _dense_to_conv3d(conv, params):
    k = torch.tensor(np.asarray(params["kernel"]).T)  # [out, in]
    conv.weight.data = k[:, :, None, None, None]
    conv.bias.data = torch.tensor(np.asarray(params["bias"]))


def _spectral(torch_block, p):
    w1 = np.asarray(p["weights1_re"]) + 1j * np.asarray(p["weights1_im"])
    w2 = np.asarray(p["weights2_re"]) + 1j * np.asarray(p["weights2_im"])
    torch_block.weights1.data = torch.tensor(w1, dtype=torch.cfloat)
    torch_block.weights2.data = torch.tensor(w2, dtype=torch.cfloat)


def test_fno2d_matches_reference_torch_forward():
    from Base_FNO import FNO_multi2d

    kw = dict(T_in=3, step=2, modes1=6, modes2=6, num_vars=2, width_time=12)
    model = FNO2d(**kw)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 24, 24, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    tm = FNO_multi2d(3, 2, 6, 6, 2, 12)
    tm.eval()
    _dense_to_linear(tm.fc0_time, params["fc0_time"])
    _dense_to_linear(tm.fc1_time, params["fc1_time"])
    _dense_to_linear(tm.fc2_time, params["fc2_time"])
    for name in ("f0", "f1", "f2", "f3", "f4", "f5"):
        tb = getattr(tm, name)
        fb = params[name]
        _spectral(tb.conv, fb["SpectralConv2d_0"])
        _dense_to_conv3d(tb.mlp.mlp1, fb["_ChannelMLP_0"]["Dense_0"])
        _dense_to_conv3d(tb.mlp.mlp2, fb["_ChannelMLP_0"]["Dense_1"])
        _dense_to_conv3d(tb.w, fb["_Channel1x1_0"]["Dense_0"])
        _dense_to_conv3d(tb.b, fb["_Channel1x1_1"]["Dense_0"])

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    assert ours.shape == theirs.shape == (2, 2, 24, 24, 2)
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_torch_checkpoint_import_2d(tmp_path):
    """The migration path: a randomly-initialised reference FNO_multi2d
    state_dict saved with torch.save loads into cppre's FNO2d and the
    forwards agree — a reference user's trained .pth works unchanged."""
    from Base_FNO import FNO_multi2d

    from cppre.utils import load_torch_fno

    torch.manual_seed(3)
    tm = FNO_multi2d(3, 2, 6, 6, 2, 12)
    tm.eval()
    path = str(tmp_path / "FNO_ref.pth")
    torch.save(tm.state_dict(), path)

    model = FNO2d(T_in=3, step=2, modes1=6, modes2=6, num_vars=2,
                  width_time=12)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 2, 24, 24, 3)).astype(np.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_torch_fno(path, template)

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_torch_checkpoint_import_1d():
    from Base_FNO import FNO_multi1d

    from cppre.models import FNO1d
    from cppre.utils import fno_params_from_torch

    torch.manual_seed(7)
    tm = FNO_multi1d(3, 2, 6, 2, width_time=12)
    tm.eval()

    model = FNO1d(T_in=3, step=2, modes1=6, num_vars=2, width_time=12)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 2, 32, 3)).astype(np.float32)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = fno_params_from_torch(tm.state_dict(), template)

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        theirs = tm(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=1e-3)


def test_torch_import_shape_mismatch_message():
    """Wrong hyper-parameters must fail loudly with the leaf path, not
    produce silently-wrong params."""
    from Base_FNO import FNO_multi2d

    from cppre.utils import fno_params_from_torch

    tm = FNO_multi2d(3, 2, 4, 4, 2, 12)  # modes=4, template expects 6
    model = FNO2d(T_in=3, step=2, modes1=6, modes2=6, num_vars=2,
                  width_time=12)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 2, 24, 24, 3)))
    with pytest.raises(ValueError, match="shape mismatch"):
        fno_params_from_torch(tm.state_dict(), template)
