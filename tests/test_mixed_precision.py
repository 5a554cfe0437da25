"""bf16-activation training path (`models.with_activation_dtype`).

The training forward is activation-HBM-bound on TPU (BASELINE.md roofline),
so training runs with bf16 activations + params over f32 masters while the
CP rollouts keep the untouched f32 apply (exchangeability binds there, not
in SGD — models/fno.py PRECISION comment). These tests pin the contract on
CPU: f32-in/f32-out at the boundary, forward/grad agreement with the f32
path at bf16 rounding scale, and an end-to-end fit that actually trains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppre.models import FNO2d, with_activation_dtype
from cppre.train.loops import fit, rollout_loss
from cppre.train.losses import lp_loss


def _tiny_model(rng=0, nvar=1, spectral_impl="dft"):
    model = FNO2d(T_in=2, step=1, modes1=4, modes2=4, num_vars=nvar,
                  width_time=8, spectral_impl=spectral_impl)
    x = jnp.asarray(np.random.default_rng(rng).standard_normal(
        (3, nvar, 16, 16, 2)), jnp.float32)
    params = model.init(jax.random.PRNGKey(rng), x)
    return model, params, x


def test_output_dtype_and_masters_untouched():
    model, params, x = _tiny_model()
    fast = with_activation_dtype(model.apply)
    out = fast(params, x)
    assert out.dtype == jnp.float32
    # master params were not mutated by the boundary cast
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("spectral_impl", ["dft", "fft"])
def test_forward_matches_f32_at_bf16_scale(spectral_impl):
    model, params, x = _tiny_model(spectral_impl=spectral_impl)
    ref = model.apply(params, x)
    out = with_activation_dtype(model.apply)(params, x)
    # bf16 has an 8-bit mantissa: rounding accumulates to ~1e-2 relative
    # over a 6-block forward on O(1) activations
    scale = float(jnp.max(jnp.abs(ref))) + 1e-12
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 5e-2


def test_grads_f32_finite_and_aligned():
    model, params, x = _tiny_model()
    y = x[..., :1]

    def loss(p, apply_fn):
        return jnp.mean((apply_fn(p, x) - y) ** 2)

    g_ref = jax.grad(lambda p: loss(p, model.apply))(params)
    g_bf = jax.grad(lambda p: loss(p, with_activation_dtype(model.apply)))(params)
    ref_flat = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(g_ref)])
    bf_flat = jnp.concatenate([g.ravel() for g in jax.tree_util.tree_leaves(g_bf)])
    for leaf in jax.tree_util.tree_leaves(g_bf):
        assert leaf.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(bf_flat)))
    cos = float(jnp.vdot(ref_flat, bf_flat)
                / (jnp.linalg.norm(ref_flat) * jnp.linalg.norm(bf_flat) + 1e-12))
    assert cos > 0.99, cos
    ratio = float(jnp.linalg.norm(bf_flat) / (jnp.linalg.norm(ref_flat) + 1e-12))
    assert 0.8 < ratio < 1.25, ratio


def test_fit_trains_under_bf16_activations():
    model, params, x = _tiny_model()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((8, 1, 16, 16, 2)), jnp.float32)
    u = jnp.asarray(0.1 * rng.standard_normal((8, 1, 16, 16, 4)), jnp.float32)
    fast = with_activation_dtype(model.apply)
    params0 = model.init(jax.random.PRNGKey(1), a[:1])
    l0, _ = rollout_loss(fast, params0, a, u, 1, 4, lp_loss)
    trained = fit(fast, params0, a, u, a[-2:], u[-2:], epochs=3, batch_size=4,
                  step=1, T_out=4, loss_func=lp_loss, lr=1e-3)
    l1, _ = rollout_loss(fast, trained, a, u, 1, 4, lp_loss)
    assert np.isfinite(float(l1))
    assert float(l1) < float(l0)
    for leaf in jax.tree_util.tree_leaves(trained):
        assert leaf.dtype == jnp.float32


def test_rollout_carry_stays_f32():
    # the scan carry concatenates the (f32) model output back into the
    # (f32) window; the bf16 cast must stay inside the per-step apply
    model, params, x = _tiny_model()
    fast = with_activation_dtype(model.apply)
    a = x
    u = jnp.concatenate([x[..., :1]] * 4, axis=-1)
    total, pred = rollout_loss(fast, params, a, u, 1, 4, lp_loss)
    assert pred.dtype == jnp.float32


def test_bf16_refuses_fused_train():
    from cppre.experiments.base2d import run_2d_cp

    data = jnp.zeros((12, 1, 16, 16, 6), jnp.float32)
    cfg = {"T_in": 2, "T_out": 4, "Step": 1, "n_train": 4, "n_cal": 4,
           "n_pred": 4, "Modes": 4, "Width_time": 8, "Variables": 1,
           "Epochs": 1, "Batch Size": 4, "Learning Rate": 1e-3,
           "Scheduler Step": 100, "Scheduler Gamma": 0.5}
    with pytest.raises(ValueError, match="bf16"):
        run_2d_cp(data=data, residual_fn=lambda u: u[..., 1:-1, 1:-1, 1:-1],
                  cfg=cfg, fused_train=True, train_precision="bf16",
                  verbose=False)
