"""Training-layer tests: rollout semantics, losses, normalizers, fit."""

import jax
import jax.numpy as jnp
import numpy as np

from cppre.train import (
    GaussianNormalizer,
    Identity,
    LpLoss,
    MinMaxNormalizer,
    RangeNormalizer,
    autoregressive_rollout,
    fit,
    validation_AR,
)
from cppre.train.losses import lp_loss
from cppre.train.loops import rollout_loss


def test_rollout_matches_python_loop():
    """lax.scan rollout == the reference's Python re-feed loop
    (training_utils.py:27-45)."""
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (6, 2))

    def apply_fn(x):  # [B, C, N, T_in=6] -> [B, C, N, 2]
        return jnp.einsum("bcnt,ts->bcns", x, w)

    x0 = jax.random.normal(key, (3, 1, 8, 6))
    step, T_out = 2, 8
    pred = autoregressive_rollout(apply_fn, x0, step, T_out)

    xx, chunks = x0, []
    for t in range(0, T_out, step):
        im = apply_fn(xx)
        chunks.append(im)
        xx = jnp.concatenate((xx[..., step:], im), axis=-1)
    expected = jnp.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(expected), atol=1e-5)


def test_validation_ar_metrics():
    apply_fn = lambda x: x[..., -1:]  # persistence model
    a = jnp.ones((2, 1, 4, 1))
    u = jnp.ones((2, 1, 4, 5))
    pred, mse, mae = validation_AR(apply_fn, a, u, 1, 5)
    assert pred.shape == u.shape
    assert float(mse) == 0.0 and float(mae) == 0.0


def test_lp_loss_values():
    pred = jnp.asarray([[3.0, 4.0]])
    tgt = jnp.asarray([[0.0, 4.0]])
    # rel l2 = ||(3,0)|| / ||(0,4)|| = 3/4
    assert abs(float(lp_loss(pred, tgt)) - 0.75) < 1e-6
    loss = LpLoss(size_average=False)
    two = jnp.concatenate([pred, pred])
    two_t = jnp.concatenate([tgt, tgt])
    assert abs(float(loss(two, two_t)) - 1.5) < 1e-6


def test_normalizer_roundtrips():
    x = jnp.asarray(np.random.RandomState(0).rand(4, 3, 5).astype(np.float32)) * 7 - 2
    for cls in (MinMaxNormalizer, RangeNormalizer, GaussianNormalizer, Identity):
        nrm = cls(x)
        np.testing.assert_allclose(
            np.asarray(nrm.decode(nrm.encode(x))), np.asarray(x), atol=1e-4
        )
    nrm = MinMaxNormalizer(x)
    enc = np.asarray(nrm.encode(x))
    assert enc.min() >= -1e-5 and enc.max() <= 1 + 1e-5


def test_fit_reduces_loss():
    """Two epochs of AR training on a linear target must reduce the loss."""
    from cppre.models import FNO1d

    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.rand(16, 1, 32, 6).astype(np.float32))
    a, y = u[..., :1], u[..., 1:6]
    m = FNO1d(T_in=1, step=1, modes1=4, num_vars=1, width_time=8)
    p0 = m.init(jax.random.PRNGKey(0), a)
    loss = lambda pr, tg: lp_loss(pr, tg)
    l0 = float(rollout_loss(m.apply, p0, a, y, 1, 5, loss)[0])
    p1 = fit(m.apply, p0, a, y, a, y, epochs=5, batch_size=8, step=1, T_out=5,
             loss_func=loss, lr=5e-3)
    l1 = float(rollout_loss(m.apply, p1, a, y, 1, 5, loss)[0])
    assert l1 < l0


def test_single_shot_rollout_step_equals_tout():
    """step == T_out (the Expts_initial single-shot configs, where step may
    exceed T_in): no AR carry — one apply, loss/pred shapes intact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cppre.train.loops import rollout_loss
    from cppre.train.rollout import autoregressive_rollout, validation_AR

    step = t_out = 6
    t_in = 4  # step > T_in: the scan carry could never be shape-stable
    apply_fn = lambda x: jnp.repeat(x.mean(axis=-1, keepdims=True), step, -1)
    xx = jnp.ones((3, 1, 8, t_in))
    pred = autoregressive_rollout(apply_fn, xx, step, t_out)
    assert pred.shape == (3, 1, 8, t_out)
    yy = jnp.zeros((3, 1, 8, t_out))
    pred2, mse, mae = validation_AR(apply_fn, xx, yy, step, t_out)
    np.testing.assert_array_equal(np.asarray(pred2), np.asarray(pred))
    loss_fn = lambda p, y: jnp.mean((p - y) ** 2)
    total, pred3 = rollout_loss(lambda p, x: apply_fn(x), None, xx, yy,
                                step, t_out, loss_fn)
    np.testing.assert_array_equal(np.asarray(pred3), np.asarray(pred))
    assert np.isfinite(float(total))


def test_remat_policy_changes_scheduling_never_values():
    """Policy remat ("dots": save MXU contraction outputs in the rollout
    scan) must produce bit-level-close loss AND gradients vs the default
    save-nothing remat and vs no remat — it is a scheduling knob only.
    Also pins `resolve_remat_policy`'s alias/error contract."""
    import pytest

    from cppre.models import FNO1d
    from cppre.train.loops import resolve_remat_policy, rollout_loss

    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.rand(4, 1, 32, 7).astype(np.float32))
    a, y = u[..., :1], u[..., 1:7]
    m = FNO1d(T_in=1, step=1, modes1=4, num_vars=1, width_time=8)
    p0 = m.init(jax.random.PRNGKey(0), a)

    def loss_of(p, remat, policy):
        total, _ = rollout_loss(m.apply, p, a, y, 1, 6, lp_loss,
                                remat=remat, remat_policy=policy)
        return total

    ref_l, ref_g = jax.value_and_grad(loss_of)(p0, True, None)
    for remat, policy in [(True, "dots"), (True, "dots_no_batch"),
                          (False, None)]:
        l, g = jax.value_and_grad(loss_of)(p0, remat, policy)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        for ga, gb in zip(jax.tree_util.tree_leaves(ref_g),
                          jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=1e-5, atol=1e-6)

    assert resolve_remat_policy(None) is None
    fn = lambda *_: True
    assert resolve_remat_policy(fn) is fn
    assert callable(resolve_remat_policy("checkpoint_dots"))
    with pytest.raises(ValueError, match="unknown remat policy"):
        resolve_remat_policy("not_a_policy")
