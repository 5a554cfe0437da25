"""CalibratedSurrogate serving bundle: calibrate-once / serve-many.

Oracles: (a) the serving accept decision IS the reference's selection
filter, so on exchangeable data the accept rate must sit at >= 1 - alpha
within binomial noise (`Joint/Advection_Residuals_CP.py:327-336`);
(b) the calibration state must match the experiment engine's
(`experiments.pipeline.joint_cp`) bit-for-bit on the same residuals;
(c) the save/load bundle must reproduce the serving outputs exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cppre.deploy import CalibratedSurrogate
from cppre.models import FNO2d


def _wave_like_setup(nvar=1, nx=12, ny=12, t_in=1, t_out=4, n=48, seed=0):
    """Tiny surrogate + smooth synthetic trajectories (no training: an
    untrained model is a fixed measurable function, which is all CP needs)."""
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, nx)[:, None]
    y = np.linspace(0, 1, ny)[None, :]
    t = np.arange(t_in + t_out)
    amp = rng.uniform(0.5, 1.5, size=(n, nvar, 1, 1, 1))
    ph = rng.uniform(0, 2 * np.pi, size=(n, nvar, 1, 1, 1))
    field = amp * np.sin(2 * np.pi * (x[None, None, :, :, None]
                                      + y[None, None, :, :, None])
                         + ph + 0.3 * t[None, None, None, None, :])
    data = jnp.asarray(field, jnp.float32)  # [n, nvar, nx, ny, T]

    model = FNO2d(T_in=t_in, step=1, modes1=4, modes2=4, num_vars=nvar,
                  width_time=8)
    params = model.init(jax.random.PRNGKey(3), data[:1, ..., :t_in])

    def residual_fn(fields):  # [B, Nvar, Nt, Nx, Ny] -> interior Laplacian-ish
        d = (fields[..., 1:, :, :] - fields[..., :-1, :, :])
        return d[..., 1:-1, 1:-1]

    return model, params, residual_fn, data


def test_joint_pre_accept_rate_tracks_alpha():
    model, params, residual_fn, data = _wave_like_setup(n=120)
    t_in, t_out = 1, 4
    srv = CalibratedSurrogate(model, params, residual_fn, step=1,
                              T_out=t_out, mode="joint", score="pre")
    # holdout modulation: the guarantee-carrying estimator (in-sample
    # modulation — reference semantics — undercovers on noise-dominated
    # residuals; quantified in RESULTS.md "2-D Wave")
    srv.calibrate(data[:80, ..., :t_in], alpha=0.2, holdout_modulation=True)
    out = srv.predict(data[80:, ..., :t_in])
    assert out["prediction"].shape == data[80:, ..., t_in:t_in + t_out].shape
    lo, hi = out["sets"]
    assert lo.shape == out["residual"].shape
    # exchangeable serving samples: accept rate >= 1 - alpha - binomial noise
    rate = float(np.mean(np.asarray(out["accept"])))
    assert rate >= 0.8 - 3 * np.sqrt(0.2 * 0.8 / 40), rate


def test_matches_pipeline_joint_cp_state():
    from cppre.experiments.pipeline import joint_cp

    model, params, residual_fn, data = _wave_like_setup(n=60)
    t_in = 1
    srv = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                              mode="joint", score="pre")
    srv.calibrate(data[:40, ..., :t_in], alpha=0.1)
    # same residuals through the experiment engine
    _, res_cal = srv._rollout(data[:40, ..., :t_in])
    _, res_new = srv._rollout(data[40:, ..., :t_in])
    ref = joint_cp(None, res_cal, res_new, mode="pre", alpha=0.1)
    np.testing.assert_array_equal(np.asarray(srv.qhat),
                                  np.asarray(ref["qhat"]))
    np.testing.assert_array_equal(np.asarray(srv.modulation),
                                  np.asarray(ref["modulation"]))
    lo, hi = srv.sets(res_new)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(ref["sets"][0]))
    accept = srv.predict(data[40:, ..., :t_in])["accept"]
    np.testing.assert_array_equal(np.asarray(accept),
                                  np.asarray(ref["filter_mask"]))


def test_marginal_aer_needs_truth_and_filters():
    model, params, residual_fn, data = _wave_like_setup(n=40)
    t_in, t_out = 1, 4
    srv = CalibratedSurrogate(model, params, residual_fn, step=1,
                              T_out=t_out, mode="marginal", score="aer+pre")
    with pytest.raises(ValueError):
        srv.calibrate(data[:30, ..., :t_in], alpha=0.1)
    srv.calibrate(data[:30, ..., :t_in],
                  data[:30, ..., t_in:t_in + t_out], alpha=0.1)
    out = srv.predict(data[30:, ..., :t_in])
    assert out["accept"].shape == (10,)
    assert srv.qhat.shape == out["residual"].shape[1:]  # per-cell qhat
    # the accept decision must be falsifiable (not res-vs-sets(res), which
    # is vacuously true): a physics-violating input must be rejected while
    # in-distribution inputs pass. Rejection here takes a LARGE violation:
    # the aer+pre width is wide (~0.4 — the synthetic truth is not
    # residual-free, so scores ~ |res_out|), the FNO's mode truncation
    # attenuates white noise ~70x, and the untrained model's noise
    # response leaves >50% of residual cells near zero (spatially
    # heavy-tailed) until the residual dwarfs the band everywhere.
    rng = np.random.default_rng(7)
    garbage = jnp.asarray(
        5e3 * rng.standard_normal(data[30:, ..., :t_in].shape), jnp.float32)
    out_bad = srv.predict(garbage)
    assert not bool(np.any(np.asarray(out_bad["accept"])))
    assert bool(np.all(np.asarray(out["accept"])))


def test_save_load_roundtrip_bitexact(tmp_path):
    model, params, residual_fn, data = _wave_like_setup(n=50)
    t_in = 1
    srv = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                              mode="joint", score="pre")
    srv.calibrate(data[:40, ..., :t_in], alpha=0.15,
                  holdout_modulation=True)
    prefix = str(tmp_path / "bundle" / "wave_v1")
    srv.save(prefix)
    srv2 = CalibratedSurrogate.load(prefix, model, residual_fn)
    assert srv2.alpha == 0.15 and srv2.mode == "joint"
    a_new = data[40:, ..., :t_in]
    out1, out2 = srv.predict(a_new), srv2.predict(a_new)
    np.testing.assert_array_equal(np.asarray(out1["prediction"]),
                                  np.asarray(out2["prediction"]))
    np.testing.assert_array_equal(np.asarray(out1["sets"][0]),
                                  np.asarray(out2["sets"][0]))
    np.testing.assert_array_equal(np.asarray(out1["accept"]),
                                  np.asarray(out2["accept"]))


def test_recalibrate_matches_fresh_calibrate_and_survives_load(tmp_path):
    model, params, residual_fn, data = _wave_like_setup(n=50)
    t_in = 1
    srv = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                              mode="joint", score="pre")
    srv.calibrate(data[:40, ..., :t_in], alpha=0.1)
    q_01 = np.asarray(srv.qhat)
    srv.recalibrate(0.3)
    fresh = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                                mode="joint", score="pre")
    fresh.calibrate(data[:40, ..., :t_in], alpha=0.3)
    np.testing.assert_array_equal(np.asarray(srv.qhat),
                                  np.asarray(fresh.qhat))
    # roundtrip: a loaded bundle can still move alpha
    prefix = str(tmp_path / "b")
    srv.save(prefix)
    srv2 = CalibratedSurrogate.load(prefix, model, residual_fn)
    srv2.recalibrate(0.1)
    np.testing.assert_array_equal(np.asarray(srv2.qhat), q_01)


def test_mesh_sharded_serving_parity():
    """dp-sharded serving (uneven batch) must match single-device serving
    exactly — the 8-virtual-device CPU mesh from conftest."""
    from cppre.parallel import make_mesh

    model, params, residual_fn, data = _wave_like_setup(n=40)
    t_in = 1
    mesh = make_mesh(8, dp=8, tp=1)
    srv1 = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4)
    srvm = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                               mesh=mesh)
    srv1.calibrate(data[:30, ..., :t_in], alpha=0.1)   # n_cal=30: uneven
    srvm.calibrate(data[:30, ..., :t_in], alpha=0.1)
    # partitioned execution reorders reductions and the AR rollout + the
    # sup-norm score amplify the ~1e-7 per-step float noise; the same
    # band as tests/test_parallel.py's sharded-scores parity
    np.testing.assert_allclose(np.asarray(srv1.qhat), np.asarray(srvm.qhat),
                               rtol=5e-4)
    o1 = srv1.predict(data[30:, ..., :t_in])           # batch 10: uneven
    om = srvm.predict(data[30:, ..., :t_in])
    np.testing.assert_allclose(np.asarray(o1["prediction"]),
                               np.asarray(om["prediction"]),
                               rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(o1["accept"]),
                                  np.asarray(om["accept"]))


def test_fused_serving_parity():
    """fused=True routes the rollout through the Pallas blocks (interpret
    mode on CPU) and must agree with the XLA serving path."""
    from cppre.models.fused import fused_supported

    model, params, residual_fn, data = _wave_like_setup(nx=16, ny=16, n=24)
    t_in = 1
    if not fused_supported(model, (24, 1, 16, 16, t_in)):
        pytest.skip("fused path unsupported at this toy shape")
    srv_x = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4)
    srv_f = CalibratedSurrogate(model, params, residual_fn, step=1, T_out=4,
                                fused=True)
    srv_x.calibrate(data[:16, ..., :t_in], alpha=0.1)
    srv_f.calibrate(data[:16, ..., :t_in], alpha=0.1)
    o_x = srv_x.predict(data[16:, ..., :t_in])
    o_f = srv_f.predict(data[16:, ..., :t_in])
    np.testing.assert_allclose(np.asarray(o_x["prediction"]),
                               np.asarray(o_f["prediction"]),
                               atol=5e-6, rtol=0)
    np.testing.assert_array_equal(np.asarray(o_x["accept"]),
                                  np.asarray(o_f["accept"]))
