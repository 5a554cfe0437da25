"""Utils tests: checkpoint round-trip, norms contract, config, runlog, timing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from cppre.utils import (
    Benchmark,
    assert_almost_equal,
    benchmark,
    load_checkpoint,
    load_config,
    load_norms,
    save_checkpoint,
    save_norms,
)
from cppre.utils.runlog import Run


def test_checkpoint_roundtrip(tmp_path):
    from cppre.models import FNO1d

    m = FNO1d(T_in=1, step=1, modes1=4, num_vars=1, width_time=8)
    x = jnp.ones((1, 1, 32, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    path = save_checkpoint(str(tmp_path / "FNO_Wave_testrun"), params)
    restored = load_checkpoint(path, params)
    y1 = m.apply(params, x)
    y2 = m.apply(restored, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_norms_npz_contract(tmp_path):
    from cppre.train.normalizers import MinMaxNormalizer

    x = jnp.asarray(np.random.RandomState(0).rand(4, 8).astype(np.float32))
    n_in, n_out = MinMaxNormalizer(x), MinMaxNormalizer(2 * x)
    path = save_norms(str(tmp_path / "FNO_Wave_testrun"), n_in, n_out)
    # the reference reads keys in_a/in_b/out_a/out_b directly
    z = np.load(path)
    assert set(z.files) == {"in_a", "in_b", "out_a", "out_b"}
    r_in, r_out = load_norms(path)
    np.testing.assert_allclose(np.asarray(r_in.encode(x)), np.asarray(n_in.encode(x)))
    np.testing.assert_allclose(np.asarray(r_out.decode(x)), np.asarray(n_out.decode(x)))


def test_yaml_config_loads():
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "cppre", "uq", "configs", "Wave_FNO.yaml"))
    assert cfg["Case"] == "Wave" and "UQ" in cfg and cfg["T_out"] == 20


def test_runlog_local(tmp_path):
    run = Run().init(name="t", folder=str(tmp_path), metadata={"Case": "Wave"})
    run.update_metadata({"Number of Params": 123})
    run.log_metrics({"loss": 0.5}, step=1)
    run.save_object({"a": np.ones(3)}, name="arrays")
    run.close()
    meta = json.load(open(tmp_path / "t" / "metadata.json"))
    assert meta["Number of Params"] == 123
    assert (tmp_path / "t" / "metrics.jsonl").exists()
    assert (tmp_path / "t" / "artifact" / "arrays.npz").exists()


def test_benchmark_and_tolerance():
    b = benchmark(lambda: np.ones(10), num_iterations=3)
    assert isinstance(b, Benchmark) and b.mean >= 0
    assert_almost_equal(np.ones(5), np.ones(5) + 2e-5)
    try:
        assert_almost_equal(np.ones(5), np.ones(5) + 1e-3)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_validation_helpers():
    from cppre.utils import check_finite, check_shape, scrub_nan_sims

    x = np.ones((3, 4))
    check_finite(x)
    check_shape(x, (3, None))
    try:
        check_finite(np.array([1.0, np.nan]))
        raised = False
    except ValueError:
        raised = True
    assert raised
    fields = np.ones((4, 2, 2))
    fields[1, 0, 0] = np.nan
    clean, mask = scrub_nan_sims(fields, names=["a", "b", "c", "d"], bad_list=["d"])
    assert clean.shape[0] == 2 and list(mask) == [True, False, True, False]


def test_timer_and_trace_helpers():
    from cppre.utils import timer

    with timer("t", sink=None) as t:
        sum(range(1000))
    assert t["seconds"] > 0


def test_experiment_figure_artifacts(tmp_path):
    """Experiments write the reference's coverage/field figure set
    (`Marginal/Advection_Residuals_CP.py:286-300` saves plots per run)."""
    import numpy as np

    from cppre.utils.plot_tools import save_experiment_artifacts

    r = {"mode": "joint", "alphas": np.linspace(0.05, 0.95, 10),
         "coverage_aer_pre": np.linspace(0.95, 0.05, 10),
         "coverage_pre": np.linspace(0.9, 0.05, 10),
         "coverage_aer_pre_holdout": np.linspace(0.97, 0.06, 10),
         "pred_pred": np.random.default_rng(0).random((2, 1, 8, 8, 5))}
    save_experiment_artifacts(r, str(tmp_path), "Smoke")
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["Smoke_joint_coverage.pdf", "Smoke_joint_fields.pdf"]
    assert all((tmp_path / n).stat().st_size > 1000 for n in names)


def test_tpu_bench_chain_preserves_value_and_times():
    """`tpu_bench.chain_calls` must not change the computed result (the
    one-element 1e-30 perturbation is below f32 resolution) and
    `slope_time` must return a positive per-call work estimate."""
    import jax.numpy as jnp

    from cppre.utils.tpu_bench import chain_calls, dispatch_time, slope_time

    def fn(t, p):
        return jnp.sum((t - p) ** 2)

    t = jnp.asarray(np.random.default_rng(0).random((4, 8, 8)), jnp.float32)
    p = t + 0.1
    expect = float(fn(t, p))
    pipe = chain_calls(fn, 7)
    got = float(np.asarray(pipe(t, p)).ravel()[0])
    assert abs(got - expect) <= 1e-6 * abs(expect)
    tm, q0 = dispatch_time(fn, 3, t, p, reps=2)
    assert tm > 0 and abs(q0 - expect) <= 1e-6 * abs(expect)
    work, fixed, q1 = slope_time(fn, t, p, inners=(2, 4, 8), reps=2)
    assert np.isfinite(work) and abs(q1 - expect) <= 1e-6 * abs(expect)


def test_tpu_bench_chain_x64_and_array_outputs():
    """The fori_loop carry is seeded from fn's own output shape/dtype:
    f64 scalars (x64 runs) and small-array outputs must both chain
    without a carry-structure mismatch."""
    import jax
    import jax.numpy as jnp

    from cppre.utils.tpu_bench import chain_calls

    with jax.enable_x64(True):
        t = jnp.asarray(np.random.default_rng(1).random((4, 8)), jnp.float64)
        p = t + 0.25

        def fn64(tt, pp):
            return jnp.sum((tt - pp) ** 2)  # f64 scalar

        got = float(np.asarray(chain_calls(fn64, 3)(t, p)).ravel()[0])
        assert abs(got - float(fn64(t, p))) <= 1e-12 * abs(float(fn64(t, p)))

    t32 = jnp.asarray(np.random.default_rng(2).random((4, 8)), jnp.float32)
    p32 = t32 + 0.5

    def fn_vec(tt, pp):
        return jnp.sum((tt - pp) ** 2, axis=1)  # small array output

    got_v = np.asarray(chain_calls(fn_vec, 3)(t32, p32))
    np.testing.assert_allclose(got_v, np.asarray(fn_vec(t32, p32)), rtol=1e-6)


def test_slope_time_min_interleave_resists_hiccup_window(monkeypatch):
    """A transient tunnel hiccup window must not corrupt the slope fit:
    before 2026-08-20 all reps of one inner count ran back-to-back, so a
    ~35 ms hiccup covering that window under-reported a 1.2 ms/call
    pipeline ~7x (two banked g-sweep rows implied >2 TB/s HBM bandwidth on
    an 819 GB/s part). The harness now warms all pipelines, interleaves
    passes round-robin, and takes the per-count min, so a hiccup spanning
    several consecutive dispatches is fully rejected."""
    import numpy as np

    from cppre.utils import tpu_bench

    inners = (4, 12, 36)
    work_true, fixed_true = 1.2e-3, 28e-3

    class VClock:
        # virtual time: each dispatch advances by its true duration, plus a
        # hiccup on dispatches 3..6 (a contiguous window mid-run, the shape
        # of a real tunnel stall)
        t = 0.0
        dispatches = 0

        def perf_counter(self):
            return self.t

    clock = VClock()

    def fake_chain(fn, inner):
        def pipe(*arrays):
            dur = fixed_true + work_true * inner
            if 3 <= clock.dispatches < 7:
                dur += 35e-3
            clock.dispatches += 1
            clock.t += dur
            return np.asarray(1.0)

        return pipe

    monkeypatch.setattr(tpu_bench, "chain_calls", fake_chain)
    monkeypatch.setattr(tpu_bench, "time", clock)
    work, fixed, q = tpu_bench.slope_time(None, None, inners=inners, reps=4)
    assert q == 1.0
    assert abs(work - work_true) / work_true < 1e-9
    assert abs(fixed - fixed_true) / fixed_true < 1e-9
