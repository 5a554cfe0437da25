"""UQ baseline tests: model variants, SWAG statistics, validators, harness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cppre.models import FNO2d
from cppre.models.swag import SWAG
from cppre.models.variants import (
    BayesDense,
    FNO2dBayesian,
    bayes_kl_loss,
    make_dropout_fno,
    make_mle_fno,
    mc_dropout_apply,
)

KW = dict(T_in=1, step=1, modes1=4, modes2=4, num_vars=1, width_time=8)
X = jnp.ones((2, 1, 16, 16, 1))


def test_dropout_fno_mc_variance():
    model = make_dropout_fno(**KW, dropout_rate=0.5)
    params = model.init({"params": jax.random.PRNGKey(0)}, X)
    det = model.apply(params, X)  # deterministic by default
    det2 = model.apply(params, X)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    mc = mc_dropout_apply(model, params, X, jax.random.PRNGKey(1), samples=4)
    assert mc.shape == (4,) + det.shape
    assert float(mc.std(axis=0).mean()) > 0  # dropout live at eval


def test_bayesian_fno_sampling_and_kl():
    model = FNO2dBayesian(**KW)
    rngs = {"params": jax.random.PRNGKey(0), "bayes": jax.random.PRNGKey(1)}
    params = model.init(rngs, X)
    y1 = model.apply(params, X, rngs={"bayes": jax.random.PRNGKey(2)})
    y2 = model.apply(params, X, rngs={"bayes": jax.random.PRNGKey(3)})
    assert float(jnp.abs(y1 - y2).mean()) > 0  # stochastic forward
    kl = bayes_kl_loss(params["params"])
    # at init, q == prior for the log-sigma part and mu != prior_mu -> kl > 0
    assert float(kl) >= 0


def test_mle_fno_emits_mean_logvar():
    model = make_mle_fno(**KW)
    params = model.init(jax.random.PRNGKey(0), X)
    out = model.apply(params, X)
    assert out.shape[-1] == 2  # step*2 channels


def test_swag_mean_and_sampling():
    template = {"w": jnp.zeros((3,)), "b": jnp.zeros((2,))}
    swag = SWAG(template, max_num_models=3)
    snapshots = [
        {"w": jnp.asarray([1.0, 2.0, 3.0]), "b": jnp.asarray([0.0, 1.0])},
        {"w": jnp.asarray([3.0, 2.0, 1.0]), "b": jnp.asarray([2.0, 1.0])},
    ]
    for s in snapshots:
        swag.collect_model(s)
    # ravel_pytree orders keys alphabetically: b (2) then w (3)
    np.testing.assert_allclose(swag.theta[:2], [1.0, 1.0])
    np.testing.assert_allclose(swag.theta[2:], [2.0, 2.0, 2.0])
    sample = swag.sample(jax.random.PRNGKey(0), scale=0.5)
    assert sample["w"].shape == (3,) and sample["b"].shape == (2,)
    # FIFO cap
    for _ in range(5):
        swag.collect_model(snapshots[0])
    assert swag.D.shape[1] == 3


def test_validators_shapes():
    from cppre.uq.validation import (
        validation_aer,
        validation_dropout,
        validation_ensemble,
        validation_mle,
        validation_pre,
    )

    T_out = 4
    u = jnp.ones((2, 1, 16, 16, T_out))
    model = make_dropout_fno(**KW, dropout_rate=0.2)
    params = model.init({"params": jax.random.PRNGKey(0)}, X)
    mean, std, mse, mae = validation_dropout(
        model, params, X, u, 1, T_out, samples=3, key=jax.random.PRNGKey(1))
    assert mean.shape == u.shape and std.shape == u.shape

    base = FNO2d(**KW)
    p1 = base.init(jax.random.PRNGKey(0), X)
    p2 = base.init(jax.random.PRNGKey(1), X)
    mean, std, mse, mae = validation_ensemble(base, [p1, p2], X, u, 1, T_out)
    assert mean.shape == u.shape

    pred, qhat, mse, mae = validation_aer(base, p1, X, u, 1, T_out, alpha=0.2)
    assert qhat.shape == u.shape[1:]

    from cppre.residuals.wave import PRE_Wave

    pre = PRE_Wave(0.1, 0.1)

    class _Wrap:
        def residual(self, fields):
            return pre(fields[:, 0])

    pred, qhat, mse, mae = validation_pre(base, p1, X, u, 1, T_out, 0.2, _Wrap())
    assert np.isfinite(np.asarray(qhat)).all()

    mle = make_mle_fno(**KW)
    pm = mle.init(jax.random.PRNGKey(0), X)
    mean, var, mse, mae = validation_mle(mle, pm, X, u, 1, T_out)
    assert mean.shape == u.shape and (np.asarray(var) > 0).all()


def test_eval_harness_smoke():
    from cppre.uq.eval import evaluate_uq_methods
    from cppre.residuals.wave import PRE_Wave

    base = FNO2d(**KW)
    p = base.init(jax.random.PRNGKey(0), X)
    pre_op = PRE_Wave(0.1, 0.1)

    class _Wrap:
        def residual(self, fields):
            return pre_op(fields[:, 0])

    a = jnp.ones((4, 1, 16, 16, 1))
    u = jnp.ones((4, 1, 16, 16, 4))

    def factory(uq):
        if uq == "Ensemble":
            return base, [p, p]
        return base, p

    banked = []
    res = evaluate_uq_methods(
        methods=["Deterministic", "Ensemble", "AER", "PRE"],
        model_factory=factory, test_a=a, test_u=u, step=1, T_out=4,
        runs=2, n_eval=3, samples=2, pre=_Wrap(), verbose=False,
        on_method_done=lambda uq, r: banked.append((uq, r)))
    assert set(res) == {"Deterministic", "Ensemble", "AER", "PRE"}
    for r in res.values():
        assert np.isfinite(r["l2"][0])
    # incremental banking fires once per method, in order, with the final dict
    assert [uq for uq, _ in banked] == ["Deterministic", "Ensemble", "AER", "PRE"]
    assert banked[-1][1] == res["PRE"]


def test_eval_harness_dp_mesh_parity():
    """`mesh=` dp-shards every validation rollout; bootstrap batches that
    do not divide the dp extent are zero-padded and cropped, and the
    AER/PRE conformal quantile sees only real rows. Statistics must match
    the unsharded run (samples are embarrassingly parallel; rollouts run
    at HIGHEST precision, so shard layout cannot perturb them)."""
    from cppre.parallel import make_mesh
    from cppre.residuals.wave import PRE_Wave
    from cppre.uq.eval import evaluate_uq_methods

    base = FNO2d(**KW)
    p = base.init(jax.random.PRNGKey(0), X)
    pre_op = PRE_Wave(0.1, 0.1)

    class _Wrap:
        def residual(self, fields):
            return pre_op(fields[:, 0])

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((7, 1, 16, 16, 1)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((7, 1, 16, 16, 4)), jnp.float32)
    kw = dict(methods=["Deterministic", "AER", "PRE"],
              model_factory=lambda uq: (base, p), test_a=a, test_u=u,
              step=1, T_out=4, runs=2, n_eval=5, samples=2, pre=_Wrap(),
              verbose=False)
    plain = evaluate_uq_methods(**kw)
    mesh = make_mesh(8, dp=8, tp=1)
    sharded = evaluate_uq_methods(**kw, mesh=mesh)
    for m in plain:
        # host-f64 vs device-f32 metric accumulation and the padded batch
        # shape (7 -> 8) reordering CPU matmul accumulation: ~1e-6 absolute
        np.testing.assert_allclose(sharded[m]["l2"], plain[m]["l2"],
                                   rtol=2e-4, atol=5e-6, err_msg=m)
        # a ~1e-6 rollout perturbation (batch 7 -> 8 accumulation order)
        # can flip borderline cells against the CP bound — allow a few
        # cell flips out of the ~5k counted, not a statistical change
        np.testing.assert_allclose(sharded[m]["coverage"],
                                   plain[m]["coverage"], atol=5e-3,
                                   err_msg=m)

    with pytest.raises(ValueError):
        evaluate_uq_methods(**kw, mesh=mesh, batch_chunk=3)


def test_eval_harness_traces_once_per_method():
    """Regression: the per-method validator must be jitted with the
    bootstrap arrays as ARGUMENTS, so resamples after the first reuse the
    compiled rollout. The pre-fix code rebuilt the closure per resample,
    baking each bootstrap's data in as jaxpr constants — one full
    re-trace + re-compile per resample, which dominated the protocol's
    reported eval wall-clock (see cppre/uq/eval.py)."""
    from cppre.uq.eval import evaluate_uq_methods

    base = FNO2d(**KW)
    p = base.init(jax.random.PRNGKey(0), X)
    traces = {"n": 0}
    real_apply = base.apply

    class _Counting:
        """Duck-typed model: counts trace entries of apply."""

        def apply(self, *args, **kw):
            traces["n"] += 1
            return real_apply(*args, **kw)

    a = jnp.ones((6, 1, 16, 16, 1))
    u = jnp.ones((6, 1, 16, 16, 4))
    evaluate_uq_methods(
        methods=["Deterministic"], model_factory=lambda uq: (_Counting(), p),
        test_a=a, test_u=u, step=1, T_out=4, runs=4, n_eval=4, samples=2,
        verbose=False)
    # one trace for the single rollout-shape signature, regardless of the
    # number of resamples (scan traces its body twice: trace + lowering is
    # still bounded by a constant, not by `runs`)
    assert traces["n"] <= 2, (
        f"validator re-traced per resample: {traces['n']} apply traces "
        "for 4 resamples")


def test_eval_harness_batch_chunk_parity():
    """`batch_chunk` is a device-memory knob, not a protocol change: the
    per-element methods must produce identical statistics chunked (uneven
    final piece included) and unchunked. Guards the MHD 10x150 OOM fix —
    a 16 GB v5e ResourceExhausted'd on the unchunked 6-variable eval."""
    from cppre.uq.eval import evaluate_uq_methods

    base = FNO2d(**KW)
    p = base.init(jax.random.PRNGKey(0), X)
    bayes = FNO2dBayesian(**KW)
    pb = bayes.init({"params": jax.random.PRNGKey(1),
                     "bayes": jax.random.PRNGKey(2)}, X)
    drop = make_dropout_fno(**KW)
    pd = drop.init({"params": jax.random.PRNGKey(3)}, X)

    key = jax.random.PRNGKey(7)
    a = jax.random.normal(key, (7, 1, 16, 16, 1))
    u = jax.random.normal(jax.random.PRNGKey(8), (7, 1, 16, 16, 4))

    def factory(uq):
        if uq == "Ensemble":
            return base, [p, p]
        if uq == "Bayesian":
            return bayes, pb
        if uq == "Dropout":
            return drop, pd
        return base, p

    # weight-space draws (Bayesian) and deterministic forwards are
    # batch-shape-independent -> exact parity (up to f32 summation order)
    kw = dict(methods=["Deterministic", "Ensemble", "Bayesian"],
              model_factory=factory, test_a=a, test_u=u, step=1, T_out=4,
              runs=2, n_eval=7, samples=2, verbose=False)
    full = evaluate_uq_methods(**kw)
    # chunk 3 over batch 7 -> pieces 3, 3, 1 (exercises the uneven weights)
    chunked = evaluate_uq_methods(**kw, batch_chunk=3)
    for m in kw["methods"]:
        for stat in ("l2", "coverage", "joint_coverage"):
            np.testing.assert_allclose(
                chunked[m][stat], full[m][stat], rtol=1e-5, atol=1e-6,
                err_msg=f"{m}.{stat}")

    # dropout masks are ACTIVATION-shaped: a batch-3 mask from the same key
    # is not the first 3 rows of a batch-7 mask, so chunked runs draw
    # different (equally iid) masks — statistically equivalent, not
    # bit-equal. Assert the chunked path just runs and stays finite.
    kw_d = dict(kw, methods=["Dropout"])
    res_d = evaluate_uq_methods(**kw_d, batch_chunk=3)
    assert np.isfinite(res_d["Dropout"]["l2"][0])

    # AER/PRE (round-4): the conformal quantile is taken over the
    # CONCATENATED per-chunk scores, so chunking must be exact here too —
    # this unlocks the MHD 10x300 full protocol on a 16 GB chip.
    from cppre.residuals.wave import PRE_Wave

    pre_op = PRE_Wave(0.1, 0.1)

    class _Wrap:
        def residual(self, fields):
            return pre_op(fields[:, 0])

    kw_cp = dict(kw, methods=["AER", "PRE"], pre=_Wrap())
    full_cp = evaluate_uq_methods(**kw_cp)
    chunked_cp = evaluate_uq_methods(**kw_cp, batch_chunk=3)
    for m in ("AER", "PRE"):
        np.testing.assert_allclose(
            chunked_cp[m]["l2"], full_cp[m]["l2"], rtol=1e-5, atol=1e-6,
            err_msg=f"{m}.l2")
        # coverage runs through an ORDER STATISTIC (qhat) and a hard
        # threshold: XLA tiles batch-3 and batch-7 forwards differently, so
        # f32 reduction order perturbs scores at ~1e-7, and a score sitting
        # exactly at the quantile can flip a cell. Bound the flip mass
        # (~1/n_cells), not bit equality.
        for stat in ("coverage", "joint_coverage"):
            np.testing.assert_allclose(
                chunked_cp[m][stat], full_cp[m][stat], atol=2e-3,
                err_msg=f"{m}.{stat}")


def test_run_eval_end_to_end_with_train_precision():
    """`run_eval.run` trains + evaluates with the `Train Precision` knob:
    the training applies are wrapped (bf16 MXU contractions on TPU; a no-op
    numerically on CPU where every precision is f32) while evaluation uses
    the unwrapped HIGHEST apply. Tiny config: 2 methods, 1 epoch."""
    from cppre.uq.run_eval import run

    res = run("Wave", overrides={
        "UQ": ["Deterministic", "PRE", "MLE"],
        "Train Precision": "default",
        "Epochs": 1,
        "n_total": 6,
        "n_train_eval": 3,
        "runs": 1,
        "n_eval": 2,
        "samples": 1,
        "Batch Size": 3,
        "T_out": 4,
        "Modes": 4,
        "Width_time": 8,
    }, verbose=False)
    assert set(res) == {"Deterministic", "PRE", "MLE"}
    for r in res.values():
        assert np.isfinite(r["l2"][0])


def test_run_eval_train_cache_roundtrip(tmp_path):
    """With `train_cache_dir` set, a second run of the SAME protocol loads
    every method's trained weights from disk and reproduces the first
    run's statistics exactly (flap-tolerance for the remote-chip
    campaigns); a protocol change (different Epochs) must MISS the cache
    (fingerprint-keyed filenames)."""
    from cppre.uq.run_eval import run

    ov = {
        "UQ": ["Deterministic", "Ensemble", "SWAG", "Bayesian"],
        "Epochs": 1,
        "n_total": 6,
        "n_train_eval": 3,
        "runs": 1,
        "n_eval": 2,
        "samples": 2,
        "n_ensemble": 2,
        "Batch Size": 3,
        "T_out": 4,
        "Modes": 4,
        "Width_time": 8,
        "train_cache_dir": str(tmp_path),
    }
    res1 = run("Wave", overrides=dict(ov), verbose=False)
    files = sorted(p.name for p in tmp_path.iterdir())
    # base (Deterministic) + 2 ensemble members + swag.npz + bayesian
    assert any(f.startswith("uq_Wave_base_") for f in files)
    assert any(f.startswith("uq_Wave_ens0_") for f in files)
    assert any(f.startswith("uq_Wave_swag_") and f.endswith(".npz") for f in files)
    assert any(f.startswith("uq_Wave_bayesian_") for f in files)

    res2 = run("Wave", overrides=dict(ov), verbose=False)
    for m in res1:
        assert res1[m]["l2"] == res2[m]["l2"], m
        assert res1[m]["coverage"] == res2[m]["coverage"], m

    # protocol change -> different fingerprint -> no stale reuse
    n_before = len(list(tmp_path.iterdir()))
    run("Wave", overrides=dict(ov, Epochs=2, UQ=["Deterministic"]), verbose=False)
    assert len(list(tmp_path.iterdir())) > n_before


def test_run_eval_ood_trains_in_dist(tmp_path):
    """Reference OOD semantics (`Eval.py:62-84` + `data_loaders.py:15-92`):
    the Dist switch shifts only the EVALUATION data; models, normalizers
    and the PRE's physics constants stay in-distribution. Pinned via the
    train cache: an OOD run at the same training config must REUSE the
    in-dist run's cached weights (no new checkpoint files), while its
    eval statistics shift."""
    from cppre.uq.run_eval import run

    ov = {
        "UQ": ["Deterministic", "PRE"],
        "Epochs": 1,
        "n_total": 6,
        "n_train_eval": 3,
        "runs": 1,
        "n_eval": 2,
        "samples": 1,
        "Batch Size": 3,
        "T_out": 4,
        "Modes": 4,
        "Width_time": 8,
        "train_cache_dir": str(tmp_path),
    }
    res_in = run("Wave", overrides=dict(ov), verbose=False)
    files = {p.name for p in tmp_path.iterdir()}
    assert files  # the in-dist run trained and cached the base model
    res_out = run("Wave", overrides=dict(ov, Dist="out", n_eval_pool=3),
                  verbose=False)
    assert {p.name for p in tmp_path.iterdir()} == files, (
        "OOD run must reuse the in-dist cached weights, not retrain")
    for r in res_out.values():
        assert np.isfinite(r["l2"][0])
    # the shifted eval pool is genuinely different data
    assert res_out["Deterministic"]["l2"][0] != res_in["Deterministic"]["l2"][0]


def test_run_eval_skip_and_bf16_precision():
    """`skip=` drops already-banked methods (the per-method resume path in
    scripts/uq_family_tpu.py) and `Train Precision: bf16` routes training
    through the bf16-activation wrapper without breaking evaluation."""
    from cppre.uq.run_eval import run

    res = run("Wave", overrides={
        "UQ": ["Deterministic", "PRE", "AER"],
        "Train Precision": "bf16",
        "Epochs": 1,
        "n_total": 6,
        "n_train_eval": 3,
        "runs": 1,
        "n_eval": 2,
        "samples": 1,
        "Batch Size": 3,
        "T_out": 4,
        "Modes": 4,
        "Width_time": 8,
    }, verbose=False, skip=("AER",))
    assert set(res) == {"Deterministic", "PRE"}
    for r in res.values():
        assert np.isfinite(r["l2"][0])


def test_run_eval_n_eval_extra_widens_pool_without_retraining(tmp_path):
    """`n_eval_extra` (the reference-exact 10x300 protocol's pool widener,
    `Other_UQ/Evaluation/Eval.py:121-122`) appends fresh disjoint-seed
    in-dist sims to the EVAL pool only: the train-cache fingerprint is
    unchanged (no retraining — no new checkpoint files), the widened run
    can draw n_eval larger than the base pool, and its statistics differ
    from the base run's (the pool is genuinely bigger)."""
    from cppre.uq.run_eval import run

    ov = {
        "UQ": ["Deterministic", "PRE"],
        "Epochs": 1,
        "n_total": 6,
        "n_train_eval": 3,
        "runs": 1,
        "n_eval": 2,
        "samples": 1,
        "Batch Size": 3,
        "T_out": 4,
        "Modes": 4,
        "Width_time": 8,
        "train_cache_dir": str(tmp_path),
    }
    res_base = run("Wave", overrides=dict(ov), verbose=False)
    files = {p.name for p in tmp_path.iterdir()}
    assert files
    # widened pool: base eval pool is 3; ask for 5 of a 3+4=7 pool —
    # impossible without the extra sims unless bootstrap had been
    # degenerate; must reuse cached weights bit-for-bit
    res_wide = run("Wave", overrides=dict(ov, n_eval=5, n_eval_extra=4),
                   verbose=False)
    assert {p.name for p in tmp_path.iterdir()} == files, (
        "n_eval_extra must not invalidate the train cache")
    for r in res_wide.values():
        assert np.isfinite(r["l2"][0])
    assert (res_wide["Deterministic"]["l2"][0]
            != res_base["Deterministic"]["l2"][0])


def test_ood_data_loader_shifts_physics():
    """`Dist: out` (reference `Other_UQ/Evaluation/data_loaders.py:15-92`)
    must produce a DIFFERENT physical family: half wave speed for Wave, so
    the solver trajectories and the PRE residual operator both change."""
    from cppre.uq.data_loaders import load_wave

    d_in, pre_in, cfg_in = load_wave("in", n=3, Nx=32, seed=0)
    d_out, pre_out, cfg_out = load_wave("out", n=3, Nx=32, seed=0)
    assert cfg_out["c"] == 0.5 * cfg_in["c"]
    assert d_in.shape == d_out.shape
    # same seed, different wave speed -> different trajectories
    assert float(np.max(np.abs(np.asarray(d_in) - np.asarray(d_out)))) > 1e-3
    # the PRE carries the shifted physics: residuals of the SAME field differ
    f = np.asarray(d_in[:, 0]).transpose(0, 3, 1, 2)  # ConvOps layout
    import jax.numpy as jnp

    r_in = np.asarray(pre_in(jnp.asarray(f)))
    r_out = np.asarray(pre_out(jnp.asarray(f)))
    assert float(np.max(np.abs(r_in - r_out))) > 1e-6


def test_ood_mhd_loader_samples_disjoint_design_box():
    """MHD `Dist: out` (reference `data_loaders.py:15-92` in/out pairing)
    shifts the Orszag-Tang DESIGN BOX, not a PDE coefficient: field
    strength b above the training range, density/pressure scale c below
    it. The box must be disjoint from the training box on (b, c) and the
    resulting trajectories must differ at the same seed."""
    from cppre.experiments.common import sample_params
    from cppre.experiments.mhd import LB, UB
    from cppre.uq.data_loaders import load_mhd

    # the box itself: every OOD (b, c) sample sits outside [LB, UB]
    lb, ub = (0.5, 1.0, 0.25), (1.0, 1.5, 0.5)
    p = sample_params(np.asarray(lb), np.asarray(ub), 64, seed=0)
    assert np.all((p >= lb) & (p <= ub))
    outside = (p[:, 1] > UB[1]) | (p[:, 2] < LB[2])
    frac = float(np.mean(outside))
    assert frac > 0.95, f"only {frac:.0%} of OOD samples left the box"

    # the loader wires it through: different data, same shapes/residual op
    d_in, pre_in, _ = load_mhd("in", n=2, N=16, seed=0)
    d_out, pre_out, _ = load_mhd("out", n=2, N=16, seed=0)
    assert d_in.shape == d_out.shape
    assert float(np.max(np.abs(np.asarray(d_in) - np.asarray(d_out)))) > 1e-3
    assert np.all(np.isfinite(np.asarray(d_out)))  # CFL-safe at the fixed dt


def test_full_protocol_pool_strictly_exceeds_n_eval():
    """ADVICE r03 (high): a pool exactly equal to n_eval makes every
    without-replacement "bootstrap resample" the identical set permuted, so
    the reported +-std collapses to float-reduction noise for
    permutation-invariant methods. The full-scale override in
    scripts/uq_family_tpu.py must keep pool > n_eval (the reference draws
    300 from the strictly larger post-ntrain dataset,
    `Other_UQ/Evaluation/Eval.py:121-122`), and resamples must genuinely
    differ."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "uq_family_tpu", "/root/repo/scripts/uq_family_tpu.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for fam in ("Wave", "Navier-Stokes", "MHD"):
        ov = dict(mod.OVERRIDES, **mod.FAMILY_OVERRIDES.get(fam, {}))
        pool = ov["n_total"] - ov.get("n_train_eval", ov["n_total"] // 2)
        # replicate the scale=full update from main()
        extra = max(0, 450 - pool)
        assert pool + extra > 300, (fam, pool, extra)

    # and the resampler actually produces different index sets there
    from cppre.uq.eval import _bootstrap_idx

    rng = np.random.default_rng(0)
    draws = [frozenset(_bootstrap_idx(rng, 450, 300).tolist())
             for _ in range(4)]
    assert len(set(draws)) > 1
