"""End-to-end experiment tests (reduced sizes): the coverage diagonal is the
behavioural oracle (SURVEY.md §4.2) — a correct CP implementation must give
empirical coverage tracking 1 - alpha."""

import numpy as np
import pytest


def test_advection_marginal_end_to_end():
    from cppre.experiments.advection import run

    r = run("marginal", config={"Epochs": 10, "n_train": 30, "n_test": 40,
                                 "n_cal": 60, "n_pred": 20}, verbose=False)
    assert r["mse"] < 0.2
    ideal = 1 - r["alphas"]
    # AER+PRE marginal coverage must track the diagonal within binomial noise
    assert np.all(r["coverage_aer_pre"] >= ideal - 0.12)
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.1


def test_advection_joint_end_to_end():
    from cppre.experiments.advection import run

    r = run("joint", config={"Epochs": 10, "n_train": 30, "n_test": 40,
                              "n_cal": 60, "n_pred": 20}, verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.2


def test_residual_small_on_exact_solution():
    """The PRE of a well-resolved exact advection solution must be far
    smaller than that of a perturbed one (the premise of the method)."""
    import jax.numpy as jnp

    from cppre.residuals.advection import PRE_Advection
    from cppre.solvers.advection1d import Advection1D

    sim = Advection1D(200, 100, 0.0, 2.0, 0.5)
    x, t, u, ue = sim.solve(0.7, 100.0, 1.0)
    pre = PRE_Advection(sim.dt, sim.dx, v=1.0)
    r_exact = np.abs(np.asarray(pre(jnp.asarray(ue)[None]))).mean()
    rng = np.random.default_rng(0)
    r_noisy = np.abs(
        np.asarray(pre(jnp.asarray(ue + 0.3 * rng.standard_normal(ue.shape))[None]))
    ).mean()
    assert r_exact < 0.2 * r_noisy


# --- remaining §2.4 pipelines: reduced-size asserted coverage diagonals ----
# (joint coverage counts whole samples, so at n_pred = 20-30 the binomial
# noise is ~0.1; tolerances below are diagonal +- noise, same as advection)


def test_burgers_joint_end_to_end():
    from cppre.experiments.burgers import run

    r = run("joint", config={"Epochs": 25, "Nx": 100,
                             "n_train": 30, "n_cal": 60, "n_pred": 30},
            verbose=False)
    # CP's guarantee is model-agnostic — a partly-trained surrogate still
    # must produce the diagonal; the MSE bound is only a sanity check
    assert r["mse"] < 3.0
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.2


def test_ns_marginal_end_to_end_with_periodic_bc():
    """NS marginal CP incl. the vorticity periodic-BC residual path
    (`Marginal/NS_Residuals_CP.py:468-495`)."""
    from cppre.experiments.ns import run

    r = run("marginal", config={"Epochs": 8, "N": 64, "x_slice": 2,
                                "tEnd": 0.2, "Variables": 4, "Modes": 8,
                                "Width_time": 8, "Batch Size": 10,
                                "n_train": 20, "n_cal": 40, "n_pred": 20},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.all(r["coverage_aer_pre"] >= ideal - 0.15)
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.12
    # BC-residual CP is PRE-only (scores |bc residual|): valid coverage
    assert r["bc_coverage"] is not None
    assert np.all(r["bc_coverage"] >= ideal - 0.2)


def test_mhd_joint_end_to_end_equation_switch():
    """MHD joint CP through the fused induction path AND a second equation
    through the ConvOps path (the reference's equation selector,
    `Joint/MHD_Residuals_CP.py:323-348`)."""
    from cppre.experiments.mhd import run

    import jax.numpy as jnp

    from cppre.residuals.mhd import PRE_MHD

    small = {"Epochs": 8, "N": 32, "tEnd": 0.1, "dt": 2.5e-4, "t_slice": 20,
             "Modes": 8, "Width_time": 8, "Batch Size": 10,
             "n_train": 20, "n_cal": 40, "n_pred": 20}
    r = run("joint", config=dict(small, equation="induction"), verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.25
    # the holdout-modulation estimator must also be reported
    assert r["coverage_aer_pre_holdout"] is not None
    # equation selector: every equation produces a finite residual on real
    # trajectories (full pipelines per equation are redundant — CP is
    # identical; only the residual definition changes, covered by parity
    # tests against the torch reference)
    rng = np.random.default_rng(0)
    fields = jnp.asarray(rng.standard_normal((2, 6, 9, 12, 12)), np.float32)
    pre = PRE_MHD(0.01, 0.02, 0.02)
    for eq in PRE_MHD.EQUATIONS:
        out = pre.residual(fields, equation=eq)
        assert np.all(np.isfinite(np.asarray(out))), eq


def test_wave_joint_end_to_end():
    """Reduced wave joint-CP diagonal (VERDICT r2 item 3): the flagship TPU
    run (`results_wave.json`) covers the full config; this asserts the same
    pipeline (fused composite-kernel PRE -> modulated sup-norm joint CP,
    `Joint/Wave_Residuals_CP.py:251-263`) in-suite at CI size."""
    from cppre.experiments.wave import run

    r = run("joint", config={"Epochs": 20, "Nx": 32, "Modes": 8,
                             "Width_time": 8, "Batch Size": 10,
                             "n_train": 30, "n_cal": 60, "n_pred": 30},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.2
    assert r["coverage_aer_pre_holdout"] is not None


def test_mhd_marginal_end_to_end():
    """Reduced MHD marginal-CP diagonal (VERDICT r2 item 3): per-cell qhat
    over the induction PRE (`Marginal/MHD_Residuals_CP.py` sweep). Marginal
    coverage averages over cells, so the diagonal is tighter than joint's
    whole-sample counting at the same n."""
    from cppre.experiments.mhd import run

    r = run("marginal", config={"Epochs": 8, "N": 32, "tEnd": 0.1,
                                "dt": 2.5e-4, "t_slice": 20, "Modes": 8,
                                "Width_time": 8, "Batch Size": 10,
                                "n_train": 20, "n_cal": 40, "n_pred": 20},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.all(r["coverage_aer_pre"] >= ideal - 0.15)
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.12


def test_jorek_joint_end_to_end():
    from cppre.experiments.jorek import run

    r = run("joint", config={"Epochs": 8, "Batch Size": 10,
                             "n_train": 20, "n_cal": 40, "n_pred": 20},
            verbose=False)
    ideal = 1 - r["alphas"]
    assert np.mean(np.abs(r["coverage_aer_pre"] - ideal)) < 0.25


def test_jorek_npz_ingestion_schema(tmp_path):
    """The documented offline-dataset path (`Joint/JOREK_residuals_CP.py:
    120-142` schema: fields [Nsim, 3, NR, NZ, Nt] + R/Z/t grids): field
    normalisation by (1e20, 1e5, 1e6) and NaN scrub must run before CP."""
    from cppre.experiments.jorek import run, synthetic_blobs

    R, Z, t, fields = synthetic_blobs(20, NR=16, NZ=16, Nt=50, seed=1)
    norms = np.asarray([1e20, 1e5, 1e6], np.float32)
    raw = fields * norms[None, :, None, None, None]
    raw[3, 0, 2, 2, 5] = np.nan  # one bad simulation -> must be scrubbed
    path = tmp_path / "jorek.npz"
    np.savez(path, fields=raw, R=R, Z=Z, t=t)
    r = run("joint", data_path=str(path),
            config={"Epochs": 2, "Batch Size": 4, "Width_time": 8,
                    "n_train": 5, "n_cal": 10, "n_pred": 4},
            verbose=False)
    # 20 sims - 1 scrubbed = 19 >= 5+10+4 and coverage array exists
    assert r["coverage_aer_pre"].shape == (10,)
    assert np.all(np.isfinite(r["coverage_aer_pre"]))


def test_efit_csv_ingestion_schema(tmp_path):
    """Reference EFIT CSV schema (`EFIT/EFIT_cp.py:36-53`): headerless rows
    of index + 6 flattened 33x33 blocks; loader must recover psi pairs and
    the CP flow must run on them."""
    from cppre.experiments.gs import load_efit_csv, run_efit

    rng = np.random.default_rng(9)
    n_grid, n = 9, 12  # reduced grid, same layout
    ncell = n_grid * n_grid
    psi = rng.standard_normal((n, ncell)).astype(np.float32)
    pred = psi + 0.01 * rng.standard_normal((n, ncell)).astype(np.float32)
    other = rng.standard_normal((n, 4 * ncell)).astype(np.float32)
    rows = np.concatenate([np.arange(n)[:, None].astype(np.float32),
                           psi, pred, other], axis=1)
    path = tmp_path / "v_results.csv"
    np.savetxt(path, rows, delimiter=",")
    pt, pp = load_efit_csv(str(path), n_grid=n_grid)
    assert pt.shape == (n, n_grid, n_grid)
    np.testing.assert_allclose(pt[2].ravel(), psi[2], rtol=1e-5)
    R = np.linspace(1.0, 2.0, n_grid, dtype=np.float32)
    out = run_efit(pt, pp, R=R, dr=0.1, dz=0.1, verbose=False)
    assert np.all(np.isfinite(out["coverage"]))


def test_cp_rollouts_single_batched_call(monkeypatch):
    """Regression guard for the batch-shape exchangeability bug: TPU kernels
    round differently per batch shape (measured max|d|=0.087 on one FNO step
    between bs=200 and bs=100), so calibration and prediction rollouts MUST
    share one batched validation_AR call — separate calls collapsed joint-CP
    coverage to 0.0 at n_cal=400/n_pred=100 on hardware."""
    import cppre.experiments.base2d as base2d
    from cppre.experiments.wave import run

    calls = []
    real = base2d.validation_AR

    def counting(apply_fn, a, u, step, T_out):
        calls.append(a.shape[0])
        return real(apply_fn, a, u, step, T_out)

    monkeypatch.setattr(base2d, "validation_AR", counting)
    run("joint", config={"Epochs": 1, "n_train": 4, "n_cal": 8, "n_pred": 4,
                         "Nx": 32, "Modes": 4, "Width_time": 8,
                         "Batch Size": 4}, verbose=False)
    assert calls == [12], f"cal+pred must roll out together, got calls={calls}"


def test_offline_initial_pipeline(tmp_path):
    """The Expts_initial workflow (`/root/reference/Expts_initial/readme`):
    saved dataset + pretrained checkpoint -> marginal CP -> residual-bound
    inversion to solution space. Exercises the checkpoint/norms contract
    end-to-end."""
    import jax
    import jax.numpy as jnp

    from cppre.experiments.initial import run_offline
    from cppre.experiments.wave import gen_data
    from cppre.models import FNO2d
    from cppre.residuals.wave import PRE_Wave
    from cppre.train.loops import fit
    from cppre.train.losses import lp_loss
    from cppre.train.normalizers import MinMaxNormalizer
    from cppre.utils.checkpoint import save_checkpoint, save_norms

    cfg = {"T_in": 1, "T_out": 10, "Step": 1, "Modes": 4, "Width_time": 8,
           "Variables": 1, "n_cal": 40, "Nx": 32, "x_min": -1.0,
           "x_max": 1.0, "tend": 1.0, "c": 1.0, "t_slice": 5}
    data, dt_eff, dx = gen_data(cfg, 80, seed=3)  # [80, 1, 32, 32, Nt]
    np.savez(tmp_path / "wave.npz", fields=data)

    # train briefly, save the reference-contract checkpoint + norms
    a = jnp.asarray(data[..., :1])
    u = jnp.asarray(data[..., 1:11])
    in_n, out_n = MinMaxNormalizer(a), MinMaxNormalizer(u)
    model = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=1,
                  width_time=8)
    p0 = model.init(jax.random.PRNGKey(0), in_n.encode(a[:2]))
    params = fit(model.apply, p0, in_n.encode(a[:30]), out_n.encode(u[:30]),
                 in_n.encode(a[:4]), out_n.encode(u[:4]), epochs=10,
                 batch_size=10, step=1, T_out=10, loss_func=lp_loss,
                 lr=5e-3, verbose=False)
    ckpt = save_checkpoint(str(tmp_path / "FNO_Wave_test"), params)
    norms = save_norms(str(tmp_path / "FNO_Wave_test"), in_n, out_n)

    pre = PRE_Wave(dt_eff, dx, c=1.0)
    out = run_offline(data=str(tmp_path / "wave.npz"),
                      residual_fn=pre.__call__, cfg=cfg, ckpt=ckpt,
                      norms=norms, invert_with=pre.D, verbose=False)
    ideal = 1 - out["alphas"]
    assert np.all(out["coverage"] >= ideal - 0.15)
    lo, up = out["inverted_bounds"]
    assert lo.shape == up.shape and np.isfinite(lo).all()
    # the inverted band must actually bracket: upper >= lower everywhere
    # away from the deconvolution's eps-regularised nullspace artefacts
    assert (up - lo).mean() > 0


def test_run_initial_advection_single_shot_with_inversion():
    """The historical Expts_initial pipeline by family: marginal PRE-only CP
    at the script's configuration shape (T_in window, single-shot step ==
    T_out > T_in) incl. the residual-bound inversion
    (`Expts_initial/Advection_Residuals_CP.py:340-352`)."""
    from cppre.experiments.initial import INITIAL_CONFIGS, run_initial

    assert set(INITIAL_CONFIGS) == {"Advection", "Burgers", "Wave",
                                    "Navier-Stokes", "MHD", "JOREK"}
    out = run_initial("Advection", config={
        "Epochs": 2, "Nx": 64, "Nt": 80, "n_train": 8, "n_cal": 8,
        "n_pred": 4, "T_in": 10, "T_out": 16, "Step": 16, "Width": 8,
        "Modes": 4, "Batch Size": 4}, verbose=False)
    assert "coverage_pre" in out and "inverted_bounds" in out
    cov = np.asarray(out["coverage_pre"])
    assert cov.shape[0] == len(out["alphas"]) and np.isfinite(cov).all()


def test_run_initial_wave_chunked_window():
    """Wave initial config shape: T_in=20-style window with chunked step
    (scaled down), through the standard 2-D engine."""
    from cppre.experiments.initial import run_initial

    out = run_initial("Wave", config={
        "Epochs": 1, "Nx": 24, "n_train": 6, "n_cal": 8, "n_pred": 4,
        "T_in": 4, "T_out": 8, "Step": 4, "Width_time": 8, "Modes": 4,
        "Batch Size": 4}, verbose=False)
    assert np.isfinite(np.asarray(out["coverage_pre"])).all()


def test_train_precision_knob_trains_and_calibrates():
    """`run_2d_cp(train_precision="default")` must train under the bf16
    trace (models/fno.py::precision_scope) and still run the CP phase at
    package HIGHEST — same pipeline, same outputs structure, coverage
    finite. On CPU the precisions are numerically identical, so this pins
    the plumbing (the knob reaches fit's apply_fn) rather than the perf."""
    from cppre.experiments.wave import run

    cfg = {"Epochs": 3, "Nx": 32, "Modes": 8, "Width_time": 8,
           "Batch Size": 10, "n_train": 20, "n_cal": 30, "n_pred": 20}
    r_hi = run("joint", config=cfg, verbose=False)
    r_bf = run("joint", config=cfg, verbose=False, train_precision="default")
    assert np.all(np.isfinite(r_bf["coverage_aer_pre"]))
    # CPU ignores TPU matmul precision -> identical training trajectories
    np.testing.assert_allclose(r_bf["mse"], r_hi["mse"], rtol=1e-5)
    from cppre.models import fno as fno_mod
    import jax
    assert fno_mod.PRECISION == jax.lax.Precision.HIGHEST

    # the flagship default: bf16 ACTIVATIONS for SGD. Real dtype change on
    # CPU too, so the trajectory may differ at bf16 rounding scale — pin
    # that the pipeline runs, calibrates, and stays in the same MSE regime
    r_act = run("joint", config=cfg, verbose=False, train_precision="bf16")
    assert np.all(np.isfinite(r_act["coverage_aer_pre"]))
    assert r_act["mse"] < 10 * r_hi["mse"] + 1e-6
    assert fno_mod.ACT_DTYPE is None  # trace-scoped, no global leak
