"""Flagship 2-D wave joint-CP run on the real TPU (RESULTS.md section 2).

Reference config `Joint/Wave_Residuals_CP.py` at n_train=200 / n_cal=200 /
n_pred=100, 60 epochs (the round-1 scale, for comparability). Reports the
reference-semantics joint coverage (in-sample modulation,
`Joint/Wave_Residuals_CP.py:219-220`) AND the holdout-modulation corrected
estimator side by side; writes results_wave.json at the repo root.

eps=1e-6 modulation guard: the reference runs its CP reductions in float64
NumPy, where the per-cell std never underflows; our on-device f32 std can
hit exact zeros, which turn the sup-norm scores into inf and the bounds
into NaN (observed: 0.0 coverage at every level). The guard only offsets
cells the f64 reference would have kept > 0.

Run from /root/repo:  timeout 3000 python scripts/wave_flagship_tpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

# probe the tunnel with a tiny op before committing to a long run
t0 = time.perf_counter()
probe = float(jnp.sum(jnp.ones((8, 8))))
print(f"tunnel probe ok ({probe}) in {time.perf_counter() - t0:.1f}s on "
      f"{jax.default_backend()}", flush=True)

# compiled-Pallas parity gate: the run's residual path must match ConvOps
# on the real chip before we spend 15 min training against it
from cppre.ops.pallas import wave_residual_fused
from cppre.residuals.wave import PRE_Wave

rng = np.random.default_rng(0)
f_small = jnp.asarray(rng.standard_normal((4, 21, 64, 64)), jnp.float32)
pre_chk = PRE_Wave(0.05, 2 / 63, c=1.0)
ref = np.asarray(pre_chk(f_small))
got = np.asarray(wave_residual_fused(f_small, pre_chk.D.kernel))
np.testing.assert_allclose(got, ref, atol=2e-5)
print("pallas wave kernel parity ok on TPU "
      f"(max |d| = {np.abs(got - ref).max():.2e})", flush=True)

from cppre.experiments.wave import run

CFG = {"Epochs": 60, "n_train": 200, "n_cal": 200, "n_pred": 100,
       "Batch Size": 50}
EPS = 1e-6

t0 = time.perf_counter()
# bf16-activation training (2.58x train-wall A/B-validated,
# results_precision_ab.json; CP rollouts keep HIGHEST f32 —
# models/fno.py::with_activation_dtype)
r = run("joint", config=CFG, verbose=True, eps=EPS, return_residuals=True,
        train_precision="bf16")
wall = time.perf_counter() - t0

# diagnostics: how close did the f32 modulation come to the inf/NaN cliff?
ro, rp = r["res_out_cal"], r["res_pred_cal"]
mod_aer = jnp.std(ro - rp, axis=0)
mod_pre = jnp.std(rp, axis=0)
diag = {
    "n_zero_mod_aer": int(jnp.sum(mod_aer == 0.0)),
    "n_zero_mod_pre": int(jnp.sum(mod_pre == 0.0)),
    "min_mod_aer": float(jnp.min(mod_aer)),
    "min_mod_pre": float(jnp.min(mod_pre)),
    "n_nonfinite_res": int(jnp.sum(~jnp.isfinite(ro)) + jnp.sum(~jnp.isfinite(rp))),
    "res_pred_abs_mean": float(jnp.mean(jnp.abs(rp))),
}
print("diagnostics:", json.dumps(diag), flush=True)

out = {
    "wave_joint": {
        "config": CFG,
        "eps": EPS,
        "mse": r["mse"],
        "alphas": np.asarray(r["alphas"]).tolist(),
        "coverage_aer_pre": np.asarray(r["coverage_aer_pre"]).tolist(),
        "coverage_pre": np.asarray(r["coverage_pre"]).tolist(),
        "coverage_aer_pre_holdout":
            np.asarray(r["coverage_aer_pre_holdout"]).tolist(),
        "coverage_pre_holdout":
            np.asarray(r["coverage_pre_holdout"]).tolist(),
        "diagnostics": diag,
        "wall_s": wall,
        "train_time_s": float(r.get("train_time", float("nan"))),
    }
}
with open("/root/repo/results_wave.json", "w") as f:
    json.dump(out, f, indent=1)
print("holdout:", json.dumps(out["wave_joint"]["coverage_aer_pre_holdout"]))
print(f"DONE in {wall:.0f}s", flush=True)
