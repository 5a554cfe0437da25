"""Flagship 2-D wave joint-CP run on the real TPU (RESULTS.md section 2).

Reference config `Joint/Wave_Residuals_CP.py` at n_train=200 / n_cal=400 /
n_pred=100, 120 epochs. Reports the reference-semantics joint coverage
(in-sample modulation, `Joint/Wave_Residuals_CP.py:219-220`) AND the
holdout-modulation corrected estimator side by side; writes
results_wave.json at the repo root.

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

from cppre.experiments.wave import run

CFG = {"Epochs": 120, "n_train": 200, "n_cal": 400, "n_pred": 100,
       "Batch Size": 50}

t0 = time.perf_counter()
r = run("joint", config=CFG, verbose=True)
wall = time.perf_counter() - t0

out = {
    "wave_joint": {
        "config": {k: v for k, v in r["config"].items()},
        "mse": r["mse"],
        "alphas": np.asarray(r["alphas"]).tolist(),
        "coverage_aer_pre": np.asarray(r["coverage_aer_pre"]).tolist(),
        "coverage_pre": np.asarray(r["coverage_pre"]).tolist(),
        "coverage_aer_pre_holdout":
            np.asarray(r["coverage_aer_pre_holdout"]).tolist(),
        "coverage_pre_holdout":
            np.asarray(r["coverage_pre_holdout"]).tolist(),
        "wall_s": wall,
    }
}
with open("/root/repo/results_wave.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out["wave_joint"]["coverage_aer_pre_holdout"]))
print(f"DONE in {wall:.0f}s", flush=True)
