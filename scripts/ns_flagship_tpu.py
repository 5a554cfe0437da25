"""Flagship 2-D Navier-Stokes joint-CP run on the real TPU (BASELINE
config #4, `Joint/NS_Residuals_CP.py`).

Full reference data pipeline: N=400 pseudospectral solver, dt=1e-3,
nu=1e-3, tEnd=0.5, sliced [::10, ::4, ::4] -> [n, 3, 100, 100, 21] (u, v,
p), 3-variable FNO_multi2d, momentum PRE (fused Pallas path), joint CP with
reference-semantics and holdout-modulation coverage. Writes
results_ns.json at the repo root.

Run from /root/repo:  timeout 3000 python scripts/ns_flagship_tpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
float(jnp.sum(jnp.ones((8, 8))))
print(f"tunnel probe ok in {time.perf_counter() - t0:.1f}s on "
      f"{jax.default_backend()}", flush=True)

from cppre.experiments.ns import run

CFG = {"Epochs": 60, "n_train": 100, "n_cal": 100, "n_pred": 100,
       "Batch Size": 10, "Modes": 8, "Width_time": 16}

t0 = time.perf_counter()
# train with bf16 activations like the other flagships (A/B-validated,
# BASELINE.md "Train-time precision ladder"); CP rollouts stay HIGHEST f32
# but ride the fused Pallas FNO blocks — the on-chip A/B maps the NS
# flagship shape as the fused kernel's win region (1.30x rollout,
# BASELINE.md "Fused FNO block A/B"; cal+pred still roll out in ONE
# batched call, so exchangeability is unchanged)
r = run("joint", config=CFG, verbose=True, eps=1e-6,
        train_precision="bf16", fused_forward=True)
wall = time.perf_counter() - t0

out = {
    "ns_joint": {
        "config": CFG,
        "mse": r["mse"],
        "alphas": np.asarray(r["alphas"]).tolist(),
        "coverage_aer_pre": np.asarray(r["coverage_aer_pre"]).tolist(),
        "coverage_pre": np.asarray(r["coverage_pre"]).tolist(),
        "coverage_aer_pre_holdout":
            np.asarray(r["coverage_aer_pre_holdout"]).tolist(),
        "coverage_pre_holdout":
            np.asarray(r["coverage_pre_holdout"]).tolist(),
        "wall_s": wall,
        "train_time_s": float(r.get("train_time", float("nan"))),
    }
}
with open("/root/repo/results_ns.json", "w") as f:
    json.dump(out, f, indent=1)
print("cov_ref:", np.asarray(r["coverage_aer_pre"]).round(2).tolist())
print("cov_holdout:", np.asarray(r["coverage_aer_pre_holdout"]).round(2).tolist())
print(f"DONE in {wall:.0f}s", flush=True)
