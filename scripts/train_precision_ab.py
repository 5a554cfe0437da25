"""A/B the train-time matmul precision on the wave flagship pipeline.

HIGHEST (the round-2 default: 6-pass f32 MXU contractions) vs DEFAULT
(1-pass bf16) for TRAINING ONLY — calibration/prediction rollouts keep
HIGHEST in both arms, so the CP exchangeability constraint
(models/fno.py PRECISION comment) is untouched. Reports per-arm train
wall, rollout MSE, and joint coverage at the 0.95 level; the decision
rule for flipping the flagship default is MSE within ~20% and coverage
within the binomial band.

A third arm, `bf16` (train_precision="bf16": bf16 activations + params
with f32 masters, models/fno.py::with_activation_dtype), targets the
activation-HBM bound the matmul knob cannot reach. Same decision rule.

Run from /root/repo:  timeout 5400 python scripts/train_precision_ab.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
print(f"probe {float(jnp.sum(jnp.ones((8, 8))))} on {jax.default_backend()} "
      f"in {time.perf_counter() - t0:.1f}s", flush=True)

from cppre.experiments.wave import run

CFG = {"Epochs": 60, "n_train": 100, "n_cal": 100, "n_pred": 100,
       "Batch Size": 50}
EPS = 1e-6

out = {}
for arm in ("highest", "default", "bf16"):
    t0 = time.perf_counter()
    r = run("joint", config=CFG, seed=0, verbose=False, eps=EPS,
            train_precision=arm)
    wall = time.perf_counter() - t0
    cov95 = float(np.asarray(r["coverage_aer_pre_holdout"])[0])
    out[arm] = {"train_s": r["train_time"], "total_s": wall,
                "mse": r["mse"], "cov95_holdout": cov95,
                "coverage_aer_pre":
                    np.asarray(r["coverage_aer_pre"]).tolist()}
    print(f"{arm:8s}: train {r['train_time']:.0f}s  total {wall:.0f}s  "
          f"mse {r['mse']:.3e}  cov95(holdout) {cov95:.2f}", flush=True)

for arm in ("default", "bf16"):
    sp = out["highest"]["train_s"] / out[arm]["train_s"]
    print(f"training speedup (highest/{arm}): {sp:.2f}x", flush=True)
with open("/root/repo/results_precision_ab.json", "w") as f:
    json.dump(out, f, indent=1)
