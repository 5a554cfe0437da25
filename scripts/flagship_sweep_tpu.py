"""Sequential flagship refreshes on the real TPU: MHD (fused all-equation
path + holdout columns), JOREK (synthetic multi-blob family), Burgers 1-D.

Writes results_mhd.json / results_jorek.json / results_burgers.json.

Run from /root/repo:  timeout 5400 python scripts/flagship_sweep_tpu.py
Optionally name the legs to run:  ... flagship_sweep_tpu.py burgers
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

LEGS = {a for a in sys.argv[1:] if a in {"mhd", "jorek", "burgers"}} \
    or {"mhd", "jorek", "burgers"}

t0 = time.perf_counter()
float(jnp.sum(jnp.ones((8, 8))))
print(f"probe ok {time.perf_counter() - t0:.1f}s", flush=True)


def dump(path, key, r, wall, extra=None):
    rec = {
        "config": {k: v for k, v in r["config"].items()},
        "mse": r["mse"],
        "alphas": np.asarray(r["alphas"]).tolist(),
        "coverage_aer_pre": np.asarray(r["coverage_aer_pre"]).tolist(),
        "coverage_pre": np.asarray(r["coverage_pre"]).tolist(),
        "wall_s": wall,
        "train_time_s": float(r.get("train_time", float("nan"))),
    }
    for k in ("coverage_aer_pre_holdout", "coverage_pre_holdout"):
        if r.get(k) is not None:
            rec[k] = np.asarray(r[k]).tolist()
    if extra:
        rec.update(extra)
    with open(path, "w") as f:
        json.dump({key: rec}, f, indent=1)
    print(f"{key}: ref@95={rec['coverage_aer_pre'][0]:.2f} "
          f"holdout@95={rec.get('coverage_aer_pre_holdout', [float('nan')])[0]:.2f} "
          f"mse={rec['mse']:.2e} wall={wall:.0f}s", flush=True)


# --- MHD (BASELINE #5a): fused induction, 64^2, 100/100/100 ---------------
if "mhd" in LEGS:
    from cppre.experiments.mhd import run as run_mhd

    t0 = time.perf_counter()
    r = run_mhd("joint", config={"N": 64, "Epochs": 60, "Batch Size": 10,
                                 "n_train": 100, "n_cal": 100,
                                 "n_pred": 100},
                verbose=True, train_precision="bf16")
    dump("/root/repo/results_mhd.json", "mhd_joint_induction", r,
         time.perf_counter() - t0)

# --- JOREK (BASELINE #5b): synthetic multi-blob family --------------------
if "jorek" in LEGS:
    from cppre.experiments.jorek import run as run_jorek

    t0 = time.perf_counter()
    r = run_jorek("joint", config={"Epochs": 60, "Batch Size": 10,
                                   "n_train": 100, "n_cal": 100,
                                   "n_pred": 100},
                  verbose=True, train_precision="bf16")
    dump("/root/repo/results_jorek.json", "jorek_joint_continuity", r,
         time.perf_counter() - t0)

# --- Burgers 1-D (BASELINE #2): multi-kernel residual ---------------------
if "burgers" in LEGS:
    from cppre.experiments.burgers import run as run_burgers

    t0 = time.perf_counter()
    r = run_burgers("joint", config={"Epochs": 200, "n_train": 100,
                                     "n_cal": 100, "n_pred": 100},
                    verbose=True, train_precision="bf16")
    dump("/root/repo/results_burgers.json", "burgers_joint", r,
         time.perf_counter() - t0)
print("SWEEP DONE", flush=True)
