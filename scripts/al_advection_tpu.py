"""Active-learning parity run on TPU (BASELINE.md's only published numbers).

Reference `Active_Learning/Advection_AL_Joint.py:387-391,434-438` records
test-MSE per iteration and sims sampled per iteration for CP / PRE / RAND
acquisition over 5 iterations (CP: [50, 77, 42, 20, 20] sims; MSE
0.0319 -> 0.0022). This runs the rebuilt loop at the same protocol and
writes results_al.json for side-by-side comparison. Exact values differ
(different random draws / solver port) — the parity claims are the shape:
monotone MSE decay of comparable magnitude, CP acquiring a varying number
of sims vs PRE's fixed top-fraction.

Run from /root/repo:  timeout 3000 python scripts/al_advection_tpu.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

t0 = time.perf_counter()
float(jnp.sum(jnp.ones((8, 8))))
print(f"probe ok {time.perf_counter() - t0:.1f}s", flush=True)

from cppre.experiments.al_advection import run

REFERENCE = {  # Active_Learning/Advection_AL_Joint.py:387-391,434-438
    "CP": {"mse": [0.0318748, 0.00642189, 0.00386953, 0.00276095,
                   0.00239962, 0.0022232], "sampled": [50, 77, 42, 20, 20]},
    "PRE": {"mse": [0.0318748, 0.00637728, 0.00460812, 0.00302673,
                    0.00250596, 0.0022536], "sampled": [50, 50, 50, 50, 50]},
    "RAND": {"mse": [0.0318748, 0.00642819, 0.00465056, 0.00317558,
                     0.00264536, 0.00237693]},
}

t0 = time.perf_counter()
# bf16-activation training for the pretrain + fine-tune fits (A/B-validated,
# BASELINE.md "Train-time precision ladder"); acquisition rollouts and CP
# scores stay on the unwrapped f32 apply inside the loop
r = run("all", config={"n_train": 20, "Epochs": 50}, verbose=True,
        train_precision="bf16")
wall = time.perf_counter() - t0

out = {"reference": REFERENCE, "wall_s": wall, "ours": {}}
for acq, rec in r.items():
    out["ours"][acq] = {"mse": [float(m) for m in rec["test_mse"]],
                        "sampled": [int(s) for s in rec["sims_sampled"]]}
    print(f"{acq}: mse {np.round(rec['test_mse'], 5).tolist()} "
          f"sampled {rec['sims_sampled']}", flush=True)
with open("/root/repo/results_al.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"DONE in {wall:.0f}s", flush=True)
