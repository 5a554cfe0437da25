"""Burgers / Wave active-learning trajectories on TPU (VERDICT r03 weak #3).

`cppre/experiments/al_more.py` reproduces
`Active_Learning/Burgers_AL_Joint.py` and `Wave_AL_Joint.py:297-380`
(5-iteration loops: rollout -> joint-CP filter -> simulate rejected ->
fine-tune). The reference scripts print per-iteration test MSE but bank no
numbers in-source, so the parity claim is the SHAPE: monotone test-MSE
decay over AL iterations with CP acquiring a varying (typically decaying)
number of sims per round vs PRE's fixed top-fraction.

Banks one CP-acquisition trajectory per family into results_al.json under
a per-family key (merging with the existing advection entry).

Usage: timeout 4000 python scripts/al_more_tpu.py [burgers|wave]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from cppre.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

t0 = time.perf_counter()
float(jnp.sum(jnp.ones((8, 8))))
print(f"probe ok {time.perf_counter() - t0:.1f}s", flush=True)

from cppre.experiments.al_more import run

PATH_ = "/root/repo/results_al.json"

# moderate scale: full 5-iteration loops, sized to finish inside the stage
# budget on one v5e (the smoke test in tests/test_pi_al.py covers the
# mechanics; this banks the decay signature on hardware)
CONFIGS = {
    "burgers": {"Epochs": 30, "n_train": 40, "n_test": 30, "n_cal": 40,
                "n_pred": 40, "n_iterations": 5, "alpha": 0.5},
    "wave": {"Epochs": 30, "n_train": 30, "n_test": 20, "n_cal": 30,
             "n_pred": 30, "n_iterations": 5, "alpha": 0.5,
             **{"Batch Size": 10}},
}


def main(case: str):
    t0 = time.perf_counter()
    out_case = {}
    for acq in ("CP", "PRE"):
        r = run(case, acq, config=CONFIGS[case], verbose=True)
        out_case[acq] = {"mse": [float(m) for m in r["test_mse"]],
                         "sampled": [int(s) for s in r["sims_sampled"]]}
        print(f"{case}/{acq}: mse {np.round(r['test_mse'], 5).tolist()} "
              f"sampled {r['sims_sampled']}", flush=True)
        # bank incrementally (a flap keeps the finished acquisition arm)
        existing = json.load(open(PATH_))
        existing.setdefault(case, {})
        existing[case].update(out_case)
        existing[case]["wall_s"] = time.perf_counter() - t0
        existing[case]["config"] = CONFIGS[case]
        json.dump(existing, open(PATH_, "w"), indent=1)
    print(f"DONE {case} in {time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "burgers")
