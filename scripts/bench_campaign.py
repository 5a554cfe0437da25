"""Bench campaign: mean +- std over N tunnel-separated bench.py runs, plus a
roofline measurement of the Pallas pipeline (achieved HBM-bandwidth
fraction on the v5e).

Each bench.py invocation is a fresh process (fresh tunnel session), so the
spread captures tunnel variance, not just chip variance. The roofline leg
uses the slope harness (cppre.utils.tpu_bench.slope_time), which cancels
the fixed ~28 ms per-dispatch tunnel overhead exactly.

Run from /root/repo:  timeout 3000 python scripts/bench_campaign.py
"""

import json
import subprocess
import sys
import time

N_RUNS = 5

# --- bytes moved per pipeline iteration (paired one-pass kernel) ----------
# truth + prediction read once by the paired diff+stats kernel, |diff|
# written once and re-read by the score pass; stats/scores are KB-scale.
N_CAL, NVAR, NT, NX, NY = 100, 3, 21, 100, 100
BYTES_IN = 2 * N_CAL * NVAR * NT * NX * NY * 4
BYTES_DIFF = N_CAL * (NT - 2) * (NX - 2) * (NY - 2) * 4
BYTES_TOTAL = BYTES_IN + 2 * BYTES_DIFF
V5E_HBM_GBS = 819.0  # v5e HBM bandwidth, GB/s


def main():
    vals = []
    for i in range(N_RUNS):
        t0 = time.perf_counter()
        out = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                             text=True, timeout=2500, cwd="/root/repo")
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        rec = json.loads(line[0])
        vals.append(rec)
        print(f"run {i}: {rec['value']} fields/s (x{rec['vs_baseline']}) "
              f"[{time.perf_counter() - t0:.0f}s]", flush=True)

    import numpy as np

    v = np.asarray([r["value"] for r in vals])
    b = np.asarray([r["vs_baseline"] for r in vals])
    print(json.dumps({
        "metric": vals[0]["metric"],
        "mean": round(float(v.mean()), 1),
        "std": round(float(v.std()), 1),
        "vs_baseline_mean": round(float(b.mean()), 1),
        "n_runs": N_RUNS,
    }), flush=True)

    # --- roofline: slope harness (fixed dispatch overhead cancels) --------
    code = (
        "import jax.numpy as jnp;"
        "import bench;"
        "from cppre.cp.inductive import calibrate;"
        "from cppre.ops.pallas import ns_joint_cp_scores_fused;"
        "from cppre.utils.tpu_bench import slope_time;"
        "f, p = bench._synthetic_fields();"
        "fn = lambda t, q: calibrate(ns_joint_cp_scores_fused("
        "t, q, bench.DT, bench.DX, bench.DX, bench.NU), bench.N_CAL, bench.ALPHA);"
        "w, fx, _ = slope_time(fn, jnp.asarray(f), jnp.asarray(p),"
        " inners=(10, 40, 160), reps=3);"
        "print('T_PER_CALL=%.6f' % w)"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=2500, cwd="/root/repo")
    t_call = None
    for l in out.stdout.splitlines():
        if l.startswith("T_PER_CALL="):
            t_call = float(l.split("=")[1])
    if t_call is None:
        print("roofline leg failed:", out.stderr[-300:], file=sys.stderr)
        return
    sol = BYTES_TOTAL / (V5E_HBM_GBS * 1e9)
    print(json.dumps({
        "roofline_bytes_per_call": BYTES_TOTAL,
        "speed_of_light_s": round(sol, 6),
        "measured_s_per_call": round(t_call, 6),
        "hbm_bw_fraction": round(sol / t_call, 3),
        "achieved_GBs": round(BYTES_TOTAL / t_call / 1e9, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
