"""Round-3d TPU campaign: reference-exact UQ protocol + bench confirm.

Stages (poll-and-drive, same pattern as round3c_campaign.py):

1. bench_confirm — end-to-end bench.py with the g=4 optional arm added
                   after the robust-harness g-sweep re-measure (skipped
                   only when a prior run of THIS campaign recorded the
                   stage in /tmp/round3d_done; the stage exists for
                   resume-after-flap)
2. uq_wave_full  — Wave UQ comparison at the reference-EXACT protocol:
                   10 bootstrap resamples x 300 eval sims
                   (`Other_UQ/Evaluation/Eval.py:121-122`). Eval-only on
                   chip: the 10x150 run's trained weights are reused via
                   the fingerprint-keyed cache (n_eval_extra widens only
                   the eval pool — cppre/uq/run_eval.py). Per-method
                   banking under the "Wave (full)" key means a flap keeps
                   every finished method.

Usage: nohup python scripts/round3d_campaign.py > /tmp/round3d.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = "/root/repo"
STATE = "/tmp/round3d_done"
POLL_S = 180
MAX_WALL_S = 6 * 3600

STAGES = [
    ("bench_confirm", ["python", "bench.py"], 2400),
    ("uq_wave_full",
     ["python", "scripts/uq_family_tpu.py", "Wave", "in", "full"], 14000),
]


def probe() -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax,jax.numpy as jnp;"
             "print(float(jnp.sum(jnp.ones((8,8)))))"],
            cwd=REPO, timeout=150, capture_output=True, text=True)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    t_start = time.time()
    done = set()
    if os.path.exists(STATE):
        done = set(open(STATE).read().split())
    for name, cmd, budget in STAGES:
        if name in done:
            print(f"[skip] {name} (done)", flush=True)
            continue
        while time.time() - t_start < MAX_WALL_S:
            if not probe():
                print(f"[poll] tunnel down before {name}; sleeping {POLL_S}s",
                      flush=True)
                time.sleep(POLL_S)
                continue
            t0 = time.time()
            log = f"/tmp/round3d_{name}.log"
            try:
                with open(log, "a") as f:
                    proc = subprocess.run(cmd, cwd=REPO, timeout=budget,
                                          stdout=f, stderr=subprocess.STDOUT)
                ok = proc.returncode == 0
            except subprocess.TimeoutExpired:
                with open(log, "a") as f:
                    f.write("\n--- TIMEOUT ---\n")
                ok = False
            dt = time.time() - t0
            print(f"[stage] {name}: {'ok' if ok else 'FAIL'} in {dt:.0f}s "
                  f"(log {log})", flush=True)
            if ok:
                with open(STATE, "a") as f:
                    f.write(name + "\n")
                break
            # failed: re-poll and retry while wall budget lasts (per-method
            # banking makes uq_wave_full retries cheap)
            time.sleep(POLL_S)
        else:
            print(f"[wall] budget exhausted before {name}", flush=True)
            return
    print("[campaign] all stages done", flush=True)


if __name__ == "__main__":
    main()
