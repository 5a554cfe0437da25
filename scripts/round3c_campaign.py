"""Round-3c TPU campaign: the stages queued behind the 2026-08-20 flap.

Same poll-and-drive pattern as `round3b_campaign.py` (which completed all
its stages 2026-08-20 ~04:20 UTC, right before the tunnel dropped again):
probe cheaply, run the next pending stage, re-probe on failure. Stages:

1. verify_onchip   — fresh package-boundary drive for this session's state
2. probe_bench_arms — per-arm qhat deltas at bench.py's field distribution
                      (justifies/refutes the optional bf16 arm at that
                      distribution; the g=2 arm is qhat-identical)
3. bench_confirm   — clean end-to-end run of the NEW multi-arm bench.py
                      (the round3b bench ran mid-edit and lost its Pallas
                      leg to the old all-arms-mandatory gate)
4. uq_mhd_ood      — third OOD family, completing the 3x8 OOD matrix

Usage: nohup python scripts/round3c_campaign.py > /tmp/round3c.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = "/root/repo"
STATE = "/tmp/round3c_done"
POLL_S = 240
MAX_WALL_S = 10 * 3600

STAGES = [
    ("verify_onchip", ["python", "scripts/verify_onchip.py"], 600),
    ("probe_bench_arms", ["python", "scripts/probe_bench_arms.py"], 900),
    ("bench_confirm", ["python", "bench.py"], 2400),
    # re-measure ONLY the g-sweep: the banked wave rows were three g=1
    # runs (samples_per_block was silently dropped before the forwarding
    # fix in ops/pallas/stencil_kernels.py)
    ("gsweep_rerun", ["python", "scripts/bench_scaling.py", "gsweep"], 1800),
    ("uq_mhd_ood", ["python", "scripts/uq_family_tpu.py", "MHD", "out"],
     14000),
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
        attempts = 0
        while time.time() - t_start < MAX_WALL_S:
            if not probe():
                print(f"[poll] tunnel down before {name}; sleeping {POLL_S}s",
                      flush=True)
                time.sleep(POLL_S)
                continue
            attempts += 1
            t0 = time.time()
            log = f"/tmp/round3c_{name}.log"
            try:
                with open(log, "a") as f:
                    proc = subprocess.run(cmd, cwd=REPO, timeout=budget,
                                          stdout=f, stderr=subprocess.STDOUT)
                ok = proc.returncode == 0
            except subprocess.TimeoutExpired:
                with open(log, "a") as f:
                    f.write("\n--- TIMEOUT ---\n")
                ok = False
            wall = time.time() - t0
            print(f"[{'ok' if ok else 'FAIL'}] {name} attempt {attempts} "
                  f"{wall:.0f}s -> {log}", flush=True)
            if ok:
                with open(STATE, "a") as f:
                    f.write(name + "\n")
                break
            if attempts >= 3:
                print(f"[giveup] {name} after {attempts} attempts", flush=True)
                break
        else:
            print("wall budget exhausted", flush=True)
            return 1
    print("campaign complete", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
