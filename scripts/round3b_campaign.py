"""Round-3b TPU campaign: poll the flapping tunnel, drive the pending stages.

The round-3 on-chip campaign (`refresh_results_tpu.py`) landed everything
except: the MHD 10x150 UQ resume (4 methods were banked before round end),
the grid-size scaling sweep (`results_scaling.json` never landed), the
OOD-distribution UQ runs, and an eval-time re-bench of SWAG/Ensemble after
the single-program `lax.map` refactor (cppre/uq/validation.py).

Unlike `refresh_results_tpu.py` (which aborts when the probe fails), this
orchestrator LOOPS: probe -> run next pending stage -> on stage failure
re-probe; if the tunnel is down, sleep and retry the same stage. Stages
bank their own results incrementally (per-method UQ resume), so a flap
mid-stage only costs the in-flight piece. State in /tmp/round3b_done.

Usage: nohup python scripts/round3b_campaign.py > /tmp/round3b.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
STATE = "/tmp/round3b_done"
POLL_S = 240
MAX_WALL_S = 9.5 * 3600  # leave headroom before the driver's own bench run


def _mark_wave_uq_for_rebench():
    """Drop the pre-refactor SWAG/Ensemble rows from the Wave UQ entry and
    mark it _partial, so `uq_family_tpu.py Wave` recomputes ONLY those two
    methods (per-method resume) with the single-program eval — an on-chip
    A/B of the lax.map refactor against the banked 159 s/44.5 s times."""
    marker = "/tmp/round3b_rebench_marked"
    if os.path.exists(marker):
        return  # only strip the PRE-refactor rows once: a retry after a
        # mid-stage flap must keep freshly recomputed methods banked
    path = os.path.join(REPO, "results_uq.json")
    d = json.load(open(path))
    wave = d.get("Wave", {})
    if "SWAG" not in wave and "Ensemble" not in wave:
        return  # already rebenched (or never run) — nothing to do
    for m in ("SWAG", "Ensemble"):
        wave.pop(m, None)
    wave.setdefault("_protocol", {})["_partial"] = True
    d["Wave"] = wave
    # atomic replace, and set the marker only AFTER a successful write: a
    # crash mid-dump must neither truncate hours of banked TPU results nor
    # leave a marker that blocks the retry from redoing the strip
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, indent=1)
    os.replace(tmp, path)
    open(marker, "w").write("1")
    print("marked Wave SWAG/Ensemble for re-bench", flush=True)


# (name, pre-hook, cmd, timeout_s) — priority order
STAGES = [
    ("verify_onchip", None,
     ["python", "scripts/verify_onchip.py"], 600),
    ("uq_mhd_resume", None,
     ["python", "scripts/uq_family_tpu.py", "MHD", "in"], 14000),
    ("scaling", None,
     ["python", "scripts/bench_scaling.py"], 3000),
    ("uq_wave_swag_rebench", _mark_wave_uq_for_rebench,
     ["python", "scripts/uq_family_tpu.py", "Wave", "in"], 8000),
    ("uq_wave_ood", None,
     ["python", "scripts/uq_family_tpu.py", "Wave", "out"], 12000),
    ("uq_ns_ood", None,
     ["python", "scripts/uq_family_tpu.py", "Navier-Stokes", "out"], 12000),
    ("kernel_check", None,
     ["python", "scripts/tpu_kernel_check.py"], 1200),
    ("bench_diff_dtype", None,
     ["python", "scripts/bench_diff_dtype.py"], 900),
    ("bench_confirm", None,
     ["python", "bench.py"], 2400),
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
    for name, hook, cmd, budget in STAGES:
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
            if hook is not None:
                hook()
            attempts += 1
            t0 = time.time()
            log = f"/tmp/round3b_{name}.log"
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
            # failed: likely a flap — re-probe at the top of the loop
        else:
            print("wall budget exhausted", flush=True)
            return 1
    print("campaign complete", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
