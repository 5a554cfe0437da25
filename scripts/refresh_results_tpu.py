"""One-command refresh of every TPU-measured artifact, in priority order.

Run after a tunnel outage or a numerics-affecting change (e.g. the DFT
spectral path) so all committed evidence reflects the current code:

  1. tiny probe (fail fast if the tunnel is down)
  2. bench.py                 -> driver metric sanity
  3. scripts/bench_scaling.py -> chunked-kernel routing validation
  4. flagship experiment re-runs -> results_*.json
     (scripts/ns_flagship_tpu.py, flagship_sweep_tpu.py,
      wave_flagship_tpu.py, al_advection_tpu.py)

Each stage runs in a subprocess under its own timeout and failures don't
stop later stages (the tunnel can die mid-campaign); the summary line per
stage makes partial progress visible. Total budget ~3 h.

Run from /root/repo:  python scripts/refresh_results_tpu.py [--quick]
(--quick stops after stage 3; --from NAME resumes a killed campaign at the
named stage, keeping the fail-fast probe first; --resume skips stages a
prior invocation already completed — recorded in /tmp/refresh_stages_done
— so a flapping tunnel only costs the stage it interrupted.)
"""

import os
import subprocess
import sys
import time

STATE_PATH = "/tmp/refresh_stages_done"

STAGES = [
    ("probe", ["python", "-c",
               "import jax,jax.numpy as jnp;print(float(jnp.sum(jnp.ones((8,8)))))"],
     240),
    ("kernel_check", ["python", "scripts/tpu_kernel_check.py"], 1200),
    ("bench", ["python", "bench.py"], 1800),
    ("scaling", ["python", "scripts/bench_scaling.py"], 3000),
    ("fused_fno", ["python", "scripts/bench_fused_fno.py"], 1800),
    ("train_roofline_xla", ["python", "scripts/train_roofline.py"], 1800),
    ("train_roofline_fused",
     ["python", "scripts/train_roofline.py", "fused"], 1800),
    ("train_roofline_fused_xlabwd",
     ["python", "scripts/train_roofline.py", "fused", "xlabwd"], 1800),
    ("train_roofline_fused_noremat",
     ["python", "scripts/train_roofline.py", "fused", "noremat"], 1800),
    ("train_roofline_bf16",
     ["python", "scripts/train_roofline.py", "bf16"], 1800),
    ("train_roofline_bf16act",
     ["python", "scripts/train_roofline.py", "bf16act"], 1800),
    # 3-arm wave A/B (highest / default-matmul / bf16-activation): the
    # accept/reject evidence for the flagship train_precision default
    ("precision_ab", ["python", "scripts/train_precision_ab.py"], 5400),
    ("ns_flagship", ["python", "scripts/ns_flagship_tpu.py"], 5400),
    ("mhd_jorek_burgers", ["python", "scripts/flagship_sweep_tpu.py"], 5400),
    ("wave_flagship", ["python", "scripts/wave_flagship_tpu.py"], 5400),
    ("al_advection", ["python", "scripts/al_advection_tpu.py"], 5400),
    # last: the reference-scale UQ protocols (10 resamples x 150 sims,
    # VERDICT r2 item 6) — longest stages, failures don't block anything;
    # NS/MHD are opportunistic upgrades of the 5x50 round-2 runs
    ("uq_wave", ["python", "scripts/uq_family_tpu.py", "Wave"], 12000),
    ("uq_ns", ["python", "scripts/uq_family_tpu.py", "Navier-Stokes"], 12000),
    ("uq_mhd", ["python", "scripts/uq_family_tpu.py", "MHD"], 12000),
]


def main():
    quick = "--quick" in sys.argv
    start = None
    if "--from" in sys.argv:
        start = sys.argv[sys.argv.index("--from") + 1]
        if start not in {n for n, _, _ in STAGES}:
            print(f"unknown stage {start!r}")
            return 1
    done = set()
    if "--resume" in sys.argv and os.path.exists(STATE_PATH):
        done = set(open(STATE_PATH).read().split())
    started = start is None
    results = {}
    for name, cmd, budget in STAGES:
        if not started:
            started = name == start
            if not started and name != "probe":  # always keep the probe
                continue
        if quick and name == "ns_flagship":
            break
        if name in done and name != "probe":
            print(f"[skip] {name:18s} (done in a prior invocation)")
            continue
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(cmd, cwd="/root/repo", timeout=budget,
                                  capture_output=True, text=True)
            ok = proc.returncode == 0
            tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
            # full stdout+stderr per stage: several stages print measured
            # numbers they do not persist anywhere else
            with open(f"/tmp/refresh_stage_{name}.log", "w") as f:
                f.write(proc.stdout + "\n--- stderr ---\n" + proc.stderr)
        except subprocess.TimeoutExpired as e:
            # keep everything the stage printed before the kill — several
            # stages print measured numbers they persist nowhere else
            out = (e.stdout or b"").decode(errors="replace") \
                if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode(errors="replace") \
                if isinstance(e.stderr, bytes) else (e.stderr or "")
            with open(f"/tmp/refresh_stage_{name}.log", "w") as f:
                f.write(out + "\n--- stderr ---\n" + err + "\n--- TIMEOUT ---\n")
            ok, tail = False, ["TIMEOUT"]
        wall = time.perf_counter() - t0
        results[name] = ok
        print(f"[{'ok' if ok else 'FAIL'}] {name:18s} {wall:7.1f}s", flush=True)
        for line in tail:
            print(f"       {line}")
        if ok and name != "probe":
            with open(STATE_PATH, "a") as f:
                f.write(name + "\n")
        if name == "probe" and not ok:
            print("tunnel down — aborting refresh")
            return 1
    return 0 if all(results.values()) else 2


if __name__ == "__main__":
    sys.exit(main())
