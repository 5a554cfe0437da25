"""Round-4 TPU campaign: reference-scale UQ matrix + refsem + AL banking.

Stages (sequential, each banks incrementally so a tunnel flap or round end
keeps all finished work; pattern: round3d_campaign.py):

1. wave_refsem  — scripts/wave_refsem_torch.py: flagship wave weights
                  through our JAX pipeline AND the reference's own torch
                  code (VERDICT r03 ask #5); trains ~6 min on chip, banks
                  results_refsem.json.
2. uq_wave_full — Wave 10x300 RE-RUN with the 450-sim pool (the round-3
                  "full" run's pool was exactly 300 = n_eval, making the
                  bootstrap degenerate — ADVICE r03 high). Eval-only via
                  the weights cache.
3. uq_ns_full   — Navier-Stokes 10x300 (trains 8 methods first: the train
                  cache only holds Wave).
4. uq_mhd_full  — MHD 10x300 with the round-4 chunked AER/PRE path
                  (batch_chunk=50 now bounds the CP methods too).
5. uq_mhd_ood   — MHD OOD completion to 8/8 methods (resumes the 2/8
                  _partial entry; reuses stage 4's cached in-dist weights).
6. al_burgers   — Burgers AL trajectory (acquisition-decay signature) into
                  results_al.json (VERDICT r03 weak #3).
7. al_wave      — Wave AL trajectory, same banking.

Stage completions are recorded in /tmp/round4_done; a re-run of this
campaign skips recorded stages (per-method resume inside the UQ stages is
additionally handled by uq_family_tpu.py itself).

Usage: nohup python scripts/round4_campaign.py > /tmp/round4.log 2>&1 &
"""

import os
import subprocess
import sys
import time

REPO = "/root/repo"
STATE = "/tmp/round4_done"

STAGES = [
    ("wave_refsem", [sys.executable, "scripts/wave_refsem_torch.py"], 3000),
    ("uq_wave_full",
     [sys.executable, "scripts/uq_family_tpu.py", "Wave", "in", "full"], 4000),
    ("uq_ns_full",
     [sys.executable, "scripts/uq_family_tpu.py", "Navier-Stokes", "in",
      "full"], 9000),
    ("uq_mhd_full",
     [sys.executable, "scripts/uq_family_tpu.py", "MHD", "in", "full"], 9000),
    ("uq_mhd_ood",
     [sys.executable, "scripts/uq_family_tpu.py", "MHD", "out"], 4000),
    ("al_burgers", [sys.executable, "scripts/al_more_tpu.py", "burgers"], 4000),
    ("al_wave", [sys.executable, "scripts/al_more_tpu.py", "wave"], 4000),
]


def done_stages():
    if not os.path.exists(STATE):
        return set()
    with open(STATE) as fh:
        return {l.strip() for l in fh if l.strip()}


def mark_done(name):
    with open(STATE, "a") as fh:
        fh.write(name + "\n")


def probe(timeout_s=150):
    code = ("import jax.numpy as jnp;"
            "assert float(jnp.sum(jnp.ones((32,32)))) == 1024")
    try:
        return subprocess.run([sys.executable, "-c", code], cwd=REPO,
                              timeout=timeout_s,
                              capture_output=True).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    for name, cmd, budget in STAGES:
        if name in done_stages():
            print(f"[skip] {name} (done)", flush=True)
            continue
        # wait out tunnel outages between stages rather than burning a
        # stage's budget on a dead backend
        waited = 0
        while not probe():
            print(f"[wait] tunnel down before {name}; sleeping 120s",
                  flush=True)
            time.sleep(120)
            waited += 120
            if waited > 7200:
                print(f"[abort] tunnel down >2h before {name}", flush=True)
                return
        t0 = time.time()
        print(f"[run ] {name} (budget {budget}s)", flush=True)
        try:
            rc = subprocess.run(cmd, cwd=REPO, timeout=budget).returncode
        except subprocess.TimeoutExpired:
            print(f"[FAIL] {name}: timeout after {budget}s (partial results "
                  f"are banked per-method)", flush=True)
            continue
        dt = time.time() - t0
        if rc == 0:
            mark_done(name)
            print(f"[ok  ] {name} in {dt:.0f}s", flush=True)
        else:
            print(f"[FAIL] {name} rc={rc} after {dt:.0f}s", flush=True)


if __name__ == "__main__":
    main()
