"""Round-5 TPU campaign: kernel checks, perf A/Bs, NS refsem, OOD-at-scale,
then the Wave reference-budget matrix for the rest of the round.

Stages (sequential; each banks incrementally so a tunnel flap or round end
keeps all finished work; pattern: round4_campaign.py). Ordered
complete-items-first: short stages that fully close a VERDICT r04 ask run
before the open-ended reference-budget training block.

1. kernel_check   — scripts/tpu_kernel_check.py: Mosaic lowering of all
                    fused kernels incl. the new single-pass scores kernel.
2. bench_single   — scripts/bench_single_pass.py: MHD VMEM-stash A/B
                    (VERDICT r04 #7), banks results_scaling.json.
3. bench_iters    — scripts/bench_inner_iters.py: 400/800/1600 chain sweep
                    (VERDICT r04 #6), banks results_weather.json.
4. bench_contract — one full `python bench.py` under the round-5 budget:
                    proves the driver-contract path end-to-end in a
                    healthy window (VERDICT r04 #1 done-criterion dry run).
5. ns_refsem      — scripts/ns_refsem_torch.py: executed-reference-code
                    cross-check for the first multi-field family
                    (VERDICT r04 #5), banks results_refsem.json.
6. uq_wave_ood_full / 7. uq_ns_ood_full — OOD at the reference 10x300
                    protocol (VERDICT r04 #4); eval-only via weights cache.
8. uq_wave_refbudget — the TRUE reference training budget (VERDICT r04
                    #3): 500 epochs / 500 train sims / 500-sim pool, 8
                    methods, banked per-method under "Wave (ref-budget)".
                    Runs last with the biggest budget; whatever the round
                    boundary cuts off is resumable (train cache +
                    per-method banking).

Usage: nohup python scripts/round5_campaign.py > /tmp/round5.log 2>&1 &
Optionally skip ahead:  python scripts/round5_campaign.py --from ns_refsem
"""

import os
import subprocess
import sys
import time

REPO = "/root/repo"
STATE = "/tmp/round5_done"

STAGES = [
    ("kernel_check", [sys.executable, "scripts/tpu_kernel_check.py"], 1500),
    ("bench_single", [sys.executable, "scripts/bench_single_pass.py"], 1500),
    ("bench_iters", [sys.executable, "scripts/bench_inner_iters.py"], 1500),
    ("bench_contract", [sys.executable, "bench.py"], 1500),
    ("ns_refsem", [sys.executable, "scripts/ns_refsem_torch.py"], 6000),
    ("uq_wave_ood_full",
     [sys.executable, "scripts/uq_family_tpu.py", "Wave", "out", "full"],
     4000),
    ("uq_ns_ood_full",
     [sys.executable, "scripts/uq_family_tpu.py", "Navier-Stokes", "out",
      "full"], 6000),
    ("uq_wave_refbudget",
     [sys.executable, "scripts/uq_family_tpu.py", "Wave", "in", "refbudget"],
     18000),
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
    stages = STAGES
    if "--from" in sys.argv:
        start = sys.argv[sys.argv.index("--from") + 1]
        names = [n for n, _, _ in STAGES]
        stages = STAGES[names.index(start):]
    for name, cmd, budget in stages:
        if name in done_stages():
            print(f"[skip] {name} (done)", flush=True)
            continue
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
    print("[campaign complete]", flush=True)


if __name__ == "__main__":
    main()
