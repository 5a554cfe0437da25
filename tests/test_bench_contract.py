"""Driver-contract tests: bench.py JSON line and graft entry shapes."""

import json
import subprocess
import sys


def test_bench_json_contract():
    """bench.py (shrunken) must print exactly one JSON line with the
    required keys — the driver parses this at round end."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import bench;"
        "bench.N_CAL, bench.NT, bench.NX, bench.NY = 8, 9, 24, 24;"
        "bench.REPS, bench.INNER_ITERS = 1, 1;"
        "bench.main()"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=420, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0


def test_bench_emits_error_json_when_backend_unavailable():
    """Round-2 regression: with the TPU backend unreachable, bench.py must
    still print driver-parseable JSON lines carrying an "error" field —
    not an uncaught traceback (BENCH_r02.json was rc=1/parsed:null). Since
    round 5 the error line is emitted TWICE: immediately when the first
    probe fails (so a driver kill mid-retry still leaves a parseable tail
    — BENCH_r04 captured nothing) and again as final state at exit; the
    LAST line is authoritative."""
    import os

    env = dict(os.environ)
    # No GPU here, so backend init raises RuntimeError fast. The axon
    # sitecustomize hook must NOT register its backend in the child: its
    # register() call overrides platform resolution, so with a healthy
    # tunnel the child would run the real TPU benchmark and blow the test
    # timeout (observed 2026-08-18, the moment the tunnel came back up).
    # Dropping the trigger env var keeps the test hermetic either way.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cuda"
    code = (
        "import bench;"
        "bench.RETRY_BUDGET_S = 1.0; bench.RETRY_DELAY_S = 0.1;"
        "bench.PROBE_TIMEOUT_S = 25.0;"
        "bench.main()"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=360, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-500:]
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) >= 1, out.stdout
    for line in lines:  # every JSON line must parse — the driver greps any
        rec = json.loads(line)
        assert set(rec) == {"metric", "value", "unit", "vs_baseline", "error"}
        assert rec["value"] is None and rec["vs_baseline"] is None
    final = json.loads(lines[-1])
    assert "unavailable" in final["error"].lower() or "backend" in final["error"]


def test_bench_budget_inside_driver_kill_window():
    """Empirical driver bracket (BENCH_r03 vs r04): a 1500 s total wall
    survived (rc=0, line captured); 2100 s was killed (rc=124, nothing
    captured). Pin the retry budget and the self-watchdog strictly below
    the proven-safe point so no future 'the driver probably waits longer'
    inference can regress this again (VERDICT r04 #1a/#1d)."""
    sys.path.insert(0, "/root/repo")
    import bench

    assert bench.RETRY_BUDGET_S <= 1400
    assert bench.WATCHDOG_S <= 1450
    assert bench.RETRY_BUDGET_S < bench.WATCHDOG_S
    # the healthy-path legs must also fit: probe + XLA leg + pallas
    # (first attempt + capped retry) + margin inside the watchdog
    worst_healthy = (bench.PROBE_TIMEOUT_S + bench.PALLAS_TIMEOUT_TPU_S
                     + 300 + 240)
    assert worst_healthy < bench.WATCHDOG_S


def test_bench_first_json_line_is_fast_on_dead_backend():
    """Wall-to-first-JSON bound (VERDICT r04 #1d): with the backend dead,
    the first parseable line must appear as soon as the first probe fails —
    NOT after the retry budget. BENCH_r04 died because nothing was printed
    for 2100 s."""
    import os
    import time

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cuda"
    code = (
        "import bench;"
        # LONG budget: the point is that the first line beats the budget
        "bench.RETRY_BUDGET_S = 600.0; bench.RETRY_DELAY_S = 600.0;"
        "bench.PROBE_TIMEOUT_S = 25.0;"
        "bench.main()"
    )
    t0 = time.monotonic()
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, text=True,
                            cwd="/root/repo", env=env)
    try:
        first = None
        while time.monotonic() - t0 < 120:
            line = proc.stdout.readline()
            if not line:
                break
            if line.startswith("{"):
                first = line
                break
        elapsed = time.monotonic() - t0
        assert first is not None, "no JSON line before timeout"
        rec = json.loads(first)
        assert rec["value"] is None and "error" in rec
        # probe timeout (25 s) + interpreter/jax startup slack
        assert elapsed < 90, f"first JSON took {elapsed:.0f}s"
    finally:
        proc.kill()
        proc.wait()
