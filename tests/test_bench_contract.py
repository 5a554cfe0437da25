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
    still print ONE driver-parseable JSON line carrying an "error" field —
    not an uncaught traceback (BENCH_r02.json was rc=1/parsed:null)."""
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
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline", "error"}
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "unavailable" in rec["error"].lower() or "backend" in rec["error"]
