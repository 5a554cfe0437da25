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
