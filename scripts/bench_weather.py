"""Tunnel-weather study: N back-to-back `python bench.py` invocations.

VERDICT r03 ask #6: the published 121k-144k fields/s range was an anecdote
across rounds; this runs N invocations in ONE window and reports
min/median/max/spread so BASELINE.md can quote a measured distribution and
a policy for which number the headline uses.

Each run is the full driver contract (probe -> XLA leg -> Pallas
subprocess legs -> JSON line), so run 1 also warms the persistent
compilation cache (.jax_cache) with bench.py's exact call pattern —
the artifact that lets a driver invocation in a degraded window skip the
~100 s Mosaic recompile (cppre/utils/jax_cache.py).

Usage: python scripts/bench_weather.py [N] [--out results_weather.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(i: int) -> dict:
    t0 = time.monotonic()
    try:
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, timeout=2500,
                             cwd=REPO)
        # LAST JSON line is authoritative: since round 5 bench.py also
        # emits an error line immediately on a failed first probe, which a
        # later in-window recovery supersedes
        line = next((l for l in reversed(out.stdout.splitlines())
                     if l.startswith("{")), None)
        rec = json.loads(line) if line else {"error": "no JSON line",
                                             "rc": out.returncode}
    except subprocess.TimeoutExpired:
        rec = {"error": "bench.py exceeded 2500s"}
    rec["run"] = i
    rec["wall_s"] = round(time.monotonic() - t0, 1)
    return rec


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 5
    out_path = os.path.join(REPO, "results_weather.json")
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    runs = []
    for i in range(n):
        rec = run_once(i)
        runs.append(rec)
        print(json.dumps(rec), flush=True)
        # bank incrementally: a tunnel outage mid-campaign keeps earlier runs
        import statistics

        values = sorted(r["value"] for r in runs
                        if isinstance(r.get("value"), (int, float)))
        summary = {
            "n_requested": n, "n_done": len(runs),
            "n_with_value": len(values),
            "min": values[0] if values else None,
            # standard midpoint median (ADVICE r04: values[n//2] is the
            # upper median for even-length campaigns, and the BASELINE.md
            # headline policy quotes this field)
            "median": float(statistics.median(values)) if values else None,
            "max": values[-1] if values else None,
            "spread_pct": (round(100 * (values[-1] - values[0]) / values[-1], 1)
                           if len(values) > 1 else None),
            "policy": "headline quotes the MEDIAN of a same-window campaign; "
                      "single-shot driver runs are expected to land within "
                      "[min, max] of this table",
            "date": time.strftime("%Y-%m-%d"),
        }
        with open(out_path, "w") as fh:
            json.dump({"summary": summary, "runs": runs}, fh, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
