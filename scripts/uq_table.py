"""Render a RESULTS.md-style markdown table from results_uq.json.

Usage: python scripts/uq_table.py <family> [results_uq.json]

Formats each method row exactly like the hand-written Wave/NS tables in
RESULTS.md (L2 mean +- std, coverage at the 0.9 nominal level, mean eval
time), bolding the conformal methods, so banking a freshly completed
family (or an OOD row, keyed "<family> (OOD)") is a copy-paste.
"""

from __future__ import annotations

import json
import sys

DISPLAY = {
    "Deterministic": "Deterministic",
    "Dropout": "MC Dropout",
    "Ensemble": "Deep Ensemble (3)",
    "Bayesian": "Bayesian (VI last layer)",
    "SWAG": "SWAG",
    "MLE": "MLE (heteroscedastic)",
    "AER": "**AER (CP)**",
    "PRE": "**PRE (CP, data-free)**",
}


def _sig(x: float, n: int = 2) -> str:
    """Two-significant-digit scientific form matching the hand tables."""
    return f"{x:.{n - 1}e}"


def render(family: str, path: str = "results_uq.json") -> str:
    data = json.load(open(path))
    if family not in data:
        raise SystemExit(f"{family!r} not in {path}; have {list(data)}")
    fam = data[family]
    proto = fam.get("_protocol", {})
    lines = [
        f"<!-- {family}: runs={proto.get('runs')} n_eval={proto.get('n_eval')}"
        f" epochs={proto.get('Epochs')} partial={proto.get('_partial')}"
        f" wall={fam.get('_wall_s', 0) / 60:.0f} min -->",
        "| Method | L2 (MSE) | Coverage @ 0.9 nominal | Eval time |",
        "|---|---|---|---|",
    ]
    for key, name in DISPLAY.items():
        if key not in fam:
            continue
        l2m, l2s = fam[key]["l2"]
        cm, cs = fam[key]["coverage"]
        tm = fam[key]["eval_time"][0]
        conformal = key in ("AER", "PRE")
        if key == "Deterministic" and cm < 1e-9:
            cov = "0.000 (zero-width sets)"
        else:
            cov = f"{cm:.3f} ± {cs:.3f}"
            if conformal:
                cov = f"**{cov}**"
        lines.append(f"| {name} | {_sig(l2m)} ± {_sig(l2s)} | {cov} "
                     f"| {tm:.1f} s |")
    return "\n".join(lines)


if __name__ == "__main__":
    fam = sys.argv[1] if len(sys.argv) > 1 else "MHD"
    path = sys.argv[2] if len(sys.argv) > 2 else "results_uq.json"
    print(render(fam, path))
