"""Config system: the reference's per-script dict + YAML schema.

Key set from `Marginal/Advection_Residuals_CP.py:15-38` and
`Other_UQ/Evaluation/Configs/*.yaml` (adds UQ, Dist, Seed, Runs). The
reference has no argparse/CLI; configs are dicts, optionally loaded from
YAML (`Eval.py:13-16`).
"""

from __future__ import annotations

import os

__all__ = ["load_config", "validate_config", "KNOWN_KEYS"]

KNOWN_KEYS = {
    "Case", "Field", "Model", "Epochs", "Batch Size", "Optimizer",
    "Learning Rate", "Scheduler Step", "Scheduler Gamma", "Activation",
    "Normalisation Strategy", "Physics Normalisation", "T_in", "T_out",
    "Step", "Width", "Width_time", "Width_vars", "Modes", "Variables",
    "Noise", "Loss Function", "UQ", "Dist", "Seed", "Runs",
    "n_train", "n_test", "n_cal", "n_pred",
}


def load_config(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f)


def validate_config(cfg: dict, required=("T_in", "T_out", "Step")) -> dict:
    missing = [k for k in required if k not in cfg]
    if missing:
        raise KeyError(f"config missing required keys: {missing}")
    return cfg
