"""Checkpointing: flax params (msgpack) + normalizer stats (npz).

Reference contract (SURVEY.md §5): weights-only `torch.save` of
`<Model>_<Case>_<runname>.pth` paired with `<...>_norms.npz` holding
`{in_a, in_b, out_a, out_b}` (`Physics_Informed/Wave_FNO_PI.py:168-175`,
load `Joint/Wave_Residuals_CP.py:131-139,190,208`). Here weights serialize
with flax msgpack to `<Model>_<Case>_<runname>.ckpt`; the norms contract is
identical.
"""

from __future__ import annotations

import os

import numpy as np
from flax import serialization

__all__ = ["checkpoint_name", "save_checkpoint", "load_checkpoint",
           "save_norms", "load_norms"]


def checkpoint_name(model: str, case: str, run_name: str) -> str:
    return f"{model}_{case}_{run_name}"


def save_checkpoint(path: str, params) -> str:
    if not path.endswith(".ckpt"):
        path = path + ".ckpt"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_checkpoint(path: str, params_template):
    if not path.endswith(".ckpt"):
        path = path + ".ckpt"
    with open(path, "rb") as f:
        return serialization.from_bytes(params_template, f.read())


def save_norms(path: str, in_normalizer, out_normalizer) -> str:
    """np.savez(in_a, in_b, out_a, out_b) — the reference's exact keys."""
    if not path.endswith(".npz"):
        path = path + "_norms.npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path,
             in_a=np.asarray(in_normalizer.a), in_b=np.asarray(in_normalizer.b),
             out_a=np.asarray(out_normalizer.a), out_b=np.asarray(out_normalizer.b))
    return path


def load_norms(path: str):
    """Returns (in_normalizer, out_normalizer) rebuilt from the npz
    (`Joint/Wave_Residuals_CP.py:131-139`)."""
    from ..train.normalizers import _AffineNormalizer

    if not path.endswith(".npz"):
        path = path + "_norms.npz"
    z = np.load(path)
    return (_AffineNormalizer.from_ab(z["in_a"], z["in_b"]),
            _AffineNormalizer.from_ab(z["out_a"], z["out_b"]))
