"""Experiment pipelines (L6): thin drivers over the library.

Each module reproduces a reference experiment script
(`Marginal/*_Residuals_CP.py`, `Joint/*_Residuals_CP.py`) as a callable
`run(config) -> results dict` plus a `python -m cppre.experiments.<name>`
entry point. The shared engine in `pipeline.py` implements the common
skeleton: config -> data gen (JAX solver, vmapped) -> train-or-load FNO ->
scan rollout -> PRE residuals -> conformal calibration -> alpha-sweep
coverage.
"""

from . import pipeline
from .common import latin_hypercube, stacked_fields, unstack_fields

__all__ = ["pipeline", "latin_hypercube", "stacked_fields", "unstack_fields"]
