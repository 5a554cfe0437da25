"""Bayesian-UQ baseline harness: MC validators + the comparison protocol.

First-class rebuild of `Other_UQ/` (reference `/root/reference/Other_UQ/`):
model variants live in `cppre.models.variants`/`swag`; this package holds
the per-method validation rollouts (`Utils/training_utils.py:117-512`), the
in/out-of-distribution data loaders (`Evaluation/data_loaders.py`), and the
bootstrap comparison harness (`Evaluation/Eval.py:105-424`).
"""

from .validation import (
    validation_dropout,
    validation_ensemble,
    validation_bayesian,
    validation_swag,
    validation_mle,
    validation_aer,
    validation_pre,
)
from .eval import evaluate_uq_methods

__all__ = [
    "validation_dropout",
    "validation_ensemble",
    "validation_bayesian",
    "validation_swag",
    "validation_mle",
    "validation_aer",
    "validation_pre",
    "evaluate_uq_methods",
]
