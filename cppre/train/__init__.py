"""Training/rollout engine: scan-based autoregressive rollout, optax loops,
losses and normalizers.

First-class rebuild of the reference's external `Neural_PDE.Utils.
training_utils` / `.processing_utils`, whose semantics are specified by the
in-repo copy `/root/reference/Other_UQ/Utils/training_utils.py` (AR rollout
:27-45, grad-clip 2.0 :12,56) and the standard FNO-codebase normalizers.
"""

from .losses import LpLoss, lp_loss, mse, mae
from .normalizers import GaussianNormalizer, Identity, MinMaxNormalizer, RangeNormalizer
from .rollout import autoregressive_rollout, validation_AR
from .loops import TrainState, fit, make_train_step, train_one_epoch_AR

MinMax_Normalizer = MinMaxNormalizer  # reference-name alias

__all__ = [
    "LpLoss",
    "lp_loss",
    "mse",
    "mae",
    "MinMaxNormalizer",
    "MinMax_Normalizer",
    "RangeNormalizer",
    "GaussianNormalizer",
    "Identity",
    "autoregressive_rollout",
    "validation_AR",
    "TrainState",
    "make_train_step",
    "train_one_epoch_AR",
    "fit",
]
