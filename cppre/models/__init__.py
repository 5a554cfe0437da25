"""Surrogate model zoo (flax): FNO family, UQ variants, SWAG, INR/CAE.

First-class rebuild of the reference surrogates — `Neural_PDE.Models.FNO` as
specified by the in-repo copy `/root/reference/Other_UQ/Bayesian_Models/
Base_FNO.py` — in idiomatic flax.linen with TPU-friendly spectral layers
(split real/imaginary einsums instead of complex math).
"""

from .cae import ConvAutoencoder
from .fno import (FNO1d, FNO2d, SpectralConv1d, SpectralConv2d,
                  activation_dtype_scope, precision_scope,
                  with_activation_dtype, with_matmul_precision)
from .fused import (fno2d_forward_fused, fused_supported, make_fused_apply,
                    make_fused_train_apply)
from .inr import INR

__all__ = ["FNO1d", "FNO2d", "SpectralConv1d", "SpectralConv2d",
           "activation_dtype_scope", "fno2d_forward_fused", "fused_supported",
           "make_fused_apply", "make_fused_train_apply", "precision_scope",
           "with_activation_dtype", "with_matmul_precision",
           "ConvAutoencoder", "INR"]
