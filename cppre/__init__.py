"""cppre — CP-PRE rebuilt TPU-native.

Calibrated physics-informed uncertainty quantification for neural PDE
surrogates (arXiv 2502.04406), re-designed from scratch for JAX/XLA/TPU:
finite-difference stencils as fused convolution kernels, FNO surrogates in
flax with `lax.scan` autoregressive rollout, and vmap/pjit-transparent
inductive conformal prediction.

Reference behavioural spec: gitvicky/CP-PRE (see SURVEY.md).
"""

__version__ = "0.1.0"
