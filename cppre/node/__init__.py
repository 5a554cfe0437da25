"""Neural-ODE studies: train NODEs on classic ODEs, analyse with ConvOps_0d.

Rebuild of `/root/reference/Inverse_residuals/{SHO, DHO, Bessel,
Cauchy_Euler}` and `Inverted_bounds/SHO.py`: MLP dynamics integrated with an
ODE solver (reference uses torchdiffeq.odeint; here
`jax.experimental.ode.odeint`, dopri5 with full autodiff), ground truth from
the analytic solutions, residual analysis via `ConvOperator0d` composite
kernels, and integrate(differentiate(u)) inversion round-trips
(`DHO_NODE.py:537-548`).
"""

from .models import ODEFunc, neural_odeint, fit_node
from .problems import (
    sho_solution,
    dho_solution,
    bessel_solution,
    cauchy_euler_solution,
    sho_residual_kernel,
    dho_residual_kernel,
)

__all__ = [
    "ODEFunc",
    "neural_odeint",
    "fit_node",
    "sho_solution",
    "dho_solution",
    "bessel_solution",
    "cauchy_euler_solution",
    "sho_residual_kernel",
    "dho_residual_kernel",
]
