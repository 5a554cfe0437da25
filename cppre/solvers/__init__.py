"""Numerical PDE solvers (data generation for the data-free CP pipelines).

First-class rebuild of the reference's external `Neural_PDE.Numerical_Solvers`
package (API surface reconstructed from call sites, SURVEY.md §2.3 — the
submodule itself is not vendored in the reference snapshot). All solvers are
JAX: the time loop is a `lax.scan`, so a whole trajectory is one compiled
program, and `vmap` over the parameter axis batches an entire LHS design onto
one chip — replacing the reference's per-simulation NumPy loops
(`Marginal/Advection_Residuals_CP.py:97-116`), which SURVEY.md §3.1 flags as
the CPU hot spot.
"""

from .advection1d import Advection1D, advection_solve, advection_solve_batch
from .burgers1d import Burgers1D, burgers_solve_batch
from .wave2d_spectral import Wave2D, wave_solve_batch
from .ns2d_spectral import NavierStokes2D, ns_solve, ns_solve_batch
from .mhd2d_constrained import mhd_solve, mhd_solve_batch

Advection_1d = Advection1D  # reference-name aliases
Wave_2D = Wave2D
Navier_Stokes_2d = NavierStokes2D

__all__ = [
    "Advection1D",
    "Advection_1d",
    "advection_solve",
    "advection_solve_batch",
    "Burgers1D",
    "burgers_solve_batch",
    "Wave2D",
    "Wave_2D",
    "wave_solve_batch",
    "NavierStokes2D",
    "Navier_Stokes_2d",
    "ns_solve",
    "ns_solve_batch",
    "mhd_solve",
    "mhd_solve_batch",
]
