"""Physics Residual Error (PRE) operators, one module per PDE family.

Rebuild of the per-experiment residual closures and the
`Other_UQ/Evaluation/PRE_estimations.py` classes (reference file:line cited
per module). Each class holds the `ConvOperator` stencils and exposes
``residual(fields, boundary=False)`` returning the residual with the
reference's interior crop ``[..., 1:-1, 1:-1, 1:-1]`` unless
``boundary=True``. Everything is pure jnp: residuals jit, vmap and shard
transparently, and are differentiable end-to-end for the physics-informed
training path.
"""

from .advection import PRE_Advection
from .burgers import PRE_Burgers
from .wave import PRE_Wave
from .ns import PRE_NS
from .mhd import PRE_MHD
from .jorek import PRE_JOREK
from .gs import PRE_GradShafranov

__all__ = [
    "PRE_Advection",
    "PRE_Burgers",
    "PRE_Wave",
    "PRE_NS",
    "PRE_MHD",
    "PRE_JOREK",
    "PRE_GradShafranov",
]
