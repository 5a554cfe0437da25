"""Physics-informed (fine-)tuning: PRE as the training loss.

Rebuild of `/root/reference/Physics_Informed/{Wave_FNO_PI.py,
Wave_FNO_PISL.py, Advection_FNO_PI.py}`: the composite residual kernel is
differentiable by construction in JAX (the reference needs
`D.kernel.requires_grad = True`, Wave_FNO_PI.py:206), so PI losses are
ordinary functions of the rollout output. Config `basic` trains from
scratch with the PI loss; `finetune` starts from pretrained params
(Wave_FNO_PI.py:31,192-193).
"""

from .losses import make_pi_loss, make_pisl_loss, make_combined_loss
from .train import finetune_physics_informed

__all__ = [
    "make_pi_loss",
    "make_pisl_loss",
    "make_combined_loss",
    "finetune_physics_informed",
]
