"""CP-driven active learning: acquisition functions + the AL loop.

Rebuild of `/root/reference/Active_Learning/` (`Advection_AL_Joint.py:
290-380`): three acquisition strategies over a fresh LHS candidate pool —
CP (joint-CP reject set), PRE (ranked by mean |residual|), RAND — feeding
rejected parameters back through the solver into the training set for
fine-tuning, over n_iterations rounds.
"""

from .acquisition import acquire_cp, acquire_cp_marginal, acquire_pre, acquire_rand
from .loop import active_learning_loop

__all__ = ["acquire_cp", "acquire_cp_marginal", "acquire_pre", "acquire_rand", "active_learning_loop"]
