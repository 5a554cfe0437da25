"""Multi-host entry point (SURVEY.md §7 step 9).

The reference has no distributed execution at all; the TPU-native scale-out
story is: each host calls `initialize()` once, then builds a global Mesh
over `jax.devices()` and uses the same dp/tp/sp shardings as single-host —
GSPMD routes collectives over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "global_mesh"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """`jax.distributed.initialize` wrapper; no-ops on a single process.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU multi-process runs."""
    if num_processes is not None and num_processes <= 1:
        return
    explicit = coordinator_address is not None or process_id is not None
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError as e:
        # benign double-initialize only; anything else must surface
        if "already" not in str(e).lower():
            raise
    except ValueError:
        if explicit:
            raise  # misconfiguration (bad address/process_id), not benign


def global_mesh(dp: int | None = None, tp: int = 1, axis_names=("dp", "tp")):
    """Mesh over all global devices (call after initialize())."""
    from .sharding import make_mesh

    return make_mesh(len(jax.devices()), dp=dp, tp=tp, axis_names=axis_names)
