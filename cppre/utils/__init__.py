"""Auxiliary subsystems: checkpointing, configs, run logging, timing, plots.

Rebuilds SURVEY.md §5's inventory: weights+normalizer checkpointing with the
reference's `<Model>_<Case>_<runname>` naming contract, the YAML/dict config
system, a pluggable run logger with a no-op default (the reference
hard-wires the simvue SaaS client), the `Benchmark` timing helper
(`Utils/fft_conv_pytorch/utils.py:9-33`), and matplotlib plot tools
(`Utils/plot_tools.py`).
"""

from .benchmark import Benchmark, benchmark, assert_almost_equal
from .checkpoint import save_checkpoint, load_checkpoint, save_norms, load_norms
from .config import load_config, validate_config
from .profiling import timer, trace
from .runlog import Run, NoOpRun
from .torch_compat import fno_params_from_torch, load_torch_fno
from .validate import check_finite, check_shape, scrub_nan_sims

__all__ = [
    "fno_params_from_torch",
    "load_torch_fno",
    "Benchmark",
    "benchmark",
    "assert_almost_equal",
    "save_checkpoint",
    "load_checkpoint",
    "save_norms",
    "load_norms",
    "load_config",
    "validate_config",
    "Run",
    "NoOpRun",
    "timer",
    "trace",
    "check_finite",
    "check_shape",
    "scrub_nan_sims",
]
