"""Profiling helpers: jax.profiler traces + perf_counter timers.

SURVEY.md §5 tracing decision: the reference only wall-clocks epochs with
`timeit.default_timer`; here `trace()` captures a full XLA/TPU profiler
trace viewable in TensorBoard/Perfetto, and `timer()` is the epoch-level
equivalent.
"""

from __future__ import annotations

import contextlib
import time

__all__ = ["trace", "timer"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/cppre_trace"):
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timer(label: str = "", sink=print):
    """Wall-clock the enclosed block (reference epoch-timer pattern,
    `Marginal/Advection_Residuals_CP.py:190-207`)."""
    t0 = time.perf_counter()
    result = {"label": label, "seconds": None}
    try:
        yield result
    finally:
        result["seconds"] = time.perf_counter() - t0
        if sink is not None:
            sink(f"{label}: {result['seconds']:.3f}s")
