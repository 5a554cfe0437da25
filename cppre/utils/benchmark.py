"""Timing harness + numeric-agreement assertion.

Reference: `Utils/fft_conv_pytorch/utils.py:9-33` — `Benchmark(mean, std)`
over N iterations with the first (warm-up/compile) discarded, and the
5e-5 mean / 1e-4 max tolerance used for FFT-vs-direct conv agreement.
On the remote TPU backend, results are fetched to host inside the timed
region (block_until_ready does not reliably block through the tunnel).
"""

from __future__ import annotations

import time
from typing import Callable, NamedTuple

import numpy as np

__all__ = ["Benchmark", "benchmark", "assert_almost_equal"]


class Benchmark(NamedTuple):
    mean: float
    std: float

    def __repr__(self):
        return f"Benchmark(mean: {self.mean * 1e3:.4f} ms, std: {self.std * 1e3:.4f} ms)"


def benchmark(fn: Callable, *args, num_iterations: int = 10, **kwargs) -> Benchmark:
    """Mean/std wall-clock over `num_iterations` calls, first discarded."""
    times = []
    for _ in range(num_iterations + 1):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        np.asarray(out)  # host fetch = reliable device sync
        times.append(time.perf_counter() - t0)
    times = times[1:]
    return Benchmark(float(np.mean(times)), float(np.std(times)))


def assert_almost_equal(x, y, mean_tol: float = 5e-5, max_tol: float = 1e-4):
    """The reference's FFT-vs-direct agreement tolerance (utils.py:29-33)."""
    x, y = np.asarray(x), np.asarray(y)
    abs_error = np.abs(x - y)
    assert abs_error.mean() < mean_tol, f"mean abs err {abs_error.mean():.2e} >= {mean_tol}"
    assert abs_error.max() < max_tol, f"max abs err {abs_error.max():.2e} >= {max_tol}"
