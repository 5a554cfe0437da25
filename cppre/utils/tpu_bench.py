"""TPU timing harness for remote (tunnelled) backends.

Measuring kernels through the axon tunnel has two traps (quantified in
`scripts/probe_slope.py`, 2026-08-17):

1. A fixed ~28 ms per-DISPATCH overhead (execution launch + the host-fetch
   sync, which is the only reliable completion signal — `block_until_ready`
   returns early on this backend). Any per-call number must amortise it
   over many chained in-graph iterations, or subtract it via a slope fit.
2. The chained iterations need a data dependency so XLA cannot CSE them or
   hoist loop-invariant work — but the naive guard `t + q*1e-30`
   materialises a full extra copy of the tensor every iteration (~0.5-1 ms
   at these shapes), silently inflating the measured work. The correct
   guard perturbs ONE element of the loop-carried tensors with
   `dynamic_update_slice`, which XLA applies in place (measured no-op slope
   0.009 ms/call).

`chain_calls` builds the corrected chained pipeline; `slope_time` returns
the per-call work with the fixed overhead cancelled exactly.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["chain_calls", "dispatch_time", "slope_time"]


def chain_calls(fn, inner: int):
    """jit(*arrays) running `inner` chained `fn(*arrays) -> scalar`
    evaluations (any number of array arguments; the flagship pipelines pass
    two, single-tensor probes pass one).

    Each iteration perturbs one element of every carried tensor by
    `q * 1e-30` (q = previous iteration's result): a true data dependency
    at ~zero cost, so neither CSE nor loop-invariant code motion can elide
    iterations, and the measured slope is the pipeline's real work."""

    @jax.jit
    def pipeline(*arrays):
        def body(i, carry):
            *arrs, q = carry
            q_s = q.ravel()[0]  # fn may return a (small) array
            bumped = []
            for a in arrs:
                z = (0,) * a.ndim
                eps = (q_s * 1e-30).astype(a.dtype)
                bump = jax.lax.dynamic_slice(a, z, (1,) * a.ndim) + eps
                bumped.append(jax.lax.dynamic_update_slice(a, bump, z))
            return (*bumped, fn(*bumped))

        # seed the carry with fn's own output shape/dtype (f64 under x64
        # runs) so the fori_loop carry structure matches across iterations
        out = jax.eval_shape(fn, *arrays)
        q0 = jnp.zeros(out.shape, out.dtype)
        return jax.lax.fori_loop(0, inner, body, (*arrays, q0))[-1]

    return pipeline


def dispatch_time(fn, inner: int, *arrays, reps: int = 5):
    """Median wall-clock of one dispatch of `inner` chained calls, synced
    by host fetch. Returns (median_seconds, first_result)."""
    pipe = chain_calls(fn, inner)
    q0 = float(np.asarray(pipe(*arrays)).ravel()[0])  # compile + execute
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(pipe(*arrays)).ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), q0


def slope_time(fn, *arrays, inners=(10, 40, 160), reps: int = 5):
    """Per-call work via the slope of dispatch time over iteration count —
    the fixed per-dispatch overhead cancels exactly. Returns
    (work_seconds_per_call, fixed_overhead_seconds, result).

    Robustness (2026-08-20): tunnel timing noise is one-sided additive
    (hiccups only ever ADD time), and a hiccup window that covers all reps
    of ONE inner count tilts an LSQ fit by Δ/(n_j−n_i) — observed as two
    physically-impossible g-sweep rows (implied HBM bandwidth >2 TB/s on an
    819 GB/s part). Defense: (a) warm every pipeline first, (b) interleave
    the timing passes round-robin across inner counts so a transient window
    cannot map onto a single count, (c) take the per-count MIN over passes
    (the standard robust estimator under one-sided noise) before the fit."""
    pipes = [chain_calls(fn, inner) for inner in inners]
    q0 = float(np.asarray(pipes[0](*arrays)).ravel()[0])  # compile+execute
    for p in pipes[1:]:
        float(np.asarray(p(*arrays)).ravel()[0])
    best = [float("inf")] * len(inners)
    for _ in range(reps):
        for i, p in enumerate(pipes):
            t0 = time.perf_counter()
            float(np.asarray(p(*arrays)).ravel()[0])
            best[i] = min(best[i], time.perf_counter() - t0)
    work, fixed = np.polyfit(np.asarray(inners, float), np.asarray(best), 1)
    return float(work), float(fixed), q0
