"""Definitive per-iteration cost via slope: total dispatch wall-clock at
INNER in {10, 40, 160} chained iterations; slope = true per-iteration work
(fixed per-dispatch tunnel overhead, ~26-38 ms, cancels exactly).

Harness: both tensors perturbed by a one-element dynamic_update_slice on
the loop carry each iteration — defeats CSE and loop-invariant hoisting at
~zero traffic (validated by the no-op slope, which must be ~0).

Run: timeout 1200 python scripts/probe_slope.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import calibrate
from cppre.ops.pallas import stencil_kernels as sk
from cppre.utils.tpu_bench import dispatch_time

REPS = 5
ALPHA = 0.1
SHAPE = (100, 3, 21, 100, 100)
INNERS = (10, 40, 160)


def slope(name, fn, t, p):
    # same fit as cppre.utils.tpu_bench.slope_time, kept inline only to
    # also print the per-INNER dispatch detail
    ts = [dispatch_time(fn, inner, t, p, reps=REPS)[0] for inner in INNERS]
    w, f = np.polyfit(np.asarray(INNERS, float), np.asarray(ts), 1)
    detail = "  ".join(f"N={n}:{tt*1e3:7.1f}ms" for n, tt in zip(INNERS, ts))
    print(f"{name:22s}: work {w*1e3:7.3f} ms/call  fixed {f*1e3:6.1f} ms   "
          f"[{detail}]", flush=True)
    return float(w)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    p = t + 0.01 * jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))

    nt, nx, ny = SHAPE[2:]
    math_fn = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                             0.01, 0.01, 0.01, 1e-3)

    def noop(tt, pp):
        return jnp.sum(tt[0, 0, 0, 0, :2]) * 1e-30

    def elementwise(tt, pp):
        # full elementwise pass whose output IS consumed (defeats DCE)
        return jnp.sum(tt * 1e-30)

    def composed(tt, pp):
        ro = sk._batched_residual_fused(tt, math_fn, None)
        rp = sk._batched_residual_fused(pp, math_fn, None)
        d = ro - rp
        s, sq = jnp.sum(d, axis=0), jnp.sum(d**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, SHAPE[0], 1e-6),
                         SHAPE[0], ALPHA)

    def paired(tt, pp):
        d, s, sq = sk._joint_cp_diff_stats(tt, pp, math_fn, False)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, SHAPE[0], 1e-6),
                         SHAPE[0], ALPHA)

    slope("no-op body", noop, t, p)
    slope("elementwise sum(t*c)", elementwise, t, p)
    slope("composed pipeline", composed, t, p)
    slope("paired pipeline", paired, t, p)


if __name__ == "__main__":
    main()
