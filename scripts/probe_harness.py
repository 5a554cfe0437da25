"""Harness correction: the chained-iteration CSE guard `t + q*1e-30`
materialises a full extra copy of the truth tensor every iteration
(~504 MB of extra traffic, ~1.2 ms at the chip's 430 GB/s streaming rate),
inflating every round-1 pipeline number. Carrying the tensor through the
loop and perturbing ONE element via dynamic_update_slice keeps the data
dependency (defeats CSE and loop-invariant hoisting) at ~zero cost because
XLA updates while-loop carries in place.

This probe times the NS joint-CP pipeline and a pure-copy kernel under
both harnesses. Run: timeout 900 python scripts/probe_harness.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import calibrate
from cppre.ops.pallas import stencil_kernels as sk

INNER, REPS = 25, 5
ALPHA = 0.1
SHAPE = (100, 3, 21, 100, 100)


def chain_add(fn):
    """Round-1 harness: full-tensor additive perturbation per iteration."""

    @jax.jit
    def pipeline(t, p):
        def body(i, q):
            return fn(t + q * 1e-30, p)

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    return pipeline


def chain_dus(fn):
    """Corrected harness: one-element in-place perturbation on the carry."""

    @jax.jit
    def pipeline(t, p):
        def body(i, carry):
            t_c, q = carry
            bump = jax.lax.dynamic_slice(t_c, (0,) * t_c.ndim,
                                         (1,) * t_c.ndim) + q * 1e-30
            t_c = jax.lax.dynamic_update_slice(t_c, bump, (0,) * t_c.ndim)
            return (t_c, fn(t_c, p))

        return jax.lax.fori_loop(0, INNER, body, (t, jnp.float32(0.0)))[1]

    return pipeline


def timed(pipe, t, p):
    q = float(np.asarray(pipe(t, p)).ravel()[0])
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(np.asarray(pipe(t, p)).ravel()[0])
        times.append(time.perf_counter() - t0)
    return float(np.mean(times)) / INNER, q


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    p = t + 0.01 * jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))

    nt, nx, ny = SHAPE[2:]
    math_fn = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                             0.01, 0.01, 0.01, 1e-3)

    def pipe(tt, pp):
        ro = sk._batched_residual_fused(tt, math_fn, None)
        rp = sk._batched_residual_fused(pp, math_fn, None)
        d = ro - rp
        s, sq = jnp.sum(d, axis=0), jnp.sum(d**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, SHAPE[0], 1e-6),
                         SHAPE[0], ALPHA)

    t_add, q1 = timed(chain_add(pipe), t, p)
    t_dus, q2 = timed(chain_dus(pipe), t, p)
    print(f"NS composed pipeline: add-harness {t_add*1e3:.2f} ms   "
          f"dus-harness {t_dus*1e3:.2f} ms   qhat rel "
          f"{abs(q1-q2)/abs(q1):.1e}", flush=True)

    def just_copy(tt, pp):
        return jnp.sum(tt[0, 0, 0, 0, :2]) * 1e-30

    t_add, _ = timed(chain_add(just_copy), t, p)
    t_dus, _ = timed(chain_dus(just_copy), t, p)
    print(f"no-op body         : add-harness {t_add*1e3:.2f} ms   "
          f"dus-harness {t_dus*1e3:.2f} ms  (harness overhead alone)",
          flush=True)


if __name__ == "__main__":
    main()
