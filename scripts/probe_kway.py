"""Ground-truth pipeline timing: one dispatch over K DISTINCT input pairs.

No chained loop, no carries, no perturbation tricks: K different (truth,
prediction) pairs are pre-staged in HBM, the jitted function runs the
pipeline on each and sums the qhats. Nothing is loop-invariant, nothing can
be CSE'd, and the only fixed cost is the single host-fetch RPC, amortised
over K. This supersedes the chained fori_loop harness, whose full-tensor
CSE guard added a ~1 ms/iteration elementwise pass and whose loop-invariant
prediction leg XLA could hoist (probe_harness.py).

Run: timeout 900 python scripts/probe_kway.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import calibrate
from cppre.ops.pallas import stencil_kernels as sk

K, REPS = 10, 5
ALPHA = 0.1
SHAPE = (100, 3, 21, 100, 100)


def kway(fn):
    @jax.jit
    def dispatch(ts, ps):
        q = jnp.float32(0.0)
        for i in range(K):
            q = q + fn(ts[i], ps[i])
        return q

    return dispatch


def timed(name, fn, ts, ps):
    pipe = kway(fn)
    float(pipe(ts, ps))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(pipe(ts, ps))
        times.append(time.perf_counter() - t0)
    t = float(np.mean(times)) / K
    print(f"{name:22s}: {t*1e3:7.3f} ms/call", flush=True)
    return t


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    base = rng.standard_normal(SHAPE).astype(np.float32)
    ts = jnp.asarray(np.stack([base + 0.001 * i for i in range(K)]))
    ps = ts + 0.01 * jnp.asarray(
        rng.standard_normal((K,) + SHAPE).astype(np.float32))

    nt, nx, ny = SHAPE[2:]
    math_fn = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                             0.01, 0.01, 0.01, 1e-3)

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

    def xla(tt, pp):
        f = jax.vmap(math_fn)
        d = f(tt) - f(pp)
        s, sq = jnp.sum(d, axis=0), jnp.sum(d**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, SHAPE[0], 1e-6),
                         SHAPE[0], ALPHA)

    def res_only(tt, pp):
        ro = sk._batched_residual_fused(tt, math_fn, None)
        return jnp.sum(ro[0, 0, 0, :2])

    def copy_baseline(tt, pp):
        return jnp.sum((tt * 1.000001)[0, 0, 0, 0, :2])

    timed("elementwise t*c", copy_baseline, ts, ps)
    timed("residual truth-only", res_only, ts, ps)
    timed("composed pipeline", composed, ts, ps)
    timed("paired pipeline", paired, ts, ps)
    timed("pure-XLA pipeline", xla, ts, ps)


if __name__ == "__main__":
    main()
