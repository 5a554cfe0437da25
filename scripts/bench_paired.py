"""Micro-bench: paired one-pass joint-CP kernel (raised VMEM limit) vs the
round-1 composed path, real TPU, flagship shapes.

Run: timeout 900 python scripts/bench_paired.py
Timing uses the slope harness (cppre.utils.tpu_bench.slope_time); the
original version used the naive chained guard — see probe_slope.py for the
correction that flipped this script's verdict (paired wins 1.25 vs 1.51 ms).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
ALPHA = 0.1


def timed(pipe_once, t, p):
    from cppre.utils.tpu_bench import slope_time

    work, fixed, q = slope_time(pipe_once, t, p, inners=(10, 40, 160),
                                reps=REPS)
    return work, q


def make_inputs(shape, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal(shape).astype(np.float32)
    p = t + 0.01 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(p)


def run_family(name, shape, make_paired, make_composed):
    t, p = make_inputs(shape, hash(name) % 100)
    t_pair, q_pair = timed(make_paired, t, p)
    t_comp, q_comp = timed(make_composed, t, p)
    rel = abs(q_pair - q_comp) / max(abs(q_comp), 1e-9)
    n_fields = 2 * shape[0]
    print(f"{name:5s} {shape}: composed {t_comp*1e3:7.2f} ms  paired "
          f"{t_pair*1e3:7.2f} ms  speedup {t_comp/t_pair:5.2f}x  "
          f"fields/s {n_fields/t_pair:9.0f}  qhat rel {rel:.1e}", flush=True)


def main():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import stencil_kernels as sk

    print("backend:", jax.default_backend(), flush=True)

    # --- NS ---
    shape = (100, 3, 21, 100, 100)
    nt, nx, ny = shape[2:]
    dt = dx = dy = 0.01
    nu = 1e-3
    math_fn = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                             dt, dx, dy, nu)

    def paired(tt, pp):
        d, s, sq = sk._joint_cp_diff_stats(tt, pp, math_fn, None)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, shape[0], 1e-6),
                         shape[0], ALPHA)

    def composed(tt, pp):
        ro = sk._batched_residual_fused(tt, math_fn, None)
        rp = sk._batched_residual_fused(pp, math_fn, None)
        d = ro - rp
        s, sq = jnp.sum(d, axis=0), jnp.sum(d**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, shape[0], 1e-6),
                         shape[0], ALPHA)

    run_family("NS", shape, paired, composed)

    # --- MHD ---
    shape = (100, 6, 21, 64, 64)
    nt, nx, ny = shape[2:]
    math_fn = lambda f: sk._mhd_induction_math(f, nt, nx, ny)

    def paired_m(tt, pp):
        d, s, sq = sk._joint_cp_diff_stats(tt, pp, math_fn, None)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, shape[0], 1e-6),
                         shape[0], ALPHA)

    def composed_m(tt, pp):
        ro = sk._batched_residual_fused(tt, math_fn, None)
        rp = sk._batched_residual_fused(pp, math_fn, None)
        d = ro - rp
        s, sq = jnp.sum(d, axis=0), jnp.sum(d**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(d, s, sq, shape[0], 1e-6),
                         shape[0], ALPHA)

    run_family("MHD", shape, paired_m, composed_m)


if __name__ == "__main__":
    main()
