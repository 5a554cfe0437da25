"""Micro-bench: round-1 fused joint-CP path vs the round-2 flat-layout path
on the real TPU, at the three family flagship shapes.

Usage: timeout 900 python scripts/bench_flat.py [ns|mhd|wave|all]
Timing uses the slope harness (cppre.utils.tpu_bench.slope_time), which
cancels the fixed ~28 ms per-dispatch tunnel overhead; the original
version of this script used the naive chained guard (see probe_slope.py
for the correction). Note the flat path's routing also changed in round 2
(the raised VMEM cap lets the flat PAIRED kernel run at the NS shape,
where the earlier measurement exercised the two-kernel route).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

REPS = 5


def timed(pipe_once, t, p):
    from cppre.utils.tpu_bench import slope_time

    work, fixed, q = slope_time(pipe_once, t, p, inners=(10, 40, 160),
                                reps=REPS)
    return work, q


def make_inputs(shape, seed=0):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    t = rng.standard_normal(shape).astype(np.float32)
    p = t + 0.01 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(p)


def bench_ns():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import ns_joint_cp_scores_flat, ns_joint_cp_scores_fused

    shape = (100, 3, 21, 100, 100)
    t, p = make_inputs(shape)
    n, alpha = shape[0], 0.1

    def old(tt, pp):
        return calibrate(ns_joint_cp_scores_fused(tt, pp, 0.01, 0.01, 0.01, 1e-3), n, alpha)

    def new(tt, pp):
        return calibrate(ns_joint_cp_scores_flat(tt, pp, 0.01, 0.01, 0.01, 1e-3), n, alpha)

    t_old, q_old = timed(old, t, p)
    t_new, q_new = timed(new, t, p)
    rel = abs(q_new - q_old) / max(abs(q_old), 1e-9)
    print(f"NS   {shape}: fused {t_old*1e3:7.2f} ms  flat {t_new*1e3:7.2f} ms  "
          f"speedup {t_old/t_new:5.2f}x  qhat rel diff {rel:.2e}", flush=True)


def bench_mhd():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import (mhd_induction_joint_cp_scores_fused,
                                  mhd_joint_cp_scores_flat)

    shape = (100, 6, 21, 64, 64)
    t, p = make_inputs(shape, 1)
    n, alpha = shape[0], 0.1

    def old(tt, pp):
        return calibrate(mhd_induction_joint_cp_scores_fused(tt, pp), n, alpha)

    def new(tt, pp):
        return calibrate(mhd_joint_cp_scores_flat(tt, pp, "induction"), n, alpha)

    t_old, q_old = timed(old, t, p)
    t_new, q_new = timed(new, t, p)
    rel = abs(q_new - q_old) / max(abs(q_old), 1e-9)
    print(f"MHD  {shape}: fused {t_old*1e3:7.2f} ms  flat {t_new*1e3:7.2f} ms  "
          f"speedup {t_old/t_new:5.2f}x  qhat rel diff {rel:.2e}", flush=True)


def bench_wave():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import (wave_joint_cp_scores_flat,
                                  wave_joint_cp_scores_fused)
    from cppre.residuals.wave import PRE_Wave

    shape = (200, 21, 64, 64)
    t, p = make_inputs(shape, 2)
    n, alpha = shape[0], 0.1
    k = PRE_Wave(0.01, 0.02, c=1.0).D.kernel

    def old(tt, pp):
        return calibrate(wave_joint_cp_scores_fused(tt, pp, k), n, alpha)

    def new(tt, pp):
        return calibrate(wave_joint_cp_scores_flat(tt, pp, k), n, alpha)

    t_old, q_old = timed(old, t, p)
    t_new, q_new = timed(new, t, p)
    rel = abs(q_new - q_old) / max(abs(q_old), 1e-9)
    print(f"Wave {shape}: fused {t_old*1e3:7.2f} ms  flat {t_new*1e3:7.2f} ms  "
          f"speedup {t_old/t_new:5.2f}x  qhat rel diff {rel:.2e}", flush=True)


if __name__ == "__main__":
    import jax

    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ns", "all"):
        bench_ns()
    if which in ("mhd", "all"):
        bench_mhd()
    if which in ("wave", "all"):
        bench_wave()
