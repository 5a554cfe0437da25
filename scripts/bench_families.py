"""Per-family residual + joint-CP throughput: XLA path vs fused Pallas.

Measures, at each family's flagship shape, the full nonconformity-score
pipeline (residual on truth + prediction, modulation, sup-norm scores,
split-CP quantile) on the real chip:

* NS momentum        [100, 3, 21, 100, 100]  (`Joint/NS_Residuals_CP.py`)
* MHD induction      [100, 6, 21, 64, 64]    (`Joint/MHD_Residuals_CP.py`)
* Wave composite     [200, 21, 64, 64]       (`Joint/Wave_Residuals_CP.py`)

Each timing uses the slope harness (cppre.utils.tpu_bench.slope_time):
dispatches of 10/40/160 chained in-graph evaluations, per-call work taken
from the slope so the fixed ~28 ms per-dispatch tunnel overhead cancels.

Path resolution at these shapes (see stencil_kernels._joint_cp_diff_stats):
all three families route to the paired one-pass diff+stats kernel (the v5e
grants ~120 MiB scoped VMEM, so it fits once vmem_limit_bytes is raised).
The "xla" rows are the ConvOps shift-add composition.

Run from /root/repo:  timeout 2400 python scripts/bench_families.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
ALPHA = 0.1

t0 = time.perf_counter()
float(jnp.sum(jnp.ones((4, 4))))
print(f"probe ok {time.perf_counter() - t0:.1f}s on {jax.default_backend()}",
      flush=True)

from cppre.cp.inductive import calibrate, modulation_func, ncf_metric_joint
from cppre.ops.pallas import (
    mhd_induction_joint_cp_scores_fused,
    ns_joint_cp_scores_fused,
    wave_joint_cp_scores_fused,
)
from cppre.residuals.mhd import PRE_MHD
from cppre.residuals.ns import PRE_NS
from cppre.residuals.wave import PRE_Wave


def timed(fn, t, p):
    """Slope-harness timing (cppre.utils.tpu_bench): per-call work with the
    fixed ~28 ms per-dispatch tunnel overhead cancelled exactly. The old
    chained guard `truth + q*1e-30` added a full-tensor copy pass per
    iteration and inflated every round-1 number (scripts/probe_slope.py)."""
    from cppre.utils.tpu_bench import slope_time

    work, fixed, q0 = slope_time(fn, t, p, inners=(10, 40, 160), reps=REPS)
    return work, q0


def xla_scores(residual, eps=1e-6):
    def fn(truth, pred):
        ro, rp = residual(truth), residual(pred)
        mod = modulation_func(ro, rp) + eps
        s = ncf_metric_joint(ro, rp, mod)
        return calibrate(s, truth.shape[0], ALPHA)

    return fn


def fused_scores(scores_fn):
    def fn(truth, pred):
        s = scores_fn(truth, pred)
        return calibrate(s, truth.shape[0], ALPHA)

    return fn


rng = np.random.default_rng(0)


def fields(shape):
    t = rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(t + 0.01 * rng.standard_normal(shape).astype(np.float32))


FAMILIES = []

pre_ns = PRE_NS(0.01, 0.01, 0.01, nu=1e-3)
FAMILIES.append(("ns_momentum", (100, 3, 21, 100, 100),
                 xla_scores(pre_ns.residual_momentum),
                 fused_scores(lambda t, p: ns_joint_cp_scores_fused(
                     t, p, 0.01, 0.01, 0.01, 1e-3))))

pre_mhd = PRE_MHD(0.0025, 1 / 64, 1 / 64)
FAMILIES.append(("mhd_induction", (100, 6, 21, 64, 64),
                 xla_scores(pre_mhd.residual_induction),
                 fused_scores(mhd_induction_joint_cp_scores_fused)))

pre_wave = PRE_Wave(0.05, 2 / 63, c=1.0)
FAMILIES.append(("wave_composite", (200, 21, 64, 64),
                 xla_scores(pre_wave),
                 fused_scores(lambda t, p: wave_joint_cp_scores_fused(
                     t, p, pre_wave.D.kernel))))

for name, shape, xla_fn, pallas_fn in FAMILIES:
    t, p = fields(shape)
    t_xla, q_x = timed(xla_fn, t, p)
    t_pal, q_p = timed(pallas_fn, t, p)
    assert abs(q_p - q_x) < 2e-3 * max(abs(q_x), 1e-6), (name, q_p, q_x)
    n_fields = 2 * shape[0]
    print(json.dumps({
        "family": name, "shape": list(shape),
        "xla_ms": round(t_xla * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
        "pallas_speedup": round(t_xla / t_pal, 2),
        "pallas_fields_per_s": round(n_fields / t_pal, 0),
    }), flush=True)
