"""A/B: f32 vs bf16 staged-diff in the paired joint-CP scores pipeline.

The NS flagship pipeline's staged diff tensor costs 146 MB of its 652 MB
HBM traffic (write + score-pass re-read); `diff_dtype=bfloat16` halves
that (~13% less traffic -> expected ~10% on the headline fields/s).
Measures the full scores+quantile pipeline work time (slope harness) and
the qhat relative delta at the flagship shape, on the real chip.

Run: timeout 900 python scripts/bench_diff_dtype.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (100, 3, 21, 100, 100)
DT = DX = DY = 0.01
ALPHA = 0.1


def main():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import ns_joint_cp_scores_fused
    from cppre.utils.tpu_bench import slope_time

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    p = t + 0.01 * jnp.asarray(
        rng.standard_normal(SHAPE).astype(np.float32))

    def pipe(dtype):
        def once(tt, pp):
            scores = ns_joint_cp_scores_fused(tt, pp, DT, DX, DY,
                                              diff_dtype=dtype)
            return calibrate(scores, tt.shape[0], ALPHA)
        return once

    out = {}
    for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        work, fixed, q = slope_time(pipe(dtype), t, p,
                                    inners=(10, 40, 160), reps=5)
        fields = 2 * SHAPE[0] / (work + fixed / 100)
        out[name] = {"work_ms": work * 1e3, "qhat": float(q),
                     "fields_per_s": fields}
        print(f"{name}: work {work * 1e3:.3f} ms  "
              f"{fields:,.0f} fields/s  qhat {float(q):.6g}", flush=True)
    d = abs(out["bf16"]["qhat"] - out["f32"]["qhat"]) / abs(out["f32"]["qhat"])
    out["qhat_rel_delta"] = d
    out["speedup"] = out["f32"]["work_ms"] / out["bf16"]["work_ms"]
    print(f"speedup {out['speedup']:.3f}x  qhat rel delta {d:.2e}",
          flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
