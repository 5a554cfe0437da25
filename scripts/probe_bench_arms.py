"""On-chip qhat-parity study of bench.py's optional Pallas arms.

bench.py's Pallas leg (since round 3c) tries a bf16 staged-diff arm and a
samples_per_block=2 arm behind the same 1e-3 qhat parity gate as the
one-pass variance. The 2026-08-20 campaign bench run showed the bf16 arm's
qhat delta at bench.py's smoother synthetic fields (~2e-3) exceeds the
gate that standard-normal fields pass at 1.4e-4 (scripts/bench_diff_dtype
.py) — the PRE is a near-cancellation, so a smoother field means a smaller
residual scale and a larger RELATIVE bf16 rounding. This probe pins all
four arm deltas at the exact bench field distribution so the arm list in
bench.py stays justified by measurement.

Run: timeout 900 python scripts/probe_bench_arms.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np


def main():
    import bench
    from cppre.cp.inductive import (calibrate, modulation_func,
                                    ncf_metric_joint)
    from cppre.ops.pallas import ns_joint_cp_scores_fused
    from cppre.residuals.ns import PRE_NS

    fields, pred = bench._synthetic_fields()
    f, p = jnp.asarray(fields), jnp.asarray(pred)
    pre = PRE_NS(bench.DT, bench.DX, bench.DX, nu=bench.NU)
    res_out = pre.residual_momentum(f)
    res_pred = pre.residual_momentum(p)
    mod = modulation_func(res_out, res_pred) + 1e-6
    q_xla = float(calibrate(ncf_metric_joint(res_out, res_pred, mod),
                            bench.N_CAL, bench.ALPHA))
    print(f"q_xla {q_xla:.7g}", flush=True)
    out = {"q_xla": q_xla, "arms": []}
    for dd, g in ((None, 1), (None, 2), (jnp.bfloat16, 1), (jnp.bfloat16, 2)):
        s = ns_joint_cp_scores_fused(f, p, bench.DT, bench.DX, bench.DX,
                                     bench.NU, samples_per_block=g,
                                     diff_dtype=dd)
        q = float(calibrate(s, bench.N_CAL, bench.ALPHA))
        rel = abs(q - q_xla) / abs(q_xla)
        name = "bf16" if dd is not None else "f32"
        out["arms"].append({"diff_dtype": name, "g": g, "qhat": q,
                            "rel_delta": rel,
                            "passes_gate": bool(rel <= 1e-3)})
        print(f"dd={name:4s} g={g} q={q:.7g} rel_delta={rel:.2e} "
              f"gate={'pass' if rel <= 1e-3 else 'FAIL'}", flush=True)
    print(json.dumps(out))
    np.save("/tmp/probe_bench_arms.npy", out, allow_pickle=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
