"""A/B: VMEM-stash single-pass joint-CP scores vs the staged-diff two-pass.

VERDICT r04 #7: the paired kernel's only HBM traffic above the input-read
floor is the staged diff's write + score-pass re-read. The single-pass
kernel (`_joint_cp_scores_single_pass`) keeps every sample's diff in
persistent VMEM scratch and scores it in a second grid phase, dropping the
pipeline to the 2-tensor read floor. It only FITS shapes whose padded diff
stash + blocks stay under the ~126 MiB scoped-VMEM grant:

  - MHD flagship [100, 6, 21, 64, 64]: ~87 MiB -> fits (predicted ~12%
    traffic saving: 471 -> 412 MB/call)
  - NS flagship  [100, 3, 21, 100, 100]: ~126 MiB -> does NOT fit (the
    (19, 98, 98) interior pads to 1.01 MiB/sample tiles); the staged-diff
    re-read IS the optimal NS strategy given the modulation -> score
    dependency — quantified here by construction, not by measurement.
  - Wave flagship bs=200: stash alone 124.6 MiB -> does not fit.

Measures the MHD flagship both ways (slope harness, qhat parity gate) and
banks into results_scaling.json under "single_pass_ab".

Run: timeout 1200 python scripts/bench_single_pass.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (100, 6, 21, 64, 64)  # MHD flagship
ALPHA = 0.1
PATH = "/root/repo/results_scaling.json"


def main():
    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import (mhd_induction_joint_cp_scores_fused,
                                  single_pass_fits)
    from cppre.utils.jax_cache import enable_persistent_cache
    from cppre.utils.tpu_bench import slope_time

    enable_persistent_cache()
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 8))))
    print(f"probe ok {time.perf_counter() - t0:.1f}s on "
          f"{jax.default_backend()}", flush=True)

    assert single_pass_fits(SHAPE), "fit arithmetic changed?"
    assert not single_pass_fits((100, 3, 21, 100, 100)), \
        "NS unexpectedly fits — re-run the NS arm too"

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    p = t + 0.01 * jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))

    def pipe(single):
        def once(tt, pp):
            scores = mhd_induction_joint_cp_scores_fused(
                tt, pp, single_pass=single)
            return calibrate(scores, tt.shape[0], ALPHA)
        return once

    out = {"shape": list(SHAPE)}
    for name, single in (("two_pass", False), ("single_pass", True)):
        work, fixed, q = slope_time(pipe(single), t, p,
                                    inners=(10, 40, 160), reps=5)
        fields = 2 * SHAPE[0] / (work + fixed / 100)
        out[name] = {"work_ms": work * 1e3, "qhat": float(q),
                     "fields_per_s": fields}
        print(f"{name}: work {work * 1e3:.3f} ms  {fields:,.0f} fields/s  "
              f"qhat {float(q):.6g}", flush=True)
    d = abs(out["single_pass"]["qhat"] - out["two_pass"]["qhat"]) / max(
        abs(out["two_pass"]["qhat"]), 1e-12)
    out["qhat_rel_delta"] = d
    out["speedup"] = (out["two_pass"]["work_ms"]
                      / out["single_pass"]["work_ms"])
    out["ns_fits"] = False
    out["note"] = ("MHD flagship VMEM-stash single-pass vs staged-diff "
                   "two-pass; NS/Wave flagships cannot stash (see "
                   "single_pass_fits docstring)")
    out["date"] = time.strftime("%Y-%m-%d")
    print(f"speedup {out['speedup']:.3f}x  qhat rel delta {d:.2e}",
          flush=True)

    try:
        existing = json.load(open(PATH))
    except Exception:
        existing = {}
    existing["single_pass_ab"] = out
    json.dump(existing, open(PATH, "w"), indent=1)
    print("wrote", PATH, flush=True)


if __name__ == "__main__":
    main()
