"""A/B: bench.py INNER_ITERS chain length (VERDICT r04 #6).

bench.py amortises the fixed ~28 ms tunnel dispatch over INNER_ITERS
chained in-graph pipeline evaluations; at 400 iterations ~0.07 ms of
dispatch remains on the ~1.25 ms NS pipeline (a ~5% haircut on the
reported driver metric). The chain is a fori_loop, so compile time is
count-independent — the only cost of longer chains is per-dispatch wall.

Measures the bench pipeline's per-call time at 400 / 800 / 1600 chained
iterations (same dispatch_time harness bench.py uses) and reports the
implied driver metric for each; banks into results_weather.json under
"inner_iters_ab". Policy: if 800 or 1600 moves the implied metric >= 3%,
raise bench.py's INNER_ITERS.

Run: timeout 1200 python scripts/bench_inner_iters.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

PATH = "/root/repo/results_weather.json"


def main():
    from cppre.utils.jax_cache import enable_persistent_cache
    from cppre.utils.tpu_bench import dispatch_time

    enable_persistent_cache()
    t0 = time.perf_counter()
    float(jnp.sum(jnp.ones((8, 8))))
    print(f"probe ok {time.perf_counter() - t0:.1f}s on "
          f"{jax.default_backend()}", flush=True)

    import bench

    fields, pred = bench._synthetic_fields()
    f, p = jnp.asarray(fields), jnp.asarray(pred)

    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import ns_joint_cp_scores_fused

    def once(tt, pp):
        scores = ns_joint_cp_scores_fused(tt, pp, bench.DT, bench.DX,
                                          bench.DX, bench.NU,
                                          samples_per_block=4)
        return calibrate(scores, bench.N_CAL, bench.ALPHA)

    out = {}
    qs = {}
    for inner in (400, 800, 1600):
        t_mean, q = dispatch_time(once, inner, f, p, reps=bench.REPS)
        per_call_ms = t_mean / inner * 1e3
        metric = 2 * bench.N_CAL / (t_mean / inner)
        out[str(inner)] = {"per_call_ms": per_call_ms,
                           "implied_fields_per_s": metric}
        qs[inner] = float(q)
        print(f"inner={inner}: {per_call_ms:.3f} ms/call  "
              f"{metric:,.0f} fields/s", flush=True)
    assert len({round(v, 6) for v in qs.values()}) == 1, \
        f"qhat varies with chain length: {qs}"
    base = out["400"]["implied_fields_per_s"]
    out["gain_800_pct"] = 100 * (out["800"]["implied_fields_per_s"] / base - 1)
    out["gain_1600_pct"] = (100
                            * (out["1600"]["implied_fields_per_s"] / base - 1))
    out["date"] = time.strftime("%Y-%m-%d")
    print(f"gain: 800 {out['gain_800_pct']:+.1f}%  "
          f"1600 {out['gain_1600_pct']:+.1f}%", flush=True)

    try:
        existing = json.load(open(PATH))
    except Exception:
        existing = {}
    existing["inner_iters_ab"] = out
    json.dump(existing, open(PATH, "w"), indent=1)
    print("wrote", PATH, flush=True)


if __name__ == "__main__":
    main()
