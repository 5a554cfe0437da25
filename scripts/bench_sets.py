"""Set-propagation throughput: batched TPU `set_pre_batched` vs the
per-sample host pipeline (the reference's flow,
`Inverse_residuals/Python/pre_set_prop.py:29-89` in a Python loop).

Bounds B=100 SHO prediction trajectories (Nt=200) end-to-end:
interval construction -> interval FFT -> deconvolution radius map ->
inverse interval FFT. The radius map is a [B, N] x [N, N] contraction,
so the batch rides the MXU in one device call.

Run: timeout 600 python scripts/bench_sets.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

B, NT = 100, 200


def main():
    from cppre.sets import set_PRE, set_pre_batched
    from cppre.utils.tpu_bench import slope_time

    t = np.arange(NT) * 0.1010101
    rng = np.random.default_rng(0)
    freqs = rng.uniform(0.7, 1.3, B)
    trajs = np.stack([np.cos(f * t) for f in freqs]).astype(np.float32)

    # host reference: per-sample loop (reference flow)
    t0 = time.perf_counter()
    for b in range(B):
        set_PRE(trajs[b])
    host_s = time.perf_counter() - t0

    # device: one batched call, slope-timed (returns (lower, upper))
    xs = jnp.asarray(trajs)

    def once(x):
        lo, up = set_pre_batched(x)
        return jnp.sum(up - lo)  # scalar pull keeps the pair live

    work, fixed, _ = slope_time(once, xs, inners=(10, 40, 160), reps=5)
    out = {
        "host_per_sample_ms": host_s / B * 1e3,
        "host_batch_s": host_s,
        "tpu_batch_work_ms": work * 1e3,
        "tpu_trajs_per_s": B / work,
        "speedup_vs_host_batch": host_s / work,
    }
    print(f"host loop: {host_s:.2f} s ({host_s / B * 1e3:.1f} ms/traj)  "
          f"tpu batched: {work * 1e3:.3f} ms ({B / work:,.0f} trajs/s)  "
          f"speedup {host_s / work:,.0f}x", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
