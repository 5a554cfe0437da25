"""A/B the fused Pallas FNO forward vs the XLA path on the real chip.

Wave-flagship inference config (B=50, V=1, 64x64, W=32, m=16): times one
forward and a 20-step AR rollout through each path with the slope harness.
The XLA forward measures ~18% of the streaming ceiling (launch/pass
dominated, BASELINE.md training-roofline section); the fused block's two
HBM passes per block bound the possible win at ~4-6x.

Run from /root/repo:  timeout 1800 python scripts/bench_fused_fno.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.models import FNO2d, fno2d_forward_fused
from cppre.train.rollout import validation_AR
from cppre.utils.tpu_bench import slope_time

B, V, N, W, M, T_OUT = 50, 1, 64, 32, 16, 20

# the NS flagship config (Joint/NS_Residuals_CP.py:13-36): 3 vars, 100x100
# (non-8-aligned -> exercises the sublane-padding path on chip), width 16
SHAPES = [
    ("wave64", dict(B=50, V=1, N=64, W=32, M=16)),
    ("ns100", dict(B=50, V=3, N=100, W=16, M=8)),
]


def main():
    for tag, sh in SHAPES:
        print(f"=== {tag}: {sh}", flush=True)
        run_shape(**sh)


def run_shape(B, V, N, W, M):
    print("backend:", jax.default_backend(), flush=True)
    m = FNO2d(T_in=1, step=1, modes1=M, modes2=M, num_vars=V, width_time=W)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, V, N, N, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)

    apply_xla = jax.jit(lambda z: m.apply(v, z))
    apply_fused = jax.jit(lambda z: fno2d_forward_fused(m, v, z))

    # math parity on-chip first
    d = float(jnp.abs(apply_xla(x) - apply_fused(x)).max())
    print(f"on-chip |xla - fused| max: {d:.3e}", flush=True)

    for name, fn in (("xla  ", apply_xla), ("fused", apply_fused)):
        work, _, _ = slope_time(lambda z: jnp.sum(fn(z) ** 2), x,
                                inners=(4, 12, 36), reps=3)
        print(f"forward {name}: {work*1e3:8.2f} ms  "
              f"{B/work:8.0f} samples/s", flush=True)

    u = jnp.asarray(rng.standard_normal((B, V, N, N, T_OUT)), jnp.float32)
    for name, fn in (("xla  ", apply_xla), ("fused", apply_fused)):
        def rollout(a, uu):
            pred, mse, _ = validation_AR(fn, a, uu, 1, T_OUT)
            return mse

        work, _, _ = slope_time(rollout, x, u, inners=(2, 6, 18), reps=3)
        print(f"rollout {name}: {work*1e3:8.2f} ms  "
              f"{B*T_OUT/work:8.0f} frames/s", flush=True)


if __name__ == "__main__":
    main()
