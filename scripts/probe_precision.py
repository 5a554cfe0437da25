"""Precision study for the FNO forward (post-DFT):

The channel contractions are [.., 32] x [32, 32] — at width 32 the MXU is
at most 6% utilised, and Precision.HIGHEST (6-pass bf16 emulation) multiplies
the pass count. HIGH (3-pass) halves it; DEFAULT (1-pass bf16) was ruled
out in round 1 because it made the forward batch-shape-dependent
(max|d| = 0.087 between bs=200 and bs=100), which broke CP exchangeability.

Measures, per precision: forward slope time AND the batch-shape
discrepancy max|f(x[:100]) - f(x)[:100]| at bs 200 vs 100.

Run: timeout 1500 python scripts/probe_precision.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
INNERS = (4, 16, 64)
B, NX, NY, M, W = 200, 64, 64, 16, 32


def slope(fn, x):
    def dispatch(inner):
        @jax.jit
        def run(v):
            def body(i, carry):
                z = (0,) * v.ndim
                bump = jax.lax.dynamic_slice(carry, z, (1,) * v.ndim)
                c = jax.lax.dynamic_update_slice(carry, bump * (1 + 1e-30), z)
                out = fn(c)
                return c + 0.0 * out.reshape(-1)[0]

            return jax.lax.fori_loop(0, inner, body, v)[0, 0, 0, 0, 0]

        float(np.asarray(run(x)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(np.asarray(run(x)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    ts = [dispatch(n) for n in INNERS]
    return (ts[-1] - ts[0]) / (INNERS[-1] - INNERS[0])


def main():
    import cppre.models.fno as fno

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, 1, NX, NY, 1)), jnp.float32)

    for prec_name in ("HIGHEST", "HIGH", "DEFAULT"):
        fno.PRECISION = getattr(jax.lax.Precision, prec_name)
        model = fno.FNO2d(T_in=1, step=1, modes1=M, modes2=M, num_vars=1,
                          width_time=W)
        params = model.init(jax.random.PRNGKey(0), a)
        apply_full = jax.jit(lambda v: model.apply(params, v))
        apply_half = jax.jit(lambda v: model.apply(params, v))
        full = np.asarray(apply_full(a))[:100]
        half = np.asarray(apply_half(a[:100]))
        d = np.abs(full - half).max()
        w = slope(lambda v: model.apply(params, v), a)
        print(f"{prec_name:8s}: forward {w*1e3:7.2f} ms (B={B}), "
              f"batch-shape max|d| {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
