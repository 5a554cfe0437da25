"""Serving-path throughput: CalibratedSurrogate.predict on the real chip.

The deployment question is "how many incoming simulations per second can
one chip screen?" — the serving program is encode -> scan AR rollout ->
decode -> PRE -> set test -> accept mask, one jitted graph
(`cppre/deploy.py`). Measures the NS-flagship serving config (the
reference's `Joint/NS_Residuals_CP.py` shapes: 3 vars, 100x100, T_out=20
rollout from T_in=1) and the wave config, XLA vs fused-Pallas rollout
arms, with the slope harness (fixed tunnel dispatch cancelled).

Untrained params: identical FLOPs/traffic to trained ones — this measures
the serving machinery, not model quality.

Run from /root/repo:  timeout 1800 python scripts/bench_serving.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.deploy import CalibratedSurrogate
from cppre.models import FNO2d
from cppre.utils.tpu_bench import slope_time

# (tag, batch, vars, grid, width, modes, T_out, residual family)
CONFIGS = [
    ("ns100", 50, 3, 100, 16, 8, 20, "ns"),
    ("wave64", 50, 1, 64, 32, 16, 20, "wave"),
]


def _residual_fn(family, nvar):
    if family == "ns":
        from cppre.residuals.ns import PRE_NS

        pre = PRE_NS(0.01, 0.01, 0.01, nu=0.001)
        return pre.residual_momentum
    from cppre.ops import ConvOperator

    c, dt, dx = 1.0, 0.01, 2 / 63
    D_tt = ConvOperator("t", 2)
    D_xxyy = ConvOperator(("x", "y"), 2)
    D = ConvOperator()
    D.kernel = D_tt.kernel - (c * dt / dx) ** 2 * D_xxyy.kernel
    return lambda f: D(f[:, 0])[..., 1:-1, 1:-1, 1:-1]


def run(tag, b, v, n, w, m, t_out, family):
    model = FNO2d(T_in=1, step=1, modes1=m, modes2=m, num_vars=v,
                  width_time=w)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((b, v, n, n, 1 + t_out)) * 0.1,
                       jnp.float32)
    params = model.init(jax.random.PRNGKey(0), data[:1, ..., :1])
    res_fn = _residual_fn(family, v)

    for arm in ("xla", "fused"):
        srv = CalibratedSurrogate(model, params, res_fn, step=1,
                                  T_out=t_out, fused=arm == "fused")
        if arm == "fused":
            from cppre.models.fused import fused_supported

            if not fused_supported(model, data[..., :1].shape):
                print(f"{tag}/{arm}: unsupported shape, skipped", flush=True)
                continue
        srv.calibrate(data[..., :1], alpha=0.1, holdout_modulation=True)

        def serve(a):
            out = srv.predict(a)
            return jnp.sum(out["accept"]) + out["residual"].ravel()[0]

        # jit once through predict's own path; slope over chained serves
        work, fixed, _ = slope_time(
            lambda a: serve(a), data[..., :1], inners=(2, 6, 18), reps=3)
        print(f"{tag}/{arm}: {work * 1e3:8.2f} ms/batch({b})  "
              f"{b / work:10.1f} sims/s/chip  (fixed {fixed * 1e3:.1f} ms)",
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    for cfg in CONFIGS:
        run(*cfg)


if __name__ == "__main__":
    main()
