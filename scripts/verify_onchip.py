"""Package-boundary verify drive on the real chip (the /verify skill flow).

Wave joint-CP end-to-end at the user-facing API: ConvOperator composite
kernel -> jit residual -> modulation/sup-norm scores -> split-CP quantile
-> joint coverage (reference flow `Joint/Wave_Residuals_CP.py:170-263`).
Prints one `verify: ...` line; exit 0 iff it ran to completion on TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from cppre.cp import calibrate, emp_cov_joint, modulation_func, ncf_metric_joint
    from cppre.ops import ConvOperator

    t0 = time.time()
    rng = np.random.default_rng(0)
    c, dt, dx = 1.0, 0.01, 2 / 63

    def field(k, nt=21, nx=64):
        x = np.linspace(-1, 1, nx)
        t = np.arange(nt) * dt
        return (np.cos(c * 2**0.5 * k * np.pi * t)[:, None, None]
                * np.sin(k * np.pi * x)[None, :, None]
                * np.sin(k * np.pi * x)[None, None, :])

    u = np.stack([field(k) for k in rng.uniform(1, 2, 200)]).astype(np.float32)
    pred = u + 1e-3 * rng.standard_normal(u.shape).astype(np.float32)
    D_tt, D_xxyy, D = ConvOperator("t", 2), ConvOperator(("x", "y"), 2), ConvOperator()
    D.kernel = D_tt.kernel - (c * dt / dx) ** 2 * D_xxyy.kernel
    res = jax.jit(lambda uu: D(uu)[..., 1:-1, 1:-1, 1:-1])
    ro, rp = res(jnp.asarray(u[:100])), res(jnp.asarray(pred[:100]))
    mod = modulation_func(ro, rp)
    s = ncf_metric_joint(ro, rp, mod + 1e-6)
    q = calibrate(s, 100, 0.1)
    to, tp = res(jnp.asarray(u[100:])), res(jnp.asarray(pred[100:]))
    cov = emp_cov_joint([tp - q * (mod + 1e-6), tp + q * (mod + 1e-6)], to)
    cov = float(np.asarray(cov))  # host fetch = the only reliable sync
    dev = jax.devices()[0]
    print(f"verify: coverage={cov:.3f} qhat={float(np.asarray(q)):.4g} "
          f"device={dev.platform}:{dev.device_kind} wall={time.time() - t0:.1f}s",
          flush=True)
    # in-sample modulation + sup-norm on iid synthetic noise sits well below
    # 1 - alpha (the reference method's own bias, see RESULTS.md); the
    # assertion is that the flow RAN on device and produced a sane quantile
    if not np.isfinite(cov) or not np.isfinite(float(np.asarray(q))):
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
