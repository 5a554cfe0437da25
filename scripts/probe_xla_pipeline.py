"""Probe: pure-XLA (vmapped shift-add slices, no Pallas, no ConvOps pad)
joint-CP score pipelines at the flagship shapes vs the Pallas routings.

XLA's own fusion loops stream at ~430 GB/s on this chip where Pallas block
pipelines reach ~160-210 GB/s (probe_copy_layouts.py) — if the whole
residual+diff+stats fuses into a couple of XLA loops, it should win.

Run: timeout 900 python scripts/probe_xla_pipeline.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import calibrate
from cppre.ops.pallas import stencil_kernels as sk

REPS = 5
ALPHA = 0.1


def timed(fn, t, p):
    """Slope-harness timing (cppre.utils.tpu_bench) — see probe_slope.py;
    the original full-tensor `t + q*1e-30` guard added a hidden copy pass
    per iteration."""
    import numpy as np

    from cppre.utils.tpu_bench import slope_time

    work, _fixed, q = slope_time(fn, t, p, inners=(5, 15, 45), reps=REPS)
    return work, float(np.asarray(q).ravel()[0])


def make_inputs(shape, seed):
    rng = np.random.default_rng(seed)
    t = rng.standard_normal(shape).astype(np.float32)
    p = t + 0.01 * rng.standard_normal(shape).astype(np.float32)
    return jnp.asarray(t), jnp.asarray(p)


def xla_scores(math_fn, n, eps=1e-6):
    def fn(tt, pp):
        f = jax.vmap(math_fn)
        diff = f(tt) - f(pp)
        s, sq = jnp.sum(diff, axis=0), jnp.sum(diff**2, axis=0)
        return calibrate(sk._scores_from_diff_stats(diff, s, sq, n, eps), n, ALPHA)

    return fn


def pallas_scores_ns(shape, dt, dx, dy, nu):
    def fn(tt, pp):
        return calibrate(
            sk.ns_joint_cp_scores_fused(tt, pp, dt, dx, dy, nu), shape[0], ALPHA)

    return fn


def run(name, shape, math_fn, pallas_fn):
    t, p = make_inputs(shape, hash(name) % 97)
    t_x, q_x = timed(xla_scores(math_fn, shape[0]), t, p)
    t_p, q_p = timed(pallas_fn, t, p)
    rel = abs(q_x - q_p) / max(abs(q_p), 1e-9)
    print(f"{name:5s} {shape}: pallas-route {t_p*1e3:7.2f} ms   pure-XLA "
          f"{t_x*1e3:7.2f} ms  speedup {t_p/t_x:5.2f}x  qhat rel {rel:.1e}",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    shape = (100, 3, 21, 100, 100)
    nt, nx, ny = shape[2:]
    dt = dx = dy = 0.01
    nu = 1e-3
    ns_math = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                             dt, dx, dy, nu)
    run("NS", shape, ns_math, pallas_scores_ns(shape, dt, dx, dy, nu))

    shape = (100, 6, 21, 64, 64)
    nt, nx, ny = shape[2:]
    mhd_math = lambda f: sk._mhd_induction_math(f, nt, nx, ny)

    def mhd_pallas(tt, pp):
        return calibrate(sk.mhd_induction_joint_cp_scores_fused(tt, pp),
                         shape[0], ALPHA)

    run("MHD", shape, mhd_math, mhd_pallas)

    shape = (200, 21, 64, 64)
    from cppre.residuals.wave import PRE_Wave

    k = np.asarray(PRE_Wave(0.01, 2 / 63, c=1.0).D.kernel)
    nt, nx, ny = shape[1:]
    taps = sk._taps(k)
    out_shape = (nt - 2, nx - 2, ny - 2)
    wave_math = lambda f: sk._valid_shift_add(f[0], taps, out_shape)

    def wave_pallas(tt, pp):
        return calibrate(sk.wave_joint_cp_scores_fused(tt, pp, k),
                         shape[0], ALPHA)

    def wave_math5(f):
        return wave_math(f)

    t, p = make_inputs(shape, 7)
    t5, p5 = t[:, None], p[:, None]
    t_x, q_x = timed(xla_scores(wave_math5, shape[0]), t5, p5)
    t_p, q_p = timed(wave_pallas, t, p)
    rel = abs(q_x - q_p) / max(abs(q_p), 1e-9)
    print(f"Wave  {shape}: pallas-route {t_p*1e3:7.2f} ms   pure-XLA "
          f"{t_x*1e3:7.2f} ms  speedup {t_p/t_x:5.2f}x  qhat rel {rel:.1e}",
          flush=True)


if __name__ == "__main__":
    main()
