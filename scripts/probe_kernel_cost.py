"""Diagnose the Pallas stencil-kernel floor at the NS bench shape:
is it HBM bandwidth, VPU shift-add compute, or per-grid-step overhead?

Times, on the real chip:
  1. pure copy kernel, 1 sample/block   (traffic-only baseline)
  2. pure copy kernel, B samples/block  (per-step overhead amortised)
  3. NS residual kernel, 1 sample/block (current production shape)
  4. NS residual kernel, B samples/block
  5. NS residual, 1/blk, d_y via MXU matmul instead of lane-shift slices

Run: timeout 900 python scripts/probe_kernel_cost.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cppre.ops.pallas import stencil_kernels as sk

REPS = 5
SHAPE = (100, 3, 21, 100, 100)
BS, NVAR, NT, NX, NY = SHAPE


def timed(name, fn, x, bytes_moved):
    """Slope-harness timing (cppre.utils.tpu_bench): the naive full-tensor
    `x + acc*1e-30` CSE guard this probe originally used adds a hidden
    full-tensor copy per iteration and inflates every number (the round-1
    trap documented in BASELINE.md)."""
    from cppre.utils.tpu_bench import slope_time

    try:
        work, _fixed, _ = slope_time(fn, x, inners=(5, 15, 45), reps=REPS)
    except Exception as e:
        print(f"{name:34s}: FAILED {str(e).splitlines()[0][:90]}", flush=True)
        return None
    print(f"{name:34s}: {work*1e3:7.3f} ms  "
          f"({bytes_moved/work/1e9:6.1f} GB/s eff)", flush=True)
    return work


def copy_kernel(x, blk):
    def kfn(i_ref, o_ref):
        o_ref[...] = i_ref[...]

    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(BS // blk,),
        in_specs=[pl.BlockSpec((blk, NVAR, NT, NX, NY),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk, NVAR, NT, NX, NY),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=sk._vmem_params(
            4 * blk * NVAR * NT * 104 * 128 * 4),
    )(x)


def residual_kernel(x, blk):
    math_fn = lambda f: sk._ns_momentum_math(f[0], f[1], f[2], NT, NX, NY,
                                             0.01, 0.01, 0.01, 1e-3)
    out_shape = (NT - 2, NX - 2, NY - 2)

    def kfn(i_ref, o_ref):
        for s in range(blk):
            o_ref[s] = math_fn(i_ref[s])

    est = (2 * blk * NVAR * NT * 104 * 128 + 2 * blk * 24 * 104 * 128) * 4
    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((BS,) + out_shape, x.dtype),
        grid=(BS // blk,),
        in_specs=[pl.BlockSpec((blk, NVAR, NT, NX, NY),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((blk,) + out_shape, lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=sk._vmem_params(est),
    )(x)


def residual_kernel_mxu(x):
    """d_y and the Laplacian's y part via banded-matrix matmuls on the MXU;
    t/x derivatives stay as (cheap) outer/sublane slices."""
    Dy1 = np.zeros((NY, NY - 2), np.float32)   # central first derivative
    for j in range(NY - 2):
        Dy1[j, j], Dy1[j + 2, j] = -1.0, 1.0
    Dy2 = np.zeros((NY, NY - 2), np.float32)   # [1, -2, 1]
    for j in range(NY - 2):
        Dy2[j, j], Dy2[j + 1, j], Dy2[j + 2, j] = 1.0, -2.0, 1.0
    dt_, dx_, dy_, nu = 0.01, 0.01, 0.01, 1e-3

    def math_fn(f):
        u, v, p = f[0], f[1], f[2]
        d1 = jnp.asarray(Dy1)
        d2 = jnp.asarray(Dy2)

        def I(a):
            return a[1 : NT - 1, 1 : NX - 1, 1 : NY - 1]

        def d_t(a):
            return a[2:NT, 1 : NX - 1, 1 : NY - 1] - a[0 : NT - 2, 1 : NX - 1, 1 : NY - 1]

        def d_x(a):
            return a[1 : NT - 1, 2:NX, 1 : NY - 1] - a[1 : NT - 1, 0 : NX - 2, 1 : NY - 1]

        def d_y(a):
            w = a[1 : NT - 1, 1 : NX - 1, :]
            return jax.lax.dot_general(
                w, d1, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def d_lap(a):
            w = a[1 : NT - 1, 1 : NX - 1, :]
            ylap = jax.lax.dot_general(
                w, d2, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            xlap = (a[1 : NT - 1, 2:NX, 1 : NY - 1]
                    + a[1 : NT - 1, 0 : NX - 2, 1 : NY - 1]
                    - 2.0 * I(a))
            return ylap + xlap

        ui, vi = I(u), I(v)
        res_x = (d_t(u) * (dx_ * dy_) + ui * d_x(u) * (dt_ * dy_)
                 + vi * d_y(u) * (dt_ * dx_) - nu * d_lap(u) * dt_
                 + d_x(p) * (dt_ * dy_))
        res_y = (d_t(v) * (dx_ * dy_) + ui * d_x(v) * (dt_ * dx_)
                 + vi * d_y(v) * (dt_ * dy_) - nu * d_lap(v) * dt_
                 + d_y(p) * (dt_ * dx_))
        return res_x + res_y

    out_shape = (NT - 2, NX - 2, NY - 2)

    def kfn(i_ref, o_ref):
        o_ref[0] = math_fn(i_ref[0])

    return pl.pallas_call(
        kfn,
        out_shape=jax.ShapeDtypeStruct((BS,) + out_shape, x.dtype),
        grid=(BS,),
        in_specs=[pl.BlockSpec((1, NVAR, NT, NX, NY),
                               lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE).astype(np.float32))
    in_bytes = int(np.prod(SHAPE)) * 4
    out_bytes = BS * (NT - 2) * (NX - 2) * (NY - 2) * 4

    timed("copy 1/blk", lambda v: copy_kernel(v, 1), x, 2 * in_bytes)
    timed("copy 4/blk", lambda v: copy_kernel(v, 4), x, 2 * in_bytes)
    timed("copy 10/blk", lambda v: copy_kernel(v, 10), x, 2 * in_bytes)
    timed("NS residual 1/blk", lambda v: residual_kernel(v, 1), x,
          in_bytes + out_bytes)
    timed("NS residual 4/blk", lambda v: residual_kernel(v, 4), x,
          in_bytes + out_bytes)
    timed("NS residual 1/blk MXU d_y", residual_kernel_mxu, x,
          in_bytes + out_bytes)


if __name__ == "__main__":
    main()
