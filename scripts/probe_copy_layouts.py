"""Which HBM layout can the v5e DMA engines actually stream fast?

Pure-copy Pallas kernels (read whole tensor, write whole tensor) over the
same 252 MB of data in different layouts, plus XLA elementwise baselines.

Run: timeout 900 python scripts/probe_copy_layouts.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 5
BS, NVAR, NT, NX, NY = 100, 3, 21, 100, 100


def timed(name, fn, x, bytes_moved):
    """Slope-harness timing (cppre.utils.tpu_bench): the naive full-tensor
    `x + q*1e-30` CSE guard this probe originally used adds a hidden
    full-tensor copy per iteration (the round-1 inflation trap)."""
    from cppre.utils.tpu_bench import slope_time

    try:
        work, _fixed, _ = slope_time(fn, x, inners=(5, 15, 45), reps=REPS)
    except Exception as e:
        print(f"{name:34s}: FAILED {str(e).splitlines()[0][:90]}", flush=True)
        return
    print(f"{name:34s}: {work*1e3:7.3f} ms  "
          f"({bytes_moved/work/1e9:6.1f} GB/s eff)", flush=True)


def copy_kernel(shape, block):
    grid = (shape[0] // block[0],)

    def kfn(i_ref, o_ref):
        o_ref[...] = i_ref[...]

    def call(x):
        return pl.pallas_call(
            kfn,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            grid=grid,
            in_specs=[pl.BlockSpec(block, lambda b: (b,) + (0,) * (len(shape) - 1),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(block, lambda b: (b,) + (0,) * (len(shape) - 1),
                                   memory_space=pltpu.VMEM),
        )(x)

    return call


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((BS, NVAR, NT, NX, NY)).astype(np.float32)
    nbytes = base.size * 4
    moved = 2 * nbytes  # read + write

    x4 = jnp.asarray(base)
    timed("copy 4D [b,3,21,100,100]", copy_kernel(x4.shape, (1, NVAR, NT, NX, NY)),
          x4, moved)

    x128 = jnp.asarray(np.pad(base, [(0, 0)] * 3 + [(0, 4), (0, 28)]))
    timed("copy 4D padded [..,104,128]",
          copy_kernel(x128.shape, (1, NVAR, NT, 104, 128)), x128,
          2 * x128.size * 4)

    xf = jnp.asarray(base.reshape(BS, NVAR, NT, NX * NY))
    timed("copy flat [b,3,21,10000]", copy_kernel(xf.shape, (1, NVAR, NT, NX * NY)),
          xf, moved)

    xff = jnp.asarray(base.reshape(BS, NVAR * NT * NX * NY))
    timed("copy flat2 [b,630000]", copy_kernel(xff.shape, (1, NVAR * NT * NX * NY)),
          xff, moved)

    xr = jnp.asarray(base.reshape(BS, NVAR * NT * NX, NY))
    timed("copy 3D [b,6300,100]", copy_kernel(xr.shape, (1, NVAR * NT * NX, NY)),
          xr, moved)

    # XLA baselines: what layout does the compiler itself achieve?
    timed("XLA x*1.0001 4D", jax.jit(lambda v: v * 1.0001), x4, moved)
    timed("XLA x*1.0001 flat2", jax.jit(lambda v: v * 1.0001), xff, moved)
    # XLA reduction (reads once, writes nothing big)
    timed("XLA sum 4D", jax.jit(lambda v: jnp.sum(v, axis=0, keepdims=True)
                                .broadcast_to(v.shape) * 0 + v), x4, moved)


if __name__ == "__main__":
    main()
