"""Probe: how much scoped VMEM will Mosaic actually grant on this chip?

Compiles the paired whole-block diff+stats kernel at the NS bench shape
(est ~17 MiB) and the MHD shape with escalating `vmem_limit_bytes`, and a
trivial big-buffer kernel to find the raw ceiling.
Run: timeout 600 python scripts/probe_vmem.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)


def try_big_buffer(mib):
    """One VMEM scratch of `mib` MiB: does Mosaic accept?"""
    n_rows = mib * 1024 * 1024 // (128 * 4)

    def kernel(o_ref, scratch):
        scratch[0, :] = jnp.ones((128,), jnp.float32)
        o_ref[0, :] = scratch[0, :]

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mib + 4) * 1024 * 1024),
        )()
        float(out[0, 0])
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"  {mib} MiB scratch failed: {msg}", flush=True)
        return False


for mib in (16, 24, 32, 48, 64, 96, 112, 120):
    ok = try_big_buffer(mib)
    print(f"scratch {mib} MiB: {'OK' if ok else 'NO'}", flush=True)
    if not ok:
        break
