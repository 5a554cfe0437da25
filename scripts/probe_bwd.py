"""Isolate which fused backward kernel crashes Mosaic on-chip.

Compiles fno_block2d_bwd_fused and projection2d_bwd_fused separately on
the real TPU (tiny shapes) and prints pass/fail per kernel.
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def try_one(name, fn):
    try:
        out = fn()
        jax.tree_util.tree_map(lambda a: np.asarray(a), out)
        print(f"[ok]   {name}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()
        head = msg[0] if msg else repr(e)
        print(f"[FAIL] {name}: {head[:300]}", flush=True)
        traceback.print_exc(limit=2)
        return False


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    from cppre.models import FNO2d

    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=1, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x)
    p = v["params"]

    if which in ("all", "block"):
        from cppre.ops.pallas.fno_block import fno_block2d_bwd_fused

        w = m.width_time
        z = jnp.asarray(rng.standard_normal((2, w, 1, 16, 16)), jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, w, 1, 16, 16)), jnp.float32)
        x3 = jnp.asarray(rng.standard_normal((1, w, 1, 16, 16)), jnp.float32)
        try_one("block_bwd", lambda: fno_block2d_bwd_fused(
            z, g, p["f0"], x3, 4, 4, interpret=False))

    if which in ("all", "proj"):
        from cppre.ops.pallas.fno_block import projection2d_bwd_fused

        w = m.width_time
        z5 = jnp.asarray(rng.standard_normal((2, 1, 16, 16, w)), jnp.float32)
        g5 = jnp.asarray(
            rng.standard_normal((2, 1, 16 * 16, 1)), jnp.float32)
        try_one("proj_bwd", lambda: projection2d_bwd_fused(
            z5, g5, p["fc1_time"], p["fc2_time"], interpret=False))


if __name__ == "__main__":
    main()
