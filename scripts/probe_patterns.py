"""Micro-probes: which small-reduction/store patterns lower in Mosaic.

Each pattern is a tiny standalone pallas_call on the real chip; prints
ok/FAIL per pattern. Used to redesign fno_block2d_bwd_fused's weight-grad
accumulation (rank-1 vectors crash Mosaic: layout.h:320 arr.size() >=
layout_rank(implicit_dim) (1 vs. 2)).
"""

import subprocess
import sys

sys.path.insert(0, "/root/repo")

C, NX, NY = 8, 16, 16

BODY = r"""
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C, NX, NY = 8, 16, 16
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((C, NX, NY)), jnp.float32)

full = lambda *shape: pl.BlockSpec(shape, lambda: (0,) * len(shape),
                                   memory_space=pltpu.VMEM)

def run(name, kernel, out_shape):
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[full(C, NX, NY)],
        out_specs=jax.tree_util.tree_map(
            lambda s: full(*s.shape), out_shape,
            is_leaf=lambda s: isinstance(s, jax.ShapeDtypeStruct)),
        interpret=False,
    )(x)
    jax.tree_util.tree_map(np.asarray, outs)
    print(f"[ok] {name}", flush=True)

name = sys.argv[1]
f32 = jnp.float32

if name == "sum12_reshape_1C":
    run(name, lambda x_ref, o_ref: o_ref.__setitem__(
        (...,), jnp.sum(x_ref[...], axis=(1, 2)).reshape(1, C)),
        jax.ShapeDtypeStruct((1, C), f32))
elif name == "sum12_keepdims_C11":
    run(name, lambda x_ref, o_ref: o_ref.__setitem__(
        (...,), jnp.sum(x_ref[...], axis=(1, 2), keepdims=True)),
        jax.ShapeDtypeStruct((C, 1, 1), f32))
elif name == "sum2_then_sum1_keepdims":
    def k(x_ref, o_ref):
        r = jnp.sum(x_ref[...], axis=2, keepdims=True)
        o_ref[...] = jnp.sum(r, axis=1, keepdims=True)
    run(name, k, jax.ShapeDtypeStruct((C, 1, 1), f32))
elif name == "rowwrite_1d":
    def k(x_ref, o_ref):
        for i in range(C):
            o_ref[i, :] = jnp.sum(x_ref[...] * x_ref[i][None], axis=(1, 2))
    run(name, k, jax.ShapeDtypeStruct((C, C), f32))
elif name == "rowwrite_rank3":
    def k(x_ref, o_ref):
        for i in range(C):
            r = jnp.sum(x_ref[...] * x_ref[i][None], axis=(1, 2),
                        keepdims=True)
            o_ref[i] = r
    run(name, k, jax.ShapeDtypeStruct((C, C, 1, 1), f32))
elif name == "dot_ones_lane":
    def k(x_ref, o_ref):
        x2d = x_ref[...].reshape(C * NX, NY)
        ones = jnp.ones((NY, 1), f32)
        r = jnp.dot(x2d, ones, preferred_element_type=f32)  # [C*NX, 1]
        r3 = r.reshape(C, NX, 1)
        o_ref[...] = jnp.sum(r3, axis=1, keepdims=True)
    run(name, k, jax.ShapeDtypeStruct((C, 1, 1), f32))
elif name == "bias_C1":
    def k(x_ref, o_ref):
        o_ref[...] = jnp.sum(x_ref[...], axis=(1, 2), keepdims=True) \
                        .reshape(C, 1)
    run(name, k, jax.ShapeDtypeStruct((C, 1), f32))
elif name == "dwcr_style":
    def k(x_ref, o_ref):
        z = x_ref[...][:, :8, :8]
        for i in range(C):
            o_ref[i, :, 0] = z[i][None] * z
    run(name, k, jax.ShapeDtypeStruct((C, C, 1, 8, 8), f32))

elif name == "rowwrite_rank3_seq":
    def k(x_ref, o_ref):
        for i in range(C):
            t = x_ref[...] * x_ref[i][None]
            r = jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1,
                        keepdims=True)
            o_ref[i] = r
    run(name, k, jax.ShapeDtypeStruct((C, C, 1, 1), f32))
elif name == "accum_rank3_seq":
    def k(x_ref, o_ref):
        o_ref[...] = jnp.zeros_like(o_ref)
        for i in range(C):
            t = x_ref[...] * x_ref[i][None]
            r = jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1,
                        keepdims=True)
            o_ref[i] += r
    run(name, k, jax.ShapeDtypeStruct((C, C, 1, 1), f32))
else:
    raise SystemExit(f"unknown pattern {name}")
"""

PATTERNS = [
    "sum12_reshape_1C",
    "sum12_keepdims_C11",
    "sum2_then_sum1_keepdims",
    "rowwrite_1d",
    "rowwrite_rank3",
    "dot_ones_lane",
    "bias_C1",
    "dwcr_style",
    "rowwrite_rank3_seq",
    "accum_rank3_seq",
]


def main():
    pats = sys.argv[1:] or PATTERNS
    for p in pats:
        r = subprocess.run([sys.executable, "-c", BODY, p],
                           capture_output=True, text=True, timeout=300)
        if f"[ok] {p}" in r.stdout:
            print(f"[ok]   {p}", flush=True)
        else:
            tail = (r.stderr or r.stdout).splitlines()
            err = next((ln for ln in tail if "Check failed" in ln
                        or "NotImplementedError" in ln
                        or "Unsupported" in ln or "error" in ln.lower()),
                       tail[-1] if tail else "?")
            print(f"[FAIL] {p}: {err[:200]}", flush=True)


if __name__ == "__main__":
    main()
