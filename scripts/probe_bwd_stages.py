"""Stage-wise bisection of the fno_block2d_bwd_fused Mosaic crash.

Replicates the backward kernel's structure with a `stage` knob; compiles
each stage on the real chip until one crashes the Mosaic compiler.

  stage 1: forward recompute only, dx = gs
  stage 2: + bias sums via jnp.sum(axis=(1,2)).reshape(1, C)
  stage 3: + daw/da2 per-row loops (ref[i, :] += 1-D vec)
  stage 4: + dh/dpre1/db1/da1
  stage 5: + spectral adjoint and dwcr/dwci accumulation
  stage 6: full (== the real kernel)

Usage: python scripts/probe_bwd_stages.py <stage>
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.ops.pallas.fno_block import (_dft_tables, _dgelu, _dot, _gelu,
                                        _repack_spectral,
                                        fused_block_bwd_vmem_est)
from cppre.ops.pallas.stencil_kernels import _vmem_params


def run(stage: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    b, w_ch, nv, nx, ny = 2, 8, 1, 16, 16
    m1 = m2 = 4
    k_fr = 2 * m1
    w_mid = w_ch
    f32 = jnp.float32

    x = jnp.asarray(rng.standard_normal((b, w_ch, nv, nx, ny)), f32)
    g = jnp.asarray(rng.standard_normal((b, w_ch, nv, nx, ny)), f32)
    x3 = jnp.asarray(rng.standard_normal((1, w_ch, nv, nx, ny)), f32)
    wcr = jnp.asarray(rng.standard_normal((w_ch, w_ch, nv, m2, k_fr)), f32)
    wci = jnp.asarray(rng.standard_normal((w_ch, w_ch, nv, m2, k_fr)), f32)
    a1 = jnp.asarray(rng.standard_normal((w_ch, w_mid)), f32)
    b1 = jnp.asarray(rng.standard_normal((w_mid,)), f32)
    a2 = jnp.asarray(rng.standard_normal((w_mid, w_ch)), f32)
    b2 = jnp.asarray(rng.standard_normal((w_ch,)), f32)
    aw = jnp.asarray(rng.standard_normal((w_ch, w_ch)), f32)
    bw = jnp.asarray(rng.standard_normal((w_ch,)), f32)

    cy, sy, cxk, sxk, cxT, sxT, iyc, iys = _dft_tables(nx, ny, m1, m2)
    cyT, syT = cy.T, sy.T
    iycT, iysT = iyc.T, iys.T
    inv_scale = 1.0 / (nx * ny)

    def kernel(x_ref, g_ref, wcr_ref, wci_ref, a1_ref, b1_ref, a2_ref,
               b2_ref, aw_ref, bw_ref, a1T_ref, a2T_ref, awT_ref, x3_ref,
               cy_ref, sy_ref, cxk_ref, sxk_ref, cxT_ref, sxT_ref,
               iyc_ref, iys_ref, cyT_ref, syT_ref, iycT_ref, iysT_ref,
               dx_ref, dwcr_ref, dwci_ref, da1_ref, db1_ref, da2_ref,
               db2_ref, daw_ref, dbw_ref, dx3_ref):
        bb = pl.program_id(1)
        first_any = (pl.program_id(0) == 0) & (bb == 0)
        xv = x_ref[0, :, 0]
        gv = g_ref[0, :, 0]

        # ==== forward recompute ====
        x2d = xv.reshape(w_ch * nx, ny)
        yr = _dot(x2d, cy_ref[...]).reshape(w_ch, nx, m2)
        yi = _dot(x2d, sy_ref[...]).reshape(w_ch, nx, m2)
        yrT = jnp.swapaxes(yr, 1, 2).reshape(w_ch * m2, nx)
        yiT = jnp.swapaxes(yi, 1, 2).reshape(w_ch * m2, nx)
        zr = (_dot(yrT, cxk_ref[...])
              - _dot(yiT, sxk_ref[...])).reshape(w_ch, m2, k_fr)
        zi = (_dot(yrT, sxk_ref[...])
              + _dot(yiT, cxk_ref[...])).reshape(w_ch, m2, k_fr)

        wcr_v = wcr_ref[:, :, 0]
        wci_v = wci_ref[:, :, 0]
        mr = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
        mi = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
        for i in range(w_ch):
            mr = mr + zr[i][None] * wcr_v[i] - zi[i][None] * wci_v[i]
            mi = mi + zr[i][None] * wci_v[i] + zi[i][None] * wcr_v[i]

        mr2 = mr.reshape(w_ch * m2, k_fr)
        mi2 = mi.reshape(w_ch * m2, k_fr)
        vr = (_dot(mr2, cxT_ref[...])
              + _dot(mi2, sxT_ref[...])).reshape(w_ch, m2, nx)
        vi = (_dot(mi2, cxT_ref[...])
              - _dot(mr2, sxT_ref[...])).reshape(w_ch, m2, nx)
        vrT = jnp.swapaxes(vr, 1, 2).reshape(w_ch * nx, m2)
        viT = jnp.swapaxes(vi, 1, 2).reshape(w_ch * nx, m2)
        spec = ((_dot(vrT, iyc_ref[...]) + _dot(viT, iys_ref[...]))
                .reshape(w_ch, nx, ny) * inv_scale)

        def contract(src, mat, bias, n_in, n_out):
            if bias is None:
                acc = jnp.zeros((n_out, nx, ny), jnp.float32)
            else:
                acc = jnp.broadcast_to(bias, (n_out, nx, ny)) \
                         .astype(jnp.float32)
            for i in range(n_in):
                acc = acc + src[i][None] * mat[i]
            return acc

        pre1 = contract(spec, a1_ref[...], b1_ref[...], w_ch, w_mid)
        h = _gelu(pre1)
        x1 = contract(h, a2_ref[...], b2_ref[...], w_mid, w_ch)
        x2 = contract(xv, aw_ref[...], bw_ref[...], w_ch, w_ch)
        s = x1 + x2 + x3_ref[0, :, 0]

        gs = gv * _dgelu(s)

        @pl.when(bb == 0)
        def _init_per_v():
            dx3_ref[0, :, 0] = jnp.zeros_like(gs)
            dwcr_ref[...] = jnp.zeros_like(dwcr_ref)
            dwci_ref[...] = jnp.zeros_like(dwci_ref)

        @pl.when(first_any)
        def _init_shared():
            da1_ref[...] = jnp.zeros_like(da1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            da2_ref[...] = jnp.zeros_like(da2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)
            daw_ref[...] = jnp.zeros_like(daw_ref)
            dbw_ref[...] = jnp.zeros_like(dbw_ref)

        dx3_ref[0, :, 0] += gs
        if stage >= 2:
            dbw_ref[...] += jnp.sum(gs, axis=(1, 2)).reshape(1, w_ch)
            db2_ref[...] += jnp.sum(gs, axis=(1, 2)).reshape(1, w_ch)
        if stage >= 3:
            for i in range(w_ch):
                daw_ref[i, :] += jnp.sum(xv[i][None] * gs, axis=(1, 2))
            for m in range(w_mid):
                da2_ref[m, :] += jnp.sum(h[m][None] * gs, axis=(1, 2))

        if stage >= 4:
            dh = contract(gs, a2T_ref[...], None, w_ch, w_mid)
            dpre1 = dh * _dgelu(pre1)
            db1_ref[...] += jnp.sum(dpre1, axis=(1, 2)).reshape(1, w_mid)
            for i in range(w_ch):
                da1_ref[i, :] += jnp.sum(spec[i][None] * dpre1, axis=(1, 2))
            dspec = contract(dpre1, a1T_ref[...], None, w_mid, w_ch)

        if stage >= 5:
            dspec2d = dspec.reshape(w_ch * nx, ny) * inv_scale
            dvrT = _dot(dspec2d, iycT_ref[...])
            dviT = _dot(dspec2d, iysT_ref[...])
            dvr = jnp.swapaxes(dvrT.reshape(w_ch, nx, m2), 1, 2) \
                     .reshape(w_ch * m2, nx)
            dvi = jnp.swapaxes(dviT.reshape(w_ch, nx, m2), 1, 2) \
                     .reshape(w_ch * m2, nx)
            dmr = (_dot(dvr, cxk_ref[...])
                   - _dot(dvi, sxk_ref[...])).reshape(w_ch, m2, k_fr)
            dmi = (_dot(dvi, cxk_ref[...])
                   + _dot(dvr, sxk_ref[...])).reshape(w_ch, m2, k_fr)

            dzr = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
            dzi = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
            for o in range(w_ch):
                dzr = (dzr + dmr[o][None] * wcr_v[:, o]
                       + dmi[o][None] * wci_v[:, o])
                dzi = (dzi - dmr[o][None] * wci_v[:, o]
                       + dmi[o][None] * wcr_v[:, o])
            for i in range(w_ch):
                dwcr_ref[i, :, 0] += zr[i][None] * dmr + zi[i][None] * dmi
                dwci_ref[i, :, 0] += zr[i][None] * dmi - zi[i][None] * dmr

        if stage >= 6:
            dzr2 = dzr.reshape(w_ch * m2, k_fr)
            dzi2 = dzi.reshape(w_ch * m2, k_fr)
            dyrT = _dot(dzr2, cxT_ref[...]) + _dot(dzi2, sxT_ref[...])
            dyiT = -_dot(dzr2, sxT_ref[...]) + _dot(dzi2, cxT_ref[...])
            dyr = jnp.swapaxes(dyrT.reshape(w_ch, m2, nx), 1, 2) \
                     .reshape(w_ch * nx, m2)
            dyi = jnp.swapaxes(dyiT.reshape(w_ch, m2, nx), 1, 2) \
                     .reshape(w_ch * nx, m2)
            dx_spec = (_dot(dyr, cyT_ref[...])
                       + _dot(dyi, syT_ref[...])).reshape(w_ch, nx, ny)
            dx_byp = contract(gs, awT_ref[...], None, w_ch, w_ch)
            dx_ref[0, :, 0] = dx_spec + dx_byp
        else:
            dx_ref[0, :, 0] = gs

    full = lambda *shape: pl.BlockSpec(shape, lambda v, bb: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (bb, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w_ch, w_ch, 1, m2, k_fr),
                          lambda v, bb: (0, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    x3_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (0, 0, v, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, f32),
        jax.ShapeDtypeStruct((w_ch, w_ch, nv, m2, k_fr), f32),
        jax.ShapeDtypeStruct((w_ch, w_ch, nv, m2, k_fr), f32),
        jax.ShapeDtypeStruct((w_ch, w_mid), f32),
        jax.ShapeDtypeStruct((1, w_mid), f32),
        jax.ShapeDtypeStruct((w_mid, w_ch), f32),
        jax.ShapeDtypeStruct((1, w_ch), f32),
        jax.ShapeDtypeStruct((w_ch, w_ch), f32),
        jax.ShapeDtypeStruct((1, w_ch), f32),
        jax.ShapeDtypeStruct((1, w_ch, nv, nx, ny), f32),
    )
    out_specs = [
        x_spec, w_spec, w_spec,
        full(w_ch, w_mid), full(1, w_mid), full(w_mid, w_ch),
        full(1, w_ch), full(w_ch, w_ch), full(1, w_ch),
        x3_spec,
    ]
    est = fused_block_bwd_vmem_est(w_ch, w_mid, nx, ny, m1, m2)

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nv, b),
        in_specs=[
            x_spec, x_spec, w_spec, w_spec,
            full(w_ch, w_mid, 1, 1), full(w_mid, 1, 1),
            full(w_mid, w_ch, 1, 1), full(w_ch, 1, 1),
            full(w_ch, w_ch, 1, 1), full(w_ch, 1, 1),
            full(w_mid, w_ch, 1, 1), full(w_ch, w_mid, 1, 1),
            full(w_ch, w_ch, 1, 1), x3_spec,
            full(ny, m2), full(ny, m2), full(nx, k_fr), full(nx, k_fr),
            full(k_fr, nx), full(k_fr, nx), full(m2, ny), full(m2, ny),
            full(m2, ny), full(m2, ny), full(ny, m2), full(ny, m2),
        ],
        out_specs=out_specs,
        compiler_params=_vmem_params(est),
        interpret=False,
    )(x, g, wcr, wci,
      a1[:, :, None, None], b1[:, None, None],
      a2[:, :, None, None], b2[:, None, None],
      aw[:, :, None, None], bw[:, None, None],
      a1.T[:, :, None, None], a2.T[:, :, None, None],
      aw.T[:, :, None, None],
      x3, cy, sy, cxk, sxk, cxT, sxT, iyc, iys,
      jnp.asarray(cyT), jnp.asarray(syT), jnp.asarray(iycT),
      jnp.asarray(iysT))
    jax.tree_util.tree_map(np.asarray, outs)
    print(f"stage {stage}: ok", flush=True)


if __name__ == "__main__":
    run(int(sys.argv[1]))
