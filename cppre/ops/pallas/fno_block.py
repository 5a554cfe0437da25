"""Fused FNO2d Fourier block — Pallas kernels (TurboFNO-style), forward
(`fno_block2d_fused`) and fused backward (`fno_block2d_bwd_fused`, wired
into training via the `custom_vjp` in `models/fused.py`).

One FNO block (`Base_FNO.py:84-107`, rebuilt in `models/fno.py::_FNOBlock2d`)
is gelu(mlp(spectral(x)) + w(x) + b(grid)). Lowered through XLA this is
15-20 kernel launches per block, each streaming the full-resolution
activation [B, W, V, Nx, Ny] through HBM; the measured forward runs at
~18% of the chip's streaming ceiling and ~7% of the MXU — launch- and
pass-dominated, exactly the regime "TurboFNO" (arXiv 2504.11681,
PAPERS.md) attacks by fusing FFT + GEMM + iFFT. This kernel evaluates the
WHOLE block in one VMEM pass per (sample, variable):

  * load x_bv [W, Nx, Ny] once;
  * truncated-DFT forward transforms as last-dim matmuls (the same
    tables as `models/fno.py::_dft_fwd_y/_dft_fwd_x`);
  * per-mode channel mixing, the channel MLP and the 1x1 bypass as
    unrolled sum-of-outer-products over the W input channels (a [W, S]
    broadcast-FMA per input channel — VPU work, no relayout needed);
  * inverse transforms, bias-branch add (precomputed outside: b(grid) is
    batch-constant), exact gelu;
  * write the block output once.

HBM traffic per block drops from ~4-6 activation passes to exactly 2
(read x, write out). Forward-only: the AR validation rollouts and the UQ
evaluation protocol (`validation_AR`, `uq/eval.py`) are inference, which
is where experiment wall-clock concentrates after training. Training
keeps the XLA path (autodiff through the flax block).

Routing is opt-in (`models.fno2d_forward_fused`); math parity with
`FNO2d.apply` is asserted in interpret mode (tests/test_pallas_kernels.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .stencil_kernels import _on_tpu, _vmem_pad

__all__ = ["fno_block2d_fused", "fno_block2d_bwd_fused",
           "fused_block_vmem_est", "fused_block_bwd_vmem_est"]


def _dft_tables(nx: int, ny: int, m1: int, m2: int, nx_pad: int | None = None):
    """All four transform tables (f64-built, f32-stored), matching
    models/fno.py::_dft_basis/_irfft_weights exactly.

    `nx_pad` > nx zero-extends the x tables so the kernel can run on
    inputs sublane-padded along x: the forward tables [nx_pad, K] get zero
    ROWS (padded positions contribute nothing to the spectrum) and the
    inverse tables [K, nx_pad] zero COLUMNS (padded positions reconstruct
    to zero). The DFT itself is over the TRUE nx grid."""
    nx_pad = nx if nx_pad is None else nx_pad
    freqs = list(range(m1)) + list(range(nx - m1, nx))
    ang_y = -2.0 * np.pi * np.outer(np.arange(ny), np.arange(m2)) / ny
    cy, sy = np.cos(ang_y), np.sin(ang_y)                      # [Ny, m2]
    ang_x = -2.0 * np.pi * np.outer(np.arange(nx), freqs) / nx
    cx = np.zeros((nx_pad, len(freqs)))
    sx = np.zeros((nx_pad, len(freqs)))
    cx[:nx], sx[:nx] = np.cos(ang_x), np.sin(ang_x)            # [Nx_pad, K]
    w = np.full(m2, 2.0)
    w[0] = 1.0
    if ny % 2 == 0 and m2 == ny // 2 + 1:
        w[-1] = 1.0
    # inverse-y tables with the Hermitian weights folded in:
    # out = (vr*w) @ cy.T + (vi*w) @ sy.T  ==  vr @ iyc + vi @ iys
    iyc = (w[:, None] * cy.T)                                  # [m2, Ny]
    iys = (w[:, None] * sy.T)
    f32 = np.float32
    return (jnp.asarray(cy, f32), jnp.asarray(sy, f32),
            jnp.asarray(cx, f32), jnp.asarray(sx, f32),
            jnp.asarray(cx.T.copy(), f32), jnp.asarray(sx.T.copy(), f32),
            jnp.asarray(iyc, f32), jnp.asarray(iys, f32))


def fused_block_vmem_est(w_ch: int, w_mid: int, nx: int, ny: int,
                         m1: int, m2: int) -> int:
    """VMEM footprint estimate (bytes) of one fused-block grid step at
    padded-x resolution: double-buffered x/out/x3 pipeline blocks plus the
    kernel body's live full-res temporaries (~16 W-channel planes total —
    measured 16.79 MiB actual vs the old 8-plane estimate's 8.9 MiB at the
    NS-flagship 104x100/W=16 shape, which kept the default 16 MiB grant
    and OOM'd Mosaic's stack allocator) + the two spectral weight blocks.
    Shared by the kernel's compiler hint and
    `models.fused.fused_supported`'s routing bound (oversize shapes must
    fall back to XLA instead of failing Mosaic compilation at runtime)."""
    nx_pad = _vmem_pad(nx, 8)
    k_fr = 2 * m1
    return (16 * max(w_ch, w_mid) * nx_pad * _vmem_pad(ny, 128)
            + 2 * w_ch * w_ch * _vmem_pad(m2, 8) * _vmem_pad(k_fr, 128)) * 4


def _repack_spectral(block_params, m1: int, m2: int):
    """[in, out, V, m1, m2] lo/hi pairs -> [in, out, V, m2, K] (K = 2*m1,
    lo modes then hi modes, matching the kernel's frequency order)."""
    sp = block_params["SpectralConv2d_0"]
    wr = jnp.concatenate([sp["weights1_re"], sp["weights2_re"]], axis=3)
    wi = jnp.concatenate([sp["weights1_im"], sp["weights2_im"]], axis=3)
    return jnp.swapaxes(wr, 3, 4), jnp.swapaxes(wi, 3, 4)


def fno_block2d_fused(x, block_params, x3, m1: int, m2: int,
                      nx_true: int | None = None,
                      interpret: bool | None = None):
    """One fused Fourier block. x [B, W, V, Nx, Ny] f32; block_params the
    flax param subtree of `_FNOBlock2d` (f0..f5); x3 the precomputed
    batch-constant bias branch [1, W, V, Nx, Ny]. Returns [B, W, V, Nx, Ny].

    Requires dropout-free inference, 2*m1 <= nx_true, m2 <= Ny//2+1, and
    Nx % 8 == 0 (the in-kernel [W, Nx, Ny] -> [W*Nx, Ny] view needs
    sublane-aligned planes). Non-8-aligned TRUE grids are supported by
    zero-padding x along axis 3 up to the sublane multiple and passing the
    real grid size as `nx_true`: the DFT tables carry zero rows/columns at
    padded positions, so pad-lane garbage (bias + gelu leave it nonzero)
    never enters the spectrum and the caller crops it after the block
    chain (`models.fused.fno2d_forward_fused`). Other violations must be
    routed to the XLA path by the caller."""
    b, w_ch, nv, nx, ny = x.shape
    nx_true = nx if nx_true is None else nx_true
    k_fr = 2 * m1
    assert 2 * m1 <= nx_true and m2 <= ny // 2 + 1 and nx % 8 == 0

    wcr, wci = _repack_spectral(block_params, m1, m2)
    mlp = block_params["_ChannelMLP_0"]
    a1, b1 = mlp["Dense_0"]["kernel"], mlp["Dense_0"]["bias"]   # [W, Wm], [Wm]
    a2, b2 = mlp["Dense_1"]["kernel"], mlp["Dense_1"]["bias"]   # [Wm, W], [W]
    byp = block_params["_Channel1x1_0"]["Dense_0"]
    aw, bw = byp["kernel"], byp["bias"]                          # [W, W], [W]
    w_mid = a1.shape[1]
    tables = _dft_tables(nx_true, ny, m1, m2, nx_pad=nx)
    cy, sy, cxk, sxk, cxT, sxT, iyc, iys = tables
    inv_scale = 1.0 / (nx_true * ny)

    if interpret is None:
        if not _on_tpu():
            interpret = True
        else:
            interpret = False

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, wcr_ref, wci_ref, a1_ref, b1_ref, a2_ref, b2_ref,
               aw_ref, bw_ref, cy_ref, sy_ref, cxk_ref, sxk_ref,
               cxT_ref, sxT_ref, iyc_ref, iys_ref, x3_ref, out_ref):
        xv = x_ref[0, :, 0]                                     # [W, Nx, Ny]

        # ---- forward truncated DFT (last-dim matmuls + small transposes)
        x2d = xv.reshape(w_ch * nx, ny)
        yr = _dot(x2d, cy_ref[...]).reshape(w_ch, nx, m2)
        yi = _dot(x2d, sy_ref[...]).reshape(w_ch, nx, m2)
        yrT = jnp.swapaxes(yr, 1, 2).reshape(w_ch * m2, nx)     # [W*m2, Nx]
        yiT = jnp.swapaxes(yi, 1, 2).reshape(w_ch * m2, nx)
        zr = (_dot(yrT, cxk_ref[...])
              - _dot(yiT, sxk_ref[...])).reshape(w_ch, m2, k_fr)
        zi = (_dot(yrT, sxk_ref[...])
              + _dot(yiT, cxk_ref[...])).reshape(w_ch, m2, k_fr)

        # ---- per-mode channel mixing: sum of outer products over W_in
        wcr_v = wcr_ref[:, :, 0]                                # [W, W, m2, K]
        wci_v = wci_ref[:, :, 0]
        mr = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
        mi = jnp.zeros((w_ch, m2, k_fr), jnp.float32)
        for i in range(w_ch):
            mr = mr + zr[i][None] * wcr_v[i] - zi[i][None] * wci_v[i]
            mi = mi + zr[i][None] * wci_v[i] + zi[i][None] * wcr_v[i]

        # ---- inverse transforms
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

        # ---- channel MLP + 1x1 bypass as outer-product accumulations.
        # Weights arrive host-pre-shaped [n_in, n_out, 1, 1] and biases
        # [n_out, 1, 1]: Mosaic's layout inference rejects in-kernel 1-D ->
        # 3-D reshapes (vector<N> -> vector<Nx1x1> "unsupported shape
        # cast"), but indexing/broadcasting pre-ranked blocks lowers fine.
        def chan_contract(src, mat_ref, bias_ref, n_in, n_out):
            acc = jnp.broadcast_to(bias_ref[...],
                                   (n_out, nx, ny)).astype(jnp.float32)
            for i in range(n_in):
                acc = acc + src[i][None] * mat_ref[i]
            return acc

        h = _gelu(chan_contract(spec, a1_ref, b1_ref, w_ch, w_mid))
        x1 = chan_contract(h, a2_ref, b2_ref, w_mid, w_ch)
        x2 = chan_contract(xv, aw_ref, bw_ref, w_ch, w_ch)
        out_ref[0, :, 0] = _gelu(x1 + x2 + x3_ref[0, :, 0])

    full = lambda *shape: pl.BlockSpec(shape, lambda v, bb: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (bb, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w_ch, w_ch, 1, m2, k_fr),
                          lambda v, bb: (0, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    x3_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (0, 0, v, 0, 0),
                           memory_space=pltpu.VMEM)

    # VMEM: x + out + x3 + spec/h/acc temporaries (~6 planes) + weights
    est = fused_block_vmem_est(w_ch, w_mid, nx, ny, m1, m2)
    from .stencil_kernels import _vmem_params

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        grid=(nv, b),  # b innermost: weight/table blocks stay resident
        in_specs=[
            x_spec, w_spec, w_spec,
            full(w_ch, w_mid, 1, 1), full(w_mid, 1, 1),
            full(w_mid, w_ch, 1, 1), full(w_ch, 1, 1),
            full(w_ch, w_ch, 1, 1), full(w_ch, 1, 1),
            full(ny, m2), full(ny, m2), full(nx, k_fr), full(nx, k_fr),
            full(k_fr, nx), full(k_fr, nx), full(m2, ny), full(m2, ny),
            x3_spec,
        ],
        out_specs=x_spec,
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(x.astype(jnp.float32), wcr, wci,
      a1[:, :, None, None], b1[:, None, None],
      a2[:, :, None, None], b2[:, None, None],
      aw[:, :, None, None], bw[:, None, None],
      cy, sy, cxk, sxk, cxT, sxT, iyc, iys, x3.astype(jnp.float32))


# ---------------------------------------------------------------------------
# fused backward: one VMEM pass per (sample, variable) for ALL gradients
#
# The XLA backward of a Fourier block streams the full-resolution activation
# through HBM ~8-12 times (forward recompute + transposed matmuls +
# elementwise chains). This kernel reads (x, g) once, recomputes the forward
# in VMEM, and emits dx plus every weight gradient in the same pass; weight
# gradients accumulate across the batch grid dimension in resident VMEM
# blocks (their BlockSpec index is constant over the inner grid axis).
# ---------------------------------------------------------------------------

# In-kernel matmuls must pin f32 MXU passes: Mosaic's default precision
# truncates f32 dot operands to bf16 (measured ~6e-3 relative error vs the
# XLA path, which runs the package-wide Precision.HIGHEST from models.fno).
_HI = dict(precision=jax.lax.Precision.HIGHEST,
           preferred_element_type=jnp.float32)


def _dot(a, b):
    return jnp.dot(a, b, **_HI)


_SQRT_HALF = float(np.sqrt(0.5))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))

# Mosaic's TPU lowering has no erf/erfc rule (only erf_inv is registered in
# jax._src.pallas.mosaic.lowering), so jax.nn.gelu(approximate=False) —
# which computes via lax.erfc — raises NotImplementedError inside a real
# pallas_call even though it works in interpret mode. The kernels therefore
# compute exact gelu from XLA's own f32 rational erf (openxla math.cc
# ErfImpl32: degree-4/6 polynomials in z^2, |z| clamped to 4) with
# saturated tails. Measured against jax.nn.gelu(approximate=False) over
# [-12, 12]: max |d| = 2.9e-6 absolute (5e-7 of scale); dgelu 4.8e-7.
_ERF_ALPHA = (0.00022905065861350646, 0.0034082910107109506,
              0.050955695062380861, 0.18520832239976145,
              1.128379143519084)
_ERF_BETA = (-1.1791602954361697e-7, 2.3547966471313185e-5,
             0.0010179625278914885, 0.014070470171167667,
             0.11098505178285362, 0.49746925110067538, 1.0)


def _poly(x, coeffs):
    acc = jnp.full_like(x, coeffs[0])
    for c in coeffs[1:]:
        acc = acc * x + jnp.asarray(c, x.dtype)
    return acc


def _erf32(z):
    """XLA's f32 rational erf; exact to ~1 ulp for |z| <= 4, clamped beyond
    (erf(4) = 1 - 1.5e-8, below f32 resolution of 1)."""
    zc = jnp.clip(z, -4.0, 4.0)
    z2 = zc * zc
    return zc * _poly(z2, _ERF_ALPHA) / _poly(z2, _ERF_BETA)


def _gelu(u):
    """Exact (approximate=False) gelu from supported Mosaic primitives."""
    z = u * _SQRT_HALF
    g = 0.5 * u * (1.0 + _erf32(z))
    return jnp.where(z <= -4.0, jnp.zeros_like(u),
                     jnp.where(z >= 4.0, u, g))


def _dgelu(u):
    """Exact gelu'(u) = Phi(u) + u * phi(u) (approximate=False gelu)."""
    z = u * _SQRT_HALF
    erf = jnp.clip(_erf32(z), -1.0, 1.0)
    cdf = 0.5 * (1.0 + erf)
    return cdf + u * jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI


def fused_block_bwd_vmem_est(w_ch: int, w_mid: int, nx: int, ny: int,
                             m1: int, m2: int) -> int:
    """VMEM bound for one backward grid step (~14 full-res planes of
    max(W, Wm) channels + spectral temporaries + 4 weight blocks)."""
    nx_pad = _vmem_pad(nx, 8)
    k_fr = 2 * m1
    planes = 14 * max(w_ch, w_mid) * nx_pad * _vmem_pad(ny, 128)
    spectral = 8 * w_ch * _vmem_pad(m2, 8) * _vmem_pad(k_fr, 128)
    weights = 4 * w_ch * w_ch * _vmem_pad(m2, 8) * _vmem_pad(k_fr, 128)
    return (planes + spectral + weights) * 4


def fno_block2d_bwd_fused(x, g, block_params, x3, m1: int, m2: int,
                          nx_true: int | None = None,
                          interpret: bool | None = None):
    """Backward of `fno_block2d_fused`: x the block input, g the output
    cotangent (both [B, W, V, Nx, Ny], sublane-padded along x; g MUST be
    zero in pad lanes). Returns

        (dx, dwcr, dwci, da1, db1, da2, db2, daw, dbw, dx3)

    with dwcr/dwci in the kernel's repacked [in, out, V, m2, K] layout
    (`_repack_spectral`; the caller maps back to the flax lo/hi split),
    bias grads as [1, n] rows, and dx3 batch-summed [1, W, V, Nx, Ny].
    Gradient semantics are exactly the flax block's (parity vs jax.vjp of
    the XLA block asserted in tests/test_pallas_kernels.py)."""
    b, w_ch, nv, nx, ny = x.shape
    nx_true = nx if nx_true is None else nx_true
    k_fr = 2 * m1
    assert 2 * m1 <= nx_true and m2 <= ny // 2 + 1 and nx % 8 == 0

    wcr, wci = _repack_spectral(block_params, m1, m2)
    mlp = block_params["_ChannelMLP_0"]
    a1, b1 = mlp["Dense_0"]["kernel"], mlp["Dense_0"]["bias"]
    a2, b2 = mlp["Dense_1"]["kernel"], mlp["Dense_1"]["bias"]
    byp = block_params["_Channel1x1_0"]["Dense_0"]
    aw, bw = byp["kernel"], byp["bias"]
    w_mid = a1.shape[1]
    cy, sy, cxk, sxk, cxT, sxT, iyc, iys = _dft_tables(nx_true, ny, m1, m2,
                                                       nx_pad=nx)
    # adjoint tables (plain transposes; iyc/iys already fold the Hermitian
    # weights, so their adjoints are the transposed WEIGHTED tables)
    cyT, syT = cy.T, sy.T                                      # [m2, Ny]
    iycT, iysT = iyc.T, iys.T                                  # [Ny, m2]
    inv_scale = 1.0 / (nx_true * ny)

    if interpret is None:
        interpret = not _on_tpu()

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, g_ref, wcr_ref, wci_ref, a1_ref, b1_ref, a2_ref,
               b2_ref, aw_ref, bw_ref, a1T_ref, a2T_ref, awT_ref, x3_ref,
               cy_ref, sy_ref, cxk_ref, sxk_ref, cxT_ref, sxT_ref,
               iyc_ref, iys_ref, cyT_ref, syT_ref, iycT_ref, iysT_ref,
               dx_ref, dwcr_ref, dwci_ref, da1_ref, db1_ref, da2_ref,
               db2_ref, daw_ref, dbw_ref, dx3_ref):
        bb = pl.program_id(1)
        first_any = (pl.program_id(0) == 0) & (bb == 0)
        xv = x_ref[0, :, 0]                                    # [W, Nx, Ny]
        gv = g_ref[0, :, 0]

        # ==== forward recompute (identical math to fno_block2d_fused) ====
        x2d = xv.reshape(w_ch * nx, ny)
        yr = _dot(x2d, cy_ref[...]).reshape(w_ch, nx, m2)
        yi = _dot(x2d, sy_ref[...]).reshape(w_ch, nx, m2)
        yrT = jnp.swapaxes(yr, 1, 2).reshape(w_ch * m2, nx)
        yiT = jnp.swapaxes(yi, 1, 2).reshape(w_ch * m2, nx)
        zr = (_dot(yrT, cxk_ref[...])
              - _dot(yiT, sxk_ref[...])).reshape(w_ch, m2, k_fr)
        zi = (_dot(yrT, sxk_ref[...])
              + _dot(yiT, cxk_ref[...])).reshape(w_ch, m2, k_fr)

        wcr_v = wcr_ref[:, :, 0]                               # [W, W, m2, K]
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
            # acc[o] = bias[o] + sum_i src[i] * mat[i, o]. Weights arrive
            # host-pre-shaped [n_in, n_out, 1, 1] and biases [n_out, 1, 1]:
            # Mosaic rejects in-kernel 1-D -> 3-D reshapes ("unsupported
            # shape cast"), but broadcasting pre-ranked blocks lowers fine
            # (same pattern as the forward kernel's chan_contract).
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

        def rsum(t):
            # [C, Nx, Ny] -> [C, 1, 1]. One single-axis keepdims reduce at
            # a time: Mosaic's multi-dim reduce of a rank-3 vector trips
            # the same layout check as rank-1 values (layout.h:320
            # arr.size() >= layout_rank, SIGABRT) — sequential lane-then-
            # sublane reduces lower fine (probed on-chip, probe_patterns).
            return jnp.sum(jnp.sum(t, axis=2, keepdims=True), axis=1,
                           keepdims=True)

        # ==== backward ====
        gs = gv * _dgelu(s)                                    # [W, Nx, Ny]

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
        gsum = rsum(gs)                                        # [W, 1, 1]
        dbw_ref[...] += gsum
        db2_ref[...] += gsum
        for i in range(w_ch):
            daw_ref[i] += rsum(xv[i][None] * gs)
        for m in range(w_mid):
            da2_ref[m] += rsum(h[m][None] * gs)

        dh = contract(gs, a2T_ref[...], None, w_ch, w_mid)
        dpre1 = dh * _dgelu(pre1)
        db1_ref[...] += rsum(dpre1)
        for i in range(w_ch):
            da1_ref[i] += rsum(spec[i][None] * dpre1)
        dspec = contract(dpre1, a1T_ref[...], None, w_mid, w_ch)

        # spectral adjoint (transposed tables; zero pad rows/cols make the
        # padded-lane contributions vanish exactly as in the forward)
        dspec2d = dspec.reshape(w_ch * nx, ny) * inv_scale
        dvrT = _dot(dspec2d, iycT_ref[...])                 # [W*Nx, m2]
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
            dzr = dzr + dmr[o][None] * wcr_v[:, o] + dmi[o][None] * wci_v[:, o]
            dzi = dzi - dmr[o][None] * wci_v[:, o] + dmi[o][None] * wcr_v[:, o]
        for i in range(w_ch):
            dwcr_ref[i, :, 0] += zr[i][None] * dmr + zi[i][None] * dmi
            dwci_ref[i, :, 0] += zr[i][None] * dmi - zi[i][None] * dmr

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

    full = lambda *shape: pl.BlockSpec(shape, lambda v, bb: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (bb, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((w_ch, w_ch, 1, m2, k_fr),
                          lambda v, bb: (0, 0, v, 0, 0),
                          memory_space=pltpu.VMEM)
    x3_spec = pl.BlockSpec((1, w_ch, 1, nx, ny), lambda v, bb: (0, 0, v, 0, 0),
                           memory_space=pltpu.VMEM)
    f32 = jnp.float32
    # weight grads as [in, out, 1, 1] blocks and bias grads as [n, 1, 1]
    # columns: in-kernel accumulation is per-row rank-3 stores + sequential
    # keepdims reduces (the only forms Mosaic's layout inference accepts —
    # rank-1 values and multi-axis reduces SIGABRT the compiler); the host
    # reshapes back to the public [in, out] / [1, n] contract below.
    out_shape = (
        jax.ShapeDtypeStruct(x.shape, f32),                        # dx
        jax.ShapeDtypeStruct((w_ch, w_ch, nv, m2, k_fr), f32),     # dwcr
        jax.ShapeDtypeStruct((w_ch, w_ch, nv, m2, k_fr), f32),     # dwci
        jax.ShapeDtypeStruct((w_ch, w_mid, 1, 1), f32),            # da1
        jax.ShapeDtypeStruct((w_mid, 1, 1), f32),                  # db1
        jax.ShapeDtypeStruct((w_mid, w_ch, 1, 1), f32),            # da2
        jax.ShapeDtypeStruct((w_ch, 1, 1), f32),                   # db2
        jax.ShapeDtypeStruct((w_ch, w_ch, 1, 1), f32),             # daw
        jax.ShapeDtypeStruct((w_ch, 1, 1), f32),                   # dbw
        jax.ShapeDtypeStruct((1, w_ch, nv, nx, ny), f32),          # dx3
    )
    out_specs = [
        x_spec, w_spec, w_spec,
        full(w_ch, w_mid, 1, 1), full(w_mid, 1, 1),
        full(w_mid, w_ch, 1, 1), full(w_ch, 1, 1),
        full(w_ch, w_ch, 1, 1), full(w_ch, 1, 1),
        x3_spec,
    ]

    est = fused_block_bwd_vmem_est(w_ch, w_mid, nx, ny, m1, m2)
    from .stencil_kernels import _vmem_params

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nv, b),  # b innermost: weight/grad blocks stay resident
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
        interpret=interpret,
    )(x.astype(f32), g.astype(f32), wcr, wci,
      a1[:, :, None, None], b1[:, None, None],
      a2[:, :, None, None], b2[:, None, None],
      aw[:, :, None, None], bw[:, None, None],
      a1.T[:, :, None, None], a2.T[:, :, None, None],
      aw.T[:, :, None, None],
      x3.astype(f32), cy, sy, cxk, sxk, cxT, sxT, iyc, iys,
      jnp.asarray(cyT), jnp.asarray(syT), jnp.asarray(iycT),
      jnp.asarray(iysT))
    dx, dwcr, dwci, da1, db1, da2, db2, daw, dbw, dx3 = outs
    return (dx, dwcr, dwci,
            da1.reshape(w_ch, w_mid), db1.reshape(1, w_mid),
            da2.reshape(w_mid, w_ch), db2.reshape(1, w_ch),
            daw.reshape(w_ch, w_ch), dbw.reshape(1, w_ch), dx3)


# ---------------------------------------------------------------------------
# fused projection head: fc1 (width -> 256) + gelu + fc2 (256 -> step)
#
# The projection is the widest activation in the model: XLA materialises
# the 256-channel tensor in HBM between the two matmuls (~8x the width-32
# block activations; gelu adds another round trip). This kernel keeps it in
# VMEM: read z once, write the step-channel output once.
# ---------------------------------------------------------------------------


def projection_vmem_est(w_ch: int, w_proj: int, step: int,
                        nx: int, ny: int) -> int:
    """VMEM bound for one projection grid step: the z block + the
    [S, w_proj] pre/h planes (+ small weights)."""
    s_rows = nx * ny
    return (nx * _vmem_pad(ny, 8) * _vmem_pad(w_ch, 128)
            + 3 * _vmem_pad(s_rows, 8) * _vmem_pad(w_proj, 128)
            + _vmem_pad(s_rows, 8) * _vmem_pad(step, 128)) * 4


def projection2d_fused(z, fc1, fc2, interpret: bool | None = None):
    """Fused fc1 -> gelu -> fc2 projection (`Base_FNO.py:174-179`).

    z [B, V, Nx, Ny, W] (the post-block transpose layout), fc1/fc2 the
    flax Dense param dicts {kernel, bias} with kernels [W, Wp] and
    [Wp, step]. Returns [B, V, Nx*Ny, step]: the kernel keeps the spatial
    plane flattened because Mosaic cannot split the lane dim in-kernel
    ([step, Nx*Ny] -> [step, Nx, Ny] is an unsupported shape cast); the
    caller un-flattens on the host where it is a free XLA reshape.
    Requires Ny % 8 == 0 (the in-kernel [Nx, Ny, W] -> [Nx*Ny, W] view);
    the caller pads/crops non-aligned Ny (pad lanes produce bias+gelu
    garbage that never mixes across space — the projection is pointwise)."""
    b, nv, nx, ny, w_ch = z.shape
    a1, b1 = fc1["kernel"], fc1["bias"]            # [W, Wp], [Wp]
    a2, b2 = fc2["kernel"], fc2["bias"]            # [Wp, step], [step]
    w_proj, step = a2.shape
    assert ny % 8 == 0

    if interpret is None:
        interpret = not _on_tpu()

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(z_ref, a1_ref, b1_ref, a2_ref, b2_ref, out_ref):
        zv = z_ref[0, 0]                            # [Nx, Ny, W]
        z2d = zv.reshape(nx * ny, w_ch)
        pre = _dot(z2d, a1_ref[...]) + b1_ref[...][None, :]
        h = _gelu(pre)
        out_ref[0, 0] = _dot(h, a2_ref[...]) + b2_ref[...][None, :]

    full = lambda *shape: pl.BlockSpec(shape, lambda bb, v: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, nx, ny, w_ch),
                          lambda bb, v: (bb, v, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, 1, nx * ny, step),
                          lambda bb, v: (bb, v, 0, 0),
                          memory_space=pltpu.VMEM)
    from .stencil_kernels import _vmem_params

    est = projection_vmem_est(w_ch, w_proj, step, nx, ny)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nv, nx * ny, step), jnp.float32),
        grid=(b, nv),
        in_specs=[z_spec, full(w_ch, w_proj), full(w_proj),
                  full(w_proj, step), full(step)],
        out_specs=o_spec,
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(z.astype(jnp.float32), a1, b1, a2, b2)


def projection2d_bwd_fused(z, g, fc1, fc2, interpret: bool | None = None):
    """Backward of `projection2d_fused`: z the input, g the cotangent in
    the kernel's flattened [B, V, Nx*Ny, step] output layout (zero in any
    pad rows). Returns (dz [B, V, Nx, Ny, W], da1, db1, da2, db2); weight
    grads accumulate across the whole grid in resident VMEM blocks."""
    b, nv, nx, ny, w_ch = z.shape
    a1, b1 = fc1["kernel"], fc1["bias"]
    a2, b2 = fc2["kernel"], fc2["bias"]
    w_proj, step = a2.shape

    if interpret is None:
        interpret = not _on_tpu()

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(z_ref, g_ref, a1_ref, b1_ref, a2_ref, b2_ref,
               dz_ref, da1_ref, db1_ref, da2_ref, db2_ref):
        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
        zv = z_ref[0, 0]
        z2d = zv.reshape(nx * ny, w_ch)
        pre = _dot(z2d, a1_ref[...]) + b1_ref[...][None, :]
        h = _gelu(pre)

        g2d = g_ref[0, 0]                           # [S, step]

        @pl.when(first)
        def _init():
            da1_ref[...] = jnp.zeros_like(da1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            da2_ref[...] = jnp.zeros_like(da2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        # fc2 grads: contract over the S rows (transposed-lhs matmul)
        da2_ref[...] += jax.lax.dot_general(
            h, g2d, (((0,), (0,)), ((), ())), **_HI)
        db2_ref[...] += jnp.sum(g2d, axis=0, keepdims=True)
        dh = _dot(g2d, jnp.swapaxes(a2_ref[...], 0, 1))   # [S, Wp]
        dpre = dh * _dgelu(pre)
        da1_ref[...] += jax.lax.dot_general(
            z2d, dpre, (((0,), (0,)), ((), ())), **_HI)
        db1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
        dz2d = _dot(dpre, jnp.swapaxes(a1_ref[...], 0, 1))  # [S, W]
        dz_ref[0, 0] = dz2d.reshape(nx, ny, w_ch)

    full = lambda *shape: pl.BlockSpec(shape, lambda bb, v: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    z_spec = pl.BlockSpec((1, 1, nx, ny, w_ch),
                          lambda bb, v: (bb, v, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, 1, nx * ny, step),
                          lambda bb, v: (bb, v, 0, 0),
                          memory_space=pltpu.VMEM)
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct(z.shape, f32),
        jax.ShapeDtypeStruct((w_ch, w_proj), f32),
        jax.ShapeDtypeStruct((1, w_proj), f32),
        jax.ShapeDtypeStruct((w_proj, step), f32),
        jax.ShapeDtypeStruct((1, step), f32),
    )
    from .stencil_kernels import _vmem_params

    est = projection_vmem_est(w_ch, w_proj, step, nx, ny) * 2
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b, nv),
        in_specs=[z_spec, g_spec, full(w_ch, w_proj), full(w_proj),
                  full(w_proj, step), full(step)],
        out_specs=[z_spec, full(w_ch, w_proj), full(1, w_proj),
                   full(w_proj, step), full(1, step)],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(z.astype(f32), g.astype(f32), a1, b1, a2, b2)
