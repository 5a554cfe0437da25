"""Flat-layout fused joint-CP kernels (Pallas, TPU).

Round-2 roofline push (BASELINE.md): the whole-block kernels in
`stencil_kernels.py` keep fields as [..., Nx, Ny] blocks, so the TPU's
(8, 128) f32 tiling pads Ny=100 -> 128 lanes (~28% of every byte moved is
padding; at the MHD grids' Ny=64 it is 100%). Here the two spatial axes are
merged into ONE contiguous dimension L = Nx*Ny (a free, layout-preserving
reshape): rows become 40 KB contiguous DMAs, padding drops to
`pad(L,128)/L` (<1.2% at the NS bench shape, 0% at MHD's 4096), and the
y-derivative becomes a lane shift of +-1, the x-derivative a lane shift of
+-Ny — the same static-slice shift-adds as before, over wider rows.

Cost of flattening: output columns where y wraps (y == 0 or y == Ny-1 of
the x-interior) mix neighbouring rows and are garbage — ~2% of cells,
masked out of the score reduction (the unflattened path crops them; the
flat path computes-then-masks, trading 2% wasted lanes for 28%+ saved
bytes).

The paired kernel also fuses the joint-CP front end (reference flow
`Joint/NS_Residuals_CP.py:231-263`): one grid pass reads truth+prediction
once, emits |PRE(truth) - PRE(pred)| and accumulates the cross-batch
moments for the modulation std in VMEM — removing the separate
res_out/res_pred HBM round-trips of the composed path. Shapes whose paired
blocks exceed VMEM route to a two-kernel composition (residual kernel,
then pred+res_out -> diff+stats kernel) with the same flat layout.

Everything falls back to the identical XLA shift-add math off-TPU, so
parity is by construction and `interpret=True` exercises the Pallas path
in CPU tests.
"""

from __future__ import annotations

import itertools


import jax
import jax.numpy as jnp
import numpy as np

from .stencil_kernels import _VMEM_CAP, _on_tpu, _vmem_params

__all__ = [
    "ns_joint_cp_scores_flat",
    "mhd_joint_cp_scores_flat",
    "wave_joint_cp_scores_flat",
]

_LANES = 128


def _pad_lanes(v: int) -> int:
    return -(-v // _LANES) * _LANES


def _pad_sub(v: int) -> int:
    return -(-v // 8) * 8


# ---------------------------------------------------------------------------
# flat shift-add math: blocks [nvar, nt, L] with L = nx*ny, valid output
# window f in [ny, L-ny) (x-interior, full y range; y-wrap columns garbage)
# ---------------------------------------------------------------------------


def _flat_window(a, s_t: int, s_f: int, nt: int, ny: int, lo: int):
    return a[1 + s_t : nt - 1 + s_t, ny + s_f : ny + s_f + lo]


def _flat_derivs(nt: int, ny: int, lo: int):
    W = lambda a, st, sf: _flat_window(a, st, sf, nt, ny, lo)
    I = lambda a: W(a, 0, 0)
    d_t = lambda a: W(a, 1, 0) - W(a, -1, 0)
    d_x = lambda a: W(a, 0, ny) - W(a, 0, -ny)
    d_y = lambda a: W(a, 0, 1) - W(a, 0, -1)
    d_lap = lambda a: (W(a, 0, ny) + W(a, 0, -ny) + W(a, 0, 1) + W(a, 0, -1)
                       - 4.0 * I(a))
    return I, d_t, d_x, d_y, d_lap


def _ns_momentum_flat(f, nt, ny, lo, dt, dx, dy, nu):  # off == ny
    """NS momentum residual (`Joint/NS_Residuals_CP.py:231-240`) on the flat
    window; same math as `stencil_kernels._ns_momentum_math`."""
    I, d_t, d_x, d_y, d_lap = _flat_derivs(nt, ny, lo)
    u, v, p = f[0], f[1], f[2]
    ui, vi = I(u), I(v)
    res_x = (d_t(u) * (dx * dy) + ui * d_x(u) * (dt * dy)
             + vi * d_y(u) * (dt * dx) - nu * d_lap(u) * dt
             + d_x(p) * (dt * dy))
    res_y = (d_t(v) * (dx * dy) + ui * d_x(v) * (dt * dx)
             + vi * d_y(v) * (dt * dy) - nu * d_lap(v) * dt
             + d_y(p) * (dt * dx))
    return res_x + res_y


def _mhd_flat(equation: str, f, nt, ny, lo):
    """All five ideal-MHD residuals (`Joint/MHD_Residuals_CP.py:225-278`) on
    the flat window; same math as `stencil_kernels._mhd_math`."""
    GAMMA = 5.0 / 3.0
    I, d_t, d_x, d_y, _ = _flat_derivs(nt, ny, lo)
    rho, u, v, p, Bx, By = f[0], f[1], f[2], f[3], f[4], f[5]
    if equation == "continuity":
        return (d_t(rho) + I(u) * d_x(rho) + I(rho) * d_x(u)
                + I(v) * d_y(rho) + I(rho) * d_y(v))
    if equation == "momentum":
        inv_rho = 1.0 / I(rho)
        res_x = (d_t(u) + I(u) * d_x(u) + inv_rho * d_x(p)
                 - 2 * (I(Bx) * inv_rho) * d_x(Bx) + I(v) * d_y(u)
                 - (I(By) * inv_rho) * d_y(Bx) - (I(Bx) * inv_rho) * d_y(By))
        res_y = (d_t(v) + I(u) * d_x(v) + inv_rho * d_y(p)
                 - 2 * (I(By) * inv_rho) * d_y(By) + I(v) * d_y(v)
                 - (I(By) * inv_rho) * d_x(Bx) - (I(Bx) * inv_rho) * d_x(By))
        return res_x + res_y
    if equation == "energy":
        p_gas = I(p) - 0.5 * (I(Bx) ** 2 + I(By) ** 2)
        return (d_t(rho) + I(u) * d_x(p) + I(v) * d_y(p)
                + (GAMMA - 2) * (I(u) * I(Bx) + I(v) * I(By)) * (d_x(Bx) + d_y(By))
                + (GAMMA * p_gas + I(By) ** 2) * d_x(u)
                + (GAMMA * p_gas + I(Bx) ** 2) * d_y(v)
                - I(Bx) * I(By) * (d_y(u) + d_x(v)))
    if equation == "induction":
        res_x = (d_t(Bx) - I(By) * d_y(u) + I(Bx) * d_y(v)
                 - I(v) * d_y(Bx) + I(u) * d_y(By))
        res_y = (d_t(By) + I(By) * d_x(u) - I(Bx) * d_x(v)
                 - I(v) * d_x(Bx) + I(u) * d_x(By))
        return res_x + res_y
    if equation == "gauss":
        return d_x(Bx) + d_y(By)
    raise ValueError(f"unknown MHD equation {equation!r}")


def _composite_off(kernel: np.ndarray, ny: int) -> int:
    """Flat-window margin needed by a 3x3x3 kernel: ny for face taps,
    ny+1 when any corner tap (x and y offset together) is nonzero."""
    kernel = np.asarray(kernel)
    off = ny
    for (it, ix, iy) in itertools.product(range(3), range(3), range(3)):
        if kernel[it, ix, iy] != 0.0:
            off = max(off, abs((ix - 1) * ny + (iy - 1)))
    return off


def _composite_flat(kernel: np.ndarray, f, nt, ny, lo, off):
    """Additive composite 3x3x3 stencil (wave `D_tt - (c dt/dx)^2 D_xxyy`,
    `Joint/Wave_Residuals_CP.py:170-184`) as flat taps over a window with
    margin `off` (>= |max tap offset|, so corner taps stay in bounds)."""
    kernel = np.asarray(kernel)
    assert kernel.shape == (3, 3, 3), "flat fusion assumes 3x3x3 stencils"
    a = f[0]
    acc = None
    for (it, ix, iy) in itertools.product(range(3), range(3), range(3)):
        w = float(kernel[it, ix, iy])
        if w == 0.0:
            continue
        s_f = (ix - 1) * ny + (iy - 1)
        term = a[it : nt - 2 + it, off + s_f : off + s_f + lo] * w
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# paired one-pass kernel:  (truth, pred) -> (|diff|, sum, sumsq)
# ---------------------------------------------------------------------------


def _flat_paired_absdiff_stats(truth, pred, math_fn, nt, interpret):
    """truth/pred [BS, nvar, nt, L]; math_fn([nvar, nt, L]) -> [nt-2, Lo].
    One grid pass over the batch: per-sample d = PRE(truth) - PRE(pred),
    emits |d| and accumulates sum/sumsq across the (sequential) grid for the
    modulation std."""
    bs, nvar, _, L = truth.shape

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # static output shape from the math structure: nt-2 rows, Lo lanes
    lo_len = jax.eval_shape(math_fn,
                            jax.ShapeDtypeStruct((nvar, nt, L), truth.dtype)).shape[1]
    out_shape = (nt - 2, lo_len)

    def kernel_fn(t_ref, p_ref, absdiff_ref, sum_ref, sumsq_ref):
        b = pl.program_id(0)
        d = math_fn(t_ref[0]) - math_fn(p_ref[0])
        absdiff_ref[0] = jnp.abs(d)

        @pl.when(b == 0)
        def _():
            sum_ref[...] = d
            sumsq_ref[...] = d * d

        @pl.when(b > 0)
        def _():
            sum_ref[...] += d
            sumsq_ref[...] += d * d

    block_in = pl.BlockSpec((1, nvar, nt, L), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec(out_shape, lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((bs,) + out_shape, truth.dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
        ),
        grid=(bs,),
        in_specs=[block_in, block_in],
        out_specs=(
            pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ),
        compiler_params=_vmem_params(_paired_vmem_est(nvar, nt, L, lo_len)),
        interpret=interpret,
    )(truth, pred)


def _flat_residual_kernel(fields, math_fn, nt, interpret):
    """fields [BS, nvar, nt, L] -> residual [BS, nt-2, Lo] (flat window)."""
    bs, nvar, _, L = fields.shape

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo_len = jax.eval_shape(math_fn,
                            jax.ShapeDtypeStruct((nvar, nt, L), fields.dtype)).shape[1]
    out_shape = (nt - 2, lo_len)

    def kernel_fn(in_ref, out_ref):
        out_ref[0] = math_fn(in_ref[0])

    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((bs,) + out_shape, fields.dtype),
        grid=(bs,),
        in_specs=[pl.BlockSpec((1, nvar, nt, L), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(
            _twokernel_vmem_est(nvar, nt, L, out_shape[1])),
        interpret=interpret,
    )(fields)


def _flat_absdiff_stats_from_res(pred, res_out, math_fn, nt, interpret):
    """Two-kernel route, second stage: (pred, PRE(truth)) -> |diff| + stats.
    Reads the prediction tensor and the precomputed truth residual once."""
    bs, nvar, _, L = pred.shape

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    out_shape = res_out.shape[1:]

    def kernel_fn(p_ref, r_ref, absdiff_ref, sum_ref, sumsq_ref):
        b = pl.program_id(0)
        d = r_ref[0] - math_fn(p_ref[0])
        absdiff_ref[0] = jnp.abs(d)

        @pl.when(b == 0)
        def _():
            sum_ref[...] = d
            sumsq_ref[...] = d * d

        @pl.when(b > 0)
        def _():
            sum_ref[...] += d
            sumsq_ref[...] += d * d

    stat_spec = pl.BlockSpec(out_shape, lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((bs,) + out_shape, pred.dtype),
            jax.ShapeDtypeStruct(out_shape, pred.dtype),
            jax.ShapeDtypeStruct(out_shape, pred.dtype),
        ),
        compiler_params=_vmem_params(
            _twokernel_vmem_est(nvar, nt, L, out_shape[1])),
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, nvar, nt, L), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ),
        interpret=interpret,
    )(pred, res_out)


# ---------------------------------------------------------------------------
# routing + score assembly
# ---------------------------------------------------------------------------

def _paired_vmem_est(nvar, nt, L, lo_len):
    blk = nvar * _pad_sub(nt) * _pad_lanes(L) * 4
    out = _pad_sub(nt - 2) * _pad_lanes(lo_len) * 4
    return 4 * blk + 2 * out + 2 * out


def _twokernel_vmem_est(nvar, nt, L, lo_len):
    blk = nvar * _pad_sub(nt) * _pad_lanes(L) * 4
    out = _pad_sub(nt - 2) * _pad_lanes(lo_len) * 4
    # stage 2 dominates: pred in + res in + absdiff out (double-buffered) + stats
    return 2 * blk + 2 * out + 2 * out + 2 * out


def _scores_flat(truth, pred, math_fn, ny, eps, interpret, xla_fallback,
                 off: int | None = None):
    """Common driver: flatten, route by VMEM, assemble masked sup-norm
    scores. truth/pred [BS, nvar, nt, nx, ny_] 5-D (nvar may be 1).
    `off` is the math_fn's flat-window margin (default ny)."""
    bs, nvar, nt, nx, ny_ = truth.shape
    assert ny_ == ny
    if off is None:
        off = ny
    L = nx * ny
    lo_len = L - 2 * off

    if interpret is None:
        if not _on_tpu():
            return xla_fallback()
        interpret = False

    tf = truth.reshape(bs, nvar, nt, L)
    pf = pred.reshape(bs, nvar, nt, L)

    if _paired_vmem_est(nvar, nt, L, lo_len) <= _VMEM_CAP:
        absdiff, s, sq = _flat_paired_absdiff_stats(tf, pf, math_fn, nt,
                                                    interpret)
    elif _twokernel_vmem_est(nvar, nt, L, lo_len) <= _VMEM_CAP:
        res_out = _flat_residual_kernel(tf, math_fn, nt, interpret)
        absdiff, s, sq = _flat_absdiff_stats_from_res(pf, res_out, math_fn,
                                                      nt, interpret)
    else:
        return xla_fallback()

    n = truth.shape[0]
    mean = s / n
    mod = jnp.sqrt(jnp.maximum(sq / n - mean**2, 0.0)) + eps
    # mask out-of-window cells: flat index f = off + j must sit at an
    # interior (x, y) — y-wrap columns mixed neighbouring x rows
    f_idx = jax.lax.broadcasted_iota(jnp.int32, (1, lo_len), 1) + off
    x_idx, y_idx = f_idx // ny, f_idx % ny
    valid = ((x_idx >= 1) & (x_idx < nx - 1)
             & (y_idx > 0) & (y_idx < ny - 1))
    ratio = jnp.where(valid[None], absdiff / mod[None], 0.0)
    return jnp.max(ratio, axis=(1, 2))


def ns_joint_cp_scores_flat(truth, prediction, dt: float, dx: float,
                            dy: float, nu: float = 0.001, eps: float = 1e-6,
                            interpret: bool | None = None):
    """Joint-CP nonconformity scores over the NS momentum PRE, flat layout
    (`Joint/NS_Residuals_CP.py:231-263`: residual -> modulation_func(+eps)
    -> ncf_metric_joint). Matches `ns_joint_cp_scores_fused` to one-pass-
    variance tolerance while moving ~28% fewer bytes at Ny=100."""
    bs, nvar, nt, nx, ny = truth.shape
    assert nvar >= 3
    math_fn = lambda f: _ns_momentum_flat(f, nt, ny, (nx - 2) * ny,
                                          dt, dx, dy, nu)

    def xla_fallback():
        from .stencil_kernels import ns_joint_cp_scores_fused

        return ns_joint_cp_scores_fused(truth, prediction, dt, dx, dy, nu,
                                        eps=eps)

    return _scores_flat(truth, prediction, math_fn, ny, eps, interpret,
                        xla_fallback)


def mhd_joint_cp_scores_flat(truth, prediction, equation: str = "induction",
                             eps: float = 1e-6,
                             interpret: bool | None = None):
    """Joint-CP scores over any of the five MHD residuals, flat layout
    (`Joint/MHD_Residuals_CP.py:323-352`). At the reference's 64x64 grids
    L = 4096 is an exact lane multiple — zero padding (the unflattened
    blocks padded Ny 64 -> 128, 2x the bytes)."""
    bs, nvar, nt, nx, ny = truth.shape
    assert nvar >= 6
    math_fn = lambda f: _mhd_flat(equation, f, nt, ny, (nx - 2) * ny)

    def xla_fallback():
        from .stencil_kernels import (_joint_cp_diff_stats, _mhd_math,
                                      _scores_from_diff_stats,
                                      mhd_joint_cp_diff_stats_chunked)

        mf = lambda f: _mhd_math(equation, f, nt, nx, ny)
        chunked = lambda: mhd_joint_cp_diff_stats_chunked(truth, prediction,
                                                          equation)
        diff, s, sq = _joint_cp_diff_stats(truth, prediction, mf, None,
                                           chunked_fn=chunked)
        return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)

    return _scores_flat(truth, prediction, math_fn, ny, eps, interpret,
                        xla_fallback)


def wave_joint_cp_scores_flat(truth, prediction, kernel, eps: float = 1e-6,
                              interpret: bool | None = None):
    """Joint-CP scores over the wave composite-kernel PRE, flat layout
    (`Joint/Wave_Residuals_CP.py:219-220`). truth/prediction
    [BS, Nt, Nx, Ny] single-variable trajectories."""
    kernel = np.asarray(kernel)
    bs, nt, nx, ny = truth.shape

    def xla_fallback():
        from .stencil_kernels import wave_joint_cp_scores_fused

        return wave_joint_cp_scores_fused(truth, prediction, kernel, eps=eps)

    if kernel.shape != (3, 3, 3):
        # the flat tap expansion (and _composite_off's margin scan) is
        # specialised to 3x3x3 composites; wider kernels take the generic
        # fused/XLA path, which supports any odd kernel
        return xla_fallback()

    off = _composite_off(kernel, ny)
    lo = nx * ny - 2 * off
    math_fn = lambda f: _composite_flat(kernel, f, nt, ny, lo, off)

    return _scores_flat(truth[:, None], prediction[:, None], math_fn, ny,
                        eps, interpret, xla_fallback, off=off)
