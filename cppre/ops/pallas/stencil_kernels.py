"""Fused stencil-residual kernels (Pallas, TPU).

Two entry points:

* `fused_stencil_residual(field, kernel, take_abs=False)` — the composite
  additive-kernel path (advection/wave: one kernel evaluates the whole PDE,
  reference `ConvOps_2d.convolution` + interior crop + |.| score in one
  pass). field [BS, Nt, Nx, Ny], kernel [3, 3, 3] compile-time constant.
  Output [BS, Nt-2, Nx-2, Ny-2] (the reference's `res[..., 1:-1, 1:-1,
  1:-1]` crop — because the crop discards the SAME-pad halo, the kernel
  only ever computes valid interior points and needs no padding at all).

* `ns_momentum_residual_fused(fields, dt, dx, dy, nu)` — the full NS
  momentum residual (`Joint/NS_Residuals_CP.py:231-240`): 10 stencil
  applications + elementwise combination over (u, v, p), one VMEM pass.

Grid: one program per batch sample; each block is the sample's whole
[Nt, Nx, Ny] trajectory in VMEM (21 x 100 x 100 f32 ~ 0.9 MB; the v5e has
~16 MB/core). Derivative taps are static slices of the loaded block — pure
VPU shift-adds, no MXU (a 7-tap stencil has no arithmetic intensity to
feed a systolic array; bandwidth is the budget and one-load-per-field is
the optimum). Falls back to the jnp shift-add path off-TPU.
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fused_stencil_residual",
    "ns_momentum_residual_fused",
    "mhd_induction_residual_fused",
    "mhd_residual_fused",
    "jorek_residual_fused",
    "jorek_joint_cp_scores_fused",
    "ns_joint_cp_scores_fused",
    "mhd_induction_joint_cp_scores_fused",
    "wave_joint_cp_scores_fused",
    "wave_residual_fused",
]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# ---------------------------------------------------------------------------
# generic composite-kernel residual
# ---------------------------------------------------------------------------

def _taps(kernel: np.ndarray):
    """Non-zero (offset, weight) taps of a constant stencil."""
    kernel = np.asarray(kernel)
    return [
        (idx, float(kernel[idx]))
        for idx in itertools.product(*(range(k) for k in kernel.shape))
        if kernel[idx] != 0.0
    ]


def _valid_shift_add(block, taps, out_shape):
    """sum_w w * block[t+dt, x+dx, y+dy] over the valid interior."""
    acc = None
    for (it, ix, iy), w in taps:
        window = block[it : it + out_shape[0], ix : ix + out_shape[1],
                       iy : iy + out_shape[2]]
        term = window * w
        acc = term if acc is None else acc + term
    return acc


def fused_stencil_residual(field, kernel, take_abs: bool = False,
                           interpret: bool | None = None):
    """|D(field)| on the interior, one VMEM pass per sample.

    field: [BS, Nt, Nx, Ny]; kernel: constant [k, k, k] (odd k).
    Returns [BS, Nt-k+1, Nx-k+1, Ny-k+1] == the reference crop for k=3.
    """
    kernel = np.asarray(kernel)
    k = kernel.shape[0]
    taps = _taps(kernel)
    bs, nt, nx, ny = field.shape
    out_shape = (nt - k + 1, nx - k + 1, ny - k + 1)

    if interpret is None:
        if not _on_tpu():
            # off-TPU reference path: same math, plain XLA
            from ..convops import stencil_shift_add

            res = stencil_shift_add(field, kernel, same=False)
            return jnp.abs(res) if take_abs else res
        interpret = False

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_fn(in_ref, out_ref):
        block = in_ref[0]
        acc = _valid_shift_add(block, taps, out_shape)
        out_ref[0] = jnp.abs(acc) if take_abs else acc

    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((bs,) + out_shape, field.dtype),
        grid=(bs,),
        in_specs=[pl.BlockSpec((1, nt, nx, ny), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(field)


# ---------------------------------------------------------------------------
# fused NS momentum residual
# ---------------------------------------------------------------------------

def _interior(block, nt, nx, ny):
    return block[1 : nt - 1, 1 : nx - 1, 1 : ny - 1]


def _d_t(block, nt, nx, ny):
    return block[2:nt, 1 : nx - 1, 1 : ny - 1] - block[0 : nt - 2, 1 : nx - 1, 1 : ny - 1]


def _d_x(block, nt, nx, ny):
    return block[1 : nt - 1, 2:nx, 1 : ny - 1] - block[1 : nt - 1, 0 : nx - 2, 1 : ny - 1]


def _d_y(block, nt, nx, ny):
    return block[1 : nt - 1, 1 : nx - 1, 2:ny] - block[1 : nt - 1, 1 : nx - 1, 0 : ny - 2]


def _d_lap(block, nt, nx, ny):
    c = _interior(block, nt, nx, ny)
    return (block[1 : nt - 1, 2:nx, 1 : ny - 1] + block[1 : nt - 1, 0 : nx - 2, 1 : ny - 1]
            + block[1 : nt - 1, 1 : nx - 1, 2:ny] + block[1 : nt - 1, 1 : nx - 1, 0 : ny - 2]
            - 4.0 * c)


def _ns_momentum_math(u, v, p, nt, nx, ny, dt, dx, dy, nu):
    """The reference residual (`Joint/NS_Residuals_CP.py:231-240`) on the
    interior window, all derivative taps as shifted slices."""
    ui, vi = _interior(u, nt, nx, ny), _interior(v, nt, nx, ny)
    res_x = (_d_t(u, nt, nx, ny) * (dx * dy)
             + ui * _d_x(u, nt, nx, ny) * (dt * dy)
             + vi * _d_y(u, nt, nx, ny) * (dt * dx)
             - nu * _d_lap(u, nt, nx, ny) * dt
             + _d_x(p, nt, nx, ny) * (dt * dy))
    res_y = (_d_t(v, nt, nx, ny) * (dx * dy)
             + ui * _d_x(v, nt, nx, ny) * (dt * dx)
             + vi * _d_y(v, nt, nx, ny) * (dt * dy)
             - nu * _d_lap(v, nt, nx, ny) * dt
             + _d_y(p, nt, nx, ny) * (dt * dx))
    return res_x + res_y


def _mhd_induction_math(f, nt, nx, ny):
    """Ideal-MHD induction residual (`Joint/MHD_Residuals_CP.py:259-267`,
    rebuilt in `residuals/mhd.py::residual_induction`) on the interior
    window. f: [6, nt, nx, ny] block ordered (rho, u, v, p, Bx, By); rho
    and p are untouched (loading them costs 2 extra field reads, cheaper
    than materialising a gathered 4-field copy in HBM)."""
    u, v, Bx, By = f[1], f[2], f[4], f[5]
    I = lambda a: _interior(a, nt, nx, ny)
    d_t = lambda a: _d_t(a, nt, nx, ny)
    d_x = lambda a: _d_x(a, nt, nx, ny)
    d_y = lambda a: _d_y(a, nt, nx, ny)
    res_x = d_t(Bx) - I(By) * d_y(u) + I(Bx) * d_y(v) - I(v) * d_y(Bx) + I(u) * d_y(By)
    res_y = d_t(By) + I(By) * d_x(u) - I(Bx) * d_x(v) - I(v) * d_x(Bx) + I(u) * d_x(By)
    return res_x + res_y


def _d_xx(block, nt, nx, ny):
    return (block[1 : nt - 1, 2:nx, 1 : ny - 1]
            - 2.0 * _interior(block, nt, nx, ny)
            + block[1 : nt - 1, 0 : nx - 2, 1 : ny - 1])


def _d_yy(block, nt, nx, ny):
    return (block[1 : nt - 1, 1 : nx - 1, 2:ny]
            - 2.0 * _interior(block, nt, nx, ny)
            + block[1 : nt - 1, 1 : nx - 1, 0 : ny - 2])


def _jorek_affine(R):
    """(r0, dr) of an affine 1-D major-radius grid, or None. Pallas
    kernels cannot capture array constants, so the fused JOREK path
    rebuilds R in-kernel from iota — which requires R to be affine (it is:
    the experiments build it with linspace). Non-affine grids take the XLA
    lowering."""
    R = np.asarray(R, np.float64).reshape(-1)
    if R.size < 2:
        return None
    d = np.diff(R)
    if not np.allclose(d, d[0], rtol=1e-5, atol=1e-7):
        return None
    return float(R[0]), float(d[0])


def _jorek_math(equation: str, f, nt, nx, ny, r0: float, dr: float,
                Dc: float, K: float):
    """JOREK reduced-MHD residuals (`Joint/JOREK_residuals_CP.py:210-239`,
    rebuilt in `residuals/jorek.py::PRE_JOREK`, fixed y-axis semantics) as
    interior-window shift-add math over a [3, nt, nx, ny] block
    (rho, Phi, T). The major-radius weight R = r0 + dr*i is rebuilt
    in-kernel from iota (interior rows i in [1, nx-2]; tile-padded rows
    beyond the true grid get finite garbage the caller crops — JOREK's R
    is positive and bounded away from 0)."""
    GAMMA = 5.0 / 3.0
    # tpu.iota verifies integer-only result types; build int32 then cast
    idx = jax.lax.broadcasted_iota(jnp.int32, (nx - 2, 1), 0) \
             .astype(jnp.float32)
    R_int = r0 + dr * (idx + 1.0)
    rho, phi, T = f[0], f[1], f[2]
    I = lambda a: _interior(a, nt, nx, ny)
    d_t = lambda a: _d_t(a, nt, nx, ny)
    d_x = lambda a: _d_x(a, nt, nx, ny)
    d_y = lambda a: _d_y(a, nt, nx, ny)
    d_xx = lambda a: _d_xx(a, nt, nx, ny)
    d_yy = lambda a: _d_yy(a, nt, nx, ny)
    br = lambda a, b: d_x(a) * d_y(b) - d_x(b) * d_y(a)
    if equation == "continuity":
        return (d_t(rho) - R_int * br(rho, phi) - 2.0 * I(rho) * d_y(phi)
                - Dc * (d_xx(rho) + (1.0 / R_int) * d_x(rho) + d_yy(rho)))
    if equation == "temperature":
        return (I(T) * d_t(rho) + I(rho) * d_t(T)
                - I(rho) * R_int * br(T, phi) + I(T) * R_int * br(rho, phi)
                + 2.0 * GAMMA * I(rho) * I(T) * d_y(phi)
                + K * (d_xx(T) + (1.0 / R_int) * d_x(T) + d_yy(T)))
    raise ValueError(f"unknown JOREK equation {equation!r}")


def _vmem_pad(v: int, m: int) -> int:
    return -(-v // m) * m


# Empirical VMEM ceiling (scripts/probe_vmem.py): this v5e grants >= 120 MiB
# of scoped VMEM (the chip has 128 MiB); Mosaic's DEFAULT limit is ~16 MiB,
# so kernels sized above that must raise `vmem_limit_bytes` explicitly.
# Round 1 guarded at 14 MiB and routed big shapes to composed paths — that
# left ~8x the budget (and the paired one-pass kernel's ~30% HBM-traffic
# saving) on the table.
_VMEM_HW_LIMIT = 126 * 1024 * 1024

# Route-to-Pallas ceiling: the largest BLOCK estimate whose granted limit
# (1.75x + 4 MiB, see _vmem_params) still fits under _VMEM_HW_LIMIT.
# Estimates above this would get a vmem_limit below their real need
# (body temporaries run up to ~1.64x the block estimate) and fail Mosaic
# compilation instead of taking the XLA fallback — so route them away.
_VMEM_CAP = int((_VMEM_HW_LIMIT - (4 << 20)) / 1.75)


_VMEM_DEFAULT = 14 * 1024 * 1024


def _vmem_params(est_bytes: int):
    """CompilerParams raising the scoped-VMEM limit to fit `est_bytes`.

    Only raises when the estimate exceeds Mosaic's default budget: passing
    an explicit limit changes XLA's stack-allocation decisions and can OOM
    kernels that compile fine under the default (observed with the
    whole-output-on-stack placement at the NS residual shape)."""
    from jax.experimental.pallas import tpu as pltpu

    if est_bytes <= _VMEM_DEFAULT:
        return None
    # The estimate counts pipeline blocks only; Mosaic also stack-allocates
    # the kernel body's vector temporaries (one (nt-2, Lo) tile per live
    # stencil term — ~10 at the NS momentum shape, measured 24.0M actual vs
    # 14.6M block estimate). 1.75x + 4 MiB covers the worst observed ratio
    # (1.64x) with margin.
    limit = min(int(est_bytes * 1.75) + (4 << 20), _VMEM_HW_LIMIT)
    return pltpu.CompilerParams(vmem_limit_bytes=limit)


def routing_decision(shape, out_shape=None, has_chunked: bool = True) -> str:
    """Which strategy `_joint_cp_diff_stats` picks ON TPU for
    [BS, nvar, nt, nx, ny] inputs: 'paired' (one-pass whole-trajectory
    blocks), 'composed' (per-tensor kernels + XLA moments), or 'chunked'
    (DMA time-chunked; falls back to 'composed' when the caller's math has
    no chunked instance). Pure function of the shape — the production
    routing and the bench predictors share it so they cannot drift."""
    bs, nvar, nt, nx, ny = shape
    if out_shape is None:
        out_shape = (nt - 2, nx - 2, ny - 2)
    block = nvar * nt * _vmem_pad(nx, 8) * _vmem_pad(ny, 128) * 4
    out_b = (out_shape[0] * _vmem_pad(out_shape[1], 8)
             * _vmem_pad(out_shape[2], 128) * 4)
    if 4 * block + 4 * out_b <= _VMEM_CAP:
        return "paired"
    if 2 * block + 2 * out_b <= _VMEM_CAP:
        return "composed"
    return "chunked" if has_chunked else "composed"


def _batched_residual_fused(fields, math_fn, interpret: bool | None,
                            out_shape=None):
    """Grid-over-batch pallas_call: one whole-trajectory block per program,
    `math_fn([nvar, nt, nx, ny]) -> [*out_shape]` interior residual
    (default `out_shape` is the 3-wide-stencil crop (nt-2, nx-2, ny-2);
    wider composite kernels pass their own valid-interior shape).
    Off-TPU (or interpret=None off-device) falls back to vmapped XLA — the
    same math, so parity is by construction. Whole-trajectory blocks too
    large for VMEM (double-buffered input + output must fit ~16 MB/core)
    also fall back to the XLA lowering, with a warning so a perf-sensitive
    caller notices (e.g. MHD at N=128: 8.3 MB padded blocks)."""
    bs, nvar, nt, nx, ny = fields.shape
    if out_shape is None:
        out_shape = (nt - 2, nx - 2, ny - 2)

    if interpret is None:
        if not _on_tpu():
            return jax.vmap(math_fn)(fields)
        block = nvar * nt * _vmem_pad(nx, 8) * _vmem_pad(ny, 128) * 4
        out_b = (out_shape[0] * _vmem_pad(out_shape[1], 8)
                 * _vmem_pad(out_shape[2], 128) * 4)
        vmem_est = 2 * block + 2 * out_b
        if vmem_est > _VMEM_CAP:
            import warnings

            warnings.warn(
                f"fused residual block ({vmem_est >> 20} MiB "
                f"double-buffered) exceeds VMEM; using the XLA lowering "
                f"(same math) for shape {fields.shape}", stacklevel=3)
            return jax.vmap(math_fn)(fields)
        interpret = False

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_fn(in_ref, out_ref):
        out_ref[0] = math_fn(in_ref[0])

    est = (2 * nvar * nt * _vmem_pad(nx, 8) * _vmem_pad(ny, 128)
           + 2 * out_shape[0] * _vmem_pad(out_shape[1], 8)
           * _vmem_pad(out_shape[2], 128)) * 4
    return pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((bs,) + out_shape, fields.dtype),
        grid=(bs,),
        in_specs=[pl.BlockSpec((1, nvar, nt, nx, ny), lambda b: (b, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(fields)


def ns_momentum_residual_fused(fields, dt: float, dx: float, dy: float,
                               nu: float = 0.001, interpret: bool | None = None):
    """Fused NS momentum PRE: fields [BS, 3, Nt, Nx, Ny] (u, v, p) ->
    interior residual [BS, Nt-2, Nx-2, Ny-2]. Matches
    `PRE_NS.residual_momentum(..., boundary=False)` exactly (the SAME-pad
    halo is discarded by the crop, so only valid points are computed)."""
    bs, nvar, nt, nx, ny = fields.shape
    assert nvar >= 3
    return _batched_residual_fused(
        fields,
        lambda f: _ns_momentum_math(f[0], f[1], f[2], nt, nx, ny, dt, dx, dy, nu),
        interpret)


def _mhd_math(equation: str, f, nt, nx, ny):
    """All five ideal-MHD residuals (`Joint/MHD_Residuals_CP.py:225-278`,
    rebuilt in `residuals/mhd.py`) as interior-window shift-add math over a
    [6, nt, nx, ny] block (rho, u, v, p, Bx, By)."""
    GAMMA = 5.0 / 3.0
    rho, u, v, p, Bx, By = f[0], f[1], f[2], f[3], f[4], f[5]
    I = lambda a: _interior(a, nt, nx, ny)
    d_t = lambda a: _d_t(a, nt, nx, ny)
    d_x = lambda a: _d_x(a, nt, nx, ny)
    d_y = lambda a: _d_y(a, nt, nx, ny)
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
        return _mhd_induction_math(f, nt, nx, ny)
    if equation == "gauss":
        return d_x(Bx) + d_y(By)
    raise ValueError(f"unknown MHD equation {equation!r}")


def mhd_residual_fused(fields, equation: str = "induction",
                       interpret: bool | None = None):
    """Fused ideal-MHD PRE for any of the five selectable equations
    (the reference's selector, `Joint/MHD_Residuals_CP.py:323-348`):
    fields [BS, 6, Nt, Nx, Ny] -> interior residual [BS, Nt-2, Nx-2, Ny-2].
    Matches `PRE_MHD.residual(..., equation, boundary=False)` exactly."""
    bs, nvar, nt, nx, ny = fields.shape
    assert nvar >= 6
    return _batched_residual_fused(
        fields, lambda f: _mhd_math(equation, f, nt, nx, ny), interpret)


def mhd_induction_residual_fused(fields, interpret: bool | None = None):
    """Fused ideal-MHD induction PRE (see `mhd_residual_fused`)."""
    return mhd_residual_fused(fields, "induction", interpret)


def jorek_residual_fused(fields, R, Dc: float = 3.4, K: float = 2.25e-7,
                         equation: str = "continuity",
                         interpret: bool | None = None):
    """Fused JOREK reduced-MHD PRE (`Joint/JOREK_residuals_CP.py:210-239`):
    fields [BS, 3, Nt, NR, NZ] (rho, Phi, T), R the 1-D major-radius grid.
    Matches `PRE_JOREK.residual(..., equation, boundary=False)` exactly."""
    bs, nvar, nt, nx, ny = fields.shape
    assert nvar >= 3
    aff = _jorek_affine(R)
    if aff is None:  # non-affine R: XLA lowering (closures are fine there)
        from ...residuals.jorek import PRE_JOREK

        # dt/dR/dZ only enter PRE_JOREK's norms=True branch, unused here
        dummy = PRE_JOREK(jnp.asarray(R), 1.0, 1.0, 1.0, D=Dc, K=K)
        return dummy.residual(fields, equation)
    r0, dr = aff
    return _batched_residual_fused(
        fields,
        lambda f: _jorek_math(equation, f, nt, nx, ny, r0, dr, Dc, K),
        interpret)


def wave_residual_fused(field, kernel, interpret: bool | None = None):
    """Fused wave composite-kernel PRE: field [BS, Nt, Nx, Ny], kernel the
    additive D_tt - (c dt/dx)^2 D_xxyy stencil (`Joint/Wave_Residuals_CP.py:
    170-184`). Thin alias of `fused_stencil_residual` so the wave pipeline
    names its Pallas path explicitly."""
    return fused_stencil_residual(field, kernel, interpret=interpret)


# ---------------------------------------------------------------------------
# fused joint-CP statistics: diff residual + cross-batch moments in one pass
# ---------------------------------------------------------------------------

def _joint_cp_diff_stats(truth, prediction, math_fn, interpret: bool | None,
                         out_shape=None, chunked_fn=None,
                         samples_per_block: int = 1, diff_dtype=None):
    """One-pass joint-CP front end: reads the truth and prediction field
    tensors once, emits (diff_residual [BS, *out], sum [*out], sumsq [*out])
    where diff = PRE(truth) - PRE(pred) and the moment accumulators give the
    per-cell modulation std = sqrt(sumsq/N - (sum/N)^2).

    `math_fn([nvar, nt, nx, ny]) -> [*out_shape]` is the per-sample
    residual (NS momentum, MHD induction, wave composite, ...); the default
    `out_shape` is the 3-wide-stencil interior crop (nt-2, nx-2, ny-2),
    wider composite kernels pass their own valid shape.

    Exploits the TPU grid's SEQUENTIAL execution: the moment outputs map to
    the same block for every grid step, so programs accumulate across the
    batch (initialised at b == 0). This removes two residual-tensor HBM
    round-trips vs computing res_out/res_pred separately and reducing with
    jnp.std.

    `diff_dtype` (optional, e.g. jnp.bfloat16) stores the staged diff
    tensor narrower. The diff write + score-pass re-read is 146 MB of the
    NS flagship's 652 MB pipeline traffic; bf16 halves it (~13% less
    traffic). The moments always accumulate from the f32 diff, so the
    modulation is exact; only the scored |diff| is rounded (~2^-9 relative
    — diff is a POST-cancellation residual difference, unlike the bf16
    field-storage negative result in BASELINE.md), and the rounding law is
    identical for calibration and prediction samples scored in the same
    call, so exchangeability is untouched. Every routing path applies the
    same cast, keeping scores routing-independent."""
    bs, nvar, nt, nx, ny = truth.shape
    if out_shape is None:
        out_shape = (nt - 2, nx - 2, ny - 2)
    d_dtype = diff_dtype or truth.dtype

    def _cast3(diff, s, sq):
        return diff.astype(d_dtype), s, sq

    def _xla_path():
        f = jax.vmap(math_fn)
        diff = f(truth) - f(prediction)
        return _cast3(diff, jnp.sum(diff, axis=0), jnp.sum(diff**2, axis=0))

    def _composed_path():
        # the measured-fastest mid-shape strategy (BASELINE.md roofline):
        # per-tensor whole-block fused residual kernels (which still run as
        # Pallas when a SINGLE trajectory fits VMEM) + XLA-fused moments
        ro = _batched_residual_fused(truth, math_fn, None, out_shape)
        rp = _batched_residual_fused(prediction, math_fn, None, out_shape)
        diff = ro - rp
        return _cast3(diff, jnp.sum(diff, axis=0), jnp.sum(diff**2, axis=0))

    # VMEM budget: two double-buffered input blocks + diff out + stats. The
    # v5e grants ~120 MiB scoped VMEM (probe_vmem.py), so the paired
    # one-pass kernel fits all flagship shapes when `vmem_limit_bytes` is
    # raised; only truly huge shapes route to the composed path.
    pad = lambda v, m: -(-v // m) * m
    block_bytes = nvar * nt * pad(nx, 8) * pad(ny, 128) * 4
    out_bytes = out_shape[0] * pad(out_shape[1], 8) * pad(out_shape[2], 128) * 4
    vmem_est = 2 * 2 * block_bytes + 4 * out_bytes
    if interpret is None:
        if not _on_tpu():
            return _xla_path()
        # Routing (r2, scripts/probe_slope.py): with the fixed ~28 ms
        # per-dispatch tunnel overhead subtracted out (slope harness), the
        # paired one-pass kernel measures 1.25 ms vs the composed path's
        # 1.51 ms at the NS flagship shape — its ~30% traffic saving wins,
        # and it fits big shapes once vmem_limit_bytes is raised (the v5e
        # grants ~120 MiB scoped VMEM, probe_vmem.py). Earlier
        # "paired is slower" readings were harness artifacts: the chained
        # CSE guard added a full-tensor add pass per iteration.
        # Paired whole-trajectory blocks that don't fit route to the
        # composed per-tensor-kernel path while a SINGLE trajectory still
        # fits (2 blocks + 2 out); beyond that the DMA-chunked kernel
        # (when the caller's math supports chunking) beats the XLA
        # lowering, which re-reads inputs per stencil tap (measured at
        # 512x512: chunked vs 20.7 ms XLA, scripts/bench_scaling.py).
        route = routing_decision(truth.shape, out_shape,
                                 chunked_fn is not None)
        if route == "chunked":
            return _cast3(*chunked_fn())
        if route == "composed":
            return _composed_path()
        interpret = False

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # samples_per_block > 1 packs g samples into each grid step to amortize
    # per-program overhead on small trajectories (wave/MHD 64x64 blocks are
    # <= a few MB; per-program fixed cost is a measurable fraction of their
    # DMA time). Opt-in until measured on-chip; g must divide the batch and
    # the enlarged footprint must still fit the Pallas ceiling.
    g = samples_per_block
    if g > 1 and (bs % g != 0 or g * vmem_est > _VMEM_CAP):
        g = 1

    def kernel_fn(t_ref, p_ref, diff_ref, sum_ref, sumsq_ref):
        b = pl.program_id(0)
        acc_s = acc_q = None
        for i in range(g):
            d = math_fn(t_ref[i]) - math_fn(p_ref[i])
            diff_ref[i] = d.astype(d_dtype)
            acc_s = d if acc_s is None else acc_s + d
            acc_q = d * d if acc_q is None else acc_q + d * d

        @pl.when(b == 0)
        def _():
            sum_ref[...] = acc_s
            sumsq_ref[...] = acc_q

        @pl.when(b > 0)
        def _():
            sum_ref[...] += acc_s
            sumsq_ref[...] += acc_q

    block_in = pl.BlockSpec((g, nvar, nt, nx, ny), lambda b: (b, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec(out_shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((bs,) + out_shape, d_dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
        ),
        grid=(bs // g,),
        in_specs=[block_in, block_in],
        out_specs=(
            pl.BlockSpec((g,) + out_shape, lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            stat_spec,
            stat_spec,
        ),
        compiler_params=_vmem_params(g * vmem_est),
        interpret=interpret,
    )(truth, prediction)


def _scores_from_diff_stats(diff, s, sq, n: int, eps: float):
    """modulation std from the one-pass moments, then the per-sample
    sup-norm nonconformity score (modulation_func + ncf_metric_joint).
    A narrow staged diff (diff_dtype) is upcast before the division, so
    the score arithmetic itself is always f32."""
    mean = s / n
    mod = jnp.sqrt(jnp.maximum(sq / n - mean**2, 0.0)) + eps
    return jnp.max(jnp.abs(diff.astype(s.dtype)) / mod,
                   axis=tuple(range(1, diff.ndim)))


def single_pass_vmem_bytes(shape, out_shape=None) -> int:
    """VMEM footprint estimate of `_joint_cp_scores_single_pass` at
    [BS, nvar, nt, nx, ny]: the full diff stash (the whole point — it never
    touches HBM) + double-buffered input blocks + moment/modulation scratch
    + body-temporary margin (~10 live out-shaped vectors, same basis as
    `_vmem_params`)."""
    bs, nvar, nt, nx, ny = shape
    if out_shape is None:
        out_shape = (nt - 2, nx - 2, ny - 2)
    block = nvar * nt * _vmem_pad(nx, 8) * _vmem_pad(ny, 128) * 4
    out_b = (out_shape[0] * _vmem_pad(out_shape[1], 8)
             * _vmem_pad(out_shape[2], 128) * 4)
    return bs * out_b + 4 * block + 3 * out_b + 10 * out_b + (4 << 20)


def single_pass_fits(shape, out_shape=None) -> bool:
    """Whether the VMEM-resident single-pass scores kernel fits this shape.

    Flagship arithmetic (VERDICT r04 #7): MHD [100, 6, 21, 64, 64] needs
    ~91 MiB (stash 62.3) — fits the ~126 MiB scoped-VMEM grant. NS
    [100, 3, 21, 100, 100] needs ~132 MiB (the (19, 98, 98) interior pads
    to 19x104x128 tiles = 1.01 MiB/sample, stash 101 MiB) — does NOT fit,
    which is WHY the NS flagship keeps the staged-diff two-pass: the
    modulation -> score dependency forces a second look at every diff, and
    at that shape the only place the diff can wait is HBM. Wave's bs=200
    stash (124.6 MiB) misses for the same reason. An 8 MiB safety margin
    keeps knife-edge shapes (NS estimates 125.8 of the 126 MiB grant —
    body temporaries have run up to 1.64x the block model, _vmem_params)
    off a route where a Mosaic OOM raises instead of falling back."""
    return (single_pass_vmem_bytes(shape, out_shape)
            <= _VMEM_HW_LIMIT - (8 << 20))


def _joint_cp_scores_single_pass(truth, prediction, math_fn, eps: float,
                                 out_shape=None, interpret: bool | None = None):
    """Joint-CP nonconformity scores with NO staged-diff HBM round-trip.

    The two-pass pipeline (`_joint_cp_diff_stats` + `_scores_from_diff_
    stats`) writes the diff tensor to HBM and re-reads it for the score
    pass because the modulation (a cross-batch std) is only known after
    every sample's residual — 2 x 29.5 MB of the MHD flagship's 471 MB
    traffic. Here the diff never leaves the chip: a 2-phase sequential
    grid ((phase, sample)) stashes each sample's diff in persistent VMEM
    scratch while accumulating the moments (phase 0), then computes the
    modulation once and scores every stashed sample from VMEM (phase 1).
    HBM traffic drops to the 2-tensor input read — the roofline floor for
    this computation.

    Phase 1 maps the input specs to block 0 (consecutive identical index
    -> fetched once), so the second phase costs one block of re-read, not
    a tensor. Only shapes passing `single_pass_fits` may route here; the
    caller keeps the two-pass for the rest (see the fit arithmetic there
    for why NS/Wave flagships cannot stash).

    Returns scores [BS] == ncf_metric_joint(res_t, res_p, std(diff)+eps).
    """
    bs, nvar, nt, nx, ny = truth.shape
    if out_shape is None:
        out_shape = (nt - 2, nx - 2, ny - 2)

    def _xla_path():
        f = jax.vmap(math_fn)
        diff = f(truth) - f(prediction)
        return _scores_from_diff_stats(diff, jnp.sum(diff, axis=0),
                                       jnp.sum(diff**2, axis=0), bs, eps)

    if interpret is None:
        if not _on_tpu() or not single_pass_fits(truth.shape, out_shape):
            return _xla_path()
        interpret = False

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_fn(t_ref, p_ref, scores_ref, stash_ref, s_ref, q_ref, mod_ref):
        ph = pl.program_id(0)
        b = pl.program_id(1)

        @pl.when(ph == 0)
        def _():
            d = math_fn(t_ref[0]) - math_fn(p_ref[0])
            stash_ref[b] = d

            @pl.when(b == 0)
            def _():
                s_ref[...] = d
                q_ref[...] = d * d

            @pl.when(b > 0)
            def _():
                s_ref[...] += d
                q_ref[...] += d * d

            # keep every visited output block defined (overwritten by the
            # phase-1 visit, which flushes last)
            scores_ref[...] = jnp.zeros((1, 1, 1), truth.dtype)

        @pl.when(jnp.logical_and(ph == 1, b == 0))
        def _():
            mean = s_ref[...] / bs
            mod_ref[...] = jnp.sqrt(
                jnp.maximum(q_ref[...] / bs - mean * mean, 0.0)) + eps

        @pl.when(ph == 1)
        def _():
            r = jnp.abs(stash_ref[b]) / mod_ref[...]
            # sequential single-axis keepdims reduces: multi-axis reduces
            # break Mosaic's layout inference (BASELINE.md, round 3)
            for ax in range(len(out_shape)):
                r = jnp.max(r, axis=ax, keepdims=True)
            scores_ref[...] = r

    block_in = pl.BlockSpec((1, nvar, nt, nx, ny),
                            lambda ph, b: (b * (1 - ph), 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    scores = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((bs, 1, 1), truth.dtype),
        grid=(2, bs),
        in_specs=[block_in, block_in],
        out_specs=pl.BlockSpec((1, 1, 1), lambda ph, b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bs,) + out_shape, truth.dtype),  # diff stash
            pltpu.VMEM(out_shape, truth.dtype),          # sum
            pltpu.VMEM(out_shape, truth.dtype),          # sumsq
            pltpu.VMEM(out_shape, truth.dtype),          # modulation
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=min(
            single_pass_vmem_bytes(truth.shape, out_shape), _VMEM_HW_LIMIT)),
        interpret=interpret,
    )(truth, prediction)
    return scores[:, 0, 0]


def ns_joint_cp_diff_stats(truth, prediction, dt: float, dx: float, dy: float,
                           nu: float = 0.001, interpret: bool | None = None,
                           samples_per_block: int = 1, diff_dtype=None):
    """NS-momentum instance of `_joint_cp_diff_stats` (docstring there).

    Shapes whose paired whole-trajectory blocks exceed VMEM route to the
    per-tensor-kernel + XLA-moments composition; shapes where even a
    single trajectory exceeds VMEM route to the one-pass DMA-chunked
    kernel (`ns_joint_cp_diff_stats_chunked`) rather than the XLA
    lowering."""
    nt, nx, ny = truth.shape[2:]
    math_fn = lambda f: _ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                          dt, dx, dy, nu)
    chunked = lambda: ns_joint_cp_diff_stats_chunked(truth, prediction,
                                                     dt, dx, dy, nu)
    return _joint_cp_diff_stats(truth, prediction, math_fn, interpret,
                                chunked_fn=chunked,
                                samples_per_block=samples_per_block,
                                diff_dtype=diff_dtype)


def ns_joint_cp_scores_fused(truth, prediction, dt: float, dx: float,
                             dy: float, nu: float = 0.001, eps: float = 1e-6,
                             interpret: bool | None = None,
                             samples_per_block: int = 1, diff_dtype=None,
                             single_pass: bool = False):
    """Full joint-CP nonconformity scores in two fused passes:
    per-sample sup-norm of |diff| / (std(diff, axis=0) + eps).
    Matches modulation_func + ncf_metric_joint over the NS momentum PRE.
    `diff_dtype=jnp.bfloat16` halves the staged-diff traffic (see
    `_joint_cp_diff_stats`). `single_pass=True` opts into the VMEM-stash
    kernel where it fits (NOT at the NS flagship shape — see
    `single_pass_fits` for the arithmetic); unfitting shapes fall through
    to the two-pass."""
    nt, nx, ny = truth.shape[2:]
    if single_pass and (interpret or single_pass_fits(truth.shape)):
        math_fn = lambda f: _ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                              dt, dx, dy, nu)
        return _joint_cp_scores_single_pass(truth, prediction, math_fn, eps,
                                            interpret=interpret)
    diff, s, sq = ns_joint_cp_diff_stats(truth, prediction, dt, dx, dy, nu,
                                         interpret=interpret,
                                         samples_per_block=samples_per_block,
                                         diff_dtype=diff_dtype)
    return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)


def mhd_induction_joint_cp_scores_fused(truth, prediction, eps: float = 1e-6,
                                        interpret: bool | None = None,
                                        samples_per_block: int = 1,
                                        diff_dtype=None,
                                        single_pass: bool = False):
    """Joint-CP nonconformity scores over the MHD induction PRE, one fused
    read of each 6-field tensor (reference flow `Joint/MHD_Residuals_CP.py:
    349-352`: modulation_func(+1e-6 guard) + ncf_metric_joint).
    `single_pass=True` opts into the VMEM-stash kernel (fits the MHD
    flagship: ~91 MiB incl. the 62 MiB diff stash) — removes the staged
    diff's 2 x 29.5 MB write+re-read from the pipeline's HBM traffic."""
    _, _, nt, nx, ny = truth.shape
    math_fn = lambda f: _mhd_induction_math(f, nt, nx, ny)
    if single_pass and (interpret or single_pass_fits(truth.shape)):
        return _joint_cp_scores_single_pass(truth, prediction, math_fn, eps,
                                            interpret=interpret)
    chunked = lambda: mhd_joint_cp_diff_stats_chunked(truth, prediction,
                                                      "induction")
    diff, s, sq = _joint_cp_diff_stats(truth, prediction, math_fn, interpret,
                                       chunked_fn=chunked,
                                       samples_per_block=samples_per_block,
                                       diff_dtype=diff_dtype)
    return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)


def wave_joint_cp_scores_fused(truth, prediction, kernel, eps: float = 1e-6,
                               interpret: bool | None = None,
                               samples_per_block: int = 1, diff_dtype=None):
    """Joint-CP nonconformity scores over the wave composite-kernel PRE
    (`Joint/Wave_Residuals_CP.py:219-220`). truth/prediction
    [BS, Nt, Nx, Ny] single-variable trajectories; kernel the additive
    D_tt - (c dt/dx)^2 D_xxyy stencil."""
    taps = _taps(kernel)
    _, nt, nx, ny = truth.shape
    k = np.asarray(kernel).shape[0]
    assert k % 2 == 1, "stencil kernels must have odd extent"
    out_shape = (nt - k + 1, nx - k + 1, ny - k + 1)
    math_fn = lambda f: _valid_shift_add(f[0], taps, out_shape)
    # the DMA-chunked route assumes the generic 1-frame time halo, so it is
    # only available for the standard 3-wide composite kernel
    chunked = None
    if k == 3:
        chunked = lambda: wave_joint_cp_diff_stats_chunked(truth, prediction,
                                                           kernel)
    diff, s, sq = _joint_cp_diff_stats(truth[:, None], prediction[:, None],
                                       math_fn, interpret, out_shape,
                                       chunked_fn=chunked,
                                       samples_per_block=samples_per_block,
                                       diff_dtype=diff_dtype)
    return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)


def _joint_cp_diff_stats_chunked(truth, prediction, chunk_math, whole_fn,
                                 t_block: int = 5,
                                 interpret: bool | None = None):
    """One-pass diff+stats at shapes too large for whole-trajectory blocks.

    Same contract as `_joint_cp_diff_stats`, but the per-sample
    trajectories stay in HBM (`memory_space=ANY`) and the kernel manually
    DMAs overlapping time chunks (t_block interior frames + 1-frame halo
    per side) into VMEM scratch, computes the chunk's residual difference,
    DMAs it out, and accumulates the cross-batch moments in VMEM. This
    keeps the footprint at ~2 x nvar x (t_block+2) x Nx x Ny per tensor
    regardless of Nt, where the whole-block variant needs both full
    trajectories resident (OOM at the benchmark shape).

    `chunk_math(f, nt_c, nx, ny)` maps a [nvar, nt_c, nx, ny] chunk value
    to its interior residual [nt_c-2, nx-2, ny-2] (a 3-wide-stencil
    residual evaluated per overlapping time chunk — NS momentum, any MHD
    equation, ...). `whole_fn(truth, prediction)` is the whole-block
    fallback used off-TPU and when even single-frame chunks cannot fit.
    """
    bs, nvar, nt, nx_in, ny_in = truth.shape
    out_t = nt - 2

    if interpret is None:
        if not _on_tpu():
            return whole_fn(truth, prediction)
        interpret = False

    # Once the time axis is chunked, the DMA copies slice the VMEM blocks,
    # and Mosaic requires every sliced dimension's extent to be
    # tile-aligned in the last two (tiled) dims: zero-pad y to the 128-lane
    # tile and x to the 8-sublane tile. The residual's valid interior
    # (rows [0, nx_in-2), cols [0, ny_in-2)) uses only real data; padded
    # tails are cropped after the kernel.
    if not interpret:
        nx = -(-nx_in // 8) * 8
        ny = -(-ny_in // 128) * 128
    else:
        nx, ny = nx_in, ny_in
    if (nx, ny) != (nx_in, ny_in):
        padspec = [(0, 0)] * 3 + [(0, nx - nx_in), (0, ny - ny_in)]
        truth = jnp.pad(truth, padspec)
        prediction = jnp.pad(prediction, padspec)
    # staged-diff x extent: 8-aligned so the out-copy's slice is aligned
    # (tail rows/cols are zero-filled garbage, cropped on return)
    ox = nx if not interpret else nx_in - 2
    out_shape = (out_t, nx - 2, ny - 2)
    dma_shape = (out_t, ox, ny)  # full-tile-width DMA, tail is garbage

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Auto-shrink t_block to fit hardware VMEM. The footprint is
    #   in-buffers: 2 tensors x 2 slots x nvar x (tb+2) x nx x ny
    #   diff stage: 2 slots x tb x ox x ny
    #   moment accumulators: 2 x out_t x pad8(nx-2) x pad128(ny-2),
    #     counted TWICE (Mosaic double-buffers VMEM output blocks)
    # measured: 178.9M at t_block=5, 512x512, nt=21 — matches this formula.
    acc_b = 16 * out_t * _vmem_pad(nx - 2, 8) * _vmem_pad(ny - 2, 128)

    def scratch_bytes(tb):
        return (16 * nvar * (tb + 2) * nx * ny + 8 * tb * ox * ny + acc_b)

    if not interpret:
        budget = _VMEM_HW_LIMIT
        while t_block > 1 and scratch_bytes(t_block) > budget:
            t_block -= 1
        if scratch_bytes(t_block) > budget:
            # even single-frame chunks can't fit (the accumulators alone
            # are too big) — defer to the whole-block routing, whose XLA
            # lowering handles arbitrary shapes
            return whole_fn(truth[..., :nx_in, :ny_in],
                            prediction[..., :nx_in, :ny_in])

    # static chunk table: (interior_start, interior_len)
    chunks = []
    t0 = 0
    while t0 < out_t:
        chunks.append((t0, min(t_block, out_t - t0)))
        t0 += t_block

    n_chunks = len(chunks)
    max_nt_c = max(clen for _, clen in chunks) + 2

    def kernel_fn(t_hbm, p_hbm, diff_hbm, sum_ref, sumsq_ref,
                  t_vmem, p_vmem, d_vmem, in_sems, out_sems):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            sumsq_ref[...] = jnp.zeros_like(sumsq_ref)

        def in_copies(ci, slot):
            c0, clen = chunks[ci]
            nt_c = clen + 2
            return (
                pltpu.make_async_copy(
                    t_hbm.at[b, :, pl.ds(c0, nt_c)],
                    t_vmem.at[slot, :, pl.ds(0, nt_c)], in_sems.at[slot, 0]),
                pltpu.make_async_copy(
                    p_hbm.at[b, :, pl.ds(c0, nt_c)],
                    p_vmem.at[slot, :, pl.ds(0, nt_c)], in_sems.at[slot, 1]),
            )

        def out_copy(ci, slot):
            c0, clen = chunks[ci]
            return pltpu.make_async_copy(
                d_vmem.at[slot, pl.ds(0, clen)],
                diff_hbm.at[b, pl.ds(c0, clen)], out_sems.at[slot])

        # warm-up: prefetch chunk 0
        for cp in in_copies(0, 0):
            cp.start()

        for ci, (c0, clen) in enumerate(chunks):
            slot = ci % 2
            # prefetch the next chunk into the other slot while computing
            if ci + 1 < n_chunks:
                for cp in in_copies(ci + 1, (ci + 1) % 2):
                    cp.start()
            for cp in in_copies(ci, slot):
                cp.wait()

            nt_c = clen + 2
            res_t = chunk_math(t_vmem[slot, :, :nt_c], nt_c, nx, ny)
            res_p = chunk_math(p_vmem[slot, :, :nt_c], nt_c, nx, ny)
            d = res_t - res_p  # [clen, nx-2, ny-2]

            if ci >= 2:  # this d_vmem slot's previous out-copy must finish
                out_copy(ci - 2, slot).wait()
            d_vmem[slot, pl.ds(0, clen), : nx - 2, : ny - 2] = d
            d_vmem[slot, pl.ds(0, clen), : nx - 2, ny - 2 :] = jnp.zeros(
                (clen, nx - 2, 2), d.dtype)
            if ox > nx - 2:  # zero the padded x tail rows
                d_vmem[slot, pl.ds(0, clen), nx - 2 :, :] = jnp.zeros(
                    (clen, ox - (nx - 2), ny), d.dtype)
            sum_ref[pl.ds(c0, clen)] += d
            sumsq_ref[pl.ds(c0, clen)] += d * d
            out_copy(ci, slot).start()

        # drain outstanding out-copies
        for ci in range(max(n_chunks - 2, 0), n_chunks):
            out_copy(ci, ci % 2).wait()
    diff, s, sq = pl.pallas_call(
        kernel_fn,
        out_shape=(
            jax.ShapeDtypeStruct((bs,) + dma_shape, truth.dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
            jax.ShapeDtypeStruct(out_shape, truth.dtype),
        ),
        grid=(bs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(out_shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(out_shape, lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nvar, max_nt_c, nx, ny), truth.dtype),
            pltpu.VMEM((2, nvar, max_nt_c, nx, ny), truth.dtype),
            pltpu.VMEM((2, max_nt_c - 2, ox, ny), truth.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # the scratch footprint (two double-buffered chunk pairs + the diff
        # staging buffer + both VMEM-resident moment accumulators) exceeds
        # Mosaic's ~16 MiB default at large spatial grids (e.g. ~35 MiB at
        # 256x256) — raise the scoped-VMEM limit to the SAME footprint
        # model the auto-shrink guard above admits against (+20% headroom
        # and 4 MiB for Mosaic's incidentals), so the guard can never
        # admit a shape the grant then rejects
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=min(int(1.2 * scratch_bytes(t_block)) + (4 << 20),
                                 _VMEM_HW_LIMIT)),
        interpret=interpret,
    )(truth, prediction)
    # crop the padded x/y tails (garbage from the zero-padded rows/cols)
    cx, cy = nx_in - 2, ny_in - 2
    return diff[..., :cx, :cy], s[..., :cx, :cy], sq[..., :cx, :cy]


def ns_joint_cp_diff_stats_chunked(truth, prediction, dt: float, dx: float,
                                   dy: float, nu: float = 0.001,
                                   t_block: int = 5,
                                   interpret: bool | None = None):
    """NS-momentum instance of `_joint_cp_diff_stats_chunked` (docstring
    there). Same contract as `ns_joint_cp_diff_stats`."""

    def whole(t, p):
        # no chunked_fn here: this is the chunked kernel's own fallback,
        # re-entering the chunked route would recurse
        nt, nx, ny = t.shape[2:]
        return _joint_cp_diff_stats(
            t, p, lambda f: _ns_momentum_math(f[0], f[1], f[2], nt, nx, ny,
                                              dt, dx, dy, nu), None)

    return _joint_cp_diff_stats_chunked(
        truth, prediction,
        lambda f, nt_c, nx, ny: _ns_momentum_math(
            f[0], f[1], f[2], nt_c, nx, ny, dt, dx, dy, nu),
        whole, t_block, interpret)


def wave_joint_cp_diff_stats_chunked(truth, prediction, kernel,
                                     t_block: int = 5,
                                     interpret: bool | None = None):
    """Wave-composite instance of `_joint_cp_diff_stats_chunked` for
    3-wide additive kernels (D_tt - (c dt/dx)^2 D_xxyy,
    `Joint/Wave_Residuals_CP.py:170-176`): truth/prediction
    [BS, Nt, Nx, Ny] single-variable trajectories."""
    taps = _taps(kernel)
    assert np.asarray(kernel).shape[0] == 3, \
        "chunked wave route requires a 3-wide kernel (1-frame time halo)"

    def whole(t, p):
        # no chunked_fn here (see ns_joint_cp_diff_stats_chunked)
        nt, nx, ny = t.shape[2:]
        return _joint_cp_diff_stats(
            t, p,
            lambda f: _valid_shift_add(f[0], taps, (nt - 2, nx - 2, ny - 2)),
            None)

    return _joint_cp_diff_stats_chunked(
        truth[:, None], prediction[:, None],
        lambda f, nt_c, nx, ny: _valid_shift_add(
            f[0], taps, (nt_c - 2, nx - 2, ny - 2)),
        whole, t_block, interpret)


def mhd_joint_cp_diff_stats_chunked(truth, prediction,
                                    equation: str = "induction",
                                    t_block: int = 5,
                                    interpret: bool | None = None):
    """MHD instance of `_joint_cp_diff_stats_chunked` for any of the five
    selectable residual equations (`Joint/MHD_Residuals_CP.py:225-278`):
    truth/prediction [BS, 6, Nt, Nx, Ny] -> (diff, sum, sumsq) at shapes
    whose whole 6-field trajectories exceed VMEM."""

    def whole(t, p):
        # no chunked_fn here (see ns_joint_cp_diff_stats_chunked)
        nt, nx, ny = t.shape[2:]
        return _joint_cp_diff_stats(
            t, p, lambda f: _mhd_math(equation, f, nt, nx, ny), None)

    return _joint_cp_diff_stats_chunked(
        truth, prediction,
        lambda f, nt_c, nx, ny: _mhd_math(equation, f, nt_c, nx, ny),
        whole, t_block, interpret)


def _jorek_xla_diff_stats(truth, prediction, R, Dc, K, equation):
    """XLA fallback (diff, sum, sumsq) for non-affine major-radius grids:
    the fused kernels rebuild R in-kernel from iota and so require an
    affine grid, but real tokamak npz data loaded through the public API
    can carry non-uniform R — those route through `PRE_JOREK` residuals
    with identical moment semantics (routing pinned in
    tests/test_pallas_kernels.py)."""
    from ...residuals.jorek import PRE_JOREK

    # dt/dR/dZ only enter PRE_JOREK's norms=True branch, unused here
    pre = PRE_JOREK(jnp.asarray(R), 1.0, 1.0, 1.0, D=Dc, K=K)
    diff = pre.residual(truth, equation) - pre.residual(prediction, equation)
    return diff, jnp.sum(diff, axis=0), jnp.sum(diff * diff, axis=0)


def jorek_joint_cp_scores_fused(truth, prediction, R, Dc: float = 3.4,
                                K: float = 2.25e-7,
                                equation: str = "continuity",
                                eps: float = 1e-6,
                                interpret: bool | None = None,
                                diff_dtype=None):
    """Joint-CP nonconformity scores over a JOREK reduced-MHD PRE
    (`Joint/JOREK_residuals_CP.py` flow: modulation_func(+eps guard) +
    ncf_metric_joint), one fused read of each [BS, 3, Nt, NR, NZ] tensor.
    R is the 1-D major-radius grid; non-affine grids fall back to the XLA
    lowering (see `_jorek_xla_diff_stats`)."""
    _, _, nt, nx, ny = truth.shape
    aff = _jorek_affine(R)
    if aff is None:
        diff, s, sq = _jorek_xla_diff_stats(truth, prediction, R, Dc, K,
                                            equation)
        if diff_dtype is not None:  # same cast point as every other route
            diff = diff.astype(diff_dtype)
        return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)
    r0, dr = aff
    math_fn = lambda f: _jorek_math(equation, f, nt, nx, ny, r0, dr, Dc, K)
    chunked = lambda: jorek_joint_cp_diff_stats_chunked(
        truth, prediction, R, Dc, K, equation)
    diff, s, sq = _joint_cp_diff_stats(truth, prediction, math_fn, interpret,
                                       chunked_fn=chunked,
                                       diff_dtype=diff_dtype)
    return _scores_from_diff_stats(diff, s, sq, truth.shape[0], eps)


def jorek_joint_cp_diff_stats_chunked(truth, prediction, R, Dc: float = 3.4,
                                      K: float = 2.25e-7,
                                      equation: str = "continuity",
                                      t_block: int = 5,
                                      interpret: bool | None = None):
    """JOREK instance of `_joint_cp_diff_stats_chunked` for shapes whose
    whole 3-field trajectories exceed VMEM. The chunk math rebuilds the
    interior R weight from the (tile-padded) chunk extent. Non-affine R
    grids fall back to the XLA lowering (see `_jorek_xla_diff_stats`)."""

    aff = _jorek_affine(R)
    if aff is None:
        return _jorek_xla_diff_stats(truth, prediction, R, Dc, K, equation)
    r0, dr = aff

    def whole(t, p):
        # no chunked_fn here (see ns_joint_cp_diff_stats_chunked)
        nt, nx, ny = t.shape[2:]
        return _joint_cp_diff_stats(
            t, p,
            lambda f: _jorek_math(equation, f, nt, nx, ny, r0, dr, Dc, K),
            None)

    return _joint_cp_diff_stats_chunked(
        truth, prediction,
        lambda f, nt_c, nx, ny: _jorek_math(
            equation, f, nt_c, nx, ny, r0, dr, Dc, K),
        whole, t_block, interpret)
