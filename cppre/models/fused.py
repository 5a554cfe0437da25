"""Inference-path FNO2d forward with fused Pallas Fourier blocks.

`fno2d_forward_fused(model, variables, x)` computes exactly
`model.apply(variables, x)` (dropout-free) with each of the six Fourier
blocks evaluated by `ops.pallas.fno_block.fno_block2d_fused` — one VMEM
pass per (sample, variable) instead of 15-20 XLA kernel launches per
block (see that module's docstring; TurboFNO pattern, PAPERS.md). The
lift/projection Denses and skip adds stay in XLA (they are single
matmuls). Off-TPU the kernels run in interpret mode, so this function is
also the math-parity oracle target (tests/test_pallas_kernels.py).

Use for inference only (validation_AR rollouts, UQ evaluation): training
differentiates through the flax module, which this path does not support.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.pallas.fno_block import fno_block2d_fused
from . import fno as _fno
from .fno import FNO2d

__all__ = ["fno2d_forward_fused", "fused_supported", "make_fused_apply",
           "make_fused_train_apply"]


def fused_supported(model: FNO2d, x_shape) -> bool:
    """Shape/config constraints of the fused block kernel: dropout-free,
    2*m1 <= Nx, m2 <= Ny//2+1, and the per-grid-step working set must fit
    the scoped-VMEM ceiling (oversize grids, e.g. 512x512 at width 32,
    must keep the XLA path instead of failing Mosaic compilation at
    runtime). Non-8-aligned Nx (e.g. the NS flagship's 100x100 grid) is
    supported via sublane zero-padding inside `fno2d_forward_fused`."""
    from ..ops.pallas.fno_block import fused_block_vmem_est
    from ..ops.pallas.stencil_kernels import _VMEM_CAP

    nx, ny = x_shape[2], x_shape[3]
    w = model.width_time  # _ChannelMLP mid width == width_time
    est = fused_block_vmem_est(w, w, nx, ny, model.modes1, model.modes2)
    return (model.dropout_rate == 0.0 and 2 * model.modes1 <= nx
            and model.modes2 <= ny // 2 + 1 and est <= _VMEM_CAP)


def make_fused_apply(model, variables, interpret=None):
    """Jitted `apply_fn(x)` over the fused blocks — drop-in for the
    `apply_fn` that `train.rollout.validation_AR` and the UQ validators
    take (inference only).

    Unsupported shapes/configs (`fused_supported`) fall back to
    `model.apply` per call, so the returned fn is safe for any input.

    Sharding caveat: pallas_call does not partition under pjit — on a dp
    mesh, wrap the call in `jax.shard_map` over the batch axis (the
    `parallel.sharded_fused_cp_scores` pattern) instead of relying on
    batch-sharded inputs."""

    def apply_fn(x):
        if fused_supported(model, x.shape):
            return fno2d_forward_fused(model, variables, x,
                                       interpret=interpret)
        return model.apply(variables, x)

    return jax.jit(apply_fn)


def _dense(p, x):
    return jnp.einsum("...i,io->...o", x, p["kernel"],
                      precision=_fno.PRECISION) + p["bias"]


# ---------------------------------------------------------------------------
# trainable fused block: Pallas forward, XLA backward (custom_vjp)
#
# Training is activation-HBM-bound (BASELINE.md training roofline): each XLA
# Fourier block streams the [B, W, V, Nx, Ny] activation through HBM 4-6
# times per forward, and an AR training step runs ~80 forward-equivalents
# (rollout chunks x forward + remat recompute + backward). Routing every
# FORWARD leg — including the remat recompute inside the backward of
# jax.checkpoint — through the one-VMEM-pass fused kernel cuts those legs to
# 2 HBM passes per block; the backward leg keeps XLA math (exact flax
# gradients by construction: the vjp rule IS the flax block).
# ---------------------------------------------------------------------------


def _block_xla(z, bp, x3, m1, m2):
    """XLA math of one Fourier block on [B, W, V, Nx, Ny] — the
    differentiation rule for the fused Pallas forward. Reuses the flax
    modules themselves so gradients match `model.apply`'s exactly.
    `bp` leaves not consumed here (the bias branch `_Channel1x1_1`) get
    zero cotangents; their gradients flow through the `x3` input, computed
    differentiably outside."""
    from .fno import SpectralConv2d, _Channel1x1, _ChannelMLP

    w, nv = z.shape[1], z.shape[2]
    x1 = SpectralConv2d(w, w, nv, m1, m2).apply(
        {"params": bp["SpectralConv2d_0"]}, z)
    x1 = _ChannelMLP(w, w).apply({"params": bp["_ChannelMLP_0"]}, x1)
    x2 = _Channel1x1(w).apply({"params": bp["_Channel1x1_0"]}, z)
    return jax.nn.gelu(x1 + x2 + x3, approximate=False)


def _fused_block_primal(z, bp, x3, m1, m2, interpret):
    nx = z.shape[3]
    pad = (-nx) % 8
    if pad:
        widths = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
        out = fno_block2d_fused(jnp.pad(z, widths), bp, jnp.pad(x3, widths),
                                m1, m2, nx_true=nx, interpret=interpret)
        return out[:, :, :, :nx, :]
    return fno_block2d_fused(z, bp, x3, m1, m2, interpret=interpret)


def _bwd_grads_to_tree(bp, outs, m1):
    """Map the fused backward kernel's outputs onto the block-param pytree
    (inverse of `_repack_spectral`; the bias branch `_Channel1x1_1` gets
    zeros here — its gradient flows through the x3 cotangent outside)."""
    dx, dwcr, dwci, da1, db1, da2, db2, daw, dbw, dx3 = outs
    dwr = jnp.swapaxes(dwcr, 3, 4)                   # [in, out, V, K, m2]
    dwi = jnp.swapaxes(dwci, 3, 4)
    g_bp = {
        "SpectralConv2d_0": {
            "weights1_re": dwr[:, :, :, :m1], "weights2_re": dwr[:, :, :, m1:],
            "weights1_im": dwi[:, :, :, :m1], "weights2_im": dwi[:, :, :, m1:],
        },
        "_ChannelMLP_0": {
            "Dense_0": {"kernel": da1, "bias": db1.reshape(-1)},
            "Dense_1": {"kernel": da2, "bias": db2.reshape(-1)},
        },
        "_Channel1x1_0": {"Dense_0": {"kernel": daw, "bias": dbw.reshape(-1)}},
        "_Channel1x1_1": jax.tree_util.tree_map(
            jnp.zeros_like, bp["_Channel1x1_1"]),
    }
    return dx, g_bp, dx3


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_block_trainable(z, bp, x3, m1, m2, interpret, bwd_impl="pallas"):
    return _fused_block_primal(z, bp, x3, m1, m2, interpret)


def _fused_block_fwd(z, bp, x3, m1, m2, interpret, bwd_impl):
    return _fused_block_primal(z, bp, x3, m1, m2, interpret), (z, bp, x3)


def _fused_block_bwd(m1, m2, interpret, bwd_impl, res, g):
    z, bp, x3 = res
    if bwd_impl == "pallas":
        from ..ops.pallas.fno_block import (fno_block2d_bwd_fused,
                                            fused_block_bwd_vmem_est)
        from ..ops.pallas.stencil_kernels import _VMEM_CAP

        w = z.shape[1]
        w_mid = bp["_ChannelMLP_0"]["Dense_0"]["kernel"].shape[1]
        if fused_block_bwd_vmem_est(w, w_mid, z.shape[3], z.shape[4],
                                    m1, m2) <= _VMEM_CAP:
            nx = z.shape[3]
            pad = (-nx) % 8
            if pad:
                widths = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
                outs = fno_block2d_bwd_fused(
                    jnp.pad(z, widths), jnp.pad(g, widths), bp,
                    jnp.pad(x3, widths), m1, m2, nx_true=nx,
                    interpret=interpret)
                dx, g_bp, dx3 = _bwd_grads_to_tree(bp, outs, m1)
                return dx[:, :, :, :nx, :], g_bp, dx3[:, :, :, :nx, :]
            outs = fno_block2d_bwd_fused(z, g, bp, x3, m1, m2,
                                         interpret=interpret)
            return _bwd_grads_to_tree(bp, outs, m1)
    _, vjp = jax.vjp(lambda a, b, c: _block_xla(a, b, c, m1, m2), z, bp, x3)
    return vjp(g)


_fused_block_trainable.defvjp(_fused_block_fwd, _fused_block_bwd)


# ---------------------------------------------------------------------------
# fused projection head (fc1 -> gelu -> fc2): the 256-wide projection
# activation is the model's largest tensor; the kernel keeps it in VMEM
# (ops/pallas/fno_block.py::projection2d_fused). custom_vjp so training
# backward also avoids materialising it (Pallas bwd, XLA-vjp fallback).
# ---------------------------------------------------------------------------


def _projection_xla(z, fc1, fc2):
    h = _dense(fc1, z)
    h = jax.nn.gelu(h, approximate=False)
    return _dense(fc2, h)


def _projection_supported(z_shape, fc1, fc2) -> bool:
    from ..ops.pallas.fno_block import projection_vmem_est
    from ..ops.pallas.stencil_kernels import _VMEM_CAP

    _, _, nx, ny, w = z_shape
    w_proj, step = fc2["kernel"].shape
    ny_pad = ny + ((-ny) % 8)
    return projection_vmem_est(w, w_proj, step, nx, ny_pad) * 2 <= _VMEM_CAP


def _fused_projection_primal(z, fc1, fc2, interpret):
    from ..ops.pallas.fno_block import projection2d_fused

    b, nv, nx, ny, _ = z.shape
    pad = (-ny) % 8
    if pad:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
    out = projection2d_fused(z, fc1, fc2, interpret=interpret)
    # kernel emits the flattened [B, V, Nx*Ny_pad, step] plane (Mosaic
    # cannot split the lane dim in-kernel); un-flatten + crop here.
    out = out.reshape(b, nv, nx, ny + pad, -1)
    if pad:
        out = out[:, :, :, :ny]
    return out                               # [B, V, Nx, Ny, step]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_projection(z, fc1, fc2, interpret, bwd_impl="pallas"):
    return _fused_projection_primal(z, fc1, fc2, interpret)


def _fused_projection_fwd(z, fc1, fc2, interpret, bwd_impl):
    return _fused_projection_primal(z, fc1, fc2, interpret), (z, fc1, fc2)


def _fused_projection_bwd(interpret, bwd_impl, res, g):
    z, fc1, fc2 = res
    if bwd_impl == "pallas":
        from ..ops.pallas.fno_block import projection2d_bwd_fused

        b, nv, nx, ny, _ = z.shape
        pad = (-ny) % 8
        if pad:
            widths5 = ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0))
            zk = jnp.pad(z, widths5)
            gk = jnp.pad(g, widths5)
        else:
            zk, gk = z, g
        # kernel takes the cotangent in its flattened [B, V, S, step]
        # output layout (pad rows are zero by construction of gk's pad).
        gk = gk.reshape(b, nv, nx * (ny + pad), -1)
        dz, da1, db1, da2, db2 = projection2d_bwd_fused(
            zk, gk, fc1, fc2, interpret=interpret)
        if pad:
            dz = dz[:, :, :, : ny]
        return (dz,
                {"kernel": da1, "bias": db1.reshape(-1)},
                {"kernel": da2, "bias": db2.reshape(-1)})
    _, vjp = jax.vjp(lambda a, b, c: _projection_xla(a, b, c), z, fc1, fc2)
    return vjp(g)


_fused_projection.defvjp(_fused_projection_fwd, _fused_projection_bwd)


def make_fused_train_apply(model: FNO2d, interpret=None,
                           bwd_impl: str = "pallas"):
    """Differentiable `apply_fn(variables, x)` whose six Fourier-block
    forwards run the fused Pallas kernel — a drop-in for `model.apply` in
    `train.loops.fit`/`make_train_step` (the remat recompute legs ride the
    fused kernel too). The backward rule has the exact flax block's
    gradient semantics, computed by `bwd_impl`:

      'pallas' (default): the fused backward kernel — recompute + ALL
        gradients in one VMEM pass per (sample, variable), weight grads
        accumulated in resident blocks (falls back to XLA when its VMEM
        bound is exceeded);
      'xla': jax.vjp of the flax block math.

    Dropout-free configs only; unsupported shapes fall back to
    `model.apply` per call (gradients then come from flax directly)."""

    def apply_fn(variables, x):
        if model.dropout_rate != 0.0 or not fused_supported(model, x.shape):
            return model.apply(variables, x)
        p = variables["params"]
        grid = model.get_grid(x.shape)
        h = jnp.concatenate((x, grid), axis=-1)
        h = _dense(p["fc0_time"], h)
        h = jnp.transpose(h, (0, 4, 1, 2, 3))        # [B, W, V, Nx, Ny]
        grid_c = jnp.transpose(grid[:1], (0, 4, 1, 2, 3))

        def blk(name, z):
            bp = p[name]
            x3 = _bias_branch(bp, grid_c)
            return _fused_block_trainable(z, bp, x3, model.modes1,
                                          model.modes2, interpret, bwd_impl)

        x0 = blk("f0", h)
        z = blk("f1", x0)
        z = blk("f2", z) + x0
        x1 = blk("f3", z)
        z = blk("f4", x1)
        z = blk("f5", z) + x1

        z = jnp.transpose(z, (0, 2, 3, 4, 1))        # [B, V, Nx, Ny, W]
        if _projection_supported(z.shape, p["fc1_time"], p["fc2_time"]):
            return _fused_projection(z, p["fc1_time"], p["fc2_time"],
                                     interpret, bwd_impl)
        z = _dense(p["fc1_time"], z)
        z = jax.nn.gelu(z, approximate=False)
        return _dense(p["fc2_time"], z)

    return apply_fn


def _bias_branch(block_p, grid_c):
    """b(grid): batch-constant [1, W, V, Nx, Ny] (channel Dense on the
    coordinate grid), precomputed in XLA per block."""
    g = jnp.moveaxis(grid_c, 1, -1)
    out = _dense(block_p["_Channel1x1_1"]["Dense_0"], g)
    return jnp.moveaxis(out, -1, 1)


def fno2d_forward_fused(model: FNO2d, variables, x, interpret=None):
    """[BS, Nvar, Nx, Ny, T_in] -> [BS, Nvar, Nx, Ny, step], identical math
    to `model.apply(variables, x)` for dropout-free configs.

    Non-8-aligned Nx (e.g. the NS flagship's 100x100 grid) is zero-padded
    to the sublane multiple ONCE before the block chain and cropped after:
    the blocks' DFT tables are zero at padded positions, so pad-lane
    values (garbage after the first block's bias+gelu) never mix into real
    rows — every other per-block op is pointwise in space."""
    assert model.dropout_rate == 0.0, "fused forward is inference-only"
    p = variables["params"]
    nx = x.shape[2]
    grid = model.get_grid(x.shape)
    h = jnp.concatenate((x, grid), axis=-1)
    h = _dense(p["fc0_time"], h)
    h = jnp.transpose(h, (0, 4, 1, 2, 3))            # [B, W, V, Nx, Ny]
    grid_c = jnp.transpose(grid[:1], (0, 4, 1, 2, 3))

    pad = (-nx) % 8
    if pad:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        grid_c = jnp.pad(grid_c,
                         ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))

    def blk(name, z):
        bp = p[name]
        x3 = _bias_branch(bp, grid_c)
        return fno_block2d_fused(z, bp, x3, model.modes1, model.modes2,
                                 nx_true=nx, interpret=interpret)

    x0 = blk("f0", h)
    z = blk("f1", x0)
    z = blk("f2", z) + x0
    x1 = blk("f3", z)
    z = blk("f4", x1)
    z = blk("f5", z) + x1

    if pad:
        z = z[:, :, :, :nx, :]
    z = jnp.transpose(z, (0, 2, 3, 4, 1))            # [B, V, Nx, Ny, W]
    if _projection_supported(z.shape, p["fc1_time"], p["fc2_time"]):
        return _fused_projection_primal(z, p["fc1_time"], p["fc2_time"],
                                        interpret)
    z = _dense(p["fc1_time"], z)
    z = jax.nn.gelu(z, approximate=False)
    return _dense(p["fc2_time"], z)
