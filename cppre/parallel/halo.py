"""Spatially-sharded stencil convolution via shard_map halo exchange.

For fields too large for one chip ([BS, Nt, Nx, Ny] with big Nx), shard the
x axis over a mesh axis and exchange k//2 ghost rows with the two ring
neighbours by `lax.ppermute` over ICI, then run the fused shift-add stencil
on each local block. Matches `ConvOperator.convolution`'s SAME zero-pad
semantics exactly (outermost global edges are zero-padded, interior shard
boundaries use true neighbour data).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.convops import stencil_shift_add

__all__ = ["stencil_conv_sharded", "stencil_conv_sharded_2d"]


def _check_halo(halo: int, size: int, ax: int):
    if halo > size:
        raise ValueError(
            f"stencil halo ({halo}) exceeds the local shard extent ({size}) "
            f"on axis {ax}: ring exchange only reaches immediate neighbours; "
            f"use fewer shards or a narrower kernel")


def stencil_conv_sharded(field, kernel: np.ndarray, mesh: Mesh,
                         axis: str = "sp", spatial_axis: int = -2):
    """Cross-correlate `field` with a constant stencil, with `spatial_axis`
    sharded over mesh axis `axis`.

    field: [..., Nx, Ny] (spatial_axis must index Nx and be divisible by the
    mesh axis size). Returns the SAME-padded correlation, bitwise equal to
    the single-device `direct_conv(field, kernel)`.
    """
    kernel = np.asarray(kernel)
    nd = kernel.ndim
    halo = kernel.shape[spatial_axis] // 2
    ax = spatial_axis % jnp.ndim(field)
    n_shards = mesh.shape[axis]

    in_spec = [None] * jnp.ndim(field)
    in_spec[ax] = axis
    spec = P(*in_spec)

    def local(block):
        idx = lax.axis_index(axis)
        _check_halo(halo, block.shape[ax], ax)
        # exchange halo slabs with ring neighbours
        lo = lax.slice_in_dim(block, 0, halo, axis=ax)                  # my first rows
        hi = lax.slice_in_dim(block, block.shape[ax] - halo, block.shape[ax], axis=ax)
        # neighbour i-1's hi becomes my left ghost; i+1's lo my right ghost
        left_ghost = lax.ppermute(hi, axis, [(i, (i + 1) % n_shards) for i in range(n_shards)])
        right_ghost = lax.ppermute(lo, axis, [(i, (i - 1) % n_shards) for i in range(n_shards)])
        # zero the global edges (SAME zero-pad semantics, not periodic)
        left_ghost = jnp.where(idx == 0, jnp.zeros_like(left_ghost), left_ghost)
        right_ghost = jnp.where(idx == n_shards - 1, jnp.zeros_like(right_ghost), right_ghost)
        ext = jnp.concatenate([left_ghost, block, right_ghost], axis=ax)

        # SAME-pad every kernel dim except the sharded one (already extended)
        pads = [(0, 0)] * jnp.ndim(block)
        for d in range(nd):
            full_ax = jnp.ndim(block) - nd + d
            if full_ax != ax:
                pads[full_ax] = (kernel.shape[d] // 2, kernel.shape[d] // 2)
        ext = jnp.pad(ext, pads)
        return stencil_shift_add(ext, kernel, same=False)

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(jnp.asarray(field))


def _exchange_axis(block, halo: int, ax: int, axis_name: str, n_shards: int):
    """Extend `block` along `ax` with halo slabs from the two ring
    neighbours over `axis_name`; global edges get zeros (SAME zero-pad)."""
    idx = lax.axis_index(axis_name)
    size = block.shape[ax]
    _check_halo(halo, size, ax)
    lo = lax.slice_in_dim(block, 0, halo, axis=ax)
    hi = lax.slice_in_dim(block, size - halo, size, axis=ax)
    left_ghost = lax.ppermute(hi, axis_name,
                              [(i, (i + 1) % n_shards) for i in range(n_shards)])
    right_ghost = lax.ppermute(lo, axis_name,
                               [(i, (i - 1) % n_shards) for i in range(n_shards)])
    left_ghost = jnp.where(idx == 0, jnp.zeros_like(left_ghost), left_ghost)
    right_ghost = jnp.where(idx == n_shards - 1,
                            jnp.zeros_like(right_ghost), right_ghost)
    return jnp.concatenate([left_ghost, block, right_ghost], axis=ax)


def stencil_conv_sharded_2d(field, kernel: np.ndarray, mesh: Mesh,
                            axes: tuple[str, str] = ("spx", "spy"),
                            spatial_axes: tuple[int, int] = (-2, -1)):
    """(x, y) 2-D spatial decomposition of the halo-exchange stencil conv:
    both trailing spatial axes sharded over their own mesh axis, matching
    the square NS/MHD reference grids (`Joint/NS_Residuals_CP.py:77`).

    Exchanging x halos FIRST and then exchanging y halos OF THE X-EXTENDED
    block forwards the corner ghosts for free (the y slabs already carry the
    neighbours' x ghosts), so dense k x k stencils with diagonal taps are
    exact. Bitwise-equal to single-device `direct_conv(field, kernel)`.
    """
    kernel = np.asarray(kernel)
    nd = kernel.ndim
    ndim = jnp.ndim(field)
    ax_x = spatial_axes[0] % ndim
    ax_y = spatial_axes[1] % ndim
    # kernel dims align to the LAST nd field axes
    kdim_x = nd - (ndim - ax_x)
    kdim_y = nd - (ndim - ax_y)
    halo_x = kernel.shape[kdim_x] // 2
    halo_y = kernel.shape[kdim_y] // 2
    nx_shards = mesh.shape[axes[0]]
    ny_shards = mesh.shape[axes[1]]

    in_spec = [None] * ndim
    in_spec[ax_x], in_spec[ax_y] = axes[0], axes[1]
    spec = P(*in_spec)

    def local(block):
        ext = _exchange_axis(block, halo_x, ax_x, axes[0], nx_shards)
        ext = _exchange_axis(ext, halo_y, ax_y, axes[1], ny_shards)
        # SAME-pad the remaining kernel dims (e.g. time) locally
        pads = [(0, 0)] * ndim
        for d in range(nd):
            full_ax = ndim - nd + d
            if full_ax not in (ax_x, ax_y):
                pads[full_ax] = (kernel.shape[d] // 2, kernel.shape[d] // 2)
        ext = jnp.pad(ext, pads)
        return stencil_shift_add(ext, kernel, same=False)

    fn = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return fn(jnp.asarray(field))
