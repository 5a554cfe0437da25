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
from jax.experimental.shard_map import shard_map

from ..ops.convops import stencil_shift_add

__all__ = ["stencil_conv_sharded"]


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
