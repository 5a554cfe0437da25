"""Spatially-sharded 2-D FFT and spectral convolution (shard_map + all_to_all).

SURVEY §5 names "sharded rFFT" as the scale-out decision for fields too
large for one chip. A 2-D FFT factorises into two batched 1-D FFTs with a
transpose between them, and the transpose is the only communication:

    x [..., Nx(sharded over 'sp'), Ny]
      --local fft over y-->        [..., nx, Ny] complex
      --all_to_all (Ny -> Ny/S, gather Nx)-->  [..., Nx, Ny/S]
      --local fft over x-->        spectrum sharded over the y axis

`ifft2_sharded` inverts the pipeline (local ifft over x, transpose back,
local ifft over y), so a forward->pointwise->inverse round trip costs
exactly two all_to_all collectives on ICI — the minimum for a distributed
2-D FFT. Consumers: spectral solvers at large N (`solvers/ns2d_spectral`,
`wave2d_spectral` run fft2/ifft2 per step) and large-field spectral
convolution (`ops/fftconv`). At the reference's grid sizes (64^2..400^2 —
`Joint/NS_Residuals_CP.py:77`) a single v5e core fits the whole field and
replicated FFT + dp over the batch is faster (no transpose traffic); these
primitives are for the Nx >> 1k regime. See DESIGN.md "Sharded spectral
path".
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["fft2_sharded", "ifft2_sharded", "spectral_circular_conv_sharded"]


def _specs(ndim: int, axis_name: str, dim: int):
    spec = [None] * ndim
    spec[dim] = axis_name
    return P(*spec)


def fft2_sharded(x, mesh: Mesh, axis: str = "sp"):
    """2-D FFT over the last two axes of `x`, with axis -2 (Nx) sharded over
    mesh axis `axis` on input. Returns the complex spectrum sharded over
    axis -1 (the transposed layout — feed it to `ifft2_sharded` or do the
    pointwise work in that layout to avoid a third all_to_all)."""
    x = jnp.asarray(x)
    n_shards = mesh.shape[axis]
    assert x.shape[-2] % n_shards == 0 and x.shape[-1] % n_shards == 0, (
        f"Nx and Ny must divide the mesh axis ({x.shape[-2:]} vs {n_shards})")

    def local(blk):
        f = jnp.fft.fft(blk, axis=-1)                      # [.., nx, Ny]
        # transpose: scatter y, gather x  ->  [.., Nx, Ny/S]
        f = lax.all_to_all(f, axis, split_axis=f.ndim - 1,
                           concat_axis=f.ndim - 2, tiled=True)
        return jnp.fft.fft(f, axis=-2)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(_specs(x.ndim, axis, x.ndim - 2),),
                   out_specs=_specs(x.ndim, axis, x.ndim - 1))
    return fn(x)


def ifft2_sharded(X, mesh: Mesh, axis: str = "sp"):
    """Inverse of `fft2_sharded`: takes the y-sharded spectrum, returns the
    x-sharded spatial field (complex; take .real for real signals)."""
    X = jnp.asarray(X)

    def local(blk):
        f = jnp.fft.ifft(blk, axis=-2)                     # [.., Nx, ny]
        f = lax.all_to_all(f, axis, split_axis=f.ndim - 2,
                           concat_axis=f.ndim - 1, tiled=True)
        return jnp.fft.ifft(f, axis=-1)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(_specs(X.ndim, axis, X.ndim - 1),),
                   out_specs=_specs(X.ndim, axis, X.ndim - 2))
    return fn(X)


def spectral_circular_conv_sharded(field, kernel, mesh: Mesh, axis: str = "sp",
                                   correlation: bool = True):
    """Periodic (circular) spectral correlation of an x-sharded field with a
    small replicated kernel: sharded fft2 -> pointwise multiply (kernel
    spectrum computed once, replicated, sliced to the local y chunk) ->
    sharded ifft2. Matches the single-device
    `ifft2(fft2(field) * conj(fft2(kernel_padded)))` bitstream up to FFT
    rounding; correlation=True conjugates the kernel spectrum, matching the
    ConvOps correlation convention (`Utils/fft_conv_pytorch/fft_conv.py:110`).
    """
    field = jnp.asarray(field)
    kernel = np.asarray(kernel)
    Nx, Ny = field.shape[-2], field.shape[-1]
    kx, ky = kernel.shape[-2], kernel.shape[-1]
    n_shards = mesh.shape[axis]

    # centred zero-pad + roll so the kernel origin sits at (0, 0): circular
    # correlation with SAME alignment (output[i] = sum_k k[c+d] f[i+d])
    pad = np.zeros(field.shape[-2:], dtype=kernel.dtype)
    pad[:kx, :ky] = kernel
    pad = np.roll(pad, (-(kx // 2), -(ky // 2)), axis=(0, 1))
    k_fr = np.fft.fft2(pad)
    if correlation:
        k_fr = np.conj(k_fr)
    k_fr = jnp.asarray(k_fr)  # [Nx, Ny] replicated

    X = fft2_sharded(field, mesh, axis)  # y-sharded spectrum

    def mul_local(Xb):
        idx = lax.axis_index(axis)
        chunk = Ny // n_shards
        k_loc = lax.dynamic_slice_in_dim(k_fr, idx * chunk, chunk, axis=-1)
        return Xb * k_loc

    mul = shard_map(mul_local, mesh=mesh,
                    in_specs=(_specs(field.ndim, axis, field.ndim - 1),),
                    out_specs=_specs(field.ndim, axis, field.ndim - 1))
    out = ifft2_sharded(mul(X), mesh, axis)
    return jnp.real(out)
