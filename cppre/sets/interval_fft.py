"""Interval FFT: propagate per-cell intervals through DFT -> complex
multiply -> inverse DFT.

Object API mirrors the reference (`intervalFFT.py`): `interval_fft` turns N
real intervals into N frequency-domain zonotopes (each input's radius
becomes one generator rotated by the DFT twiddle, :74-110), `complex_prod`
rotates+scales a zonotope by a precise complex number (:6-27),
`inverse_interval_fft` maps back (:113+), `real_interval` extracts the real
part's interval hull.

TPU-native fast path: every step is a linear map, so the zonotope pipeline
collapses to
    centers:  c_out = ifft(fft(c) * C)
    radii:    rad_k = (1/N) * sum_{h,j} r_j * |Re(C_h e^{2*pi*i*h(k-j)/N})|
— one twiddle-tensor contraction (`propagate_through_deconvolution`),
bit-identical to summing |Re(.)| over the reference's N^2 generators.
"""

from __future__ import annotations

import numpy as np

from .zonotope import Zonotope

__all__ = [
    "interval_fft",
    "inverse_interval_fft",
    "complex_prod",
    "real_interval",
    "propagate_through_deconvolution",
]


def complex_prod(Z: Zonotope, C: complex) -> Zonotope:
    """Multiply a complex-plane zonotope by the precise complex C
    (rotation by arg(C) + scaling by |C|; intervalFFT.py:6-27)."""
    scale = abs(C)
    angle = np.arctan2(C.imag, C.real)
    rot = np.array([[np.cos(angle), -np.sin(angle)],
                    [np.sin(angle), np.cos(angle)]])
    return scale * Z.linear_map(rot)


def interval_fft(intervals) -> list[Zonotope]:
    """[(lo, hi)] x N -> N zonotopes, one per frequency. Input k with
    centre c_k and radius r_k contributes the generator
    r_k (cos th, -sin th), th = 2 pi k h / N (intervalFFT.py:74-110)."""
    intervals = [(float(lo), float(hi)) for lo, hi in intervals]
    c = np.array([(lo + hi) / 2 for lo, hi in intervals])
    r = np.array([(hi - lo) / 2 for lo, hi in intervals])
    N = len(c)
    k = np.arange(N)
    out = []
    c_fft = np.fft.fft(c)
    for h in range(N):
        theta = 2 * np.pi * k * h / N
        gens = np.vstack((r * np.cos(theta), -r * np.sin(theta)))  # [2, N]
        center = np.array([c_fft[h].real, c_fft[h].imag])
        out.append(Zonotope(center, gens))
    return out


def inverse_interval_fft(zonotopes: list[Zonotope]) -> list[Zonotope]:
    """Inverse DFT over complex-plane zonotopes: output k sums every
    frequency's zonotope rotated by +2 pi h k / N, scaled 1/N."""
    N = len(zonotopes)
    out = []
    for k in range(N):
        centers = []
        gen_blocks = []
        for h, Z in enumerate(zonotopes):
            theta = 2 * np.pi * h * k / N
            rot = np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]])
            centers.append(rot @ Z.center)
            gen_blocks.append(rot @ Z.generators)
        center = np.sum(centers, axis=0) / N
        gens = np.hstack(gen_blocks) / N
        out.append(Zonotope(center, gens))
    return out


def real_interval(Z: Zonotope):
    """Interval hull of the real (first) coordinate (reference `Real`)."""
    lo, hi = Z.interval_hull()
    return float(lo[0]), float(hi[0])


def propagate_through_deconvolution(centers, radii, multipliers):
    """Vectorized interval FFT -> per-frequency complex multiply ->
    inverse interval FFT -> real-part intervals.

    centers, radii: [..., N] real arrays (the input intervals c +- r;
    leading dims are an optional batch of independent interval vectors).
    multipliers: [N] complex per-frequency factors (e.g. 1/(K_hat + eps)).
    Returns (out_centers [..., N], out_radii [..., N]) for the real part.

    Equivalent to real_interval(inverse_interval_fft([complex_prod(z, C)
    for z, C in zip(interval_fft(...), multipliers)])) but as three dense
    contractions (jit/vmap-able, runs on the MXU for large N; the lag
    kernel `w` is shared across the whole batch, so batched propagation is
    one [.., N] x [N, N] matmul).
    """
    import jax.numpy as jnp

    c = jnp.asarray(centers, jnp.float32)
    r = jnp.asarray(radii, c.dtype)
    C = jnp.asarray(multipliers)
    N = c.shape[-1]
    out_centers = jnp.real(jnp.fft.ifft(jnp.fft.fft(c, axis=-1) * C, axis=-1))

    # rad_k = 1/N * sum_j r_j * w[(k - j) mod N] where
    # w[m] = sum_h |Re(C_h e^{2 pi i h m / N})| — the kernel depends only on
    # the circular lag m, so the radius map is an O(N^2) circular
    # correlation instead of a dense [N, N, N] twiddle tensor.
    h = jnp.arange(N)
    m = jnp.arange(N)
    phase = jnp.exp(2j * jnp.pi * m[:, None] * h[None, :] / N)  # [m, h]
    w = jnp.sum(jnp.abs(jnp.real(C[None, :] * phase)), axis=1)  # [m]
    lag = (h[:, None] - h[None, :]) % N  # [k, j]
    out_radii = r @ (w[lag].T) / N
    return out_centers, out_radii
