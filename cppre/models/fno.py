"""Multivariate Fourier Neural Operators in flax.linen.

Behavioral spec: `/root/reference/Other_UQ/Bayesian_Models/Base_FNO.py`
(`SpectralConv2d` :28-68, `FNO2d` block :84-107, `FNO_multi2d` :111-202,
1-D variants :211-372) — the in-repo copy of the external
`Neural_PDE.Models.FNO` used by every experiment.

TPU-first design decisions (vs a torch translation):

* **Split-complex spectral weights.** The reference keeps `cfloat` parameter
  tensors and does a complex einsum. TPUs have no complex ALU — XLA would
  decompose it anyway, and complex leaves complicate optimizers/SWAG (the
  reference needs special-casing, `SWAG.py:20-31`). We store real/imag as two
  real leaves and emit the 4-real-einsum product explicitly; each einsum is a
  `width x width` channel contraction batched over (var, kx, ky) — an MXU
  matmul.
* **Mode-corner update via `dynamic_update_slice`** (`.at[].set`) into a
  zeros spectrum instead of torch's in-place slice assignment — identical
  semantics, fuses under jit.
* Everything is a pure function of `(params, x)`: rollout composes with
  `lax.scan`, calibration with `vmap`, and multi-chip batch sharding with
  `pjit` with no model changes.

I/O contract (identical to the reference):
  FNO2d: [BS, Nvar, Nx, Ny, T_in] -> [BS, Nvar, Nx, Ny, step]
  FNO1d: [BS, Nvar, Nx, T_in]     -> [BS, Nvar, Nx, step]
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "SpectralConv1d",
    "SpectralConv2d",
    "FNO1d",
    "FNO2d",
    "FNO_multi1d",
    "FNO_multi2d",
    "count_params",
]


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=0.0, maxval=scale)

    return init


# All channel contractions run at full f32 MXU precision. The TPU default
# (bf16 multiplies) makes the forward pass BATCH-SHAPE-DEPENDENT: different
# batch sizes tile the MXU differently and round differently — measured
# max|d| = 0.087 on an O(1)-scale single FNO step between bs=200 and
# bs=100, amplified ~4x through a 20-step AR rollout. That noise (a) breaks
# exchangeability between calibration and prediction rollouts evaluated at
# different batch shapes (observed as total joint-CP coverage collapse) and
# (b) inflates the physics residuals CP calibrates on. f32 contraction
# removes both; the FLOPs live in the FFTs either way.
PRECISION = jax.lax.Precision.HIGHEST


from contextlib import contextmanager


@contextmanager
def precision_scope(precision):
    """Temporarily rebind the package matmul precision (read at TRACE time
    by every einsum/Dense above).

    The CP phase NEEDS `HIGHEST` (see the PRECISION comment: default-bf16
    MXU passes make the forward batch-shape-dependent, which breaks
    calibration/prediction exchangeability) — but TRAINING does not: SGD
    noise dwarfs bf16 rounding, and each `HIGHEST` f32 matmul costs ~6 MXU
    passes where the default costs 1. Wrap only the training apply:

        fast_apply = with_matmul_precision(model.apply, "default")

    and keep the calibration/prediction rollouts on the unwrapped apply."""
    global PRECISION
    if isinstance(precision, str):
        precision = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[precision]
    old = PRECISION
    PRECISION = precision
    try:
        yield
    finally:
        PRECISION = old


def with_matmul_precision(apply_fn, precision):
    """Wrap `apply_fn` so every call (and therefore every jit TRACE of it)
    runs under `precision_scope(precision)` — composes with jit/remat/scan
    because the scope is active whenever the tracer walks the body."""

    def wrapped(*args, **kwargs):
        with precision_scope(precision):
            return apply_fn(*args, **kwargs)

    return wrapped


# Optional trace-time activation dtype for TRAINING (None = native f32).
# The training forward is activation-HBM-bound (BASELINE.md roofline: the
# precision sweep moved the step <=18%, i.e. the MXU pass count no longer
# binds — the ~105 MB width-32 activation tensors streamed several times per
# block do). Storing those activations in bf16 halves the bound resource.
# Like PRECISION, read at TRACE time by the spectral helpers below.
ACT_DTYPE = None


@contextmanager
def activation_dtype_scope(dtype):
    """Temporarily rebind the activation dtype the spectral helpers emit
    (same trace-time mechanism as `precision_scope`)."""
    global ACT_DTYPE
    old = ACT_DTYPE
    ACT_DTYPE = dtype
    try:
        yield
    finally:
        ACT_DTYPE = old


def with_activation_dtype(apply_fn, dtype=jnp.bfloat16):
    """Mixed-precision TRAINING apply: bf16 activations, f32 master params.

    The f32 params are cast to `dtype` at the call boundary (the cast's
    cotangent accumulates gradients back to f32 masters), the input is cast,
    the whole forward runs — and under remat, recomputes — in `dtype`, and
    the output is cast back to f32 for the loss. bf16 shares f32's exponent
    range, so no loss scaling is needed.

    TRAINING ONLY: calibration/prediction rollouts must keep the unwrapped
    f32 apply — CP exchangeability constrains those (see PRECISION above),
    and the physics residual is a near-cancellation that bf16 fields cannot
    resolve (BASELINE.md "bf16 field storage"). SGD, by contrast, only sees
    bf16 rounding as gradient noise far below the minibatch variance
    (A/B: `scripts/train_precision_ab.py bf16act`).
    """

    def wrapped(params, *args, **kwargs):
        cast = lambda w: w.astype(dtype) if w.dtype == jnp.float32 else w
        p = jax.tree_util.tree_map(cast, params)
        args = tuple(
            a.astype(dtype)
            if isinstance(a, jnp.ndarray) and a.dtype == jnp.float32 else a
            for a in args)
        with activation_dtype_scope(dtype):
            out = apply_fn(p, *args, **kwargs)
        return jax.tree_util.tree_map(
            lambda o: o.astype(jnp.float32) if o.dtype == dtype else o, out)

    return wrapped


def _cmul(xr, xi, wr, wi, eq):
    """Complex einsum via 4 real einsums (returns re, im)."""
    out_t = jnp.float32 if ACT_DTYPE is None else ACT_DTYPE
    kw = dict(preferred_element_type=out_t, precision=PRECISION)
    re = jnp.einsum(eq, xr, wr, **kw) - jnp.einsum(eq, xi, wi, **kw)
    im = jnp.einsum(eq, xr, wi, **kw) + jnp.einsum(eq, xi, wr, **kw)
    return re, im


# ---------------------------------------------------------------------------
# Truncated DFT as matmuls — the TPU-native spectral transform.
#
# jnp.fft on TPU lowers to a generic FFT that dominates the FNO forward
# (measured 15.7 ms of a 25.6 ms forward at the wave-flagship shape,
# `scripts/probe_fno_parts.py`), while the model only ever USES modes1 x
# modes2 low modes. Computing exactly those modes as dense DFT matmuls
# ([.., N] @ [N, m] per axis) runs on the MXU at ~22x the FFT pair's speed
# and is mathematically identical to rfft -> truncate -> mix -> zero-pad ->
# irfft (parity asserted in tests/test_models.py). 'fft' remains available
# via `spectral_impl` for cross-checking and for large-mode regimes where
# O(N log N) wins.
# ---------------------------------------------------------------------------


def _dft_basis(n: int, freqs, dtype=jnp.float32):
    """cos/sin tables F[x, k] for e^{-2 pi i k x / n} (built in f64)."""
    import numpy as np

    ang = -2.0 * np.pi * np.outer(np.arange(n), np.asarray(freqs)) / n
    return (jnp.asarray(np.cos(ang), dtype),
            jnp.asarray(np.sin(ang), dtype))


def _irfft_weights(n: int, m: int, dtype=jnp.float32):
    """Hermitian-expansion weights for a one-sided spectrum of length m:
    1 for k = 0 (and the Nyquist bin if included), else 2. The sin table is
    identically 0 at those bins, so their imaginary parts drop exactly as
    in jnp.fft.irfft."""
    import numpy as np

    w = np.full(m, 2.0)
    w[0] = 1.0
    if n % 2 == 0 and m == n // 2 + 1:
        w[-1] = 1.0
    return jnp.asarray(w, dtype)


def _mm():
    # read the module global at TRACE time (like _cmul and nn.Dense), so
    # precision sweeps that rebind fno.PRECISION reach the DFT matmuls too
    return dict(precision=PRECISION)


def _dft_fwd_y(x, ny: int, m2: int):
    """Real [.., Ny] -> one-sided modes [.., m2] (re, im): 2 matmuls."""
    cy, sy = _dft_basis(ny, range(m2), x.dtype)
    return jnp.einsum("...y,ym->...m", x, cy, **_mm()), \
        jnp.einsum("...y,ym->...m", x, sy, **_mm())


def _dft_fwd_x(yr, yi, nx: int, freqs):
    """Complex [.., Nx, m2] -> modes [.., K, m2] over axis -2: 4 matmuls."""
    cx, sx = _dft_basis(nx, freqs, yr.dtype)
    re = jnp.einsum("...xm,xk->...km", yr, cx, **_mm()) \
        - jnp.einsum("...xm,xk->...km", yi, sx, **_mm())
    im = jnp.einsum("...xm,xk->...km", yr, sx, **_mm()) \
        + jnp.einsum("...xm,xk->...km", yi, cx, **_mm())
    return re, im


def _dft_inv_x(zr, zi, nx: int, freqs):
    """Modes [.., K, m2] -> complex [.., Nx, m2] via the conjugate basis
    (zero-padded full inverse FFT over x, without the 1/Nx factor)."""
    cx, sx = _dft_basis(nx, freqs, zr.dtype)
    re = jnp.einsum("...km,xk->...xm", zr, cx, **_mm()) \
        + jnp.einsum("...km,xk->...xm", zi, sx, **_mm())
    im = jnp.einsum("...km,xk->...xm", zi, cx, **_mm()) \
        - jnp.einsum("...km,xk->...xm", zr, sx, **_mm())
    return re, im


def _dft_inv_y(vr, vi, ny: int, m2: int):
    """One-sided modes [.., m2] -> real [.., Ny] (irfft semantics, without
    the 1/Ny factor): 2 matmuls with Hermitian weights."""
    cy, sy = _dft_basis(ny, range(m2), vr.dtype)
    w = _irfft_weights(ny, m2, vr.dtype)
    return jnp.einsum("...m,ym->...y", vr * w, cy, **_mm()) \
        + jnp.einsum("...m,ym->...y", vi * w, sy, **_mm())


class SpectralConv2d(nn.Module):
    """2-D Fourier layer: rFFT2 -> per-mode channel mixing -> irFFT2.

    Matches reference `SpectralConv2d` (Base_FNO.py:28-68): two complex weight
    tensors [in, out, nvars, m1, m2] act on the low-kx and high-kx corners of
    the one-sided spectrum; init is U[0, 1/in_channels] on re and im parts
    (torch.rand of a cfloat tensor).
    """

    in_channels: int
    out_channels: int
    num_vars: int
    modes1: int
    modes2: int
    spectral_impl: str = "dft"  # 'dft' (MXU matmuls, ~22x on TPU) or 'fft'

    @nn.compact
    def __call__(self, x):
        # x: [B, C_in, V, Nx, Ny] (real)
        nx, ny = x.shape[-2], x.shape[-1]
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / self.in_channels
        wshape = (self.in_channels, self.out_channels, self.num_vars, m1, m2)
        w1r = self.param("weights1_re", _uniform_init(scale), wshape)
        w1i = self.param("weights1_im", _uniform_init(scale), wshape)
        w2r = self.param("weights2_re", _uniform_init(scale), wshape)
        w2i = self.param("weights2_im", _uniform_init(scale), wshape)

        eq = "bivxy,iovxy->bovxy"
        # the dft path sums overlapping low/high kx contributions where the
        # fft path's .at[].set() would overwrite (2*m1 > nx), and its
        # Hermitian weights assume a one-sided m2 <= ny//2+1 — route such
        # configs through the fft reference semantics
        use_dft = (self.spectral_impl == "dft" and 2 * m1 <= nx
                   and m2 <= ny // 2 + 1)
        if use_dft:
            # exactly the low-kx and high-kx corner modes, via matmuls
            freqs = list(range(m1)) + list(range(nx - m1, nx))
            cdt = (x.dtype if x.dtype == jnp.float64 or ACT_DTYPE is not None
                   else jnp.float32)
            yr, yi = _dft_fwd_y(x.astype(cdt), ny, m2)
            xr, xi = _dft_fwd_x(yr, yi, nx, freqs)
            lo_r, lo_i = _cmul(xr[..., :m1, :], xi[..., :m1, :], w1r, w1i, eq)
            hi_r, hi_i = _cmul(xr[..., m1:, :], xi[..., m1:, :], w2r, w2i, eq)
            zr = jnp.concatenate([lo_r, hi_r], axis=-2)
            zi = jnp.concatenate([lo_i, hi_i], axis=-2)
            vr, vi = _dft_inv_x(zr, zi, nx, freqs)
            return _dft_inv_y(vr, vi, ny, m2) / (nx * ny)

        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(-2, -1))
        xr, xi = jnp.real(x_ft), jnp.imag(x_ft)

        lo_r, lo_i = _cmul(xr[..., :m1, :m2], xi[..., :m1, :m2], w1r, w1i, eq)
        hi_r, hi_i = _cmul(xr[..., -m1:, :m2], xi[..., -m1:, :m2], w2r, w2i, eq)

        out_shape = (x.shape[0], self.out_channels, self.num_vars, nx, ny // 2 + 1)
        out_r = jnp.zeros(out_shape, jnp.float32)
        out_i = jnp.zeros(out_shape, jnp.float32)
        lo_r, lo_i, hi_r, hi_i = (z.astype(jnp.float32)
                                  for z in (lo_r, lo_i, hi_r, hi_i))
        out_r = out_r.at[..., :m1, :m2].set(lo_r).at[..., nx - m1 :, :m2].set(hi_r)
        out_i = out_i.at[..., :m1, :m2].set(lo_i).at[..., nx - m1 :, :m2].set(hi_i)

        out_ft = jax.lax.complex(out_r, out_i)
        # the fft path computes in f32 (complex64); hand back the caller's
        # activation dtype so a bf16 training scope stays bf16 downstream
        return jnp.fft.irfft2(out_ft, s=(nx, ny), axes=(-2, -1)).astype(x.dtype)


class SpectralConv1d(nn.Module):
    """1-D Fourier layer (Base_FNO.py:211-246): single low-mode weight block."""

    in_channels: int
    out_channels: int
    num_vars: int
    modes1: int
    spectral_impl: str = "dft"  # 'dft' (MXU matmuls) or 'fft'

    @nn.compact
    def __call__(self, x):
        # x: [B, C_in, V, Nx]
        nx = x.shape[-1]
        m1 = self.modes1
        scale = 1.0 / self.in_channels
        wshape = (self.in_channels, self.out_channels, self.num_vars, m1)
        wr = self.param("weights1_re", _uniform_init(scale), wshape)
        wi = self.param("weights1_im", _uniform_init(scale), wshape)

        eq = "bivx,iovx->bovx"
        if self.spectral_impl == "dft" and m1 <= nx // 2 + 1:
            cdt = (x.dtype if x.dtype == jnp.float64 or ACT_DTYPE is not None
                   else jnp.float32)
            xr, xi = _dft_fwd_y(x.astype(cdt), nx, m1)
            lo_r, lo_i = _cmul(xr, xi, wr, wi, eq)
            return _dft_inv_y(lo_r, lo_i, nx, m1) / nx

        x_ft = jnp.fft.rfft(x.astype(jnp.float32), axis=-1)
        xr, xi = jnp.real(x_ft), jnp.imag(x_ft)
        lo_r, lo_i = _cmul(xr[..., :m1], xi[..., :m1], wr, wi, eq)

        out_shape = (x.shape[0], self.out_channels, self.num_vars, nx // 2 + 1)
        out_r = jnp.zeros(out_shape, jnp.float32).at[..., :m1].set(lo_r.astype(jnp.float32))
        out_i = jnp.zeros(out_shape, jnp.float32).at[..., :m1].set(lo_i.astype(jnp.float32))
        return jnp.fft.irfft(jax.lax.complex(out_r, out_i), n=nx,
                             axis=-1).astype(x.dtype)


class _ChannelMLP(nn.Module):
    """Two 1x1 convs over the channel axis (reference MLP1d/2d; 1x1 ConvNd is
    a channel matmul, so we use a Dense over a moved axis — same math, MXU
    shaped)."""

    out_channels: int
    mid_channels: int

    @nn.compact
    def __call__(self, x):
        # x: [B, C, ...spatial] -> move C last for Dense
        x = jnp.moveaxis(x, 1, -1)
        x = nn.Dense(self.mid_channels, precision=PRECISION)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out_channels, precision=PRECISION)(x)
        return jnp.moveaxis(x, -1, 1)


class _Channel1x1(nn.Module):
    """1x1 ConvNd == Dense over the channel axis."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.moveaxis(x, 1, -1)
        x = nn.Dense(self.out_channels, precision=PRECISION)(x)
        return jnp.moveaxis(x, -1, 1)


class _FNOBlock2d(nn.Module):
    """One Fourier block (Base_FNO.py:84-107):
    gelu(mlp(spectral(x)) + w(x) + b(grid)). With dropout_rate > 0, dropout
    follows the spectral-mlp branch (reference Dropout_FNO.py:99-102)."""

    modes1: int
    modes2: int
    num_vars: int
    width: int
    dropout_rate: float = 0.0
    spectral_impl: str = "dft"

    @nn.compact
    def __call__(self, x, grid, deterministic: bool = True):
        x1 = SpectralConv2d(self.width, self.width, self.num_vars, self.modes1,
                            self.modes2, spectral_impl=self.spectral_impl)(x)
        x1 = _ChannelMLP(self.width, self.width)(x1)
        if self.dropout_rate > 0.0:
            x1 = nn.Dropout(self.dropout_rate)(x1, deterministic=deterministic)
        x2 = _Channel1x1(self.width)(x)
        x3 = _Channel1x1(self.width)(grid)
        return nn.gelu(x1 + x2 + x3, approximate=False)


class _FNOBlock1d(nn.Module):
    modes1: int
    num_vars: int
    width: int
    spectral_impl: str = "dft"

    @nn.compact
    def __call__(self, x, grid):
        x1 = SpectralConv1d(self.width, self.width, self.num_vars, self.modes1,
                            spectral_impl=self.spectral_impl)(x)
        x1 = _ChannelMLP(self.width, self.width)(x1)
        x2 = _Channel1x1(self.width)(x)
        x3 = _Channel1x1(self.width)(grid)
        return nn.gelu(x1 + x2 + x3, approximate=False)


class FNO2d(nn.Module):
    """`FNO_multi2d(T_in, step, modes1, modes2, num_vars, width_time)`
    (Base_FNO.py:111-202): lift Linear(T_in+2 -> width), 6 Fourier blocks with
    skip-adds every 3 (:164-170), project Linear(width -> 256 -> step).

    [BS, Nvar, Nx, Ny, T_in] -> [BS, Nvar, Nx, Ny, step].
    """

    T_in: int
    step: int
    modes1: int
    modes2: int
    num_vars: int
    width_time: int
    width_vars: int = 0
    dropout_rate: float = 0.0  # > 0 gives FNO_multi2d_Dropout (Dropout_FNO.py:113-188)
    spectral_impl: str = "dft"  # 'dft' (MXU matmuls) or 'fft' (jnp.fft)

    def get_grid(self, shape):
        bs, nv, nx, ny = shape[0], shape[1], shape[2], shape[3]
        gx = jnp.linspace(0, 1, nx, dtype=jnp.float32)
        gy = jnp.linspace(0, 1, ny, dtype=jnp.float32)
        gx = jnp.broadcast_to(gx.reshape(1, 1, nx, 1, 1), (bs, nv, nx, ny, 1))
        gy = jnp.broadcast_to(gy.reshape(1, 1, 1, ny, 1), (bs, nv, nx, ny, 1))
        return jnp.concatenate((gx, gy), axis=-1)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # grid in the activation dtype, else the concat/bias adds would
        # silently promote every block back to f32 under a bf16 scope
        grid = self.get_grid(x.shape).astype(x.dtype)
        x = jnp.concatenate((x, grid), axis=-1)
        x = nn.Dense(self.width_time, name="fc0_time", precision=PRECISION)(x)
        drop = (lambda z: nn.Dropout(self.dropout_rate)(z, deterministic=deterministic)) \
            if self.dropout_rate > 0.0 else (lambda z: z)
        x = drop(x)  # after initial projection (Dropout_FNO.py:165)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # [B, W, V, Nx, Ny]
        # the grid is identical for every sample, so the per-block bias
        # branch b(grid) is batch-constant: feed it at batch 1 and let the
        # add broadcast — saves a full-batch [B, W, V, Nx, Ny] tensor per
        # block (same math; the reference computes it at full batch)
        grid_c = jnp.transpose(grid[:1], (0, 4, 1, 2, 3))

        block = lambda name: _FNOBlock2d(
            self.modes1, self.modes2, self.num_vars, self.width_time,
            self.dropout_rate, self.spectral_impl, name=name,
        )
        x0 = block("f0")(x, grid_c, deterministic)
        x = block("f1")(x0, grid_c, deterministic)
        x = block("f2")(x, grid_c, deterministic) + x0
        x1 = block("f3")(x, grid_c, deterministic)
        x = block("f4")(x1, grid_c, deterministic)
        x = block("f5")(x, grid_c, deterministic) + x1

        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # [B, V, Nx, Ny, W]
        x = nn.Dense(256, name="fc1_time", precision=PRECISION)(x)
        x = nn.gelu(x, approximate=False)
        x = drop(x)  # between FC layers (Dropout_FNO.py:183)
        return nn.Dense(self.step, name="fc2_time", precision=PRECISION)(x)


class FNO1d(nn.Module):
    """`FNO_multi1d(T_in, step, modes, num_vars, width)` (Base_FNO.py:286-372).

    [BS, Nvar, Nx, T_in] -> [BS, Nvar, Nx, step].
    """

    T_in: int
    step: int
    modes1: int
    num_vars: int
    width_time: int
    width_vars: int = 0
    spectral_impl: str = "dft"  # 'dft' (MXU matmuls) or 'fft' (jnp.fft)

    def get_grid(self, shape):
        bs, nv, nx = shape[0], shape[1], shape[2]
        gx = jnp.linspace(0, 1, nx, dtype=jnp.float32)
        return jnp.broadcast_to(gx.reshape(1, 1, nx, 1), (bs, nv, nx, 1))

    @nn.compact
    def __call__(self, x):
        grid = self.get_grid(x.shape).astype(x.dtype)
        x = jnp.concatenate((x, grid), axis=-1)
        x = nn.Dense(self.width_time, name="fc0_time", precision=PRECISION)(x)
        x = jnp.transpose(x, (0, 3, 1, 2))  # [B, W, V, Nx]
        # batch-constant bias branch at batch 1 (see FNO2d)
        grid_c = jnp.transpose(grid[:1], (0, 3, 1, 2))

        block = lambda name: _FNOBlock1d(self.modes1, self.num_vars,
                                         self.width_time, self.spectral_impl,
                                         name=name)
        x0 = block("f0")(x, grid_c)
        x = block("f1")(x0, grid_c)
        x = block("f2")(x, grid_c) + x0
        x1 = block("f3")(x, grid_c)
        x = block("f4")(x1, grid_c)
        x = block("f5")(x, grid_c) + x1

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = nn.Dense(256, name="fc1_time", precision=PRECISION)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.step, name="fc2_time", precision=PRECISION)(x)


# Reference-name aliases (`FNO_multi2d(...)` call sites).
FNO_multi1d = FNO1d
FNO_multi2d = FNO2d


def count_params(params) -> int:
    """Total parameter count (reference `count_params`, Base_FNO.py:197-202)."""
    return sum(int(jnp.size(p)) for p in jax.tree_util.tree_leaves(params))
