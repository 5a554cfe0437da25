"""Where does the FNO training step's 1.7 s/step go?

Slope-times, at the wave-flagship shapes (B=50, width 32, 64x64, modes 16):
  1. full FNO2d forward
  2. jnp.fft.rfft2 + irfft2 alone at the in-model shape, x6 blocks
  3. the split-complex mode einsum alone, x6
  4. truncated DFT via matmul (the mode-truncated transform as two MXU
     matmuls per axis) — candidate replacement for (2)
  5. one AR train step (reference point)

Run: timeout 1800 python scripts/probe_fno_parts.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
INNERS = (4, 16, 64)
B, W, NX, NY, M = 50, 32, 64, 64, 16


def slope(name, fn, *args):
    def dispatch(inner):
        @jax.jit
        def run(*xs):
            def body(i, carry):
                out = fn(*(x + carry * 0.0 if j == 0 else x
                           for j, x in enumerate(xs)))
                return jnp.real(jnp.sum(out)) * 1e-30

            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(np.asarray(run(*args)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(np.asarray(run(*args)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # note: carry*0.0 on the first arg keeps the dependency; it IS a full
    # pass over that arg, so subtract the elementwise baseline if precision
    # matters — here we care about order of magnitude.
    ts = [dispatch(n) for n in INNERS]
    w = (ts[-1] - ts[0]) / (INNERS[-1] - INNERS[0])
    print(f"{name:34s}: {w*1e3:8.2f} ms/call", flush=True)
    return w


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, W, 1, NX, NY)), jnp.float32)

    def fft_blocks(v):
        out = v
        for _ in range(6):
            f = jnp.fft.rfft2(out, axes=(-2, -1))
            out = jnp.fft.irfft2(f, s=(NX, NY), axes=(-2, -1))
        return out

    wr = jnp.asarray(rng.standard_normal((W, W, 1, M, M)), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((W, W, 1, M, M)), jnp.float32)

    def einsum_blocks(v):
        out = v[..., :M, :M]
        for _ in range(6):
            re = jnp.einsum("bivxy,iovxy->bovxy", out, wr)
            im = jnp.einsum("bivxy,iovxy->bovxy", out, wi)
            out = re + im * 1e-3
        return out

    # truncated DFT by matmul: modes = Fx^T u Fy (split-complex), then back
    kx = np.arange(NX)
    fy = np.exp(-2j * np.pi * np.outer(kx, np.arange(M)) / NY)
    fx = np.exp(-2j * np.pi * np.outer(kx, np.arange(M)) / NX)
    fy_r, fy_i = jnp.asarray(fy.real, jnp.float32), jnp.asarray(fy.imag, jnp.float32)
    fx_r, fx_i = jnp.asarray(fx.real, jnp.float32), jnp.asarray(fx.imag, jnp.float32)

    def dft_blocks(v):
        out = v
        for _ in range(6):
            # y transform: [.., NX, NY] @ [NY, M] (re/im)
            yr = out @ fy_r
            yi = out @ fy_i
            # x transform on both parts: contract NX with [NX, M]
            xr = jnp.einsum("b i v x m, x n -> b i v n m", yr, fx_r) \
                 - jnp.einsum("b i v x m, x n -> b i v n m", yi, fx_i)
            xi = jnp.einsum("b i v x m, x n -> b i v n m", yr, fx_i) \
                 + jnp.einsum("b i v x m, x n -> b i v n m", yi, fx_r)
            # inverse: scatter back through the conjugate transposes
            br = jnp.einsum("b i v n m, x n -> b i v x m", xr, fx_r) \
                 + jnp.einsum("b i v n m, x n -> b i v x m", xi, fx_i)
            out = br @ fy_r.T / (NX * NY)
        return out

    slope("rfft2+irfft2 x6", fft_blocks, x)
    slope("mode einsum (re+im) x6", einsum_blocks, x)
    slope("truncated DFT matmul x6", dft_blocks, x)

    from cppre.models import FNO2d

    model = FNO2d(T_in=1, step=1, modes1=M, modes2=M, num_vars=1,
                  width_time=W)
    a = jnp.asarray(rng.standard_normal((B, 1, NX, NY, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), a)
    slope("FNO2d forward", lambda v: model.apply(params, v), a)


if __name__ == "__main__":
    main()
