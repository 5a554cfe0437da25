"""Pipeline-parallel FNO forward: the 6 Fourier blocks as GPipe stages.

The reference model (`Other_UQ/Bayesian_Models/Base_FNO.py:111-202`,
`FNO_multi2d`) is a strictly sequential stack: lift, 6 Fourier blocks with
skip-adds every 3 (:164-170), project. dp/tp shard the *tensors* of that
stack (`sharding.py`); this module shards its *depth*: each 'pp' mesh rank
owns 6/pp consecutive blocks and microbatches flow rank-to-rank over ICI
via `lax.ppermute` — the classic GPipe schedule, XLA-native (one fori-less
`lax.scan` over ticks, static shapes, no host round-trips).

Why it exists on TPU: at production widths the per-block weights are the
HBM-resident majority (width 128: ~67 MB/block in f32). Depth-sharding
divides parameter memory by pp without the all-gather traffic weight-dp
(ZeRO-style) would add to every step, and composes orthogonally with dp
(batch) on a 2-D ('dp', 'pp') mesh: activations only ever cross the pp
axis in [microbatch]-sized ppermute hops.

Mechanics:

* Stage state is the pair (x, skip): the reference's skip pattern
  (x0 = f0(x); f2(f1(x0)) + x0, repeated for f3..f5) sets `skip` at global
  block index ``g % 3 == 0`` and consumes it at ``g % 3 == 2``, so for
  pp = 2 the skip never leaves a stage and for pp = 3 or 6 it rides the
  same ppermute as x.
* Tick t: rank 0 ingests microbatch t (while t < n_micro), every rank runs
  its local blocks, the pair rotates one rank forward. Rank pp-1 lands
  microbatch m at tick m + pp - 1; its writes are masked-valid and a final
  psum over 'pp' (only the last rank is nonzero) replicates the output.
* The lift/projection Dense layers stay OUTSIDE the pipeline: they are
  pure per-sample maps, so under jit they follow the batch sharding
  (dp) for free and every pp rank holds them replicated (they are ~1% of
  the parameters).

The bubble fraction is (pp-1)/(n_micro+pp-1); callers pick n_micro to
amortise it (default pp, the minimum that keeps every stage busy once).
Differentiable end-to-end: ppermute/psum have exact transposes, so
jax.grad through the returned apply gives pipeline-parallel BPTT with the
same schedule reversed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["make_pp_fno_apply", "pp_supported"]

_N_BLOCKS = 6  # FNO_multi2d depth (Base_FNO.py:164-170)


def pp_supported(mesh: Mesh, axis: str = "pp") -> bool:
    """True when the mesh's `axis` extent divides the 6-block stack."""
    return axis in mesh.shape and _N_BLOCKS % mesh.shape[axis] == 0


def _stack_blocks(params):
    """Stack the f0..f5 subtrees onto a leading depth axis."""
    blocks = [params[f"f{i}"] for i in range(_N_BLOCKS)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *blocks)


def make_pp_fno_apply(model, variables, mesh: Mesh, axis: str = "pp",
                      dp_axis: str | None = None, n_microbatches: int | None = None):
    """Pipeline-parallel `model.apply` for an FNO2d over mesh axis `axis`.

    `mesh.shape[axis]` must divide 6 (2, 3 or 6 stages). If `dp_axis` is
    given the batch is additionally dp-sharded (2-D ('dp', 'pp') mesh).
    Batches are zero-sample padded to (dp * n_micro) | B and cropped (the
    `make_sharded_fused_apply` uneven-batch convention). Deterministic
    forward only (dropout off — the inference/calibration path).
    """
    from ..models import fno as _fno

    pp = mesh.shape[axis]
    if _N_BLOCKS % pp != 0:
        raise ValueError(f"'{axis}' extent ({pp}) must divide {_N_BLOCKS} blocks")
    bps = _N_BLOCKS // pp
    dp = mesh.shape[dp_axis] if dp_axis else 1
    n_micro = n_microbatches or pp

    params = variables["params"]
    stacked = _stack_blocks(params)
    block_mod = _fno._FNOBlock2d(model.modes1, model.modes2, model.num_vars,
                                 model.width_time, 0.0, model.spectral_impl)
    p_fc0, p_fc1, p_fc2 = (params["fc0_time"], params["fc1_time"],
                           params["fc2_time"])

    def local_blocks(xw, grid_c, blk):
        # xw: [B_loc, W, V, Nx, Ny] — this rank's dp shard, all microbatches;
        # blk: this rank's [bps, ...] slice of the stacked block params
        d = lax.axis_index(axis)
        b_loc = xw.shape[0]
        mb = b_loc // n_micro
        ticks = n_micro + pp - 1

        def tick(carry, t):
            x_st, skip_st, out = carry
            # rank 0 ingests microbatch t while any remain; everyone else
            # (and rank 0 in the drain phase) keeps the rotated-in state
            start = jnp.clip(t, 0, n_micro - 1) * mb
            x_in = lax.dynamic_slice_in_dim(xw, start, mb, 0)
            ingest = jnp.logical_and(d == 0, t < n_micro)
            x_cur = jnp.where(ingest, x_in, x_st)
            skip_cur = jnp.where(ingest, jnp.zeros_like(skip_st), skip_st)
            for j in range(bps):
                p_j = jax.tree_util.tree_map(lambda l: l[j], blk)
                y = block_mod.apply({"params": p_j}, x_cur, grid_c, True)
                r = (d * bps + j) % 3  # traced for pp=3 (bps not 0 mod 3)
                x_cur, skip_cur = lax.switch(
                    r,
                    (lambda y, s: (y, y),        # g%3==0: set the skip
                     lambda y, s: (y, s),        # g%3==1: pass it through
                     lambda y, s: (y + s, s)),   # g%3==2: consume it
                    y, skip_cur)
            m_out = t - (pp - 1)
            valid = jnp.logical_and(d == pp - 1, m_out >= 0)
            upd = lax.dynamic_update_slice_in_dim(
                out, x_cur, jnp.clip(m_out, 0, n_micro - 1) * mb, 0)
            out = jnp.where(valid, upd, out)
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            x_st = lax.ppermute(x_cur, axis, perm)
            skip_st = lax.ppermute(skip_cur, axis, perm)
            return (x_st, skip_st, out), None

        mb_shape = (mb,) + xw.shape[1:]
        init = (jnp.zeros(mb_shape, xw.dtype), jnp.zeros(mb_shape, xw.dtype),
                jnp.zeros_like(xw))
        (_, _, out), _ = lax.scan(tick, init, jnp.arange(ticks))
        # only rank pp-1 holds real rows; psum replicates them over 'pp'
        return lax.psum(out, axis)

    ndim = 5  # [B, W, V, Nx, Ny]
    bspec = P(dp_axis, *([None] * (ndim - 1))) if dp_axis else P(*([None] * ndim))
    blocks_fn = partial(
        shard_map, mesh=mesh,
        in_specs=(bspec, P(*([None] * ndim)), P(axis)),
        out_specs=bspec, check_vma=False)(local_blocks)

    @jax.jit
    def apply_fn(x):
        # the FNO2d.__call__ math verbatim (models/fno.py), with the block
        # stack routed through the pipeline. Dense modules are built HERE
        # so `precision_scope` rebindings of _fno.PRECISION are honoured at
        # trace time, exactly like model.apply.
        lift = _fno.nn.Dense(model.width_time, precision=_fno.PRECISION)
        proj1 = _fno.nn.Dense(256, precision=_fno.PRECISION)
        proj2 = _fno.nn.Dense(model.step, precision=_fno.PRECISION)
        n = x.shape[0]
        pad = (-n) % (dp * n_micro)
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        grid = model.get_grid(x.shape).astype(x.dtype)
        h = jnp.concatenate((x, grid), axis=-1)
        h = lift.apply({"params": p_fc0}, h)
        h = jnp.transpose(h, (0, 4, 1, 2, 3))
        grid_c = jnp.transpose(grid[:1], (0, 4, 1, 2, 3))
        h = blocks_fn(h, grid_c, stacked)
        h = jnp.transpose(h, (0, 2, 3, 4, 1))
        h = proj1.apply({"params": p_fc1}, h)
        h = _fno.nn.gelu(h, approximate=False)
        out = proj2.apply({"params": p_fc2}, h)
        return out[:n] if pad else out

    return apply_fn
