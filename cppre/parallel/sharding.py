"""Mesh construction and sharding rules (dp x tp) for the CP-PRE stack.

Everything in the library is a pure function over arrays, so scaling out is
entirely declarative: build a Mesh, annotate the batch axis with 'dp' and
the FNO channel weights with 'tp', and jit inserts the ICI collectives.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "fno_param_shardings",
    "sharded_calibrate",
    "sharded_fused_cp_scores",
    "make_sharded_train_step",
]


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              tp: int = 1, axis_names: Sequence[str] = ("dp", "tp")) -> Mesh:
    """Mesh over the first n_devices devices, shape (dp, tp)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if dp is None:
        dp = n_devices // tp
    assert dp * tp == n_devices, f"dp*tp must equal n_devices ({dp}*{tp} != {n_devices})"
    mesh_devs = np.asarray(devs[:n_devices]).reshape(dp, tp)
    return Mesh(mesh_devs, axis_names=axis_names)


def shard_batch(x, mesh: Mesh, axis: str = "dp"):
    """Place an array with its leading (batch) axis sharded over `axis`."""
    spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def fno_param_shardings(params, mesh: Mesh, axis: str = "tp",
                        overrides: dict | None = None, report: bool = False):
    """Tensor-parallel layout for FNO params.

    Structural rule (not a name heuristic): every cppre model stores its
    OUT channel at dim 1 — flax Dense kernels are [in, out] and the
    split-complex spectral weights are [in, out, var, modes...]
    (`models/fno.py`); biases and scalars are 1-D/0-D. So any leaf with
    ndim >= 2 whose dim 1 divides the mesh axis shards dim 1 over `axis`;
    everything else replicates. XLA then runs the channel contraction as a
    sharded matmul (all-gather/reduce on ICI).

    `overrides` maps a path substring (as rendered by
    `jax.tree_util.keystr`) to an explicit PartitionSpec for models with a
    different layout. `report=True` additionally returns
    {path: "sharded" | "replicated(<reason>)"} so silent replication of a
    renamed/reshaped weight is visible instead of a performance mystery.
    """
    size = mesh.shape[axis]
    overrides = overrides or {}
    log: dict[str, str] = {}

    def spec_for(path, leaf):
        name = jax.tree_util.keystr(path)
        for pat, spec in overrides.items():
            if pat in name:
                log[name] = f"override {spec}"
                return NamedSharding(mesh, spec)
        if leaf.ndim >= 2:
            if leaf.shape[1] % size == 0:
                spec = [None] * leaf.ndim
                spec[1] = axis
                log[name] = "sharded"
                return NamedSharding(mesh, P(*spec))
            log[name] = f"replicated(dim1={leaf.shape[1]} % {size} != 0)"
        else:
            log[name] = "replicated(ndim<2)"
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map_with_path(spec_for, params)
    return (shardings, log) if report else shardings


def sharded_calibrate(scores, alpha: float, mesh: Mesh):
    """Split-CP quantile with the calibration batch sharded over 'dp'.

    The quantile reduces over the (sharded) batch axis; XLA lowers it to a
    per-shard sort + all-gather of the shard boundaries on ICI.

    n_cal values that do not divide the dp extent (the experiments use
    n_cal=100 on 8 chips) are padded with +inf sentinels up to the next
    multiple — the CP order statistic is taken at the index of the TRUE
    batch (mirroring `jnp.quantile(method='higher')`'s f32 index
    arithmetic bit-for-bit), so padding never changes the result
    (exactness property-tested in tests/test_parallel.py)."""
    from ..cp.inductive import calibrate, cp_quantile_level

    scores = jnp.asarray(scores)
    n = scores.shape[0]
    dp = mesh.shape["dp"]
    pad = (-n) % dp
    if pad == 0:
        scores = shard_batch(scores, mesh)
        return jax.jit(lambda s: calibrate(s, n, alpha))(scores)
    # mirror jnp.quantile's index computation in jax's compute dtype
    dt = np.float64 if jax.config.jax_enable_x64 else np.float32
    q = dt(cp_quantile_level(n, alpha))
    k = int(np.clip(np.ceil(q * dt(n - 1)), 0, n - 1))
    fill = jnp.full((pad,) + scores.shape[1:], jnp.inf, scores.dtype)
    scores = shard_batch(jnp.concatenate([scores, fill]), mesh)
    return jax.jit(lambda s: jnp.sort(s, axis=0)[k])(scores)


def make_sharded_train_step(apply_fn, tx, step: int, T_out: int, loss_func,
                            mesh: Mesh, param_shardings=None,
                            remat: bool | None = None):
    """jit train step with batch dp-sharded inputs and (optionally)
    tp-sharded params. Identical math to `train.loops.make_train_step`.

    remat=None resolves per-platform: rematerialisation stays ON for real
    TPU meshes (the wave config OOMs single-chip without it) but is disabled
    on the CPU backend, where jax.checkpoint inside a GSPMD-sharded scan
    trips an XLA CPU FFT layout RET_CHECK (fft_thunk.cc
    IsMonotonicWithDim0Major) on the virtual-device dry run."""
    import optax

    from ..train.loops import rollout_loss

    if remat is None:
        platforms = {d.platform for d in mesh.devices.flat}
        remat = "cpu" not in platforms

    batch_sharding = NamedSharding(mesh, P("dp"))

    def train_step(params, opt_state, xx, yy):
        def loss_of(p):
            total, pred = rollout_loss(apply_fn, p, xx, yy, step, T_out,
                                       loss_func, remat=remat)
            return total, pred

        (loss, pred), grads = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    in_shardings = (
        param_shardings,
        None,
        batch_sharding,
        batch_sharding,
    ) if param_shardings is not None else None
    return jax.jit(train_step, in_shardings=in_shardings)


def sharded_fused_cp_scores(diff_stats_fn, truth, prediction, mesh: Mesh,
                            axis: str = "dp", eps: float = 1e-6):
    """Joint-CP nonconformity scores with the calibration batch dp-sharded
    and the fused one-pass kernel running independently per device.

    `diff_stats_fn(t, p) -> (diff, sum, sumsq)` is any
    `ops.pallas.stencil_kernels` `*_joint_cp_diff_stats` instance (each
    routes itself to the paired / composed / DMA-chunked Pallas kernel on
    TPU and to the XLA lowering elsewhere). Each shard evaluates it on its
    LOCAL batch slice inside `shard_map` — so the Pallas fast path, not a
    gathered pjit rewrite, runs per chip — and only the two field-shaped
    moment accumulators cross ICI via `psum`. The per-sample sup-norm
    scores (`modulation_func` + `ncf_metric_joint` semantics,
    `Joint/NS_Residuals_CP.py:244-263`) return batch-sharded, ready for
    `sharded_calibrate`. HBM traffic per chip is 1/dp of the single-chip
    pipeline; the collective moves 2 x out-field bytes per chip.
    """
    from functools import partial

    from jax import shard_map

    from ..ops.pallas.stencil_kernels import _scores_from_diff_stats

    truth = jnp.asarray(truth)
    prediction = jnp.asarray(prediction)
    n = truth.shape[0]
    dp = mesh.shape[axis]
    pad = (-n) % dp
    if pad:
        # zero-sample padding is EXACT here: every residual term carries a
        # field factor, so PRE(0) == 0 and the padded samples contribute
        # nothing to the psum'd moment accumulators; their (meaningless)
        # scores are sliced off below and n stays the TRUE batch in the
        # modulation denominators.
        widths = ((0, pad),) + ((0, 0),) * (truth.ndim - 1)
        truth = jnp.pad(truth, widths)
        prediction = jnp.pad(prediction, widths)
    spec = P(axis, *([None] * (truth.ndim - 1)))

    # check_vma=False: pallas_call's out ShapeDtypeStructs carry no
    # varying-mesh-axes info, so the vma checker rejects Pallas bodies
    @partial(shard_map, mesh=mesh, in_specs=(spec, spec),
             out_specs=P(axis), check_vma=False)
    def local_scores(t, p):
        diff, s, sq = diff_stats_fn(t, p)
        s = jax.lax.psum(s, axis)
        sq = jax.lax.psum(sq, axis)
        return _scores_from_diff_stats(diff, s, sq, n, eps)

    truth = shard_batch(truth, mesh, axis)
    prediction = shard_batch(prediction, mesh, axis)
    scores = jax.jit(local_scores)(truth, prediction)
    return scores[:n] if pad else scores


def make_sharded_fused_apply(model, variables, mesh: Mesh, axis: str = "dp",
                             interpret=None):
    """dp-sharded drop-in for `models.fused.make_fused_apply`: the fused
    Pallas FNO forward runs independently on each device's LOCAL batch
    slice inside `shard_map` (pallas_call does not partition under pjit,
    so batch-sharded inputs through plain jit would gather). Samples are
    embarrassingly parallel in the forward, so no collective is needed —
    out stays batch-sharded for the downstream (sharding-transparent) CP
    phase. Unsupported shapes fall back to `model.apply` per shard.

    Batches not divisible by the mesh extent are zero-sample padded and
    the output cropped — samples are independent in the forward, so the
    pad rows never touch the real ones (the `sharded_fused_cp_scores` /
    `sharded_calibrate` uneven-batch convention; the flagship configs'
    n_cal + n_pred are not multiples of 8)."""
    from functools import partial

    from jax import shard_map

    from ..models.fused import fno2d_forward_fused, fused_supported

    dp = mesh.shape[axis]

    def local_apply(x):
        if fused_supported(model, x.shape):
            return fno2d_forward_fused(model, variables, x,
                                       interpret=interpret)
        return model.apply(variables, x)

    @jax.jit
    def apply_fn(x):
        n = x.shape[0]
        pad = (-n) % dp
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        spec = P(axis, *([None] * (x.ndim - 1)))
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # info (same caveat as sharded_fused_cp_scores)
        f = partial(shard_map, mesh=mesh, in_specs=(spec,),
                    out_specs=spec, check_vma=False)(local_apply)
        out = f(x)
        return out[:n] if pad else out

    return apply_fn
