"""Multi-chip scale-out: device meshes, sharding rules, halo-exchange stencils.

The reference is strictly single-device (SURVEY.md §5: no NCCL/MPI/
torch.distributed anywhere); the TPU-native scaling story is XLA collectives
over ICI driven by `jax.sharding`:

* **dp** — calibration/training batches are embarrassingly parallel; shard
  the simulation axis over the 'dp' mesh axis and every ConvOps/CP/rollout
  function runs data-parallel unchanged (they are pure jnp). The fused
  Pallas joint-CP kernels compose with the mesh through
  `sharding.sharded_fused_cp_scores` (shard_map per-device kernels + psum
  of the moment accumulators) rather than pjit, so each chip keeps the
  measured single-chip fast path.
* **tp** — FNO spectral weights contract channels per (var, mode); sharding
  the output-channel dim over 'tp' turns the einsum into a GSPMD tensor-
  parallel matmul with an all-reduce XLA inserts automatically.
* **pp** — the FNO's 6-block depth as GPipe stages
  (`pipeline.make_pp_fno_apply`): each 'pp' rank owns 6/pp consecutive
  Fourier blocks, microbatches rotate rank-to-rank via `lax.ppermute`, and
  the skip state rides the same hop. Divides parameter HBM by pp with no
  per-step weight all-gather, composes with dp on a ('dp', 'pp') mesh, and
  is differentiable end-to-end (the backward replays the schedule reversed).
* **sp** — for fields too large per chip, `halo.stencil_conv_sharded` runs
  the stencil with a shard_map halo exchange (collective permute of k//2
  ghost cells) instead of gathering the field; `halo.stencil_conv_sharded_2d`
  decomposes both spatial axes (square reference grids), and
  `spectral.fft2_sharded`/`ifft2_sharded` distribute the 2-D FFT itself
  (local 1-D FFTs + one all_to_all transpose each way) for the spectral
  solvers/convolutions at large N.
"""

from .sharding import (
    make_mesh,
    shard_batch,
    fno_param_shardings,
    sharded_calibrate,
    make_sharded_fused_apply,
    sharded_fused_cp_scores,
    make_sharded_train_step,
)
from .pipeline import make_pp_fno_apply, pp_supported
from .halo import stencil_conv_sharded, stencil_conv_sharded_2d
from .spectral import fft2_sharded, ifft2_sharded, spectral_circular_conv_sharded
from .multihost import initialize, global_mesh

__all__ = [
    "make_mesh",
    "shard_batch",
    "fno_param_shardings",
    "sharded_calibrate",
    "make_sharded_fused_apply",
    "sharded_fused_cp_scores",
    "make_sharded_train_step",
    "make_pp_fno_apply",
    "pp_supported",
    "stencil_conv_sharded",
    "stencil_conv_sharded_2d",
    "fft2_sharded",
    "ifft2_sharded",
    "spectral_circular_conv_sharded",
    "initialize",
    "global_mesh",
]
