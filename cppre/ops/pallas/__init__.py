"""Pallas TPU kernels for the hot PRE paths.

The profiler-visible cost of the PRE pipeline is HBM traffic: the XLA
lowering of `D_t(u)*a + u*D_x(u)*b + ...` materialises several
field-sized intermediates per residual term. These kernels evaluate a whole
residual in one VMEM pass per batch block — load (u, v, p) once, apply all
stencil taps as register shifts, emit the interior-cropped result (and
optionally |.| for nonconformity scores) without intermediate HBM writes.
"""

from .fno_block import (
    fno_block2d_bwd_fused,
    fno_block2d_fused,
    projection2d_bwd_fused,
    projection2d_fused,
)
from .flat_kernels import (
    mhd_joint_cp_scores_flat,
    ns_joint_cp_scores_flat,
    wave_joint_cp_scores_flat,
)
from .stencil_kernels import (
    fused_stencil_residual,
    jorek_joint_cp_scores_fused,
    jorek_residual_fused,
    mhd_induction_joint_cp_scores_fused,
    mhd_induction_residual_fused,
    mhd_residual_fused,
    ns_joint_cp_scores_fused,
    ns_momentum_residual_fused,
    single_pass_fits,
    wave_joint_cp_scores_fused,
    wave_residual_fused,
)

__all__ = [
    "fno_block2d_fused",
    "fno_block2d_bwd_fused",
    "projection2d_fused",
    "projection2d_bwd_fused",
    "fused_stencil_residual",
    "mhd_joint_cp_scores_flat",
    "ns_joint_cp_scores_flat",
    "wave_joint_cp_scores_flat",
    "jorek_joint_cp_scores_fused",
    "jorek_residual_fused",
    "mhd_induction_joint_cp_scores_fused",
    "mhd_induction_residual_fused",
    "mhd_residual_fused",
    "ns_joint_cp_scores_fused",
    "ns_momentum_residual_fused",
    "single_pass_fits",
    "wave_joint_cp_scores_fused",
    "wave_residual_fused",
]
