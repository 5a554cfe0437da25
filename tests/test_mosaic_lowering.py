"""Cross-lower every Pallas kernel family for the TPU platform — on CPU.

Interpret mode (how the rest of the suite exercises these kernels) skips
Mosaic's TPU lowering entirely, so primitives with no Mosaic rule and
layout casts Mosaic rejects only surface on hardware. JAX's AOT path can
run that host-side lowering without a TPU device:

    jax.jit(f).trace().lower(lowering_platforms=("tpu",))

which is exactly where the first on-chip run of the fused FNO kernels
failed (lax.erfc from jax.nn.gelu(approximate=False) has no Mosaic rule;
in-kernel 1-D -> 3-D weight reshapes are rejected as "unsupported shape
cast"). These tests pin the whole class: any primitive or shape cast the
Mosaic lowering refuses now fails the CPU suite instead of burning a
tunnel round-trip. (Errors raised later, inside the on-device Mosaic
compiler itself, still need `scripts/tpu_kernel_check.py` on the chip.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def lower_for_tpu(fn, *args, **kwargs):
    """Host-side TPU lowering of fn(*args, **kwargs); returns the Lowered."""
    return (jax.jit(lambda: fn(*args, **kwargs))
            .trace()
            .lower(lowering_platforms=("tpu",)))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_stencil_residual_lowers(rng):
    from cppre.ops.pallas import fused_stencil_residual
    from cppre.ops.stencils import embed_kernel_3d, stencil_time_space

    f = jnp.asarray(rng.standard_normal((2, 7, 16, 16)), jnp.float32)
    k = (embed_kernel_3d(stencil_time_space(1, 2), 2)
         - 0.3 * embed_kernel_3d(stencil_time_space(2, 2), 0))
    lower_for_tpu(fused_stencil_residual, f, k, interpret=False)


def test_ns_kernels_lower(rng):
    from cppre.ops.pallas import (ns_joint_cp_scores_fused,
                                  ns_momentum_residual_fused)

    fields = jnp.asarray(rng.standard_normal((2, 3, 8, 16, 24)), jnp.float32)
    pred = fields + jnp.float32(0.1)
    lower_for_tpu(ns_momentum_residual_fused, fields, 0.01, 0.02, 0.02, 1e-3,
                  interpret=False)
    lower_for_tpu(ns_joint_cp_scores_fused, fields, pred, 0.01, 0.02, 0.02,
                  1e-3, interpret=False)


def test_ns_chunked_and_packed_instances_lower(rng):
    from cppre.ops.pallas.stencil_kernels import (
        ns_joint_cp_diff_stats_chunked,
        ns_joint_cp_scores_fused,
    )

    fields = jnp.asarray(rng.standard_normal((4, 3, 8, 16, 24)), jnp.float32)
    pred = fields + jnp.float32(0.1)
    lower_for_tpu(ns_joint_cp_diff_stats_chunked, fields, pred,
                  0.01, 0.02, 0.02, 1e-3, interpret=False)
    lower_for_tpu(ns_joint_cp_scores_fused, fields, pred, 0.01, 0.02, 0.02,
                  1e-3, interpret=False, samples_per_block=2)


def test_mhd_kernels_lower(rng):
    from cppre.ops.pallas import (mhd_induction_joint_cp_scores_fused,
                                  mhd_residual_fused)

    fields = jnp.asarray(rng.standard_normal((2, 6, 8, 16, 16)), jnp.float32)
    pred = fields + jnp.float32(0.1)
    lower_for_tpu(mhd_induction_joint_cp_scores_fused, fields, pred,
                  interpret=False)
    for equation in ("continuity", "momentum"):
        lower_for_tpu(mhd_residual_fused, fields, equation=equation,
                      interpret=False)


def test_wave_kernels_lower(rng):
    from cppre.ops.pallas import (wave_joint_cp_scores_fused,
                                  wave_residual_fused)
    from cppre.residuals.wave import PRE_Wave

    field = jnp.asarray(rng.standard_normal((3, 9, 16, 16)), jnp.float32)
    pred = field + jnp.float32(0.1)
    k = PRE_Wave(0.01, 0.02, 1.0).D.kernel
    lower_for_tpu(wave_residual_fused, field, k, interpret=False)
    lower_for_tpu(wave_joint_cp_scores_fused, field, pred, k, interpret=False)


def test_jorek_kernels_lower(rng):
    from cppre.ops.pallas import (jorek_joint_cp_scores_fused,
                                  jorek_residual_fused)

    nx, ny = 16, 24
    R = np.linspace(1.0, 2.0, nx).astype(np.float32)
    fields = jnp.asarray(rng.standard_normal((2, 3, 9, nx, ny)) + 2.0,
                         jnp.float32)
    pred = fields + jnp.float32(0.1)
    for equation in ("continuity", "temperature"):
        lower_for_tpu(jorek_residual_fused, fields, R, equation=equation,
                      interpret=False)
    lower_for_tpu(jorek_joint_cp_scores_fused, fields, pred, R,
                  interpret=False)


def test_flat_kernels_lower(rng):
    from cppre.ops.pallas import ns_joint_cp_scores_flat
    from cppre.ops.pallas import wave_joint_cp_scores_flat
    from cppre.residuals.wave import PRE_Wave

    fields = jnp.asarray(rng.standard_normal((2, 3, 8, 16, 24)), jnp.float32)
    pred = fields + jnp.float32(0.1)
    lower_for_tpu(ns_joint_cp_scores_flat, fields, pred, 0.01, 0.02, 0.02,
                  1e-3, interpret=False)
    field = jnp.asarray(rng.standard_normal((3, 9, 16, 16)), jnp.float32)
    k = PRE_Wave(0.01, 0.02, 1.0).D.kernel
    lower_for_tpu(wave_joint_cp_scores_flat, field,
                  field + jnp.float32(0.1), k, interpret=False)


def test_fused_fno_forward_lowers(rng):
    """The round-3 on-chip failure case: gelu-via-erfc and 1-D -> 3-D
    weight reshapes inside fno_block2d_fused / projection2d_fused."""
    from cppre.models import FNO2d, fno2d_forward_fused

    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=2, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    lower_for_tpu(fno2d_forward_fused, m, v, x, interpret=False)


def test_fused_fno_train_step_lowers(rng):
    """The trainable fused path (custom_vjp: Pallas forward legs + the
    fused backward kernels) must lower for TPU end-to-end through grad."""
    from cppre.models import FNO2d
    from cppre.models.fused import make_fused_train_apply

    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=2, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    apply_fn = make_fused_train_apply(m, interpret=False)

    def loss(params):
        return jnp.sum(apply_fn({"params": params}, x) ** 2)

    (jax.jit(lambda: jax.grad(loss)(v["params"]))
     .trace()
     .lower(lowering_platforms=("tpu",)))
