"""Fast on-chip validation of every Pallas kernel family (run FIRST after
an outage): compile + execute each fused kernel at a tiny shape on the real
chip and assert parity against its XLA reference. Catches Mosaic lowering
rejections (reshape/layout rules are stricter on hardware than in interpret
mode) in ~2 minutes, before the long refresh stages spend their budget.

Run from /root/repo:  timeout 1200 python scripts/tpu_kernel_check.py
Exit 0 = all kernels pass; nonzero = at least one failed (details printed).
"""

import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

RESULTS = {}


def check(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS[name] = "ok"
                print(f"[ok]   {name}", flush=True)
            except Exception as e:  # noqa: BLE001 - report and continue
                RESULTS[name] = f"FAIL: {e}"
                print(f"[FAIL] {name}: {e}", flush=True)
                traceback.print_exc(limit=3)
        return run
    return deco


def _close(a, b, tol, what):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1e-6)
    err = np.abs(a - b).max()
    assert err <= tol * scale, f"{what}: |d|={err:.3e} scale={scale:.3e}"


@check("stencil_residual")
def _stencil():
    from cppre.ops import ConvOperator
    from cppre.ops.pallas import fused_stencil_residual

    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((2, 7, 16, 16)), jnp.float32)
    D = ConvOperator("t", 2)
    _close(fused_stencil_residual(f, D.kernel),
           D(f)[..., 1:-1, 1:-1, 1:-1], 1e-4, "stencil")


@check("ns_joint_cp_scores")
def _ns():
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import ns_joint_cp_scores_fused
    from cppre.residuals.ns import PRE_NS

    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((4, 3, 7, 16, 16)), jnp.float32)
    p = t + 0.05
    pre = PRE_NS(0.01, 0.01, 0.01)
    ro, rp = pre.residual_momentum(t), pre.residual_momentum(p)
    ref = ncf_metric_joint(ro, rp, modulation_func(ro, rp) + 1e-6)
    _close(ns_joint_cp_scores_fused(t, p, 0.01, 0.01, 0.01), ref, 1e-3, "ns")


@check("ns_scores_bf16_diff")
def _ns_bf16():
    """bf16 staged-diff variant: Mosaic must lower the in-kernel f32->bf16
    store (bf16 uses (16, 128) tiles) and scores must match f32 staging to
    bf16 resolution (~2^-9 relative on the scored |diff|)."""
    from cppre.ops.pallas import ns_joint_cp_scores_fused

    rng = np.random.default_rng(1)
    t = jnp.asarray(rng.standard_normal((4, 3, 7, 16, 16)), jnp.float32)
    p = t + 0.05
    s32 = ns_joint_cp_scores_fused(t, p, 0.01, 0.01, 0.01)
    s16 = ns_joint_cp_scores_fused(t, p, 0.01, 0.01, 0.01,
                                   diff_dtype=jnp.bfloat16)
    _close(s16, s32, 1e-2, "ns bf16 diff")


@check("mhd_induction_scores")
def _mhd():
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import mhd_induction_joint_cp_scores_fused
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.standard_normal((4, 6, 7, 16, 16)), jnp.float32)
    p = t + 0.05
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ro, rp = pre.residual_induction(t), pre.residual_induction(p)
    ref = ncf_metric_joint(ro, rp, modulation_func(ro, rp) + 1e-6)
    _close(mhd_induction_joint_cp_scores_fused(t, p), ref, 1e-3, "mhd")


@check("mhd_single_pass_scores")
def _mhd_single_pass():
    """Mosaic lowering of the VMEM-stash single-pass kernel: 2-phase
    sequential grid, dynamic scratch indexing, persistent moment scratch
    (round-5; interpret-mode parity in tests/test_pallas_kernels.py)."""
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import mhd_induction_joint_cp_scores_fused
    from cppre.residuals.mhd import PRE_MHD

    rng = np.random.default_rng(2)
    t = jnp.asarray(rng.standard_normal((4, 6, 7, 16, 16)), jnp.float32)
    p = t + 0.05
    pre = PRE_MHD(0.01, 0.02, 0.02)
    ro, rp = pre.residual_induction(t), pre.residual_induction(p)
    ref = ncf_metric_joint(ro, rp, modulation_func(ro, rp) + 1e-6)
    _close(mhd_induction_joint_cp_scores_fused(t, p, single_pass=True),
           ref, 1e-3, "mhd single-pass")


@check("jorek_scores")
def _jorek():
    from cppre.cp.inductive import modulation_func, ncf_metric_joint
    from cppre.ops.pallas import jorek_joint_cp_scores_fused
    from cppre.residuals.jorek import PRE_JOREK

    rng = np.random.default_rng(3)
    R = np.linspace(1.0, 2.0, 16).astype(np.float32)
    t = jnp.asarray(rng.standard_normal((4, 3, 7, 16, 16)) + 2.0, jnp.float32)
    p = t + 0.05
    pre = PRE_JOREK(R, 1.0, 1.0, 1.0)
    ro, rp = pre.residual(t, "continuity"), pre.residual(p, "continuity")
    ref = ncf_metric_joint(ro, rp, modulation_func(ro, rp) + 1e-6)
    _close(jorek_joint_cp_scores_fused(t, p, R), ref, 1e-3, "jorek")


@check("fno_block_forward")
def _fno_fwd():
    from cppre.models import FNO2d, fno2d_forward_fused

    rng = np.random.default_rng(4)
    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=2, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 2, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    _close(fno2d_forward_fused(m, v, x), m.apply(v, x), 1e-4, "fno fwd")


@check("fno_block_forward_nonaligned")
def _fno_fwd_pad():
    from cppre.models import FNO2d, fno2d_forward_fused

    rng = np.random.default_rng(5)
    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=1, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 10, 12, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    _close(fno2d_forward_fused(m, v, x), m.apply(v, x), 1e-4, "fno pad")


@check("fno_train_grad")
def _fno_grad():
    from cppre.models import FNO2d, make_fused_train_apply

    rng = np.random.default_rng(6)
    m = FNO2d(T_in=1, step=1, modes1=4, modes2=4, num_vars=1, width_time=8)
    x = jnp.asarray(rng.standard_normal((2, 1, 16, 16, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 1, 16, 16, 1)), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), x)
    fused = make_fused_train_apply(m)
    loss_f = lambda p: jnp.mean((fused(p, x) - y) ** 2)
    loss_r = lambda p: jnp.mean((m.apply(p, x) - y) ** 2)
    gf = jax.grad(loss_f)(v)
    gr = jax.grad(loss_r)(v)
    ff, _ = jax.flatten_util.ravel_pytree(gf)
    fr, _ = jax.flatten_util.ravel_pytree(gr)
    _close(ff, fr, 5e-4, "fno grads")


@check("chunked_diff_stats")
def _chunked():
    from cppre.ops.pallas.stencil_kernels import (
        ns_joint_cp_diff_stats,
        ns_joint_cp_diff_stats_chunked,
    )

    rng = np.random.default_rng(7)
    t = jnp.asarray(rng.standard_normal((3, 3, 9, 16, 16)), jnp.float32)
    p = t + 0.05
    d1, s1, q1 = ns_joint_cp_diff_stats(t, p, 0.01, 0.01, 0.01)
    d2, s2, q2 = ns_joint_cp_diff_stats_chunked(t, p, 0.01, 0.01, 0.01,
                                                t_block=5)
    _close(d2, d1, 1e-4, "chunked diff")
    _close(s2, s1, 1e-3, "chunked sum")


def main():
    print("backend:", jax.default_backend(), flush=True)
    for fn in [_stencil, _ns, _ns_bf16, _mhd, _mhd_single_pass, _jorek,
               _fno_fwd, _fno_fwd_pad, _fno_grad, _chunked]:
        fn()
    bad = {k: v for k, v in RESULTS.items() if v != "ok"}
    print(f"kernel check: {len(RESULTS) - len(bad)}/{len(RESULTS)} ok",
          flush=True)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
