"""Training-step roofline for the wave-flagship FNO config (VERDICT r2
item 7): per-step wall time via the slope harness, XLA's own FLOP estimate,
achieved TFLOP/s vs the v5e MXU peak, and fields/s.

Config = the wave flagship (`cppre/experiments/wave.py`): FNO2d T_in=1,
step=1, modes 16x16, width_time 32, batch 50, 64x64 grid, T_out=20 AR
rollout with remat — the training half of every 2-D experiment's
wall-clock.

Run: timeout 1200 python scripts/train_roofline.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

REPS = 5
INNERS = (2, 8, 32)
BATCH, NVAR, NX, NY, T_IN, T_OUT, STEP = 50, 1, 64, 64, 1, 20, 1
# v5e peaks: 197 TFLOP/s bf16 MXU; f32 data here (XLA may upcast-accumulate)
PEAK_BF16 = 197e12


def main(fused: bool = False, remat: bool = True,
         bwd_impl: str = "pallas", precision: str = "highest",
         width: int = 32, remat_policy: str | None = None):
    from cppre.models import (FNO2d, make_fused_train_apply,
                              with_activation_dtype, with_matmul_precision)
    from cppre.train.loops import make_optimizer, make_train_step
    from cppre.train.losses import lp_loss

    print(f"backend: {jax.default_backend()}  fused={fused}  remat={remat}"
          f"  bwd={bwd_impl if fused else 'n/a'}  precision={precision}"
          f"  width={width}  policy={remat_policy}", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((BATCH, NVAR, NX, NY, T_IN)), jnp.float32)
    u = jnp.asarray(rng.standard_normal((BATCH, NVAR, NX, NY, T_OUT)), jnp.float32)

    model = FNO2d(T_in=T_IN, step=STEP, modes1=16, modes2=16, num_vars=NVAR,
                  width_time=width)
    params = model.init(jax.random.PRNGKey(0), a)
    tx = make_optimizer(5e-3)
    opt_state = tx.init(params)
    apply_fn = (make_fused_train_apply(model, bwd_impl=bwd_impl)
                if fused else model.apply)
    if precision == "bf16act":
        # bf16 activations + params (f32 masters): halves the activation
        # HBM traffic the training forward is bound by (models/fno.py::
        # with_activation_dtype); implies 1-pass bf16 MXU contractions
        apply_fn = with_activation_dtype(apply_fn)
    elif precision != "highest":
        # train-time matmul precision knob: default-bf16 MXU passes are
        # ~6x cheaper than HIGHEST; CP exchangeability only constrains the
        # calibration/prediction rollouts, not SGD (models/fno.py scope)
        apply_fn = with_matmul_precision(apply_fn, precision)
    train_step = make_train_step(apply_fn, tx, STEP, T_OUT, lp_loss,
                                 remat=remat, remat_policy=remat_policy)

    # XLA's own cost model for one step
    lowered = jax.jit(lambda p, s, xx, yy: train_step(p, s, xx, yy)[:2]).lower(
        params, opt_state, a, u)
    cost = lowered.compile().cost_analysis()
    flops = float(cost.get("flops", float("nan"))) if cost else float("nan")

    # slope-timed training step: params/opt_state carried -> natural data
    # dependency, nothing hoistable, fixed dispatch overhead cancels
    def dispatch(inner):
        @jax.jit
        def run(p, s, xx, yy):
            def body(i, carry):
                p_c, s_c = carry
                p_c, s_c, loss, _ = train_step(p_c, s_c, xx, yy)
                return (p_c, s_c)

            p_f, s_f = jax.lax.fori_loop(0, inner, body, (p, s))
            return jax.tree_util.tree_leaves(p_f)[0].ravel()[0]

        float(np.asarray(run(params, opt_state, a, u)))
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(np.asarray(run(params, opt_state, a, u)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    times = [dispatch(n) for n in INNERS]
    work, fixed = np.polyfit(np.asarray(INNERS, float), np.asarray(times), 1)
    tflops = flops / work / 1e12 if np.isfinite(flops) else float("nan")
    print(f"train step: {work*1e3:.2f} ms/step (fixed {fixed*1e3:.1f} ms), "
          f"XLA flops/step {flops:.3e}, achieved {tflops:.1f} TFLOP/s "
          f"({100*tflops*1e12/PEAK_BF16:.1f}% of bf16 peak), "
          f"{BATCH/work:.0f} fields/s", flush=True)
    for n, t in zip(INNERS, times):
        print(f"  N={n}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    # A/B the fused-forward custom_vjp training path (VERDICT r2 #5):
    #   python scripts/train_roofline.py          -> XLA baseline
    #   python scripts/train_roofline.py fused    -> fused forward legs
    #   python scripts/train_roofline.py fused noremat -> + no rollout remat
    #   python scripts/train_roofline.py fused xlabwd -> fused fwd, XLA bwd
    #   python scripts/train_roofline.py bf16     -> train-time DEFAULT
    #   matmul precision (1-pass bf16 MXU; CP rollouts stay HIGHEST)
    #   python scripts/train_roofline.py bf16act  -> bf16 activations +
    #   params (f32 masters) — halves the activation HBM traffic
    #   python scripts/train_roofline.py wide [bf16] -> width_time=128
    #   (production scale): substantiates the BASELINE claim that the low
    #   TFLOP/s at width 32 is MXU tile occupancy, not scheduling waste
    #   python scripts/train_roofline.py [bf16act] dots -> policy remat:
    #   save every MXU contraction output in the rollout scan, recompute
    #   only elementwise — trades saved-activation HBM for the full
    #   recompute pass of the default remat
    main(fused="fused" in sys.argv[1:], remat="noremat" not in sys.argv[1:],
         bwd_impl="xla" if "xlabwd" in sys.argv[1:] else "pallas",
         precision="bf16act" if "bf16act" in sys.argv[1:]
         else "default" if "bf16" in sys.argv[1:] else "highest",
         width=128 if "wide" in sys.argv[1:] else 32,
         remat_policy="dots_no_batch" if "dots_no_batch" in sys.argv[1:]
         else "dots" if "dots" in sys.argv[1:] else None)
