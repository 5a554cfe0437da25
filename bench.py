"""Benchmark: NS physics-residual + joint-CP calibration throughput.

North star (BASELINE.json): PRE fields/sec/chip on 2-D NS [BS, Nt, Nx, Ny]
plus joint-CP calibration wall-clock, vs the PyTorch CPU reference. The
timed pipeline is the full calibration block of `Joint/NS_Residuals_CP.py`:
momentum PRE on calibration-truth and prediction tensors, per-cell
modulation, sup-norm nonconformity scores, and the split-CP quantile.

The torch baseline reimplements the same math with `F.conv3d` + NumPy
(reference semantics, including its D_y==D_t kernel quirk is NOT needed
here — both sides use the same corrected stencils via explicit kernels) so
the comparison is pipeline-for-pipeline on this machine's CPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# benchmark shape: the reference NS config after slicing —
# [n_cal=100, (u,v,p), Nt=21, 100, 100] (`Joint/NS_Residuals_CP.py:115-135`)
N_CAL = 100
NVAR, NT, NX, NY = 3, 21, 100, 100
DT, DX, NU = 0.01, 0.01, 0.001
ALPHA = 0.1
REPS = 5
# Chained evaluations per dispatch: the tunnel costs a FIXED ~28 ms per
# dispatch (launch + host-fetch sync; `scripts/probe_slope.py`), so the
# per-call number is work + 28/INNER_ITERS ms. 400 iterations leave
# ~0.07 ms of amortised overhead on a ~1.3 ms pipeline (100 left ~0.3 ms —
# an 18% haircut on the reported number purely from tunnel dispatch; the
# chain is a fori_loop, so compile time does not scale with the count).
# The chaining guard lives in `cppre.utils.tpu_bench.chain_calls`
# (one-element in-place perturbation — the round-1 full-tensor guard added
# a ~1 ms copy pass per iteration and inflated every published number).
INNER_ITERS = 400


def _synthetic_fields(seed: int = 0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, NX, dtype=np.float32)
    t = np.linspace(0, 1, NT, dtype=np.float32)
    base = (
        np.sin(2 * np.pi * x)[None, None, None, :, None]
        * np.cos(2 * np.pi * x)[None, None, None, None, :]
        * np.exp(-t)[None, None, :, None, None]
    ).astype(np.float32)
    fields = np.broadcast_to(base, (N_CAL, NVAR, NT, NX, NY)).copy()
    fields += 0.05 * rng.standard_normal(fields.shape).astype(np.float32)
    pred = fields + 0.01 * rng.standard_normal(fields.shape).astype(np.float32)
    return fields, pred


def bench_jax(fields, pred):
    import jax.numpy as jnp

    from cppre.cp.inductive import calibrate, modulation_func, ncf_metric_joint
    from cppre.residuals.ns import PRE_NS
    from cppre.utils.jax_cache import enable_persistent_cache
    from cppre.utils.tpu_bench import dispatch_time

    enable_persistent_cache()

    pre = PRE_NS(DT, DX, DX, nu=NU)

    def once(truth, prediction):
        res_out = pre.residual_momentum(truth)
        res_pred = pre.residual_momentum(prediction)
        mod = modulation_func(res_out, res_pred) + 1e-6
        scores = ncf_metric_joint(res_out, res_pred, mod)
        return calibrate(scores, N_CAL, ALPHA)

    f = jnp.asarray(fields)
    p = jnp.asarray(pred)
    t_xla, q_xla = dispatch_time(once, INNER_ITERS, f, p, reps=REPS)
    # (the Pallas leg is timed only in the subprocess — see _pallas_leg)
    return min(t_xla, _bench_pallas_subprocess(q_xla)) / INNER_ITERS


PALLAS_TIMEOUT_S = 360  # strictly below any caller's own timeout (tests: 420)
PALLAS_TIMEOUT_TPU_S = 600  # remote compile ~100 s; 3 arms = 3 compiles
# (a timeout mid-arm is recoverable: the child streams PALLAS_T lines).
# 600 + the 300 s retry fits the healthy path inside RETRY_BUDGET_S with
# probe + XLA-leg + cached-torch margins (~1330 s worst case); the old
# 1000 + 500 could push a half-degraded run past the driver kill window.


def _bench_pallas_subprocess(q_xla: float, timeout_s: int | None = None) -> float:
    """Time the Pallas pipeline in a subprocess with a hard timeout: the
    remote-compile path for Pallas kernels can hang when the TPU tunnel is
    degraded, and the bench must never hang the driver. A failed TPU
    attempt is retried once — observed failures are transient tunnel
    degradation, and falling back to the ConvOps XLA leg costs ~12x on the
    reported number.

    The child inherits the parent's RESOLVED platform: a CPU-mode bench run
    (tests) must never send the child to the TPU tunnel."""
    import os
    import subprocess
    import sys

    import jax

    on_tpu = jax.default_backend() != "cpu"
    if timeout_s is None:
        timeout_s = PALLAS_TIMEOUT_TPU_S if on_tpu else PALLAS_TIMEOUT_S
    env = dict(os.environ)
    env["CPPRE_BENCH_PLATFORM"] = jax.default_backend()
    if env["CPPRE_BENCH_PLATFORM"] == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    def _best_t(stdout: str | bytes | None) -> float:
        # the child emits a PALLAS_T line after every arm (running best) so
        # a timeout mid-optional-arm still yields the anchor timing
        if not stdout:
            return float("inf")
        if isinstance(stdout, bytes):
            stdout = stdout.decode(errors="replace")
        ts = [float(line.split("=", 1)[1]) for line in stdout.splitlines()
              if line.startswith("PALLAS_T=")]
        return min(ts) if ts else float("inf")

    attempts = 2 if on_tpu else 1
    for attempt in range(attempts):
        # retry at a reduced budget: two full-budget TPU attempts would
        # overrun both JAX_LEG_TIMEOUT_S (orphaning the in-flight
        # grandchild) and the driver's own kill window (see RETRY_BUDGET_S)
        attempt_timeout = timeout_s if attempt == 0 else min(timeout_s, 300)
        try:
            dims = f"{N_CAL},{NT},{NX},{NY},{REPS},{INNER_ITERS}"
            out = subprocess.run(
                [sys.executable, __file__, "--pallas-leg", repr(q_xla), dims],
                capture_output=True, text=True, timeout=attempt_timeout,
                env=env,
            )
            t = _best_t(out.stdout)
            if t < float("inf"):
                return t
            # no timing line: distinguish a parity regression from a dead tunnel
            print(f"bench: pallas leg attempt {attempt + 1} produced no timing "
                  f"(exit {out.returncode}); stderr tail: {out.stderr[-400:]!r}",
                  file=sys.stderr)
            if "qhat mismatch" in out.stderr:
                break  # parity regression — retrying cannot fix it
        except subprocess.TimeoutExpired as e:
            t = _best_t(e.stdout)
            if t < float("inf"):
                print("bench: pallas leg timed out in an optional arm; "
                      "keeping the completed arms' timing", file=sys.stderr)
                return t
            print(f"bench: pallas leg attempt {attempt + 1} timed out "
                  f"(degraded TPU tunnel?)", file=sys.stderr)
        except (ValueError, OSError) as e:
            print(f"bench: pallas leg failed to launch: {e}", file=sys.stderr)
            break
    return float("inf")  # pallas leg unavailable; XLA number stands


def _pallas_leg(q_xla: float):
    import os

    import jax

    from cppre.utils.jax_cache import enable_persistent_cache

    # honour the platform the parent resolved (env vars are too late in this
    # environment: sitecustomize imports jax at startup pointed at the
    # remote TPU, so the override must go through jax.config post-import)
    platform = os.environ.get("CPPRE_BENCH_PLATFORM")
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # Persistent compile cache: the ~100 s remote Mosaic compile of the
    # fused kernel becomes a ~0 s executable reload on every warmed run —
    # and degraded tunnel windows that hang fresh Mosaic compiles
    # (RESULTS.md) can still serve the Pallas leg from cache.
    enable_persistent_cache()

    import jax.numpy as jnp

    from cppre.cp.inductive import calibrate
    from cppre.ops.pallas import ns_joint_cp_scores_fused
    from cppre.utils.tpu_bench import dispatch_time

    fields, pred = _synthetic_fields()

    f, p = jnp.asarray(fields), jnp.asarray(pred)

    def timed_arm(diff_dtype, g):
        def once(truth, prediction):
            # paired one-pass Pallas kernel (raised VMEM limit): truth and
            # prediction read once, |diff| + cross-batch moments in one grid
            # pass; slope-harness-measured 1.25 ms vs 1.51 ms for the
            # composed per-tensor-kernel path at this shape
            # (scripts/probe_slope.py, BASELINE.md roofline).
            scores = ns_joint_cp_scores_fused(truth, prediction, DT, DX, DX,
                                              NU, samples_per_block=g,
                                              diff_dtype=diff_dtype)
            return calibrate(scores, N_CAL, ALPHA)
        t_mean, q = dispatch_time(once, INNER_ITERS, f, p, reps=REPS)
        # one-pass variance (E[x^2]-E[x]^2) differs from two-pass at ~1e-4
        # rel; the bf16 staged diff adds ~1.4e-4 rel — both inside the gate
        if abs(q - q_xla) > 1e-3 * max(abs(q_xla), 1e-6):
            raise AssertionError(f"pallas/xla qhat mismatch: {q} vs {q_xla}")
        return t_mean

    # Mandatory parity anchor: the f32 single-sample-block arm (the
    # round-2/3 published configuration). A qhat mismatch here is a real
    # regression and must kill the leg. Emit the running best after every
    # arm: if a later arm's remote compile hangs into the subprocess
    # timeout, the parent recovers the anchor from the partial stdout.
    import sys
    t_best = timed_arm(None, 1)
    print(f"PALLAS_T={t_best}", flush=True)
    # Opportunistic arm, best-effort: samples_per_block=2 amortises
    # per-grid-step overhead at a BIT-IDENTICAL qhat (NS g-sweep: 1.05x —
    # results_scaling.json; on-chip rel_delta exactly 0.0 at these fields,
    # scripts/probe_bench_arms.py). The bf16 staged-diff arm is NOT tried:
    # it wins 1.08x on standard-normal fields at 1.4e-4 qhat delta
    # (scripts/bench_diff_dtype.py) but deterministically fails the 1e-3
    # gate at THIS smoother field distribution (2.06e-3 on chip — the
    # residual scale is smaller, so the relative bf16 rounding is larger),
    # so trying it would only waste a remote compile per run.
    # The arm must pass the same parity gate to count; a failed optional
    # arm (VMEM, lowering, parity) leaves the anchor number standing.
    # g=4 added after the robust-harness g-sweep re-measure: a modest but
    # uniform win over g=2 (ns 152.3k vs 148.3k fields/s) at the same
    # bit-identical qhat (results_scaling.json gsweep, 2026-08-20).
    for diff_dtype, g in ((None, 2), (None, 4)):
        try:
            t_arm = timed_arm(diff_dtype, g)
        except Exception as e:  # noqa: BLE001 — arm is optional by design
            dd = "f32" if diff_dtype is None else str(diff_dtype)
            print(f"bench: optional pallas arm ({dd}, g={g}) skipped: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)
            continue
        if t_arm < t_best:
            t_best = t_arm
            print(f"PALLAS_T={t_best}", flush=True)


def bench_torch_cpu(fields, pred):
    import torch
    import torch.nn.functional as F

    from cppre.ops.stencils import embed_kernel_3d, stencil_time_space

    k_t = torch.tensor(embed_kernel_3d(stencil_time_space(1, 1), 2))[None, None]
    k_x = torch.tensor(embed_kernel_3d(stencil_time_space(1, 1), 0))[None, None]
    k_y = torch.tensor(embed_kernel_3d(stencil_time_space(1, 1), 1))[None, None]
    k_lap = torch.tensor(embed_kernel_3d(stencil_time_space(2, 2), 0))[None, None]

    def conv(f, k):
        return F.conv3d(f.unsqueeze(1), k, padding=1).squeeze(1)

    def residual(v):
        u, vv, p = v[:, 0], v[:, 1], v[:, 2]
        res_x = (conv(u, k_t) * DX * DX + u * conv(u, k_x) * DT * DX
                 + vv * conv(u, k_y) * DT * DX - NU * conv(u, k_lap) * DT
                 + conv(p, k_x) * DT * DX)
        res_y = (conv(vv, k_t) * DX * DX + u * conv(vv, k_x) * DT * DX
                 + vv * conv(vv, k_y) * DT * DX - NU * conv(vv, k_lap) * DT
                 + conv(p, k_y) * DT * DX)
        return (res_x + res_y)[..., 1:-1, 1:-1, 1:-1]

    def pipeline(truth, prediction):
        res_out = residual(truth)
        res_pred = residual(prediction)
        diff = (res_out - res_pred).numpy()
        mod = diff.std(axis=0) + 1e-6
        scores = (np.abs(diff) / mod).max(axis=(1, 2, 3))
        q = min(np.ceil((N_CAL + 1) * (1 - ALPHA)) / N_CAL, 1.0)
        return np.quantile(scores, q, method="higher")

    f = torch.tensor(fields)
    p = torch.tensor(pred)
    with torch.no_grad():
        pipeline(f, p)  # warm-up
        times = []
        for _ in range(max(REPS // 3, 2)):
            t0 = time.perf_counter()
            pipeline(f, p)
            times.append(time.perf_counter() - t0)
    return float(np.mean(times))


TORCH_BASELINE_CACHE = "bench_torch_baseline.json"  # repo-relative, committed


def bench_torch_cpu_cached(fields, pred):
    """Disk-cached torch-CPU baseline. The baseline is machine-local and
    stable (~31 s/call, 0.3 % spread across rounds), so re-measuring it
    inside the capture-critical window after a late tunnel recovery only
    burns driver margin (VERDICT r04 weak #5): ~2.5 min of `F.conv3d` after
    the JAX leg already succeeded. Cache keyed by the benchmark dims; a
    fresh measurement writes through so the committed file tracks shape
    changes."""
    import os

    key = f"{N_CAL}x{NVAR}x{NT}x{NX}x{NY}_reps{REPS}"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        TORCH_BASELINE_CACHE)
    try:
        cache = json.load(open(path))
        if key in cache:
            return float(cache[key]["t_mean_s"])
    except (OSError, ValueError):
        cache = {}
    t = bench_torch_cpu(fields, pred)
    cache[key] = {"t_mean_s": t, "note": "seconds per pipeline call, "
                  "torch F.conv3d + NumPy CP on this machine's CPU"}
    try:
        json.dump(cache, open(path, "w"), indent=1)
    except OSError:
        pass  # read-only checkout: fall through with the fresh measurement
    return t


METRIC = "ns_pre_joint_cp_fields_per_sec"
UNIT = "fields/s/chip"
# Outage retry budget: the axon tunnel flaps — round 2 lost its number to a
# backend-init RuntimeError, and during long outages even backend discovery
# HANGS (the axon hook blocks inside xla_bridge.backends()). Every attempt
# therefore goes through a short-timeout subprocess probe first.
#
# The driver's own kill window is bracketed empirically: round 3 (budget
# 1500 s) exited rc=0 with its JSON line captured; round 4 (budget 2100 s)
# was killed rc=124 with NOTHING captured. So the driver waits somewhere in
# (~1500 s, ~2100 s] — stay strictly below the proven-safe point and never
# gamble above it again (VERDICT r04 #1). The error JSON line is ALSO
# emitted immediately when the first probe fails (see main), so even a
# kill mid-retry leaves a parseable tail.
RETRY_BUDGET_S = 1380.0
WATCHDOG_S = 1440  # in-process alarm: fires before the driver's earliest
# proven kill (~1500 s) and emits the final error JSON on its way out
RETRY_DELAY_S = 60.0
PROBE_TIMEOUT_S = 150.0  # jax import ~8 s + backend init + one tiny op
JAX_LEG_TIMEOUT_S = 1200  # one full XLA+Pallas leg incl. remote compiles
# (the pallas subprocess alone may take PALLAS_TIMEOUT_TPU_S; retry-path
# attempts are additionally capped by the remaining RETRY_BUDGET_S)


def _platform_env():
    """Forward the parent's RESOLVED jax platform to child processes via
    CPPRE_BENCH_PLATFORM. Env vars like JAX_PLATFORMS are NOT honoured at
    child startup here (sitecustomize imports jax pointed at the tunnel),
    so children must re-apply the platform through jax.config post-import —
    the same mechanism `_pallas_leg` already uses."""
    import os
    import sys

    env = dict(os.environ)
    if "jax" in sys.modules:
        import jax

        p = jax.config.jax_platforms
        if p:
            env["CPPRE_BENCH_PLATFORM"] = p
    return env


# applied by every child before touching the backend (see _platform_env)
_CHILD_PLATFORM_PRELUDE = (
    "import os, jax\n"
    "_p = os.environ.get('CPPRE_BENCH_PLATFORM')\n"
    "if _p:\n"
    "    jax.config.update('jax_platforms', _p)\n"
    "from cppre.utils.jax_cache import enable_persistent_cache\n"
    "enable_persistent_cache()\n"
)


def _probe_backend(timeout_s: float = PROBE_TIMEOUT_S) -> bool:
    """Can the default backend run a tiny op right now? Run in a subprocess
    with a hard timeout: a dead tunnel hangs rather than raising."""
    import subprocess
    import sys

    code = (_CHILD_PLATFORM_PRELUDE +
            "import jax.numpy as jnp\n"
            "assert float(jnp.sum(jnp.ones((64, 64)))) == 64 * 64\n")
    try:
        out = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                             capture_output=True, text=True,
                             env=_platform_env())
        return out.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _emit(value, vs_baseline, error=None):
    """A driver-parseable JSON line. On failure the numeric fields are null
    and `error` carries the diagnosis — never a bare traceback. Emitted
    immediately on the first probe failure AND as final state at exit
    (VERDICT r04 #1b): the driver reads the output tail, so the LAST line
    printed must always reflect the current best-known state, and a kill at
    any point mid-retry must still leave a parseable line behind."""
    rec = {"metric": METRIC, "value": value, "unit": UNIT,
           "vs_baseline": vs_baseline}
    if error is not None:
        rec["error"] = error
    print(json.dumps(rec), flush=True)


def _jax_leg_subprocess(timeout_s: float) -> float | None:
    """Run the whole JAX leg in a FRESH process: jax caches a failed
    backend init for the life of the process, so in-process retry after an
    'Unable to initialize backend' RuntimeError always re-raises — only a
    new process re-attempts the tunnel handshake."""
    import subprocess
    import sys

    dims = f"{N_CAL},{NT},{NX},{NY},{REPS},{INNER_ITERS}"
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--jax-leg", dims],
            capture_output=True, text=True, timeout=timeout_s,
            env=_platform_env(),
        )
    except subprocess.TimeoutExpired:
        print("bench: jax leg retry timed out (tunnel hang?)", file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("JAX_T="):
            return float(line.split("=", 1)[1])
    print(f"bench: jax leg retry exit {out.returncode}; stderr tail: "
          f"{out.stderr[-400:]!r}", file=sys.stderr)
    return None


def _jax_leg_child(dims: str):
    import os

    import jax

    from cppre.utils.jax_cache import enable_persistent_cache

    p = os.environ.get("CPPRE_BENCH_PLATFORM")
    if p:
        jax.config.update("jax_platforms", p)
    enable_persistent_cache()
    global N_CAL, NT, NX, NY, REPS, INNER_ITERS
    N_CAL, NT, NX, NY, REPS, INNER_ITERS = (int(v) for v in dims.split(","))
    fields, pred = _synthetic_fields()
    print(f"JAX_T={bench_jax(fields, pred)}")


def main():
    import sys

    # Field generation is deferred until a probe has passed: the synthetic
    # tensors are ~1 GB of numpy allocations (minutes under memory
    # pressure), and the outage path must emit its error JSON line fast.
    fields = pred = None
    deadline = time.monotonic() + RETRY_BUDGET_S
    t_jax = None
    err = None
    # Pre-flight probe in a subprocess: during outages backend discovery
    # HANGS (never raises), so never touch the backend in-process before a
    # probe has passed. On probe success run the leg in-process (fast path;
    # also what the CPU contract test exercises with jax_platforms pre-set);
    # backend-unavailable RuntimeErrors there fall through to the retry
    # loop, which uses FRESH processes — jax caches a failed backend init
    # for the life of the process.
    if _probe_backend():
        try:
            fields, pred = _synthetic_fields()
            t_jax = bench_jax(fields, pred)
        except RuntimeError as e:
            err = str(e).splitlines()[0][:300]
            print(f"bench: jax leg failed ({err}); retrying in fresh "
                  f"processes", file=sys.stderr)
            _emit(None, None, error=f"jax leg failed, retrying: {err}")
    else:
        err = "backend probe failed or timed out"
        print(f"bench: {err}; retrying with backoff", file=sys.stderr)
        # Emit the error line IMMEDIATELY (r04 lesson: the driver killed the
        # process mid-retry and captured nothing). Re-emitted as final state
        # below; a success later overwrites it as the last line.
        _emit(None, None, error=f"{err}; retrying "
                                f"({RETRY_BUDGET_S:.0f}s budget)")
    delay = RETRY_DELAY_S
    while t_jax is None and time.monotonic() < deadline:
        time.sleep(min(delay, max(deadline - time.monotonic(), 0)))
        remaining = deadline - time.monotonic()
        if remaining <= 30:
            break
        if not _probe_backend(min(PROBE_TIMEOUT_S, remaining)):
            delay = min(delay * 2, 480.0)
            continue
        t_jax = _jax_leg_subprocess(min(JAX_LEG_TIMEOUT_S, remaining))
        delay = min(delay * 2, 480.0)
    if t_jax is None:
        _emit(None, None, error=f"TPU backend unavailable after retries "
                                f"({RETRY_BUDGET_S:.0f}s budget): {err}")
        return
    if fields is None:  # jax leg ran in a retry subprocess
        fields, pred = _synthetic_fields()
    t_torch = bench_torch_cpu_cached(fields, pred)
    # "fields" processed per pipeline call: 2 tensors of N_CAL trajectories
    fields_per_call = 2 * N_CAL
    value = fields_per_call / t_jax
    baseline = fields_per_call / t_torch
    _emit(round(value, 2), round(value / baseline, 2))


if __name__ == "__main__":
    import signal
    import sys

    _is_child = len(sys.argv) > 1 and sys.argv[1] in ("--pallas-leg",
                                                      "--jax-leg")

    # Global watchdog: if the TPU tunnel hangs mid-run (it periodically
    # does), fail loudly instead of stalling the driver forever. Fires at
    # WATCHDOG_S — BEFORE the driver's earliest proven kill (~1500 s,
    # BENCH_r03 vs r04) — so the parent always emits the final
    # driver-parseable JSON line on its way out. Exit 0: round 3 proved the
    # driver records a clean parse from an rc=0 error line.
    def _alarm(signum, frame):
        print("bench: watchdog expired — TPU tunnel unresponsive", file=sys.stderr)
        if not _is_child:
            _emit(None, None, error=f"watchdog expired: TPU tunnel hung "
                                    f"mid-run ({WATCHDOG_S}s)")
            sys.exit(0)
        sys.exit(1)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(WATCHDOG_S if not _is_child else 2400)

    if len(sys.argv) > 2 and sys.argv[1] == "--pallas-leg":
        if len(sys.argv) > 3:  # dims forwarded by the parent process
            N_CAL, NT, NX, NY, REPS, INNER_ITERS = (
                int(v) for v in sys.argv[3].split(","))
        _pallas_leg(float(sys.argv[2]))
    elif len(sys.argv) > 2 and sys.argv[1] == "--jax-leg":
        _jax_leg_child(sys.argv[2])
    else:
        main()
