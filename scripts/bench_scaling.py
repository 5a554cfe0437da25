"""Grid-size scaling of the NS joint-CP pipeline on the real chip.

Sweeps the flagship NS momentum PRE + joint-CP score pipeline
(`Joint/NS_Residuals_CP.py:231-263` flow) across spatial grids from the
bench shape (100x100) up to 512x512, timing whatever path the production
routing picks (`cppre/ops/pallas/stencil_kernels.py::_joint_cp_diff_stats`:
paired one-pass kernel -> composed per-tensor kernels -> DMA-chunked
kernel as the VMEM estimate grows), plus the explicit DMA-chunked kernel
at every non-paired shape for comparison, plus one large MHD shape through
the generalized chunked route.

Prints one row per (shape, path): work ms/call (slope harness), fields/s,
effective GB/s against the path's true HBM traffic.

Run: timeout 3000 python scripts/bench_scaling.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from cppre.cp.inductive import calibrate
from cppre.ops.pallas import stencil_kernels as sk
from cppre.utils.tpu_bench import slope_time

ALPHA = 0.1
DT = DX = DY = 0.01
NU = 1e-3
REPS = 3

# (BS, NVAR, NT, N, N): batch shrinks as the grid grows so the tensors
# stay ~250 MB and fit HBM alongside their pipeline temporaries
SHAPES = [
    (100, 3, 21, 100, 100),   # flagship bench shape (paired one-pass)
    (100, 3, 21, 128, 128),
    (50, 3, 21, 256, 256),    # composed per-tensor route
    (12, 3, 21, 512, 512),    # chunked route (single block exceeds VMEM)
]


def traffic_bytes(shape, path: str) -> int:
    """True HBM bytes per pipeline call for each strategy."""
    bs, nvar, nt, nx, ny = shape
    in_b = 2 * bs * nvar * nt * nx * ny * 4          # truth + prediction read
    diff_b = bs * (nt - 2) * (nx - 2) * (ny - 2) * 4  # diff tensor
    if path in ("paired", "chunked"):
        # inputs once, diff written once + re-read by the score pass
        # (chunked additionally re-reads a 2-frame halo per time chunk)
        return in_b + 2 * diff_b
    if path == "composed":
        # per-tensor residual kernels write res_out/res_pred, XLA re-reads
        # both to form diff, writes diff, score pass re-reads it
        return in_b + 5 * diff_b
    if path == "xla":
        # at best the composed accounting (re-reads inputs per stencil tap)
        return in_b + 5 * diff_b
    raise ValueError(path)


def predicted_route(shape):
    """The production routing decision in _joint_cp_diff_stats."""
    return sk.routing_decision(shape)


RESULTS = {"rows": [], "gsweep": []}


def _persist():
    """Incremental dump: the tunnel can die mid-sweep and the refresh
    driver only keeps a 3-line tail of stage stdout."""
    with open("/root/repo/results_scaling.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


def report(shape, path, work, q):
    bs = shape[0]
    fields = 2 * bs / work
    gbs = traffic_bytes(shape, path) / work / 1e9
    print(f"[{bs:4d},{shape[1]},{shape[2]},{shape[3]:3d},{shape[4]:3d}] "
          f"{path:9s}: {work*1e3:8.2f} ms/call  {fields:9.0f} fields/s  "
          f"~{gbs:5.0f} GB/s  qhat={q:.5f}", flush=True)
    RESULTS["rows"].append({"shape": list(shape), "path": path,
                            "ms_per_call": work * 1e3, "fields_s": fields,
                            "gb_s": gbs, "qhat": float(q)})
    _persist()


def run_shape(shape):
    bs, nvar, nt, nx, ny = shape
    rng = np.random.default_rng(nx)
    t_np = rng.standard_normal(shape).astype(np.float32)
    p_np = t_np + 0.01 * rng.standard_normal(shape).astype(np.float32)
    t, p = jnp.asarray(t_np), jnp.asarray(p_np)
    route = predicted_route(shape)

    def routed(tt, pp):
        s = sk.ns_joint_cp_scores_fused(tt, pp, DT, DX, DY, NU)
        return calibrate(s, bs, ALPHA)

    def chunked(tt, pp):
        d, s, sq = sk.ns_joint_cp_diff_stats_chunked(tt, pp, DT, DX, DY, NU)
        sc = sk._scores_from_diff_stats(d, s, sq, bs, 1e-6)
        return calibrate(sc, bs, ALPHA)

    work, _, q = slope_time(routed, t, p, inners=(4, 12, 36), reps=REPS)
    report(shape, route, work, float(np.asarray(q).ravel()[0]))
    if route == "composed":
        # compare the explicit chunked kernel wherever it isn't the route
        try:
            work_c, _, q_c = slope_time(chunked, t, p, inners=(4, 12, 36),
                                        reps=REPS)
            report(shape, "chunked", work_c, float(np.asarray(q_c).ravel()[0]))
        except Exception as e:
            print(f"  chunked: FAILED {str(e).splitlines()[0][:90]}",
                  flush=True)


def run_mhd_large():
    """One large MHD shape through the generalized chunked route
    (6 fields: whole-trajectory blocks exceed VMEM well before NS does)."""
    shape = (25, 6, 21, 256, 256)
    bs = shape[0]
    rng = np.random.default_rng(7)
    t_np = (rng.standard_normal(shape) + 2.0).astype(np.float32)
    p_np = t_np + 0.01 * rng.standard_normal(shape).astype(np.float32)
    t, p = jnp.asarray(t_np), jnp.asarray(p_np)

    def routed(tt, pp):
        s = sk.mhd_induction_joint_cp_scores_fused(tt, pp)
        return calibrate(s, bs, ALPHA)

    try:
        work, _, q = slope_time(routed, t, p, inners=(4, 12, 36), reps=REPS)
        report(shape, predicted_route(shape), work,
               float(np.asarray(q).ravel()[0]))
    except Exception as e:
        print(f"  mhd-large: FAILED {str(e).splitlines()[0][:90]}", flush=True)


def run_wave_large():
    """One accumulator-dominated wave shape through the chunked route
    ([12, 26, 512, 512]: the VMEM grant must track the footprint model
    that admitted the shape — regression for the guard/grant split)."""
    import cppre.ops.pallas.stencil_kernels as sk2
    from cppre.ops.stencils import embed_kernel_3d, stencil_2d

    shape = (12, 26, 512, 512)
    bs = shape[0]
    kernel = (embed_kernel_3d(np.asarray(stencil_2d(2)), 2)
              - 0.25 * embed_kernel_3d(np.asarray(stencil_2d(2)), 0))
    rng = np.random.default_rng(9)
    t_np = rng.standard_normal(shape).astype(np.float32)
    p_np = t_np + 0.01 * rng.standard_normal(shape).astype(np.float32)
    t, p = jnp.asarray(t_np), jnp.asarray(p_np)

    def routed(tt, pp):
        s = sk2.wave_joint_cp_scores_fused(tt, pp, kernel)
        return calibrate(s, bs, ALPHA)

    try:
        work, _, q = slope_time(routed, t, p, inners=(4, 12, 36), reps=REPS)
        report((bs, 1) + shape[1:], "chunked", work,
               float(np.asarray(q).ravel()[0]))
    except Exception as e:
        print(f"  wave-large: FAILED {str(e).splitlines()[0][:90]}",
              flush=True)


def run_gsweep():
    """samples_per_block A/B at the flagship wave/MHD/NS shapes: does
    packing g samples per grid step amortise per-program overhead?"""
    from cppre.ops.stencils import embed_kernel_3d, stencil_2d

    kernel = (embed_kernel_3d(np.asarray(stencil_2d(2)), 2)
              - 0.25 * embed_kernel_3d(np.asarray(stencil_2d(2)), 0))
    rng = np.random.default_rng(13)

    cases = []
    w = rng.standard_normal((200, 21, 64, 64)).astype(np.float32)
    cases.append(("wave", (jnp.asarray(w), jnp.asarray(
        w + 0.01 * rng.standard_normal(w.shape).astype(np.float32))),
        lambda t, p, g: sk.wave_joint_cp_scores_fused(
            t, p, kernel, samples_per_block=g)))
    m = (rng.standard_normal((100, 6, 21, 64, 64)) + 2.0).astype(np.float32)
    cases.append(("mhd", (jnp.asarray(m), jnp.asarray(
        m + 0.01 * rng.standard_normal(m.shape).astype(np.float32))),
        lambda t, p, g: sk.mhd_induction_joint_cp_scores_fused(
            t, p, samples_per_block=g)))
    n = rng.standard_normal((100, 3, 21, 100, 100)).astype(np.float32)
    cases.append(("ns", (jnp.asarray(n), jnp.asarray(
        n + 0.01 * rng.standard_normal(n.shape).astype(np.float32))),
        lambda t, p, g: sk.ns_joint_cp_scores_fused(
            t, p, DT, DX, DY, NU, samples_per_block=g)))

    for name, (t, p), fn in cases:
        bs = t.shape[0]
        for g in (1, 2, 4):
            def pipeline(tt, pp, g=g):
                return calibrate(fn(tt, pp, g), bs, ALPHA)

            try:
                work, _, q = slope_time(pipeline, t, p, inners=(4, 12, 36),
                                        reps=REPS)
                print(f"  gsweep {name:5s} g={g}: {work*1e3:7.3f} ms/call  "
                      f"{2*bs/work:9.0f} fields/s  qhat={q:.5f}", flush=True)
                RESULTS["gsweep"].append(
                    {"family": name, "g": g, "ms_per_call": work * 1e3,
                     "fields_s": 2 * bs / work, "qhat": float(q)})
                _persist()
            except Exception as e:
                print(f"  gsweep {name:5s} g={g}: FAILED "
                      f"{str(e).splitlines()[0][:80]}", flush=True)


def main(leg: str | None = None):
    print("backend:", jax.default_backend(), flush=True)
    if leg == "gsweep":
        # re-measure ONLY the g-sweep, keeping the banked rows: needed
        # after the wave samples_per_block forwarding fix (the 2026-08-19
        # wave g-sweep rows were three g=1 runs — the argument was
        # silently dropped; see tests/test_pallas_kernels.py::
        # test_wave_scores_forward_samples_per_block)
        try:
            with open("/root/repo/results_scaling.json") as f:
                RESULTS.update(json.load(f))
        except (OSError, ValueError):
            pass
        RESULTS["gsweep"] = []
        run_gsweep()
        return
    for shape in SHAPES:
        run_shape(shape)
    run_mhd_large()
    run_wave_large()
    run_gsweep()


if __name__ == "__main__":
    import sys as _sys

    main(_sys.argv[1] if len(_sys.argv) > 1 else None)
