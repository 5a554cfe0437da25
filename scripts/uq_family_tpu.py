"""UQ-method comparison for one family on TPU (VERDICT r2 item 6).

Usage: timeout 14000 python scripts/uq_family_tpu.py \
           [Navier-Stokes|MHD|Wave] [in|out] [full|refbudget]

Scales: (none) = the 10x150 raised protocol (5x50 for OOD);
`full` = reference-exact 10x300 eval resampling (with `out`: OOD at the
same 10x300 — eval-only via the weights cache); `refbudget` = the TRUE
reference training budget (500 epochs / 500 train sims / 500-sim pool,
`Other_UQ/Experiments/Wave_FNO.py:102-103`).

Runs the Other_UQ evaluation protocol (`Other_UQ/Evaluation/Eval.py`) for
all 8 methods and merges the result into `results_uq.json`, keyed per
family (with an " (OOD)" suffix for `out`-distribution runs — reference
`data_loaders.py:15-92`: half wave speed / 10x viscosity / disjoint MHD
design box). In-dist
families run the raised 10x150 protocol; OOD runs keep the base 5x50.
Re-runs of an identical protocol resume per-method.
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OVERRIDES = {
    # flap-tolerance: trained weights cache to disk keyed by a protocol
    # fingerprint, so a tunnel drop mid-protocol only loses eval work
    # (cppre/uq/run_eval.py). Repo-local (gitignored) so it also survives
    # machine restarts between campaign windows — /tmp does not, and a
    # wiped cache forces a full retrain of every pending method.
    "train_cache_dir": "/root/repo/.uq_train_cache",
    "Train Precision": "default",  # bf16 MXU training; eval stays HIGHEST
    "Epochs": 60,
    "n_total": 120,
    "runs": 5,       # bootstrap resamples (reference: 10 x 300 sims)
    "n_eval": 50,    # sims per resample
    "samples": 5,    # MC samples per stochastic method
    "n_ensemble": 3,
}

# Wave runs at (toward-)reference scale (VERDICT r2 item 6): >=10 resamples
# with trained models reused across resamples (the harness trains once per
# method — eval is the cheap part, as in `Other_UQ/Evaluation/Eval.py:121-122`)
# and n_eval >= 150 test sims per resample.
FAMILY_OVERRIDES = {
    "Wave": {
        "n_total": 210,
        "n_train_eval": 60,
        "runs": 10,
        "n_eval": 150,
        "samples": 10,
    },
    # same raised protocol for the other two families (round 3: the 5x50
    # runs are superseded whenever these complete on chip)
    "Navier-Stokes": {
        "n_total": 210,
        "n_train_eval": 60,
        "runs": 10,
        "n_eval": 150,
        "samples": 10,
    },
    "MHD": {
        "n_total": 210,
        "n_train_eval": 60,
        "runs": 10,
        "n_eval": 150,
        "samples": 10,
        # 6 variables: the unchunked MC-eval footprint (fc1's
        # [150, 6, 64, 64, 256] intermediate per sample) ResourceExhausted'd
        # the 16 GB v5e twice (2026-08-19); 3 pieces of 50 bound it
        "batch_chunk": 50,
    },
}


PATH_ = "/root/repo/results_uq.json"


def _load_existing():
    existing = json.load(open(PATH_)) if os.path.exists(PATH_) else {}
    if "Wave" not in existing and "Deterministic" in existing:
        # migrate the round-1 flat (Wave-only) layout to per-family
        existing = {"Wave": existing}
        existing["Wave"]["_protocol"] = {
            "Epochs": 60, "n_total": 120, "runs": 5, "n_eval": 50,
            "samples": 5, "note": "round-1 run, see RESULTS.md"}
    return existing


def main(case: str = "Navier-Stokes", dist: str = "in", scale: str = ""):
    from cppre.uq.run_eval import run

    if dist not in ("in", "out"):
        # "OOD"/"Out"/"ood" would otherwise run the IN-dist protocol but
        # bank it under the "(OOD)" key — hours of chip time mislabeled
        raise SystemExit(f"dist must be 'in' or 'out', got {dist!r}")
    overrides = dict(OVERRIDES, **FAMILY_OVERRIDES.get(case, {}))
    if scale == "refbudget":
        # TRUE reference training budget (VERDICT r04 #3): 500 epochs on
        # 500 train sims, evaluated 10 x 300 resampled from a 500-sim test
        # pool — the exact numbers of `Other_UQ/Experiments/Wave_FNO.py:
        # 102-103` (ntrain=500, ntest=500), `Configs/Wave_FNO.yaml:6`
        # (Epochs: 500, Batch Size: 50) and `Evaluation/Eval.py:68-69,
        # 121-122, 225-237` (10 resamples x ntest=300, samples=5 MC draws,
        # 5 ensemble members). Training rides bf16 activations (the
        # A/B-validated fast path; eval rollouts stay HIGHEST f32).
        if dist != "in":
            raise SystemExit("scale=refbudget is defined for in-dist")
        overrides.update({
            "Epochs": 500, "n_total": 1000, "n_train_eval": 500,
            "Batch Size": 50, "runs": 10, "n_eval": 300, "samples": 5,
            "n_ensemble": 5, "Train Precision": "bf16",
        })
        overrides.pop("n_eval_extra", None)  # pool is already 500
        # cheapest-training-first: Deterministic/AER/PRE share one base
        # training; Ensemble's five 500-epoch members go last so a
        # budget-killed run banks the headline CP rows and the SWAG/MLE
        # rankings (the ones unstable at 60 epochs) first
        overrides["UQ"] = ["Deterministic", "AER", "PRE", "MLE", "Dropout",
                          "SWAG", "Bayesian", "Ensemble"]
    elif scale == "full" and dist == "out":
        # OOD at protocol scale (VERDICT r04 #4): the reference runs the
        # SAME 10 x 300 protocol with `Dist: out`
        # (`Other_UQ/Evaluation/data_loaders.py:15-92`); training stays
        # in-dist at the 10x150 family config, so the fingerprint-keyed
        # weights cache makes this eval-only.
        overrides.update(Dist="out", runs=10, n_eval=300, n_eval_pool=450)
    elif scale == "full":
        # reference-scale protocol: 10 bootstrap resamples x 300 eval sims
        # drawn WITHOUT replacement from a strictly larger pool, as the
        # reference does (`Other_UQ/Evaluation/Eval.py:121-122` draws 300
        # from the full post-ntrain dataset). Pool = 450 (ratio 1.5): a
        # pool equal to n_eval would make every "resample" the identical
        # set permuted, collapsing the reported +-std to float-reduction
        # noise for the permutation-invariant methods (ADVICE r03, fixed
        # round 4). Extra sims come from fresh disjoint seeds
        # (`n_eval_extra`, cppre/uq/run_eval.py) — the training block and
        # hence the weights-cache fingerprint are unchanged, so the 10x150
        # run's trained models are reused and this stage is eval-only.
        if dist != "in":
            raise SystemExit("scale=full is defined for the in-dist protocol")
        pool = overrides["n_total"] - overrides.get("n_train_eval",
                                                    overrides["n_total"] // 2)
        # n_eval_extra_chunk is pinned EXPLICITLY because it is
        # data-affecting (chunk seeds depend on the chunk offsets,
        # cppre/uq/run_eval.py; ADVICE r04): 100 is the historical default
        # every banked full-protocol pool was generated with.
        overrides.update(runs=10, n_eval=300,
                         n_eval_extra=max(0, 450 - pool),
                         n_eval_extra_chunk=100)
        # CP-first method order: methods are statistically independent
        # (same fixed split, per-method training), so order only decides
        # what a budget-killed run has banked — put the paper's headline
        # methods (AER/PRE) and the cheap evals before the expensive
        # MC-sampling baselines.
        overrides["UQ"] = ["Deterministic", "AER", "PRE", "MLE", "Dropout",
                           "Ensemble", "SWAG", "Bayesian"]
    elif scale:
        raise SystemExit(f"unknown scale {scale!r} "
                         f"(only 'full' or 'refbudget')")
    if dist == "out" and scale != "full":
        # OOD protocol (reference `Other_UQ/Evaluation/data_loaders.py`:
        # half wave speed / 10x viscosity / disjoint MHD design box).
        # Training stays IN-dist at the SAME config as the in-dist run
        # (run_eval loads in-dist for training regardless of Dist), so the
        # fingerprint-keyed train cache reuses the in-dist weights and the
        # stage is nearly train-free; the base eval protocol keeps the
        # 5x50 — the point is the coverage signature under shift
        # (scale='full' raises it to the reference 10x300, handled above)
        overrides.update(Dist="out", runs=5, n_eval=50, n_eval_pool=60)
    key = case if dist == "in" else f"{case} (OOD)"
    if scale == "full":
        # separate key: a mid-run kill must not degrade the completed
        # 10x150 family entry — the full-scale table accretes beside it
        key = f"{case} (OOD full)" if dist == "out" else f"{case} (full)"
    elif scale == "refbudget":
        key = f"{case} (ref-budget)"
    t0 = time.perf_counter()

    # Per-method resume: a prior run of the SAME protocol that was killed
    # mid-way left a `_partial` family entry with the finished methods
    # banked — keep those and only compute the rest. (Methods are
    # statistically independent: each trains and bootstraps on the same
    # fixed split, so skipping completed ones changes nothing.)
    prev = _load_existing().get(key, {})
    prev_proto = dict(prev.get("_protocol", {}))
    done = {}
    # batch_chunk is a memory knob and train_cache_dir a resume knob, not
    # protocol changes (identical statistics, see cppre.uq.eval /
    # run_eval) — ignore them when deciding resumability so adding either
    # doesn't throw away hours of banked per-method results.
    # "UQ" (method set/order) is also non-protocol: methods are independent
    # — order only affects banking priority under a kill, never statistics.
    _NONPROTO = ("batch_chunk", "train_cache_dir", "UQ")
    _cmp_prev = {k: v for k, v in prev_proto.items() if k not in _NONPROTO}
    _cmp_now = {k: v for k, v in overrides.items() if k not in _NONPROTO}
    # n_eval_extra_chunk became an explicit protocol field in round 5 (it
    # was always data-affecting); partial entries banked before then ran at
    # the implicit default 100, so treat its absence as 100 for resume.
    if "n_eval_extra" in _cmp_prev and "n_eval_extra_chunk" in _cmp_now:
        _cmp_prev.setdefault("n_eval_extra_chunk", 100)
    if _cmp_prev.pop("_partial", False) and _cmp_prev == _cmp_now:
        done = {k: v for k, v in prev.items()
                if not k.startswith("_") and isinstance(v, dict) and "l2" in v}
        if done:
            print(f"resuming {key}: keeping {sorted(done)}", flush=True)

    # the stored protocol omits the cache path (host-local, non-statistical)
    proto_store = {k: v for k, v in overrides.items() if k != "train_cache_dir"}
    partial = {"_protocol": dict(proto_store, _partial=True)}
    partial.update(done)

    def bank(uq, result):
        """Per-method incremental save: a stage killed mid-protocol (tunnel
        flap, round end) keeps every completed method. The superseded
        family entry is only replaced once the first method lands."""
        partial[uq] = result
        partial["_wall_s"] = time.perf_counter() - t0
        existing = _load_existing()
        existing[key] = dict(partial)
        json.dump(existing, open(PATH_, "w"), indent=1)
        print(f"banked {uq} -> {PATH_}", flush=True)

    res = run(case, overrides=overrides, verbose=True, on_method_done=bank,
              skip=tuple(done))
    res.update({k: v for k, v in done.items() if k not in res})
    res["_wall_s"] = time.perf_counter() - t0
    res["_protocol"] = dict(proto_store)

    existing = _load_existing()
    existing[key] = res
    json.dump(existing, open(PATH_, "w"), indent=1)
    print("wrote", PATH_, flush=True)
    for m, r in res.items():
        if isinstance(r, dict) and "l2" in r:
            print(f"{m:14s} l2 {r['l2'][0]:.3e}+-{r['l2'][1]:.1e}  "
                  f"cov {r['coverage'][0]:.3f}+-{r['coverage'][1]:.3f}  "
                  f"t {r['eval_time'][0]:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Navier-Stokes",
         sys.argv[2] if len(sys.argv) > 2 else "in",
         sys.argv[3] if len(sys.argv) > 3 else "")
