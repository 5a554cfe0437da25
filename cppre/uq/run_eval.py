"""UQ comparison driver: `python -m cppre.uq.run_eval Wave [config.yaml]`.

Reproduces `Other_UQ/Evaluation/Eval.py:13-424`: load the YAML config,
build the case's data + PRE class, train (or load) each UQ variant, then
run the bootstrap comparison protocol. The reference loads pretrained run
names from `Runs:`; entries present in the config are loaded via
`cppre.utils.checkpoint`, missing ones train in-script.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import FNO2d
from ..models.swag import SWAG
from ..models.variants import FNO2dBayesian, make_dropout_fno, make_mle_fno
from ..train.loops import fit, make_optimizer
from ..train.losses import lp_loss
from ..train.normalizers import MinMaxNormalizer
from ..utils.checkpoint import checkpoint_name, load_checkpoint, save_checkpoint
from ..utils.config import load_config
from . import data_loaders
from .eval import evaluate_uq_methods
from .train import fit_swag, make_bayesian_train_step, make_mle_train_step

_CASES = {"Wave": data_loaders.load_wave, "Navier-Stokes": data_loaders.load_ns,
          "MHD": data_loaders.load_mhd}


def _fit_generic(model, a, u, cfg, train_step_factory, seed=0, rngs_per_step=False,
                 apply_fn=None):
    import optax

    T_out, step = cfg["T_out"], cfg["Step"]
    bs = min(cfg["Batch Size"], a.shape[0])
    tx = make_optimizer(cfg["Learning Rate"], cfg["Scheduler Step"],
                        cfg["Scheduler Gamma"], max(a.shape[0] // bs, 1))
    init_rngs = {"params": jax.random.PRNGKey(seed), "bayes": jax.random.PRNGKey(seed + 1)}
    params = model.init(init_rngs, a[:1])
    opt_state = tx.init(params)
    train_step = train_step_factory(apply_fn or model.apply, tx, step, T_out)
    key = jax.random.PRNGKey(seed)
    loss = None
    for ep in range(cfg["Epochs"]):
        key, sub = jax.random.split(key)
        perm = jax.random.permutation(sub, a.shape[0])
        for i in range(0, a.shape[0] - bs + 1, bs):
            idx = perm[i : i + bs]
            if rngs_per_step:
                key, k2 = jax.random.split(key)
                params, opt_state, loss = train_step(params, opt_state, a[idx], u[idx], k2)
            else:
                params, opt_state, loss = train_step(params, opt_state, a[idx], u[idx])
        # Host-fetch once per epoch: bounds the async dispatch queue on
        # remote backends (an unsynced multi-hundred-step queue plus the
        # eval dispatched on top of it ResourceExhausted'd the 16 GB v5e
        # on the MHD 10x150 protocol, 2026-08-19). `block_until_ready`
        # does NOT block through the axon tunnel — fetch a scalar instead.
        if loss is not None:
            float(loss)
    return params


def run(case: str = "Wave", config_path: str | None = None,
        overrides: dict | None = None, verbose: bool = True,
        on_method_done=None, skip=()):
    cfg_file = config_path or os.path.join(
        os.path.dirname(__file__), "configs", f"{'NS' if case == 'Navier-Stokes' else case}_FNO.yaml")
    cfg = load_config(cfg_file)
    cfg.update(overrides or {})
    seed = cfg.get("Seed", 0)

    # The IN-distribution dataset always backs training, normalizer fit and
    # the PRE's physics constants — the reference's `Dist` switch selects
    # only the EVALUATION data (`Eval.py:62-84` loads pretrained in-dist
    # models from the run registry and builds PRE with the assumed/default
    # physics, e.g. PRE_NS hardcodes nu=1e-3 even on the 10x-viscosity OOD
    # set; `data_loaders.py:15-92`). Loading in-dist with the same
    # (n_total, seed) as the in-dist run makes the training block — and
    # hence the train-cache fingerprint — identical across Dist settings.
    dist = cfg.get("Dist", "in")
    data, pre, sim_cfg = _CASES[case]("in", n=cfg.get("n_total", 60),
                                      seed=seed)
    cfg = {**sim_cfg, **cfg}
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    data = jnp.asarray(data)
    a_all, u_all = data[..., :T_in], data[..., T_in : T_in + T_out]
    norm_in, norm_out = MinMaxNormalizer(a_all), MinMaxNormalizer(u_all)
    a_all, u_all = norm_in.encode(a_all), norm_out.encode(u_all)
    n_train = cfg.get("n_train_eval", data.shape[0] // 2)
    tr_a, tr_u = a_all[:n_train], u_all[:n_train]
    if dist == "out":
        # shifted-physics eval pool, encoded with the IN-dist normalizers
        # (the reference pairs pretrained models with their saved norms)
        n_pool = cfg.get("n_eval_pool", cfg.get("n_total", 60) - n_train)
        data_out, _pre_out, _ = _CASES[case]("out", n=n_pool, seed=seed)
        data_out = jnp.asarray(data_out)
        te_a = norm_in.encode(data_out[..., :T_in])
        te_u = norm_out.encode(data_out[..., T_in : T_in + T_out])
    else:
        te_a, te_u = a_all[n_train:], u_all[n_train:]
        # `n_eval_extra`: widen the in-dist EVAL pool to reference scale
        # (10 resamples x 300 test sims, `Other_UQ/Evaluation/Eval.py:
        # 121-122`) without touching the training block. Extra sims are
        # fresh iid draws from the same simulator at a disjoint seed,
        # encoded with the in-dist normalizers like the rest of the pool.
        # Not part of the train-cache fingerprint: training data, seeds
        # and trajectory are bit-identical with or without it, so cached
        # weights from the 10x150 protocol are exactly reused.
        # Generated in host-bounded chunks: one batched solve of 300 MHD
        # sims ResourceExhausted'd the 16 GB v5e (round-4; the solver state
        # is batch x 6 fields x N^2 x stored steps). Each chunk is pulled
        # to host before the next dispatches; chunks use disjoint seeds, so
        # the pool is the same kind of fresh-iid draw either way.
        #
        # WARNING (ADVICE r04): `n_eval_extra_chunk` is NOT a
        # statistics-identical memory knob like `batch_chunk` — chunk seeds
        # are seed + 7919 + offset, so a different chunk size draws a
        # DIFFERENT extra pool. It is therefore part of the banked protocol
        # (scripts/uq_family_tpu.py pins it explicitly at the historical
        # default 100); changing it invalidates cross-run comparability of
        # the eval pool, though never the training block or weights cache.
        n_extra = int(cfg.get("n_eval_extra", 0) or 0)
        chunk = int(cfg.get("n_eval_extra_chunk", 100) or n_extra or 1)
        off = 0
        while off < n_extra:
            m = min(chunk, n_extra - off)
            data_x, _pre_x, _ = _CASES[case]("in", n=m,
                                             seed=seed + 7919 + off)
            data_x = jnp.asarray(data_x)
            te_a = jnp.concatenate(
                [te_a, norm_in.encode(data_x[..., :T_in])])
            te_u = jnp.concatenate(
                [te_u, norm_out.encode(data_x[..., T_in : T_in + T_out])])
            off += m

    kw = dict(T_in=T_in, step=step, modes1=cfg["Modes"], modes2=cfg["Modes"],
              num_vars=cfg["Variables"], width_time=cfg["Width_time"])
    base_cfg = dict(cfg)
    run_names = cfg.get("Runs") or {}

    # TRAINING-only matmul precision (reference protocol trains in torch f32;
    # 'default' = 1-pass bf16 MXU contractions, A/B-validated on the flagship
    # pipelines — BASELINE.md "Train-time matmul precision"). EVALUATION
    # always uses the unwrapped f32-HIGHEST apply: the CP methods (AER/PRE)
    # calibrate on eval rollouts, where exchangeability binds.
    train_prec = cfg.get("Train Precision", "highest")

    def _train_apply(model):
        if train_prec == "highest":
            return model.apply
        if train_prec == "bf16":
            from ..models import with_activation_dtype

            return with_activation_dtype(model.apply)
        from ..models import with_matmul_precision

        return with_matmul_precision(model.apply, train_prec)

    _cache = {}

    # Trained-params disk cache (opt-in via `train_cache_dir`): training is
    # the expensive half of the protocol (60 epochs per method on the
    # remote chip) and the tunnel flaps — a killed run that had finished a
    # method's training but not its eval would otherwise retrain from
    # scratch on resume. Weights are keyed by a fingerprint of every
    # config field that determines them, so a protocol change invalidates
    # the cache rather than silently reusing stale weights. Same seeds ->
    # same training trajectory, so cached weights are exactly what a fresh
    # run would produce.
    cache_dir = cfg.get("train_cache_dir")
    if cache_dir:
        import hashlib
        import json as _json

        _fp_src = {k: cfg.get(k) for k in (
            "Case", "Epochs", "Batch Size", "Learning Rate",
            "Scheduler Step", "Scheduler Gamma", "T_in", "T_out", "Step",
            "Modes", "Width_time", "Variables", "Seed", "n_total",
            "n_train_eval", "Train Precision", "n_ensemble")}
        # training is ALWAYS in-distribution (the Dist switch shifts only
        # the eval pool, see above) — pin the fingerprint's Dist field so
        # an OOD run reuses the in-dist run's cached weights
        _fp_src["Dist"] = "in"
        _fp = hashlib.sha1(_json.dumps(_fp_src, sort_keys=True, default=str)
                           .encode()).hexdigest()[:12]

    def _cache_path(tag):
        return os.path.join(cache_dir, f"uq_{cfg['Case']}_{tag}_{_fp}")

    def _cache_load(tag, template):
        """`template` may be the params pytree or a zero-arg thunk building
        it — the thunk form avoids a wasted model.init (a traced+compiled
        dispatch on the remote TPU) when the cache is disabled or misses."""
        if not cache_dir:
            return None
        path = _cache_path(tag)
        if not os.path.exists(path + ".ckpt"):
            return None
        if verbose:
            print(f"[train-cache] {tag} <- {path}.ckpt", flush=True)
        return load_checkpoint(path, template() if callable(template)
                               else template)

    def _cache_store(tag, params):
        if cache_dir:
            save_checkpoint(_cache_path(tag), params)

    def _base_params():
        if "base" not in _cache:
            model = FNO2d(**kw)
            p0 = model.init(jax.random.PRNGKey(seed), tr_a[:1])
            cached = _cache_load("base", p0)
            if cached is None:
                cached = fit(_train_apply(model), p0, tr_a, tr_u, tr_a[-2:], tr_u[-2:],
                             epochs=cfg["Epochs"], batch_size=min(cfg["Batch Size"], n_train),
                             step=step, T_out=T_out, loss_func=lp_loss,
                             lr=cfg["Learning Rate"], seed=seed)
                _cache_store("base", cached)
            _cache["base"] = cached
        return _cache["base"]

    def _maybe_load(model, uq):
        """Load a named checkpoint from Runs: (the reference's pretrained
        run-name registry, Eval.py:138-209) if present."""
        name = run_names.get(uq)
        if not name:
            return None
        import os

        path = checkpoint_name(cfg.get("Model", "FNO"), cfg["Case"], name)
        if not os.path.exists(path + ".ckpt"):
            return None
        template = model.init(jax.random.PRNGKey(0), tr_a[:1])
        return load_checkpoint(path, template)

    def model_factory(uq: str):
        if uq in ("Deterministic", "AER", "PRE"):
            model = FNO2d(**kw)
            loaded = _maybe_load(model, uq)
            return model, (loaded if loaded is not None else _base_params())
        if uq == "Dropout":
            model = make_dropout_fno(**kw)
            p0 = model.init({"params": jax.random.PRNGKey(seed)}, tr_a[:1])
            params = _cache_load("dropout", p0)
            if params is None:
                params = fit(_train_apply(model), p0, tr_a, tr_u, tr_a[-2:], tr_u[-2:],
                             epochs=cfg["Epochs"], batch_size=min(cfg["Batch Size"], n_train),
                             step=step, T_out=T_out, loss_func=lp_loss,
                             lr=cfg["Learning Rate"], seed=seed)
                _cache_store("dropout", params)
            return model, params
        if uq == "Bayesian":
            model = FNO2dBayesian(**kw)
            rngs0 = {"params": jax.random.PRNGKey(seed),
                     "bayes": jax.random.PRNGKey(seed + 1)}
            params = _cache_load("bayesian",
                                 lambda: model.init(rngs0, tr_a[:1]))
            if params is None:
                params = _fit_generic(model, tr_a, tr_u, cfg, make_bayesian_train_step,
                                      seed, rngs_per_step=True,
                                      apply_fn=_train_apply(model))
                _cache_store("bayesian", params)
            return model, params
        if uq == "MLE":
            model = make_mle_fno(**kw)
            rngs0 = {"params": jax.random.PRNGKey(seed),
                     "bayes": jax.random.PRNGKey(seed + 1)}
            params = _cache_load("mle", lambda: model.init(rngs0, tr_a[:1]))
            if params is None:
                params = _fit_generic(model, tr_a, tr_u, cfg, make_mle_train_step, seed,
                                      apply_fn=_train_apply(model))
                _cache_store("mle", params)
            return model, params
        if uq == "Ensemble":
            model = FNO2d(**kw)
            members = []
            for s in range(cfg.get("n_ensemble", 5)):
                p0 = model.init(jax.random.PRNGKey(seed + 100 + s), tr_a[:1])
                member = _cache_load(f"ens{s}", p0)
                if member is None:
                    member = fit(_train_apply(model), p0, tr_a, tr_u, tr_a[-2:], tr_u[-2:],
                                 epochs=cfg["Epochs"],
                                 batch_size=min(cfg["Batch Size"], n_train),
                                 step=step, T_out=T_out, loss_func=lp_loss,
                                 lr=cfg["Learning Rate"], seed=seed + s)
                    _cache_store(f"ens{s}", member)
                members.append(member)
            return model, members
        if uq == "SWAG":
            model = FNO2d(**kw)
            p0 = model.init(jax.random.PRNGKey(seed), tr_a[:1])
            if cache_dir and os.path.exists(_cache_path("swag") + ".npz"):
                if verbose:
                    print(f"[train-cache] swag <- {_cache_path('swag')}.npz",
                          flush=True)
                swag = SWAG(p0).load(_cache_path("swag") + ".npz")
            else:
                swag = fit_swag(_train_apply(model), p0, tr_a, tr_u, epochs=cfg["Epochs"],
                                batch_size=min(cfg["Batch Size"], n_train), step=step,
                                T_out=T_out, loss_func=lp_loss,
                                lr=cfg["Learning Rate"], seed=seed)
                if cache_dir:
                    os.makedirs(cache_dir, exist_ok=True)
                    swag.save(_cache_path("swag") + ".npz")
            return model, swag
        raise ValueError(f"unknown UQ method {uq}")

    return evaluate_uq_methods(
        methods=[m for m in cfg["UQ"] if m not in set(skip)],
        model_factory=model_factory,
        test_a=te_a, test_u=te_u, step=step, T_out=T_out,
        alpha=cfg.get("alpha", 0.1), samples=cfg.get("samples", 10),
        runs=cfg.get("runs", 10), n_eval=cfg.get("n_eval", 300),
        pre=pre, seed=seed, verbose=verbose, on_method_done=on_method_done,
        batch_chunk=cfg.get("batch_chunk"),
    )


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "Wave",
        sys.argv[2] if len(sys.argv) > 2 else None)
