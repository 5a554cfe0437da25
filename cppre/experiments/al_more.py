"""Burgers and Wave active-learning experiments.

Thin drivers over `cppre.al.active_learning_loop` reproducing
`/root/reference/Active_Learning/Burgers_AL_Joint.py` (spectral Burgers
solver data, 3-mode sine ICs in [-3,3]^3) and `Wave_AL_Joint.py` (spectral
wave solver, (amp, x0, y0) in [10,50]x[0.1,0.5]^2, 2-D FNO).

Run: ``python -m cppre.experiments.al_more [burgers|wave] [CP|PRE|RAND]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..al import active_learning_loop
from ..cp.inductive import modulation_func, ncf_metric_joint
from ..models import FNO1d, FNO2d
from ..residuals.burgers import PRE_Burgers
from ..residuals.wave import PRE_Wave
from ..solvers.burgers1d import Burgers1D
from ..train.loops import fit
from ..train.losses import lp_loss
from ..train.rollout import validation_AR
from .common import sample_params


def _setup_burgers(cfg, seed):
    from .burgers import CONFIG as BCFG, LB, UB

    cfg = {**BCFG, "n_iterations": 5, "alpha": 0.5, **(cfg or {})}
    sim = Burgers1D(cfg["Nx"], cfg["Nt"], cfg["x_min"], cfg["x_max"],
                    cfg["t_end"], cfg["nu"])
    pre = PRE_Burgers(sim.dt, sim.dx, nu=cfg["nu"])
    T_in, T_out = cfg["T_in"], cfg["T_out"]

    def gen(p):
        u = np.asarray(sim.solve_batch(p))
        d = jnp.asarray(u, jnp.float32).transpose(0, 2, 1)[:, None]
        return d[..., :T_in], d[..., T_in : T_in + T_out]

    model = FNO1d(T_in=T_in, step=cfg["Step"], modes1=cfg["Modes"],
                  num_vars=1, width_time=cfg["Width"])
    to_res = lambda pred: np.asarray(pre(jnp.transpose(pred, (0, 1, 3, 2))[:, 0]))
    return cfg, LB, UB, gen, model, to_res


def _setup_wave(cfg, seed):
    from .wave import CONFIG as WCFG, LB, UB, gen_data

    cfg = {**WCFG, "n_iterations": 5, "alpha": 0.5, **(cfg or {})}
    T_in, T_out = cfg["T_in"], cfg["T_out"]
    from ..solvers.wave2d_spectral import Wave2D

    sim = Wave2D(cfg["Nx"], cfg["x_min"], cfg["x_max"], cfg["tend"], cfg["c"])
    pre = PRE_Wave(sim.dt * cfg["t_slice"], sim.dx, c=cfg["c"])

    def gen(p):
        u = np.asarray(sim.solve_batch(p))[:, :: cfg["t_slice"]]
        d = jnp.asarray(np.moveaxis(u, 1, -1)[:, None], jnp.float32)
        return d[..., :T_in], d[..., T_in : T_in + T_out]

    model = FNO2d(T_in=T_in, step=cfg["Step"], modes1=cfg["Modes"],
                  modes2=cfg["Modes"], num_vars=1, width_time=cfg["Width_time"])
    to_res = lambda pred: np.asarray(pre(jnp.transpose(pred, (0, 1, 4, 2, 3))[:, 0]))
    return cfg, LB, UB, gen, model, to_res


def run(case: str = "burgers", acq: str = "PRE", config: dict | None = None,
        seed: int = 0, verbose: bool = True):
    setup = _setup_burgers if case == "burgers" else _setup_wave
    cfg, lb, ub, gen, model, to_res = setup(config, seed)
    step, T_out = cfg["Step"], cfg["T_out"]

    train_a, train_u = gen(sample_params(lb, ub, cfg["n_train"], seed))
    test_a, test_u = gen(sample_params(lb, ub, cfg.get("n_test", 50), seed + 1))
    params = model.init(jax.random.PRNGKey(seed), train_a[:1])
    params = fit(model.apply, params, train_a, train_u, test_a[:5], test_u[:5],
                 epochs=cfg["Epochs"], batch_size=min(cfg["Batch Size"], train_a.shape[0]),
                 step=step, T_out=T_out, loss_func=lp_loss,
                 lr=cfg["Learning Rate"], seed=seed, verbose=False)

    cal_a, cal_u = gen(sample_params(lb, ub, cfg["n_cal"], seed + 2))
    pred_cal, _, _ = validation_AR(lambda x: model.apply(params, x), cal_a, cal_u,
                                   step, T_out)
    res_out = to_res(cal_u)
    res_prd = to_res(pred_cal)
    mod = np.asarray(modulation_func(res_out, res_prd)) + 1e-6
    scores = np.asarray(ncf_metric_joint(res_out, res_prd, mod))

    params, mse_hist, sampled = active_learning_loop(
        acq_func=acq, model=model, params=params, gen_fields=gen,
        residual_of=to_res, lb=lb, ub=ub, train_a=train_a, train_u=train_u,
        test_a=test_a, test_u=test_u, cal_scores=scores, modulation=mod,
        n_iterations=cfg["n_iterations"], n_pred=cfg["n_pred"],
        alpha=cfg["alpha"], epochs=cfg["Epochs"],
        batch_size=min(cfg["Batch Size"], 10), step=step, T_out=T_out,
        loss_func=lp_loss, lr=1e-3, seed=seed, verbose=verbose)
    return {"test_mse": mse_hist, "sims_sampled": sampled}


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "burgers",
        sys.argv[2] if len(sys.argv) > 2 else "PRE")
