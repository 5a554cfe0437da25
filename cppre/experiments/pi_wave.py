"""Physics-informed wave-FNO training experiment.

Reproduces `/root/reference/Physics_Informed/Wave_FNO_PI.py` (PRE as the
training loss, Config basic|finetune :31,192-193) and `Wave_FNO_PISL.py`
(PISL and combined losses :209-220). Data from the spectral wave solver;
reports test MSE and mean |PRE| before/after physics-informed training.

Run: ``python -m cppre.experiments.pi_wave [pi|pisl|combined] [basic|finetune]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import FNO2d
from ..pi import finetune_physics_informed, make_combined_loss, make_pi_loss, make_pisl_loss
from ..pi.losses import fno_chunk_residual
from ..residuals.wave import PRE_Wave
from ..train.loops import fit
from ..train.losses import lp_loss
from ..train.normalizers import MinMaxNormalizer
from ..train.rollout import autoregressive_rollout, validation_AR
from .wave import CONFIG, gen_data

PI_CONFIG = dict(CONFIG, Config="finetune", c_pi=0.5, PI_Epochs=100)


def run(loss_kind: str = "pi", mode: str = "finetune",
        config: dict | None = None, seed: int = 0, verbose: bool = True):
    cfg = {**PI_CONFIG, **(config or {}), "Config": mode}
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    n_total = cfg["n_train"] + cfg["n_test"]
    data, dt_eff, dx = gen_data(cfg, n_total, seed)
    data = jnp.asarray(data)
    a_all, u_all = data[..., :T_in], data[..., T_in : T_in + T_out]
    norm_in, norm_out = MinMaxNormalizer(a_all), MinMaxNormalizer(u_all)
    a_all, u_all = norm_in.encode(a_all), norm_out.encode(u_all)
    tr = slice(0, cfg["n_train"])
    te = slice(cfg["n_train"], None)

    model = FNO2d(T_in=T_in, step=step, modes1=cfg["Modes"], modes2=cfg["Modes"],
                  num_vars=cfg["Variables"], width_time=cfg["Width_time"])
    params = model.init(jax.random.PRNGKey(seed), a_all[tr][:1])
    if mode == "finetune":  # pretrain with data loss first (:192-193)
        params = fit(model.apply, params, a_all[tr], u_all[tr],
                     a_all[te][:5], u_all[te][:5], epochs=cfg["Epochs"],
                     batch_size=min(cfg["Batch Size"], cfg["n_train"]),
                     step=step, T_out=T_out, loss_func=lp_loss,
                     lr=cfg["Learning Rate"], seed=seed, verbose=False)

    # PI residual operator: c = 0.5 like Wave_FNO_PI.py:201
    pre = PRE_Wave(dt_eff, dx, c=cfg["c_pi"])
    residual_fn = fno_chunk_residual(pre)
    loss_fn = {"pi": make_pi_loss(residual_fn),
               "pisl": make_pisl_loss(residual_fn),
               "combined": make_combined_loss(residual_fn)}[loss_kind]

    def metrics(p):
        pred, mse, mae = validation_AR(lambda x: model.apply(p, x),
                                       a_all[te], u_all[te], step, T_out)
        pre_mag = float(jnp.mean(jnp.abs(residual_fn(pred))))
        return float(mse), pre_mag

    mse0, pre0 = metrics(params)
    params = finetune_physics_informed(
        model.apply, params, a_all[tr], u_all[tr], loss_fn=loss_fn,
        epochs=cfg["PI_Epochs"], batch_size=min(cfg["Batch Size"], cfg["n_train"]),
        step=step, T_out=T_out, lr=cfg["Learning Rate"],
        loss_on="full", seed=seed)
    mse1, pre1 = metrics(params)

    results = {"mse_before": mse0, "mse_after": mse1,
               "pre_before": pre0, "pre_after": pre1, "params": params}
    if verbose:
        print(f"{loss_kind}/{mode}: MSE {mse0:.3e} -> {mse1:.3e}, "
              f"|PRE| {pre0:.3e} -> {pre1:.3e}")
    return results


if __name__ == "__main__":
    import sys

    run(sys.argv[1] if len(sys.argv) > 1 else "pi",
        sys.argv[2] if len(sys.argv) > 2 else "finetune")
