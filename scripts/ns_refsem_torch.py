"""Executed-reference-code cross-check, NS family (VERDICT r04 ask #5).

Round 4 pinned the Wave flagship's reference-semantics coverage row against
the reference's own executed torch stack (`scripts/wave_refsem_torch.py`).
This extends the instrument to the first MULTI-FIELD family: the SAME
trained weights and the SAME 3-variable NS dataset are pushed through

  (a) our JAX pipeline (`cppre.experiments.base2d.run_2d_cp`, joint mode,
      momentum PRE with ``legacy_y_axis=True`` so both sides compute the
      reference's exact stencils), and
  (b) the reference's own torch code, executed from /root/reference as a
      behavioral oracle (never copied):
        - `Other_UQ/Bayesian_Models/Base_FNO.py::FNO_multi2d` (num_vars=3)
          with the flax weights transplanted,
        - `Other_UQ/Utils/training_utils.py::validation` AR rollout,
        - `Utils/ConvOps_2d.py::ConvOperator` momentum residual exactly as
          `Joint/NS_Residuals_CP.py:222-240` builds it (D_t/D_x/D_y/D_xx_yy,
          including the reference's y-axis kernel embedding as-is),
        - the CP chain of `Joint/NS_Residuals_CP.py:286-300`: in-sample
          modulation, sup-norm scores, split-CP quantile, joint coverage
          sweep (formulas per the reference's in-repo reimplementation,
          `Tests/test_advection_inv_sampling_marginal.py:428-434`).

A coverage row matched to two decimals at every alpha extends the
gold-standard parity evidence beyond the single-field Wave case to the
multi-field `stacked_fields` path (permutes, per-variable slicing, the
momentum residual's nonlinear advective terms).

Run from /root/repo (TPU for training; torch leg is CPU):
    timeout 6000 python scripts/ns_refsem_torch.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS_PATH = "/root/repo/results_refsem.json"
CKPT = "/root/repo/.uq_train_cache/ns_refsem_flagship.ckpt"

# the NS flagship configuration (`scripts/ns_flagship_tpu.py`)
CFG = {"Epochs": 60, "n_train": 100, "n_cal": 100, "n_pred": 100,
       "Batch Size": 10, "Modes": 8, "Width_time": 16}
EPS = 1e-6
SEED = 0


def jax_leg():
    """Train (or reuse) the NS flagship FNO with the LEGACY momentum PRE
    and collect our coverage rows plus the pieces the torch leg needs."""
    import jax
    import jax.numpy as jnp

    from cppre.experiments.base2d import run_2d_cp
    from cppre.experiments.ns import CONFIG, gen_data
    from cppre.residuals.ns import PRE_NS
    from cppre.utils.checkpoint import load_checkpoint, save_checkpoint
    from cppre.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    cfg = dict(CONFIG, **CFG)
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    data, dt_eff, dx = gen_data(cfg, n_total, SEED)
    # reference-exact stencils on BOTH legs: the torch leg executes the
    # reference's kernel_3d as-is, so the JAX side must opt into the
    # legacy y-axis embedding (`cppre/ops/stencils.py:100-129`)
    pre = PRE_NS(dt_eff, dx, dx, nu=cfg["nu"], legacy_y_axis=True)

    params = None
    if os.path.exists(CKPT):
        from cppre.models import FNO2d

        model = FNO2d(T_in=cfg["T_in"], step=cfg["Step"], modes1=cfg["Modes"],
                      modes2=cfg["Modes"], num_vars=cfg["Variables"],
                      width_time=cfg["Width_time"])
        tmpl = model.init(
            jax.random.PRNGKey(SEED),
            jnp.zeros((1, cfg["Variables"], 100, 100, cfg["T_in"]),
                      jnp.float32))
        params = load_checkpoint(CKPT, tmpl)
        print("reusing cached NS refsem weights", flush=True)
    t0 = time.perf_counter()
    r = run_2d_cp(data=data, residual_fn=pre.residual_momentum, cfg=cfg,
                  mode="joint", params=params, seed=SEED, eps=EPS,
                  verbose=True, train_precision="bf16")
    if params is None:
        save_checkpoint(CKPT, r["params"])
    print(f"jax leg done in {time.perf_counter() - t0:.0f}s", flush=True)
    return r, cfg, (data, dt_eff, dx)


def torch_leg(params, cfg, data_pack):
    """Reference-code pipeline on the same data + weights (torch CPU)."""
    import torch

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, "/root/reference/Utils")  # vendored fft_conv_pytorch
    sys.path.insert(0, "/root/reference/Other_UQ/Bayesian_Models")
    sys.path.insert(0, "/root/reference/Other_UQ/Utils")
    # training_utils.py:443 star-imports the (unvendored, absent)
    # Neural_PDE submodule at module level — stub it so the file imports;
    # only `validation` (defined above that line) is used here.
    import types

    for name in ("Neural_PDE", "Neural_PDE.UQ", "Neural_PDE.UQ.inductive_cp"):
        sys.modules.setdefault(name, types.ModuleType(name))
    from Base_FNO import FNO_multi2d
    from training_utils import validation
    from Utils.ConvOps_2d import ConvOperator

    from cppre.train.normalizers import MinMaxNormalizer

    data, dt_eff, dx = data_pack
    # identical split + normalizers as run_2d_cp (base2d.py:53-67)
    T_in, T_out, step = cfg["T_in"], cfg["T_out"], cfg["Step"]
    a_all = data[..., :T_in]
    u_all = data[..., T_in:T_in + T_out]
    in_norm, out_norm = MinMaxNormalizer(a_all), MinMaxNormalizer(u_all)
    a_enc = np.asarray(in_norm.encode(a_all))
    u_enc = np.asarray(out_norm.encode(u_all))
    n_total = cfg["n_train"] + cfg["n_cal"] + cfg["n_pred"]
    cal_sl = slice(cfg["n_train"], cfg["n_train"] + cfg["n_cal"])
    pred_sl = slice(cfg["n_train"] + cfg["n_cal"], n_total)

    # weight transplant (tests/test_fno_torch_parity.py helpers)
    p = params["params"] if "params" in params else params

    def _lin(linear, pp):
        linear.weight.data = torch.tensor(np.asarray(pp["kernel"]).T)
        linear.bias.data = torch.tensor(np.asarray(pp["bias"]))

    def _c3d(conv, pp):
        k = torch.tensor(np.asarray(pp["kernel"]).T)
        conv.weight.data = k[:, :, None, None, None]
        conv.bias.data = torch.tensor(np.asarray(pp["bias"]))

    def _spec(tb, fb):
        w1 = np.asarray(fb["weights1_re"]) + 1j * np.asarray(fb["weights1_im"])
        w2 = np.asarray(fb["weights2_re"]) + 1j * np.asarray(fb["weights2_im"])
        tb.weights1.data = torch.tensor(w1, dtype=torch.cfloat)
        tb.weights2.data = torch.tensor(w2, dtype=torch.cfloat)

    tm = FNO_multi2d(T_in, step, cfg["Modes"], cfg["Modes"],
                     cfg["Variables"], cfg["Width_time"])
    tm.eval()
    _lin(tm.fc0_time, p["fc0_time"])
    _lin(tm.fc1_time, p["fc1_time"])
    _lin(tm.fc2_time, p["fc2_time"])
    for name in ("f0", "f1", "f2", "f3", "f4", "f5"):
        tb, fb = getattr(tm, name), p[name]
        _spec(tb.conv, fb["SpectralConv2d_0"])
        _c3d(tb.mlp.mlp1, fb["_ChannelMLP_0"]["Dense_0"])
        _c3d(tb.mlp.mlp2, fb["_ChannelMLP_0"]["Dense_1"])
        _c3d(tb.w, fb["_Channel1x1_0"]["Dense_0"])
        _c3d(tb.b, fb["_Channel1x1_1"]["Dense_0"])

    # reference AR rollout (training_utils.py:86-113), batched cal+pred
    a_cp = torch.tensor(np.concatenate([a_enc[cal_sl], a_enc[pred_sl]]))
    u_cp = torch.tensor(np.concatenate([u_enc[cal_sl], u_enc[pred_sl]]))
    t0 = time.perf_counter()
    pred_all, mse, _ = validation(tm, a_cp, u_cp, step, T_out)
    print(f"torch rollout done in {time.perf_counter() - t0:.0f}s "
          f"(mse {float(mse):.3e})", flush=True)
    n_cal = cfg["n_cal"]
    pred_cal, pred_pred = pred_all[:n_cal], pred_all[n_cal:]

    # decode exactly as the reference (Joint/NS_Residuals_CP.py:275-278)
    a_dec = float(out_norm.a)
    b_dec = float(out_norm.b)

    def decode(x):
        return (x - b_dec) / a_dec

    cal_out = decode(u_cp[:n_cal])
    cal_pred = decode(pred_cal)
    prd_out = decode(u_cp[n_cal:])
    prd_pred = decode(pred_pred)

    # reference momentum residual (Joint/NS_Residuals_CP.py:214-240),
    # reference ConvOps_2d code as-is (its y-axis embedding included)
    D_t = ConvOperator(domain='t', order=1)
    D_x = ConvOperator(domain='x', order=1)
    D_y = ConvOperator(domain='y', order=1)
    D_xx_yy = ConvOperator(domain=('x', 'y'), order=2)
    dt = float(dt_eff)
    dy = dx = float(dx)
    nu = 0.001

    def residual_momentum(v):
        u, vv, pp_ = v[:, 0], v[:, 1], v[:, 2]
        res_x = (D_t(u) * dx * dy + u * D_x(u) * dt * dy
                 + vv * D_y(u) * dt * dx - nu * D_xx_yy(u) * dt
                 + D_x(pp_) * dt * dy)
        res_y = (D_t(vv) * dx * dy + u * D_x(vv) * dt * dx
                 + vv * D_y(vv) * dt * dy - nu * D_xx_yy(vv) * dt
                 + D_y(pp_) * dt * dx)
        return (res_x[..., 1:-1, 1:-1, 1:-1]
                + res_y[..., 1:-1, 1:-1, 1:-1])

    with torch.no_grad():
        cal_out_res = residual_momentum(cal_out.permute(0, 1, 4, 2, 3)).numpy()
        cal_pred_res = residual_momentum(cal_pred.permute(0, 1, 4, 2, 3)).numpy()
        prd_res = residual_momentum(prd_pred.permute(0, 1, 4, 2, 3)).numpy()
        val_res = residual_momentum(prd_out.permute(0, 1, 4, 2, 3)).numpy()

    # reference CP chain (Joint/NS_Residuals_CP.py:286-300; formulas per
    # Tests/test_advection_inv_sampling_marginal.py:428-434), f64 numpy as
    # the reference's CPU-numpy reductions effectively are. The +EPS guard
    # matches the flagship script (f32 residuals can produce exact-zero
    # per-cell std, which the reference's own data never hits).
    cal_out_res = cal_out_res.astype(np.float64)
    cal_pred_res = cal_pred_res.astype(np.float64)
    modulation = np.std(cal_out_res - cal_pred_res, axis=0) + EPS
    ncf_scores = np.max(np.abs(cal_out_res - cal_pred_res) / modulation,
                        axis=(1, 2, 3))

    alphas = np.arange(0.05, 0.95, 0.1)
    cov = []
    n = len(ncf_scores)
    for alpha in alphas:
        q = min(math.ceil((n + 1) * (1 - alpha)) / n, 1.0)
        qhat = np.quantile(ncf_scores, q, method="higher")
        lo = prd_res - qhat * modulation
        hi = prd_res + qhat * modulation
        inside = np.all((val_res >= lo) & (val_res <= hi), axis=(1, 2, 3))
        cov.append(float(np.mean(inside)))
    return alphas.tolist(), cov, float(mse)


def main():
    r, cfg, data_pack = jax_leg()
    alphas_t, cov_torch, mse_t = torch_leg(r["params"], cfg, data_pack)
    entry = {
        "config": CFG,
        "eps": EPS,
        "alphas": np.asarray(r["alphas"]).tolist(),
        "jax_reference_semantics": np.asarray(r["coverage_aer_pre"]).tolist(),
        "jax_holdout_modulation":
            np.asarray(r["coverage_aer_pre_holdout"]).tolist(),
        "torch_reference_code": {"alphas": alphas_t, "coverage": cov_torch,
                                 "rollout_mse": mse_t},
        "date": time.strftime("%Y-%m-%d"),
        "note": "same weights + same 3-variable NS data through our JAX "
                "pipeline (momentum PRE, legacy_y_axis=True) and the "
                "reference's own torch code (Base_FNO + training_utils + "
                "ConvOps_2d executed from /root/reference)",
    }
    # results_refsem.json grows per-family: keep the Wave entry (its legacy
    # flat layout migrates under a "Wave" key on first write here)
    existing = {}
    if os.path.exists(RESULTS_PATH):
        existing = json.load(open(RESULTS_PATH))
        if "jax_reference_semantics" in existing:  # round-4 flat Wave layout
            existing = {"Wave": existing}
    existing["Navier-Stokes"] = entry
    with open(RESULTS_PATH, "w") as fh:
        json.dump(existing, fh, indent=1)
    print(json.dumps({"alphas": [round(a, 2) for a in alphas_t],
                      "torch_reference_code": [round(c, 3) for c in cov_torch],
                      "jax_reference_semantics":
                          [round(float(c), 3)
                           for c in np.asarray(r["coverage_aer_pre"])]}))
    print("wrote", RESULTS_PATH, flush=True)


if __name__ == "__main__":
    main()
