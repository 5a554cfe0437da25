"""In/out-of-distribution data loaders for the UQ comparison.

Behavioral spec: `/root/reference/Other_UQ/Evaluation/data_loaders.py:15-92`
— per-case loaders returning stacked FNO tensors plus the matching PRE
residual class; `Dist: out` shifts the physics (half wave speed for Wave,
10x viscosity for NS, a disjoint stronger-field/lighter-fluid design box
for MHD; SURVEY.md §2.5). The reference reads cached .npz archives; here
the JAX solvers regenerate the data on-device.
"""

from __future__ import annotations

import numpy as np

from ..residuals.mhd import PRE_MHD
from ..residuals.ns import PRE_NS
from ..residuals.wave import PRE_Wave

__all__ = ["load_wave", "load_ns", "load_mhd"]


def load_wave(dist: str = "in", n: int = 100, Nx: int = 64, seed: int = 0):
    from ..experiments.wave import CONFIG, gen_data

    cfg = dict(CONFIG, Nx=Nx)
    if dist == "out":
        cfg["c"] = cfg["c"] * 0.5  # OOD: half wave speed
    data, dt_eff, dx = gen_data(cfg, n, seed)
    pre = PRE_Wave(dt_eff, dx, c=cfg["c"])
    return data, pre, cfg


def load_ns(dist: str = "in", n: int = 50, N: int = 128, x_slice: int = 2,
            seed: int = 0):
    from ..experiments.ns import CONFIG, gen_data

    cfg = dict(CONFIG, N=N, x_slice=x_slice)
    if dist == "out":
        cfg["nu"] = cfg["nu"] * 10.0  # OOD: 10x viscosity
    data, dt_eff, dx = gen_data(cfg, n, seed)
    pre = PRE_NS(dt_eff, dx, dx, nu=cfg["nu"])
    return data, pre, cfg


def load_mhd(dist: str = "in", n: int = 50, N: int = 64, seed: int = 0):
    from ..experiments.mhd import CONFIG, gen_data

    cfg = dict(CONFIG, N=N)
    lb = ub = None
    if dist == "out":
        # OOD: a disjoint Orszag-Tang design box — field strength b above
        # the training range, density/pressure scale c below it (stronger
        # field / lighter fluid; training box is (a, b, c) in [0.5, 1]^3,
        # solvers/mhd2d_constrained.py:7). CFL-safe at the fixed dt: the
        # fast speed grows ~sqrt(1 + b^2/(4 pi rho)) <= 2.2 at (b, c) =
        # (1.5, 0.25), giving v dt / dx ~ 0.014 at N = 64.
        lb, ub = (0.5, 1.0, 0.25), (1.0, 1.5, 0.5)
    data, dt_eff, dx = gen_data(cfg, n, seed + (1000 if dist == "out" else 0),
                                lb=lb, ub=ub)
    pre = PRE_MHD(dt_eff, dx, dx)
    return data, pre, cfg
