"""Shared plotting helpers (reference `Utils/plot_tools.py:8-104`).

`subplots_2d`: imshow grid with per-panel colorbars; `subplots_1d`:
per-timestep line plots from a {label: [N, T, X]} dict. Import is lazy so
headless library use never touches matplotlib.
"""

from __future__ import annotations

import numpy as np

__all__ = ["subplots_2d", "subplots_1d", "coverage_figure",
           "wall_contour_figure", "save_experiment_artifacts"]


def wall_contour_figure(R, Z, field, qhat, wall=None, levels: int = 10,
                        title: str = "Residual and Error Bar",
                        save_path: str | None = None):
    """EFIT-style residual/error-bar contour overlay on the tokamak
    cross-section (`EFIT/EFIT_cp.py:111-160`): blue contours of the
    per-cell field (e.g. a prediction residual), red contours of the
    per-cell CP bound qhat, and the tokamak wall polyline in black, equal
    aspect, R/Z axes.

    `field`/`qhat` are [NR, NZ] on the (R, Z) grid (1-D coordinate
    arrays); `wall` is an [N, 2] (R, Z) polyline — defaults to a D-shaped
    wall hugging the grid extent when the machine geometry (the
    reference's JET-wall CSV, not shipped) is unavailable."""
    import matplotlib.pyplot as plt

    R, Z = np.asarray(R).reshape(-1), np.asarray(Z).reshape(-1)
    field = np.asarray(field)
    qhat = np.broadcast_to(np.asarray(qhat), field.shape)
    fig, ax = plt.subplots(figsize=(5, 6))
    # contour expects [len(Z), len(R)]: transpose the [NR, NZ] fields
    ax.contour(R, Z, field.T, colors="blue", alpha=0.4, levels=levels)
    ax.contour(R, Z, qhat.T, colors="red", alpha=0.4, levels=levels)
    if wall is None:
        # synthetic D-shaped first wall: elongated, slightly triangular
        r0, z0 = R.mean(), Z.mean()
        a = 0.55 * (R.max() - R.min())
        b = 0.55 * (Z.max() - Z.min())
        th = np.linspace(0, 2 * np.pi, 128)
        wall = np.stack([r0 + a * np.cos(th + 0.3 * np.sin(th)),
                         z0 + b * np.sin(th)], axis=1)
    wall = np.asarray(wall)
    ax.plot(wall[:, 0], wall[:, 1], linewidth=4, color="black",
            label="tokamak")
    ax.axis("equal")
    ax.set_xlabel("R")
    ax.set_ylabel("Z")
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def subplots_2d(values, titles=None, flatten: bool = False, suptitle: str | None = None,
                cmap: str = "viridis", save_path: str | None = None):
    """Grid of imshow panels with colorbars (plot_tools.py:8-56)."""
    import matplotlib.pyplot as plt

    values = [np.asarray(v) for v in values]
    n = len(values)
    ncols = min(n, 4)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3.5 * nrows),
                             squeeze=False)
    for i, v in enumerate(values):
        ax = axes[i // ncols][i % ncols]
        im = ax.imshow(v, cmap=cmap, origin="lower")
        if titles:
            ax.set_title(titles[i])
        fig.colorbar(im, ax=ax, fraction=0.046)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def subplots_1d(x, values: dict, indices, suptitle: str | None = None,
                save_path: str | None = None):
    """Per-timestep line plots: values = {label: array[..., T, X]} sliced at
    each t in `indices` (plot_tools.py:60-104)."""
    import matplotlib.pyplot as plt

    n = len(indices)
    ncols = min(n, 4)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 3 * nrows),
                             squeeze=False)
    for i, t in enumerate(indices):
        ax = axes[i // ncols][i % ncols]
        for label, arr in values.items():
            arr = np.asarray(arr)
            y = arr[t] if arr.ndim >= 2 else arr
            ax.plot(np.asarray(x), y, label=label)
        ax.set_title(f"t = {t}")
        ax.legend(fontsize=7)
    if suptitle:
        fig.suptitle(suptitle)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def coverage_figure(alphas, coverages: dict, title: str | None = None,
                    save_path: str | None = None):
    """Empirical-coverage-vs-(1-alpha) figure with the ideal diagonal — the
    artifact every reference experiment saves (e.g.
    `Marginal/Advection_Residuals_CP.py:286-300`). `coverages` maps a legend
    label to a coverage array over `alphas`."""
    import matplotlib.pyplot as plt

    alphas = np.asarray(alphas)
    fig, ax = plt.subplots(figsize=(5, 4.2))
    ideal = 1 - alphas
    ax.plot(ideal, ideal, "k--", label="ideal")
    for label, cov in coverages.items():
        if cov is not None:
            ax.plot(ideal, np.asarray(cov), marker="o", ms=3, label=label)
    ax.set_xlabel("1 - alpha")
    ax.set_ylabel("empirical coverage")
    if title:
        ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, bbox_inches="tight")
    return fig


def save_experiment_artifacts(results: dict, out_dir: str, case: str):
    """Write the reference's per-experiment figure set to `out_dir`
    (the reference saves PDFs/SVGs into `Plots/`, .gitignored): the
    coverage sweep and, when prediction fields are present, a field panel."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    mode = results.get("mode", "joint")
    covs = {"AER+PRE": results.get("coverage_aer_pre"),
            "PRE": results.get("coverage_pre")}
    if results.get("coverage_aer_pre_holdout") is not None:
        covs["AER+PRE (holdout mod)"] = results["coverage_aer_pre_holdout"]
    fig = coverage_figure(results["alphas"], covs,
                          title=f"{case} ({mode} CP)",
                          save_path=os.path.join(out_dir, f"{case}_{mode}_coverage.pdf"))
    try:
        import matplotlib.pyplot as plt

        plt.close(fig)
    except Exception:
        pass
    pred = results.get("pred_pred")
    if pred is not None and np.ndim(pred) == 5:
        p = np.asarray(pred[0, 0])
        idx = [0, p.shape[-1] // 2, p.shape[-1] - 1]
        fig = subplots_2d([p[..., i] for i in idx],
                          titles=[f"t={i}" for i in idx],
                          suptitle=f"{case} prediction rollout",
                          save_path=os.path.join(out_dir, f"{case}_{mode}_fields.pdf"))
        import matplotlib.pyplot as plt

        plt.close(fig)
