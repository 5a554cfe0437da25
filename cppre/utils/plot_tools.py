"""Shared plotting helpers (reference `Utils/plot_tools.py:8-104`).

`subplots_2d`: imshow grid with per-panel colorbars; `subplots_1d`:
per-timestep line plots from a {label: [N, T, X]} dict. Import is lazy so
headless library use never touches matplotlib.
"""

from __future__ import annotations

import numpy as np

__all__ = ["subplots_2d", "subplots_1d"]


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
