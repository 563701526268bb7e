"""Training/inference diagnostic plots.

Twin of the reference's ``visualize_predictions`` (utils.py:1118-1225):
map views of grid detections vs labels, query cross-sections, and
association score panels, written as PNGs under ``Plots/``.
Matplotlib is imported lazily; the trainer calls this only when
``make_visualize_predictions`` is enabled.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def visualize_predictions(out_path, step, grid_pos, lbl_grid, pred_grid,
                          x_query=None, lbl_query=None, pred_query=None,
                          arv_p=None, lbl_p=None):
    """Write one diagnostic figure. Arrays:
    grid_pos (n_src, 3) cart; lbl_grid/pred_grid (n_src, n_t)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_panels = 2 + (2 if x_query is not None else 0) + (1 if arv_p is not None else 0)
    fig, axes = plt.subplots(1, n_panels, figsize=(4 * n_panels, 4))
    axes = np.atleast_1d(axes)

    it = np.unravel_index(np.argmax(lbl_grid), lbl_grid.shape)[1]
    sc = axes[0].scatter(grid_pos[:, 0] / 1e3, grid_pos[:, 1] / 1e3,
                         c=lbl_grid[:, it], s=8, vmin=0, vmax=1, cmap="viridis")
    axes[0].set_title(f"grid labels (t={it})")
    plt.colorbar(sc, ax=axes[0])
    sc = axes[1].scatter(grid_pos[:, 0] / 1e3, grid_pos[:, 1] / 1e3,
                         c=pred_grid[:, it], s=8, vmin=0, vmax=1, cmap="viridis")
    axes[1].set_title("grid predictions")
    plt.colorbar(sc, ax=axes[1])

    i = 2
    if x_query is not None:
        sc = axes[i].scatter(x_query[:, 0] / 1e3, x_query[:, 1] / 1e3,
                             c=lbl_query[:, it], s=4, vmin=0, vmax=1)
        axes[i].set_title("query labels")
        sc = axes[i + 1].scatter(x_query[:, 0] / 1e3, x_query[:, 1] / 1e3,
                                 c=pred_query[:, it], s=4, vmin=0, vmax=1)
        axes[i + 1].set_title("query predictions")
        i += 2
    if arv_p is not None:
        axes[i].imshow(arv_p, aspect="auto", vmin=0, vmax=1, cmap="magma")
        axes[i].set_title("P association scores")
        if lbl_p is not None:
            axes[i].contour(lbl_p, levels=[0.5], colors="c", linewidths=0.5)

    for ax in axes[:2]:
        ax.set_xlabel("x (km)")
        ax.set_ylabel("y (km)")
    fig.tight_layout()
    out = Path(out_path)
    out.mkdir(parents=True, exist_ok=True)
    fig.savefig(out / f"predictions_step_{step}.png", dpi=110)
    plt.close(fig)
    return out / f"predictions_step_{step}.png"
