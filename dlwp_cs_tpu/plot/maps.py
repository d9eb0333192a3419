"""Plotting helpers: cubed-sphere face maps and skill curves.

Capability parity with ``DLWP/plot/`` (SURVEY.md §2 row 18), minus basemap/
cartopy (unavailable offline): face fields are drawn as an unfolded cross
layout, and lat-lon maps can be produced by remapping first
(:mod:`dlwp_cs_tpu.remap`).  Matplotlib only, Agg-safe.
"""

from __future__ import annotations

import numpy as np

__all__ = ["plot_cube_faces", "plot_error_curves", "plot_history"]

# Cross layout: (row, col) panel of each face in a 3x4 grid.
#         [4]
#  [3][0][1][2]
#         [5]
_CROSS = {0: (1, 1), 1: (1, 2), 2: (1, 3), 3: (1, 0), 4: (0, 1), 5: (2, 1)}


def _mpl():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_cube_faces(field, *, title: str | None = None, cmap: str = "RdBu_r",
                    vmin=None, vmax=None, out_path=None):
    """Draw a ``(6, n, n)`` field as an unfolded cube cross; returns Figure."""
    plt = _mpl()
    f = np.asarray(field)
    if f.ndim != 3 or f.shape[0] != 6:
        raise ValueError(f"expected (6, n, n), got {f.shape}")
    vmin = f.min() if vmin is None else vmin
    vmax = f.max() if vmax is None else vmax
    fig, axes = plt.subplots(3, 4, figsize=(10, 7.5))
    for ax in axes.ravel():
        ax.set_axis_off()
    for face, (r, c) in _CROSS.items():
        ax = axes[r][c]
        im = ax.imshow(f[face], origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
        ax.set_title(f"face {face}", fontsize=8)
        ax.set_axis_on()
        ax.set_xticks([])
        ax.set_yticks([])
    fig.colorbar(im, ax=axes, shrink=0.6)
    if title:
        fig.suptitle(title)
    if out_path is not None:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    return fig


def plot_error_curves(lead_hours, curves: dict, *, ylabel: str = "RMSE",
                      title: str | None = None, out_path=None):
    """Error-vs-lead-time plot; ``curves`` maps label -> (L,) array."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, values in curves.items():
        ax.plot(np.asarray(lead_hours) / 24.0, np.asarray(values), label=label)
    ax.set_xlabel("lead time (days)")
    ax.set_ylabel(ylabel)
    ax.grid(True, alpha=0.3)
    ax.legend()
    if title:
        ax.set_title(title)
    if out_path is not None:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    return fig


def plot_history(history, *, out_path=None):
    """Training-history curves from a ``train.History`` (epoch records)."""
    plt = _mpl()
    epochs = [r["epoch"] for r in history.epochs]
    fig, ax = plt.subplots(figsize=(7, 4.5))
    ax.plot(epochs, [r["train_loss"] for r in history.epochs], label="train")
    if any(r.get("val_loss") is not None for r in history.epochs):
        ax.plot(epochs, [r.get("val_loss") for r in history.epochs], label="val")
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.grid(True, alpha=0.3)
    ax.legend()
    if out_path is not None:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
    return fig
