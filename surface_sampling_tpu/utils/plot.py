"""Matplotlib output (mcmc/utils/plot.py analog, Agg backend).

Covers the reference's plot inventory: per-sweep summary stats, energy
analysis, anneal schedule, atom-type histograms, clustering scatter +
dendrogram, distance-weight diagnostics.
"""

from __future__ import annotations

from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _save(fig, save_folder, name):
    if save_folder is not None:
        path = Path(save_folder) / name
        fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return fig


def plot_summary_stats(
    energy_hist,
    frac_accept_hist,
    adsorption_count_hist,
    num_sweeps: int,
    save_folder=None,
):
    """3-panel energy / acceptance / adsorption-count vs sweep
    (mcmc/utils/plot.py:227-281)."""
    runs = np.arange(1, num_sweeps + 1)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    axes[0].plot(runs, np.asarray(energy_hist))
    axes[0].set_xlabel("Sweep")
    axes[0].set_ylabel("Energy (eV)")
    axes[1].plot(runs, np.asarray(frac_accept_hist))
    axes[1].set_xlabel("Sweep")
    axes[1].set_ylabel("Acceptance rate")
    axes[2].plot(runs, np.asarray(adsorption_count_hist))
    axes[2].set_xlabel("Sweep")
    axes[2].set_ylabel("Adsorbed atoms")
    fig.tight_layout()
    return _save(fig, save_folder, "summary_stats.png")


def plot_energy_analysis(energies, accept_rates, save_folder=None, bins: int = 40):
    """Energy trace + histogram (mcmc/utils/plot.py:98-226 condensed)."""
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    e = np.asarray(energies).ravel()
    axes[0].plot(e)
    axes[0].set_xlabel("Sweep")
    axes[0].set_ylabel("Surface energy (eV)")
    axes[1].hist(e, bins=bins)
    axes[1].set_xlabel("Surface energy (eV)")
    axes[1].set_ylabel("Count")
    fig.tight_layout()
    return _save(fig, save_folder, "energy_analysis.png")


def plot_anneal_schedule(temps, save_folder=None):
    """(mcmc/utils/plot.py:349-372)."""
    fig, ax = plt.subplots(figsize=(5, 3.5))
    ax.plot(np.asarray(temps))
    ax.set_xlabel("Sweep")
    ax.set_ylabel("Temperature (kB T)")
    return _save(fig, save_folder, "anneal_schedule.png")


def plot_atom_type_histograms(counts_per_type: dict, save_folder=None):
    """Per-element adsorption-count histograms (plot.py:310-348)."""
    n = len(counts_per_type)
    fig, axes = plt.subplots(1, max(n, 1), figsize=(3.2 * max(n, 1), 3.2))
    if n == 1:
        axes = [axes]
    for ax, (sym, counts) in zip(axes, counts_per_type.items()):
        ax.hist(np.asarray(counts), bins="auto")
        ax.set_xlabel(f"{sym} count")
        ax.set_ylabel("Frequency")
    fig.tight_layout()
    return _save(fig, save_folder, "atom_type_histograms.png")


def plot_clustering_results(points, num_clusters, labels, selected=None, save_folder=None, **kw):
    """2-D scatter of clustered latent points (plot.py:373-509)."""
    pts = np.asarray(points)
    fig, ax = plt.subplots(figsize=(5, 4.5))
    sc = ax.scatter(pts[:, 0], pts[:, 1], c=np.asarray(labels), cmap="tab20", s=18)
    if selected is not None:
        ax.scatter(pts[selected, 0], pts[selected, 1], marker="x", c="k", s=60)
    ax.set_xlabel("PC 1")
    ax.set_ylabel("PC 2")
    ax.set_title(f"{num_clusters} clusters")
    fig.colorbar(sc, ax=ax)
    return _save(fig, save_folder, "clustering_results.png")


def plot_dendrogram(linkage_matrix, save_folder=None, save_prepend: str = ""):
    """(plot.py:510-536)."""
    from scipy.cluster.hierarchy import dendrogram

    fig, ax = plt.subplots(figsize=(7, 4))
    dendrogram(linkage_matrix, ax=ax, no_labels=True)
    ax.set_ylabel("Ward distance")
    return _save(fig, save_folder, f"{save_prepend}dendrogram.png")


def plot_distance_weight_matrix(dwm, save_folder=None):
    """(plot.py:537-570)."""
    fig, ax = plt.subplots(figsize=(4.5, 4))
    im = ax.imshow(np.asarray(dwm), cmap="viridis")
    ax.set_xlabel("Site j")
    ax.set_ylabel("Site i")
    fig.colorbar(im, ax=ax)
    return _save(fig, save_folder, "distance_weight_matrix.png")


def plot_decay_curve(distances, weights, save_folder=None):
    """(plot.py:571-593)."""
    fig, ax = plt.subplots(figsize=(4.5, 3.5))
    order = np.argsort(np.asarray(distances))
    ax.plot(np.asarray(distances)[order], np.asarray(weights)[order], ".-")
    ax.set_xlabel("Distance (A)")
    ax.set_ylabel("Weight")
    return _save(fig, save_folder, "decay_curve.png")


def plot_specific_weights(coords, weights, site_idx, save_folder=None, run_iter: int = 0):
    """Scatter of per-site selection weights around a chosen site
    (plot.py:594-644)."""
    c = np.asarray(coords)
    fig, ax = plt.subplots(figsize=(4.5, 4))
    sc = ax.scatter(c[:, 0], c[:, 1], c=np.asarray(weights), cmap="plasma", s=30)
    ax.scatter([c[site_idx, 0]], [c[site_idx, 1]], marker="*", c="r", s=120)
    ax.set_xlabel("x (A)")
    ax.set_ylabel("y (A)")
    fig.colorbar(sc, ax=ax)
    return _save(fig, save_folder, f"specific_weights_iter_{run_iter:04d}.png")

def plot_surfaces(structures, save_folder=None, max_cols: int = 4,
                  save_prepend: str = ""):
    """Top-view (x, y) scatter grid of surface structures, sized by z and
    colored by atomic number (mcmc/utils/plot.py:282-308 analog)."""
    structures = list(structures)
    n = len(structures)
    cols = min(max_cols, max(n, 1))
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows),
                             squeeze=False)
    for k, st in enumerate(structures):
        ax = axes[k // cols][k % cols]
        z = st.positions[:, 2]
        zspan = max(z.max() - z.min(), 1e-6)
        size = 20 + 60 * (z - z.min()) / zspan
        sc = ax.scatter(st.positions[:, 0], st.positions[:, 1], s=size,
                        c=st.numbers, cmap="viridis", edgecolors="k",
                        linewidths=0.3)
        ax.set_title(st.formula, fontsize=8)
        ax.set_aspect("equal")
    for k in range(n, rows * cols):
        axes[k // cols][k % cols].axis("off")
    fig.tight_layout()
    return _save(fig, save_folder, f"{save_prepend}surfaces.png")
