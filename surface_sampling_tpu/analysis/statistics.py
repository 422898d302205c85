"""Sampling statistics: surface-energy distributions and chain diagnostics.

BASELINE.md's parity target is distributional (surface-energy histograms,
acceptance rates) — the reference offers only summary plots. This module
adds the quantitative tools: distribution summaries and two-sample
comparisons (Wasserstein / KS) for parity checks, and integrated
autocorrelation times for judging chain mixing and effective sample size.
"""

from __future__ import annotations

import numpy as np


def distribution_summary(energies) -> dict:
    """Mean/std/quantiles/min of an energy sample (any shape, flattened)."""
    e = np.asarray(energies, dtype=np.float64).ravel()
    qs = np.quantile(e, [0.05, 0.25, 0.5, 0.75, 0.95])
    return {
        "n": int(e.size),
        "mean": float(e.mean()),
        "std": float(e.std()),
        "min": float(e.min()),
        "max": float(e.max()),
        "q05": float(qs[0]),
        "q25": float(qs[1]),
        "median": float(qs[2]),
        "q75": float(qs[3]),
        "q95": float(qs[4]),
    }


def compare_distributions(a, b) -> dict:
    """Two-sample comparison of energy distributions (parity checking):
    Wasserstein-1 distance, Kolmogorov-Smirnov statistic/p-value, and the
    difference of means in units of the pooled std."""
    from scipy import stats

    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    ks = stats.ks_2samp(a, b)
    pooled = np.sqrt(0.5 * (a.var() + b.var()))
    return {
        "wasserstein": float(stats.wasserstein_distance(a, b)),
        "ks_stat": float(ks.statistic),
        "ks_pvalue": float(ks.pvalue),
        "mean_diff_sigma": float((a.mean() - b.mean()) / max(pooled, 1e-12)),
    }


def autocorrelation(series, max_lag: int | None = None) -> np.ndarray:
    """Normalized autocorrelation function of a 1-D chain observable."""
    x = np.asarray(series, dtype=np.float64).ravel()
    x = x - x.mean()
    n = len(x)
    max_lag = max_lag or n // 2
    var = np.dot(x, x) / n
    if var <= 0:
        return np.ones(1)
    acf = np.array([np.dot(x[: n - k], x[k:]) / ((n - k) * var) for k in range(max_lag)])
    return acf


def integrated_autocorrelation_time(series, window_factor: float = 5.0) -> float:
    """Integrated ACT via the self-consistent window method (Sokal):
    tau = 1 + 2 sum_k acf(k), truncated at the first k >= window_factor*tau."""
    acf = autocorrelation(series)
    tau = 1.0
    s = 1.0
    for k in range(1, len(acf)):
        s += 2.0 * acf[k]
        tau = max(s, 1.0)
        if k >= window_factor * tau:
            break
    return float(tau)


def effective_sample_size(series) -> float:
    """ESS = n / tau_int for a per-chain observable series."""
    x = np.asarray(series).ravel()
    return float(len(x) / integrated_autocorrelation_time(x))


def pooled_chain_energies(rec_energy) -> np.ndarray:
    """Flatten a (chains, sweeps) record into an equilibrium sample, dropping
    the first half of each chain as burn-in."""
    e = np.asarray(rec_energy)
    if e.ndim == 1:
        e = e[None]
    half = e.shape[1] // 2
    return e[:, half:].ravel()
