"""Miscellaneous workflow utilities (mcmc/utils/misc.py analogs)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
from scipy.spatial import distance as _sdist
from scipy.special import softmax

from surface_sampling_tpu.structure.atoms import Structure


def filter_distances(
    st: Structure, ads=("O",), cutoff_distance: float = 1.5
) -> bool:
    """True iff all adsorbate-adsorbate MIC distances exceed the cutoff
    (mcmc/utils/misc.py:118-135)."""
    mask = np.isin(np.array(st.symbols), list(ads))
    if mask.sum() < 2:
        return True
    d = st.all_distances(mic=True)[mask][:, mask]
    iu = np.triu_indices(len(d), k=1)
    vals = d[iu]
    return not np.any((vals > 0) & (vals <= cutoff_distance))


def randomize_structure(
    st: Structure, amplitude: float, displace_lattice: bool = True, rng=None
) -> Structure:
    """Uniform random rattle of positions (and optionally the lattice)
    (mcmc/utils/misc.py:138-168)."""
    rng = rng or np.random.default_rng()
    out = st.copy()
    out.positions = out.positions + rng.uniform(-amplitude, amplitude, out.positions.shape)
    if displace_lattice:
        out.cell = out.cell + rng.uniform(-amplitude, amplitude, (3, 3))
    return out


def compute_distance_weight_matrix(
    ads_coords: np.ndarray, distance_decay_factor: float
) -> np.ndarray:
    """Row-softmax of -d/tau over site pairs (mcmc/utils/misc.py:170-190),
    consumed by the canonical switch proposal's distance decay."""
    d = _sdist.cdist(ads_coords, ads_coords, "euclidean")
    w = softmax(-d / distance_decay_factor, axis=1)
    assert np.allclose(w.sum(axis=1), 1.0)
    return w


def load_structures_any(path: str | Path) -> list[Structure]:
    """Load structures from .npz bundles, .cif, .xyz, or a .txt list of
    paths (mcmc/utils/misc.py:90-115 analog)."""
    from surface_sampling_tpu.structure.io import load_structures_npz, read_cif, read_xyz

    path = Path(path)
    if path.suffix == ".txt":
        out: list[Structure] = []
        for line in path.read_text().splitlines():
            line = line.strip()
            if line:
                out.extend(load_structures_any(line))
        return out
    if path.suffix == ".npz":
        return load_structures_npz(path)[0]
    if path.suffix == ".cif":
        return [read_cif(path)]
    if path.suffix == ".xyz":
        return [read_xyz(path)]
    raise ValueError(f"unsupported structure file {path}")
