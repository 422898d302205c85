"""Minimal immutable-ish Structure container (host side).

Replaces ase.Atoms for our purposes (reference uses ase.Atoms throughout,
e.g. mcmc/system.py:40). Positions are cartesian Angstroms; ``numbers`` are
atomic numbers with 0 reserved for vacancy/virtual markers.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

import numpy as np

from surface_sampling_tpu.constants import (
    ATOMIC_MASSES,
    formula_from_numbers,
    numbers_to_symbols,
    symbols_to_numbers,
)


@dataclass
class Structure:
    """A periodic atomic structure.

    Attributes:
        numbers: (N,) int atomic numbers.
        positions: (N, 3) float cartesian coordinates in Angstrom.
        cell: (3, 3) float lattice vectors as rows.
        pbc: (3,) bool periodic boundary flags.
        arrays: extra per-atom arrays (e.g. "tags", "ads_group").
        info: free-form metadata.
    """

    numbers: np.ndarray
    positions: np.ndarray
    cell: np.ndarray
    pbc: np.ndarray = field(default_factory=lambda: np.array([True, True, True]))
    arrays: dict = field(default_factory=dict)
    info: dict = field(default_factory=dict)

    def __post_init__(self):
        self.numbers = np.asarray(self.numbers, dtype=np.int32)
        self.positions = np.asarray(self.positions, dtype=np.float64).reshape(-1, 3)
        self.cell = np.asarray(self.cell, dtype=np.float64).reshape(3, 3)
        self.pbc = np.asarray(self.pbc, dtype=bool).reshape(3)

    # --- constructors -------------------------------------------------
    @classmethod
    def from_symbols(cls, symbols, positions, cell, **kw) -> "Structure":
        return cls(symbols_to_numbers(list(symbols)), positions, cell, **kw)

    # --- basic queries ------------------------------------------------
    def __len__(self) -> int:
        return len(self.numbers)

    @property
    def symbols(self) -> list[str]:
        return numbers_to_symbols(self.numbers)

    @property
    def masses(self) -> np.ndarray:
        return ATOMIC_MASSES[self.numbers]

    @property
    def formula(self) -> str:
        return formula_from_numbers(self.numbers)

    @property
    def scaled_positions(self) -> np.ndarray:
        """Fractional coordinates (cell-row convention: cart = frac @ cell)."""
        return np.linalg.solve(self.cell.T, self.positions.T).T

    def set_scaled_positions(self, frac: np.ndarray) -> None:
        self.positions = np.asarray(frac) @ self.cell

    @property
    def volume(self) -> float:
        return float(abs(np.linalg.det(self.cell)))

    # --- manipulation -------------------------------------------------
    def copy(self) -> "Structure":
        return Structure(
            self.numbers.copy(),
            self.positions.copy(),
            self.cell.copy(),
            self.pbc.copy(),
            {k: np.array(v) for k, v in self.arrays.items()},
            dict(self.info),
        )

    def wrap(self) -> "Structure":
        """Wrap atoms into the unit cell along periodic directions."""
        frac = self.scaled_positions
        frac[:, self.pbc] %= 1.0
        out = self.copy()
        out.set_scaled_positions(frac)
        return out

    def repeat(self, reps) -> "Structure":
        """Tile the structure (nx, ny, nz) times."""
        reps = np.asarray(reps, dtype=int)
        if reps.shape == ():
            reps = np.array([int(reps)] * 3)
        shifts = np.array(
            [[i, j, k] for i in range(reps[0]) for j in range(reps[1]) for k in range(reps[2])],
            dtype=np.float64,
        )
        new_pos = (self.positions[None, :, :] + (shifts @ self.cell)[:, None, :]).reshape(-1, 3)
        new_num = np.tile(self.numbers, len(shifts))
        new_cell = self.cell * reps[:, None]
        new_arrays = {k: np.tile(v, (len(shifts),) + (1,) * (np.ndim(v) - 1)) for k, v in self.arrays.items()}
        return Structure(new_num, new_pos, new_cell, self.pbc.copy(), new_arrays, dict(self.info))

    def select(self, mask_or_idx) -> "Structure":
        idx = np.asarray(mask_or_idx)
        if idx.dtype == bool:
            idx = np.where(idx)[0]
        return Structure(
            self.numbers[idx],
            self.positions[idx],
            self.cell.copy(),
            self.pbc.copy(),
            {k: np.asarray(v)[idx] for k, v in self.arrays.items()},
            dict(self.info),
        )

    def translated(self, vec) -> "Structure":
        out = self.copy()
        out.positions = out.positions + np.asarray(vec)
        return out

    def center_z(self, vacuum: float) -> "Structure":
        """Center the slab along z with ``vacuum`` Angstrom padding on each side.

        Mirror of the reference's ``slab.center(vacuum=..., axis=2)``
        (mcmc/utils/slab.py:56).
        """
        out = self.copy()
        zmin, zmax = out.positions[:, 2].min(), out.positions[:, 2].max()
        height = zmax - zmin
        new_c = height + 2 * vacuum
        # make c-axis orthogonal to xy and of the new length
        out.cell[2] = np.array([0.0, 0.0, new_c])
        out.positions[:, 2] += vacuum - zmin
        return out

    def sorted_by_z(self) -> "Structure":
        order = np.argsort(self.positions[:, 2], kind="stable")
        return self.select(order)

    def __add__(self, other: "Structure") -> "Structure":
        arrays = {}
        keys = set(self.arrays) | set(other.arrays)
        for k in keys:
            a = self.arrays.get(k)
            b = other.arrays.get(k)
            if a is None:
                a = np.zeros((len(self),) + np.shape(b)[1:], dtype=np.asarray(b).dtype)
            if b is None:
                b = np.zeros((len(other),) + np.shape(a)[1:], dtype=np.asarray(a).dtype)
            arrays[k] = np.concatenate([np.asarray(a), np.asarray(b)])
        return Structure(
            np.concatenate([self.numbers, other.numbers]),
            np.concatenate([self.positions, other.positions]),
            self.cell.copy(),
            self.pbc.copy(),
            arrays,
            {**self.info, **other.info},
        )

    # --- geometry -----------------------------------------------------
    def all_distances(self, mic: bool = True) -> np.ndarray:
        """Pairwise distance matrix, optionally with minimum-image convention.

        MIC here scans the 27 nearest periodic images, which is exact for
        cells where the cutoff is below half the smallest cell height — the
        same regime the reference's ase ``get_all_distances(mic=True)``
        handles (used by filter_distances, mcmc/utils/misc.py:118).
        """
        diff = self.positions[:, None, :] - self.positions[None, :, :]
        if not mic or not self.pbc.any():
            return np.linalg.norm(diff, axis=-1)
        shifts = _mic_shifts(self.cell, self.pbc)
        d = diff[None, :, :, :] + shifts[:, None, None, :]
        return np.min(np.linalg.norm(d, axis=-1), axis=0)

    def get_layers(self, tol: float = 0.1) -> np.ndarray:
        """Tag atoms by unique z-layers: 1 = topmost, increasing downward.

        TPU-native equivalent of catkit ``get_unique_coordinates`` + the
        reference's surface-depth tagging (mcmc/system.py:268-294), but with
        the layer index counted from the top so "surface_depth" reads simply.
        """
        z = self.positions[:, 2]
        order = np.argsort(-z)
        tags = np.zeros(len(z), dtype=np.int32)
        layer = 0
        last = None
        for i in order:
            if last is None or (last - z[i]) > tol:
                layer += 1
                last = z[i]
            tags[i] = layer
        return tags

    def __repr__(self) -> str:
        return f"Structure({self.formula}, n={len(self)}, cell diag={np.diag(self.cell).round(3)})"


def _mic_shifts(cell: np.ndarray, pbc: np.ndarray) -> np.ndarray:
    """Cartesian shift vectors of the 3^3 neighbor images (periodic dims only)."""
    ranges = [(-1, 0, 1) if p else (0,) for p in pbc]
    combos = np.array([[i, j, k] for i in ranges[0] for j in ranges[1] for k in ranges[2]], dtype=np.float64)
    return combos @ cell


def make_replace(**kw):  # small convenience used by tests
    return replace(**kw)
