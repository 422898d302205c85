"""Periodic-table data and physical constants.

Self-contained replacement for the ase/pymatgen element data the reference
relies on implicitly (reference: mcmc/system.py imports ase; we have no ASE).
Masses are standard atomic weights (IUPAC 2021, rounded); covalent radii are
the Cordero et al. 2008 set — both are public physical constants.
"""

from __future__ import annotations

import numpy as np

# fmt: off
CHEMICAL_SYMBOLS = [
    "X",  # Z = 0 is the vacancy / virtual-site marker
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
]

ATOMIC_MASSES = np.array([
    0.0,
    1.008, 4.0026, 6.94, 9.0122, 10.81, 12.011, 14.007, 15.999, 18.998, 20.180,
    22.990, 24.305, 26.982, 28.085, 30.974, 32.06, 35.45, 39.95, 39.098, 40.078,
    44.956, 47.867, 50.942, 51.996, 54.938, 55.845, 58.933, 58.693, 63.546, 65.38,
    69.723, 72.630, 74.922, 78.971, 79.904, 83.798, 85.468, 87.62, 88.906, 91.224,
    92.906, 95.95, 97.0, 101.07, 102.91, 106.42, 107.87, 112.41, 114.82, 118.71,
    121.76, 127.60, 126.90, 131.29, 132.91, 137.33, 138.91, 140.12, 140.91, 144.24,
    145.0, 150.36, 151.96, 157.25, 158.93, 162.50, 164.93, 167.26, 168.93, 173.05,
    174.97, 178.49, 180.95, 183.84, 186.21, 190.23, 192.22, 195.08, 196.97, 200.59,
    204.38, 207.2, 208.98, 209.0, 210.0, 222.0, 223.0, 226.0, 227.0, 232.04,
    231.04, 238.03, 237.0, 244.0, 243.0, 247.0, 247.0, 251.0, 252.0, 257.0,
])

# Cordero et al., Dalton Trans. 2008 covalent radii (Angstrom); 0.2 fallback for X.
COVALENT_RADII = np.array([
    0.20,
    0.31, 0.28, 1.28, 0.96, 0.84, 0.76, 0.71, 0.66, 0.57, 0.58,
    1.66, 1.41, 1.21, 1.11, 1.07, 1.05, 1.02, 1.06, 2.03, 1.76,
    1.70, 1.60, 1.53, 1.39, 1.39, 1.32, 1.26, 1.24, 1.32, 1.22,
    1.22, 1.20, 1.19, 1.20, 1.20, 1.16, 2.20, 1.95, 1.90, 1.75,
    1.64, 1.54, 1.47, 1.46, 1.42, 1.39, 1.45, 1.44, 1.42, 1.39,
    1.39, 1.38, 1.39, 1.40, 2.44, 2.15, 2.07, 2.04, 2.03, 2.01,
    1.99, 1.98, 1.98, 1.96, 1.94, 1.92, 1.92, 1.89, 1.90, 1.87,
    1.87, 1.75, 1.70, 1.62, 1.51, 1.44, 1.41, 1.36, 1.36, 1.32,
    1.45, 1.46, 1.48, 1.40, 1.50, 1.50, 2.60, 2.21, 2.15, 2.06,
    2.00, 1.96, 1.90, 1.87, 1.80, 1.69, 1.68, 1.68, 1.65, 1.67,
])
# fmt: on

Z_FROM_SYMBOL: dict[str, int] = {s: z for z, s in enumerate(CHEMICAL_SYMBOLS)}
SYMBOL_FROM_Z: dict[int, str] = dict(enumerate(CHEMICAL_SYMBOLS))

# Unit conversions (CODATA 2018)
HARTREE_TO_EV = 27.211386245988
BOHR_TO_ANGSTROM = 0.529177210903
KCAL_MOL_TO_EV = 0.04336414
EV_TO_KCAL_MOL = 1.0 / KCAL_MOL_TO_EV
KB_EV = 8.617333262e-5  # Boltzmann constant in eV/K
# LAMMPS "metal" units Coulomb constant  e^2/(4 pi eps0) in eV*Angstrom,
# as used by pair_style eam funcfl z2r conversion (27.2 * 0.529).
EAM_QQR2E = 27.2 * 0.529


def symbols_to_numbers(symbols: list[str] | tuple[str, ...]) -> np.ndarray:
    """Convert chemical symbols to atomic numbers (Z)."""
    return np.array([Z_FROM_SYMBOL[s] for s in symbols], dtype=np.int32)


def numbers_to_symbols(numbers) -> list[str]:
    """Convert atomic numbers to chemical symbols."""
    return [SYMBOL_FROM_Z[int(z)] for z in numbers]


def parse_formula(formula: str) -> dict[str, int]:
    """Parse a simple chemical formula like 'H2O' or 'SrTiO3' into counts.

    Handles element symbols followed by optional integer counts; no nesting.
    """
    import re

    counts: dict[str, int] = {}
    for sym, num in re.findall(r"([A-Z][a-z]?)(\d*)", formula):
        if not sym:
            continue
        if sym not in Z_FROM_SYMBOL:
            raise ValueError(f"Unknown element {sym!r} in formula {formula!r}")
        counts[sym] = counts.get(sym, 0) + (int(num) if num else 1)
    return counts


def formula_from_numbers(numbers) -> str:
    """Hill-ordered chemical formula string from atomic numbers (0s skipped)."""
    from collections import Counter

    cnt = Counter(SYMBOL_FROM_Z[int(z)] for z in numbers if int(z) > 0)
    # Hill: C first, H second, then alphabetical — matches ASE for most cases
    parts = []
    for sym in (["C", "H"] if "C" in cnt else []):
        if sym in cnt:
            n = cnt.pop(sym)
            parts.append(f"{sym}{n if n > 1 else ''}")
    for sym in sorted(cnt):
        n = cnt[sym]
        parts.append(f"{sym}{n if n > 1 else ''}")
    return "".join(parts)
