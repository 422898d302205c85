"""Embedded-atom-method (EAM) potential, DYNAMO funcfl/setfl compatible.

TPU-native replacement for the reference's LAMMPS ``pair_style eam`` path
(tests/test_Cu.py:41, mcmc/calculators/lammpsrun.py:309-470). Tables are
parsed on the host and turned into LAMMPS-identical local cubic splines
(ops/splines.py); the energy is a dense masked (N, N) pipeline:

    rho_i = sum_j rho_tj(r_ij);  E = sum_i F_ti(rho_i) + 1/2 sum_ij phi(r_ij)

with phi(r) = z2r(r) / r and z2r = 27.2*0.529 * Z_i(r) Z_j(r) for funcfl
(the LAMMPS convention). Forces come from jax.grad through the splines.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.constants import EAM_QQR2E
from surface_sampling_tpu.ops.neighbors import image_distances, image_pair_mask
from surface_sampling_tpu.ops.splines import lammps_spline_coeffs, spline_eval
from surface_sampling_tpu.potentials.base import Potential


@dataclass
class EAMTables:
    """Host-side EAM tables on common grids (numpy)."""

    numbers: np.ndarray          # (T,) atomic numbers
    nrho: int
    drho: float
    nr: int
    dr: float
    cutoff: float
    frho: np.ndarray             # (T, nrho) embedding energy F(rho), eV
    rhor: np.ndarray             # (T, nr) electron density rho(r)
    z2r: np.ndarray              # (T, T, nr) pair table, eV*Angstrom


def parse_funcfl(path: str | Path) -> dict:
    """Parse a single-element DYNAMO funcfl file (e.g. Cu_u3.eam).

    Layout: comment line; "Z mass alat lattice"; "nrho drho nr dr cutoff";
    then nrho F(rho) values, nr Z(r) values, nr rho(r) values.
    """
    tokens = Path(path).read_text().split("\n")
    header2 = tokens[1].split()
    z = int(float(header2[0]))
    header3 = tokens[2].split()
    nrho, drho, nr, dr, cutoff = (
        int(header3[0]),
        float(header3[1]),
        int(header3[2]),
        float(header3[3]),
        float(header3[4]),
    )
    vals = np.array(" ".join(tokens[3:]).split(), dtype=np.float64)
    if len(vals) < nrho + 2 * nr:
        raise ValueError(f"funcfl file {path} truncated: {len(vals)} values")
    frho = vals[:nrho]
    zr = vals[nrho : nrho + nr]
    rhor = vals[nrho + nr : nrho + 2 * nr]
    return {
        "number": z,
        "nrho": nrho,
        "drho": drho,
        "nr": nr,
        "dr": dr,
        "cutoff": cutoff,
        "frho": frho,
        "zr": zr,
        "rhor": rhor,
    }


def tables_from_funcfl(elements: list[dict]) -> EAMTables:
    """Combine one-or-more parsed funcfl elements into alloy tables.

    For a single element this is exact LAMMPS behaviour. For multiple files
    with differing grids, all tables are resampled onto the finest common
    grid with the same spline family LAMMPS uses.
    """
    nrho = max(e["nrho"] for e in elements)
    nr = max(e["nr"] for e in elements)
    drho = min(e["drho"] for e in elements)
    dr = min(e["dr"] for e in elements)
    cutoff = max(e["cutoff"] for e in elements)
    T = len(elements)
    frho = np.zeros((T, nrho))
    rhor = np.zeros((T, nr))
    zr = np.zeros((T, nr))
    for t, e in enumerate(elements):
        frho[t] = _resample(e["frho"], e["drho"], nrho, drho)
        rhor[t] = _resample(e["rhor"], e["dr"], nr, dr)
        zr[t] = _resample(e["zr"], e["dr"], nr, dr)
    z2r = EAM_QQR2E * np.einsum("ik,jk->ijk", zr, zr)
    return EAMTables(
        numbers=np.array([e["number"] for e in elements], dtype=np.int32),
        nrho=nrho,
        drho=drho,
        nr=nr,
        dr=dr,
        cutoff=cutoff,
        frho=frho,
        rhor=rhor,
        z2r=z2r,
    )


def _resample(f: np.ndarray, delta: float, n_new: int, delta_new: float) -> np.ndarray:
    if len(f) == n_new and np.isclose(delta, delta_new):
        return f
    coeffs = lammps_spline_coeffs(f)
    x = np.arange(n_new) * delta_new
    p = x / delta
    idx = np.clip(p.astype(int), 0, len(f) - 2)
    t = np.minimum(p - idx, 1.0)
    c = coeffs[idx]
    return ((c[:, 0] * t + c[:, 1]) * t + c[:, 2]) * t + c[:, 3]


def save_tables_npz(path: str | Path, tables: EAMTables) -> None:
    np.savez_compressed(path, **{k: getattr(tables, k) for k in tables.__dataclass_fields__})


def load_tables_npz(path: str | Path) -> EAMTables:
    d = np.load(path)
    return EAMTables(
        numbers=d["numbers"],
        nrho=int(d["nrho"]),
        drho=float(d["drho"]),
        nr=int(d["nr"]),
        dr=float(d["dr"]),
        cutoff=float(d["cutoff"]),
        frho=d["frho"],
        rhor=d["rhor"],
        z2r=d["z2r"],
    )


DATA_DIR = Path(__file__).parent / "data"


def builtin_eam(name: str) -> EAMTables:
    """Load a bundled EAM table set (e.g. 'Cu_u3', 'Au_u3')."""
    return load_tables_npz(DATA_DIR / f"{name}.eam.npz")


def make_eam(tables: EAMTables, dtype=jnp.float32) -> Potential:
    """Build the jittable EAM Potential from host tables."""
    T = len(tables.numbers)
    frho_c = jnp.asarray(
        np.stack([lammps_spline_coeffs(tables.frho[t]) for t in range(T)]), dtype
    )
    rhor_c = jnp.asarray(
        np.stack([lammps_spline_coeffs(tables.rhor[t]) for t in range(T)]), dtype
    )
    z2r_c = jnp.asarray(
        np.stack(
            [lammps_spline_coeffs(tables.z2r[i, j]) for i in range(T) for j in range(T)]
        ),
        dtype,
    )  # (T*T, nr, 4)
    inv_dr = 1.0 / tables.dr
    inv_drho = 1.0 / tables.drho
    cutoff = float(tables.cutoff)

    def per_atom(positions, type_idx, alive, shifts):
        r, _ = image_distances(positions, shifts)          # (K, N, N)
        mask = image_pair_mask(alive, r, cutoff)
        rsafe = jnp.where(mask, r, cutoff)
        fmask = mask.astype(r.dtype)
        # electron density at i from neighbor images j,k: table of species j
        rho_kij = spline_eval(rhor_c, rsafe, inv_dr, table_idx=type_idx[None, None, :])
        rho_i = jnp.sum(rho_kij * fmask, axis=(0, 2))
        # embedding energy
        F_i = spline_eval(frho_c, rho_i, inv_drho, table_idx=type_idx)
        F_i = jnp.where(alive, F_i, 0.0)
        # pair term
        pair_t = (type_idx[:, None] * T + type_idx[None, :])[None, :, :]
        z2 = spline_eval(z2r_c, rsafe, inv_dr, table_idx=pair_t)
        phi = z2 / rsafe * fmask
        return F_i + 0.5 * jnp.sum(phi, axis=(0, 2))

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts))

    return Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff, name="eam")
