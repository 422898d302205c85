"""Tersoff bond-order potential (LAMMPS pair_style tersoff compatible).

TPU-native replacement for the reference's LAMMPS Tersoff path used by the
GaN(0001) tutorial (tutorials/data/GaN_0001/lammps_opt_template.txt,
``pair_style tersoff`` with mcmc/potentials/GaN.tersoff — parameters from
Nord, Albe, Erhart & Nordlund, J. Phys.: Condens. Matter 15, 5649 (2003)).

Formulation (Tersoff 1988/1989, LAMMPS conventions):

    E      = 1/2 sum_i sum_{j!=i} fC(r_ij) [ fR(r_ij) + b_ij fA(r_ij) ]
    fR     = A exp(-lambda1 r);   fA = -B exp(-lambda2 r)
    fC     = 1                                r < R - D
             1/2 - 1/2 sin(pi/2 (r-R)/D)      |r - R| <= D
             0                                r > R + D
    b_ij   = (1 + (beta zeta_ij)^n)^(-1/(2n))
    zeta   = sum_{k!=i,j} fC(r_ik) g(theta_ijk) exp([lambda3 (r_ij-r_ik)]^m)
    g      = gamma (1 + c^2/d^2 - c^2/(d^2 + (h - cos theta)^2))

Two-body params come from the (ti, tj, tj) table entry, three-body (zeta)
params from (ti, tj, tk) — the LAMMPS convention. Dense masked tensors over
a padded (N, M) neighbor list; all parameter lookups are flat gathers.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.ops.neighbors import neighbor_list
from surface_sampling_tpu.potentials.base import Potential

_FIELDS = (
    "m", "gamma", "lam3", "c", "d", "h", "n", "beta",
    "lam2", "B", "R", "D", "lam1", "A",
)


@dataclass
class TersoffTables:
    """Parameter tensors indexed [ti, tj, tk]."""

    elements: tuple[str, ...]
    params: dict[str, np.ndarray]    # each (T, T, T)

    @property
    def cutoff(self) -> float:
        return float((self.params["R"] + self.params["D"]).max())


def parse_tersoff(text: str, elements: list[str] | None = None) -> TersoffTables:
    """Parse a LAMMPS .tersoff parameter file (14 numbers per entry)."""
    tokens: list[str] = []
    for line in text.splitlines():
        line = line.split("#")[0].strip()
        if line:
            tokens.extend(line.split())
    entries = {}
    i = 0
    while i < len(tokens):
        e1, e2, e3 = tokens[i : i + 3]
        vals = [float(x) for x in tokens[i + 3 : i + 17]]
        entries[(e1, e2, e3)] = dict(zip(_FIELDS, vals))
        i += 17
    if elements is None:
        elements = sorted({e for key in entries for e in key})
    T = len(elements)
    params = {f: np.zeros((T, T, T)) for f in _FIELDS}
    for (e1, e2, e3), vals in entries.items():
        if e1 in elements and e2 in elements and e3 in elements:
            t1, t2, t3 = (elements.index(e) for e in (e1, e2, e3))
            for f in _FIELDS:
                params[f][t1, t2, t3] = vals[f]
    return TersoffTables(elements=tuple(elements), params=params)


def load_tersoff(path: str | Path, elements: list[str] | None = None) -> TersoffTables:
    return parse_tersoff(Path(path).read_text(), elements)


def save_tersoff_npz(path: str | Path, tables: TersoffTables) -> None:
    np.savez_compressed(path, elements=np.array(tables.elements), **tables.params)


def load_tersoff_npz(path: str | Path) -> TersoffTables:
    d = np.load(path)
    elements = tuple(str(e) for e in d["elements"])
    return TersoffTables(elements=elements, params={f: d[f] for f in _FIELDS})


def builtin_tersoff(name: str) -> TersoffTables:
    """Load a bundled Tersoff table set (e.g. 'GaN_nord2003')."""
    return load_tersoff_npz(Path(__file__).parent / "data" / f"{name}.tersoff.npz")


def _make_edge_fn(static_nbr, cutoff: float, max_neighbors: int):
    """Edge builder: static candidate ranking when a table is given, else
    the all-image top_k search (shared by Tersoff and SW)."""
    if static_nbr is None:
        def edge_fn(positions, alive, shifts):
            return neighbor_list(positions, shifts, alive, cutoff, max_neighbors)

        return edge_fn
    from surface_sampling_tpu.ops.neighbors import neighbor_list_from_table

    tbl_j = jnp.asarray(static_nbr.slot_j, jnp.int32)
    tbl_shift = jnp.asarray(static_nbr.shift, jnp.float32)
    tbl_valid = jnp.asarray(static_nbr.valid)

    def edge_fn(positions, alive, shifts):
        return neighbor_list_from_table(
            positions, alive, tbl_j, tbl_shift, tbl_valid, cutoff, max_neighbors
        )

    return edge_fn


def _fc(r, R, D):
    """Tersoff cutoff function."""
    inner = r < (R - D)
    outer = r > (R + D)
    mid = 0.5 - 0.5 * jnp.sin(0.5 * jnp.pi * (r - R) / jnp.maximum(D, 1e-12))
    return jnp.where(inner, 1.0, jnp.where(outer, 0.0, mid))


def make_tersoff(tables: TersoffTables, max_neighbors: int = 16, dtype=jnp.float32,
                 static_nbr=None) -> Potential:
    """Build the jittable Tersoff Potential.

    ``static_nbr`` (a core.static_neighbors.StaticNeighborTable) ranks only
    the spec's candidate pairs instead of searching all image pairs — use
    for MC hot paths over slot-realized geometries.
    """
    T = len(tables.elements)
    cutoff = tables.cutoff
    p3 = {f: jnp.asarray(tables.params[f].reshape(-1), dtype) for f in _FIELDS}
    edge_fn = _make_edge_fn(static_nbr, cutoff, max_neighbors)

    def flat3(ti, tj, tk):
        return (ti * T + tj) * T + tk

    def per_atom(positions, type_idx, alive, shifts, edges=None):
        disp, r, nbr_j, nbr_mask, _ = (
            edges if edges is not None else edge_fn(positions, alive, shifts)
        )
        fmask = nbr_mask.astype(r.dtype)
        ti = type_idx[:, None]                       # (N, 1)
        tj = type_idx[nbr_j]                         # (N, M)
        # ---- two-body: params from (i, j, j) -----------------------------
        idx2 = flat3(ti, tj, tj)                     # (N, M)
        R2, D2 = p3["R"][idx2], p3["D"][idx2]
        fc_ij = _fc(r, R2, D2) * fmask
        fr = p3["A"][idx2] * jnp.exp(-p3["lam1"][idx2] * r)
        fa = -p3["B"][idx2] * jnp.exp(-p3["lam2"][idx2] * r)
        # ---- zeta over k: params from (i, j, k) --------------------------
        tk = tj[:, None, :]                          # (N, 1, M) -> k axis last
        idx3 = flat3(ti[:, :, None], tj[:, :, None], tk)      # (N, M, M)
        R3, D3 = p3["R"][idx3], p3["D"][idx3]
        r_ik = r[:, None, :]                         # (N, 1, M)
        fc_ik = _fc(r_ik, R3, D3)
        # cos(theta_ijk) between bonds i->j and i->k
        rsafe = jnp.maximum(r, 1e-12)
        unit = disp / rsafe[..., None]               # (N, M, 3)
        cos_t = jnp.einsum("nmx,nkx->nmk", unit, unit)
        c2 = p3["c"][idx3] ** 2
        d2 = p3["d"][idx3] ** 2
        hh = p3["h"][idx3]
        g = p3["gamma"][idx3] * (1.0 + c2 / d2 - c2 / (d2 + (hh - cos_t) ** 2))
        delr = r[:, :, None] - r_ik                  # r_ij - r_ik
        m = p3["m"][idx3]
        lam3 = p3["lam3"][idx3]
        base = lam3 * delr
        arg = jnp.where(m > 2.0, base**3, base)      # LAMMPS supports m=1|3
        ex_delr = jnp.exp(jnp.clip(arg, -60.0, 60.0))
        # mask: k valid, k != j (same list position), and exclude self-pairs
        M = r.shape[1]
        not_same = ~jnp.eye(M, dtype=bool)[None, :, :]
        kmask = nbr_mask[:, None, :] & not_same & nbr_mask[:, :, None]
        zeta = jnp.sum(jnp.where(kmask, fc_ik * g * ex_delr, 0.0), axis=2)
        # ---- bond order ---------------------------------------------------
        beta = p3["beta"][idx2]
        nn = p3["n"][idx2]
        bz = jnp.maximum(beta * zeta, 1e-30)
        b_ij = (1.0 + bz**nn) ** (-1.0 / (2.0 * jnp.maximum(nn, 1e-12)))
        e_pair = 0.5 * fc_ij * (fr + b_ij * fa)
        return jnp.where(alive, jnp.sum(e_pair, axis=1), 0.0)

    def energy(positions, type_idx, alive, shifts, edges=None):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts, edges=edges))

    pot = Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff,
                    name="tersoff")
    if static_nbr is not None:
        from surface_sampling_tpu.ops.neighbors import make_table_topology_fns

        topo_fn, geom_fn = make_table_topology_fns(static_nbr, cutoff,
                                                   max_neighbors)
        # relax-loop hooks (core/energy.py refresh_edges="once"): the
        # per-pair _fc cutoffs vanish smoothly, so drifted fixed edges
        # are safe
        pot.__dict__["edge_topology"] = topo_fn
        pot.__dict__["edges_of"] = geom_fn
        pot.__dict__["energy_with_edges"] = energy
    return pot
