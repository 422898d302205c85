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

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.constants import EAM_QQR2E
from surface_sampling_tpu.ops.neighbors import image_distances, image_pair_mask
from surface_sampling_tpu.ops.splines import lammps_spline_coeffs, spline_eval, spline_eval_onehot
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


def combine_tables(parts: list[EAMTables]) -> EAMTables:
    """Alloy tables from single-element table sets (the LAMMPS behaviour of
    listing several funcfl files in one pair_coeff). Recovers each element's
    effective charge Z(r) from its z2r diagonal (z2r = qqr2e Z_i Z_j, all
    non-negative for funcfl data) and resamples onto the finest common grid."""
    elements = []
    for t in parts:
        if len(t.numbers) != 1:
            raise ValueError("combine_tables takes single-element table sets")
        elements.append({
            "number": int(t.numbers[0]),
            "nrho": t.nrho, "drho": t.drho, "nr": t.nr, "dr": t.dr,
            "cutoff": t.cutoff,
            "frho": t.frho[0],
            "zr": np.sqrt(np.maximum(t.z2r[0, 0], 0.0) / EAM_QQR2E),
            "rhor": t.rhor[0],
        })
    return tables_from_funcfl(elements)


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
        F_i = spline_eval_onehot(frho_c, rho_i, inv_drho, table_idx=type_idx)
        F_i = jnp.where(alive, F_i, 0.0)
        # pair term
        pair_t = (type_idx[:, None] * T + type_idx[None, :])[None, :, :]
        z2 = spline_eval(z2r_c, rsafe, inv_dr, table_idx=pair_t)
        phi = z2 / rsafe * fmask
        return F_i + 0.5 * jnp.sum(phi, axis=(0, 2))

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts))

    return Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff, name="eam")


# ----------------------------------------------------------------------
# Fast path: static candidate pairs + gather-free polynomial tables
# ----------------------------------------------------------------------
def _fit_piecewise_poly(xs: np.ndarray, ys: np.ndarray, n_seg: int, degree: int):
    """Least-squares piecewise polynomial on uniform segments of [0, xmax].

    Returns (n_seg, degree+1) coefficients in the local coordinate
    t in [0, 1), highest power first (Horner order).
    """
    xmax = xs[-1]
    seg_w = xmax / n_seg
    coeffs = np.zeros((n_seg, degree + 1))
    for s in range(n_seg):
        lo, hi = s * seg_w, (s + 1) * seg_w
        m = (xs >= lo) & (xs <= hi)
        t = (xs[m] - lo) / seg_w
        # Vandermonde in Horner order
        V = np.vander(t, degree + 1)
        coeffs[s] = np.linalg.lstsq(V, ys[m], rcond=None)[0]
    return coeffs


def _poly_eval(tables: jnp.ndarray, table_idx, x, inv_xmax, n_seg: int):
    """Branchless piecewise-poly evaluation: a one-hot (values, T*S) matmul
    selects segment coefficients — MXU work instead of HBM gathers.

    tables: (T, S, D+1); table_idx broadcastable to x (or None when T == 1).
    """
    T, S, D1 = tables.shape
    p = jnp.clip(x * inv_xmax * S, 0.0, S - 1e-6)
    seg = p.astype(jnp.int32)
    t = p - seg
    flat = tables.reshape(T * S, D1)
    if T == 1:
        sel = seg
    else:
        sel = table_idx * S + seg
    onehot = jax.nn.one_hot(sel, T * S, dtype=x.dtype)
    c = onehot @ flat                      # (..., D+1)
    acc = c[..., 0]
    for k in range(1, D1):
        acc = acc * t + c[..., k]
    return acc


def make_eam_static(
    tables: EAMTables,
    nbr_table,
    mode: str = "poly",
    n_seg: int = 32,
    degree: int = 6,
    dtype=jnp.float32,
    gather_via_matmul: bool = False,
) -> Potential:
    """EAM over a static candidate-pair table (core/static_neighbors.py).

    mode="poly" replaces the LAMMPS spline gathers with piecewise
    polynomials fitted to the exact splines (default 32 segments x degree 6:
    max abs deviation ~1e-6 eV over the table range — verified in tests);
    evaluation is pure FMA + one small one-hot matmul, no HBM gathers.
    mode="spline" keeps exact LAMMPS interpolation on the reduced pairs.
    mode="cheb" (fastest) fits one global Chebyshev polynomial per pair
    table on the physical range [r_lo, cutoff] (deg 20: deviation ~1e-6)
    and evaluates by pure Horner — zero gathers and zero one-hot traffic in
    the pair loop; below r_lo a quadratic repulsion wall keeps overlapping
    configurations rejected.
    """
    T = len(tables.numbers)
    cutoff = float(tables.cutoff)
    slot_j = jnp.asarray(nbr_table.slot_j)
    shift = jnp.asarray(nbr_table.shift, dtype)
    valid = jnp.asarray(nbr_table.valid)

    if mode == "spline":
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
        )
        inv_dr = 1.0 / tables.dr
        inv_drho = 1.0 / tables.drho

        def eval_rhor(r, tj):
            return spline_eval(rhor_c, r, inv_dr, table_idx=tj)

        def eval_z2r(r, pair_t):
            return spline_eval(z2r_c, r, inv_dr, table_idx=pair_t)

        def eval_frho(rho, ti):
            return spline_eval_onehot(frho_c, rho, inv_drho, table_idx=ti)

    elif mode == "cheb":
        # fit floor below any distance template geometries can produce
        # (site-site spacings bottom out around 1.3 A); beyond the floor a
        # steep exponential wall guarantees overlap states stay rejected
        r_lo = 0.8
        r_hi = float(tables.nr * tables.dr)
        xs = np.linspace(r_lo, r_hi, 30000)

        def dense_of(table_1d, delta, xq):
            c = lammps_spline_coeffs(table_1d)
            p = xq / delta
            idx = np.clip(p.astype(int), 0, len(table_1d) - 2)
            t = np.minimum(p - idx, 1.0)
            cc = c[idx]
            return ((cc[:, 0] * t + cc[:, 1]) * t + cc[:, 2]) * t + cc[:, 3]

        deg = 24

        def cheb_coeffs(table_1d):
            fit = np.polynomial.chebyshev.Chebyshev.fit(xs, dense_of(table_1d, tables.dr, xs), deg)
            return fit.coef  # Chebyshev-basis coefficients (Clenshaw eval)

        rhor_u = jnp.asarray(np.stack([cheb_coeffs(tables.rhor[t]) for t in range(T)]), dtype)
        z2r_u = jnp.asarray(
            np.stack([cheb_coeffs(tables.z2r[i, j]) for i in range(T) for j in range(T)]),
            dtype,
        )
        mid = 0.5 * (r_lo + r_hi)
        half = 0.5 * (r_hi - r_lo)

        def clenshaw(coeff_rows, table_idx, r):
            """coeff_rows: (T', D+1) Chebyshev coefficients; numerically
            stable Clenshaw recurrence in f32 (power-basis Horner of a
            degree-20 fit cancels catastrophically). The tiny one-hot
            contraction over T' pair types is skipped when T' == 1."""
            u = (jnp.clip(r, r_lo, r_hi) - mid) / half
            Tp, D1 = coeff_rows.shape
            if Tp == 1:
                c = [coeff_rows[0, k] for k in range(D1)]
            else:
                onehot = jax.nn.one_hot(table_idx, Tp, dtype=u.dtype)
                cc = onehot @ coeff_rows            # (..., D+1)
                c = [cc[..., k] for k in range(D1)]
            b1 = jnp.zeros_like(u)
            b2 = jnp.zeros_like(u)
            two_u = 2.0 * u
            for k in range(D1 - 1, 0, -1):
                b1, b2 = c[k] + two_u * b1 - b2, b1
            acc = c[0] + u * b1 - b2
            # steep repulsion wall below the fit floor (never reached by
            # template geometries; dominates any clamped attraction). A
            # quartic is as over-rejecting as the previous exp form but
            # costs 3 FMAs instead of a transcendental on every pair lane:
            # at full overlap (r=0, d_in=0.8) it reaches ~2.7e5 eV.
            d_in = jnp.maximum(r_lo - r, 0.0)
            q = 8.0 * d_in
            q2 = q * q
            wall = 100.0 * (q2 + q2 * q2)
            return acc + wall

        def eval_rhor(r, tj):
            return clenshaw(rhor_u, tj, r)

        def eval_z2r(r, pair_t):
            return clenshaw(z2r_u, pair_t, r)

        frho_c = jnp.asarray(
            np.stack([lammps_spline_coeffs(tables.frho[t]) for t in range(T)]), dtype
        )
        inv_drho = 1.0 / tables.drho

        def eval_frho(rho, ti):
            return spline_eval_onehot(frho_c, rho, inv_drho, table_idx=ti)

    else:
        # fit piecewise polys to dense samples of the exact splines
        r_grid = np.linspace(0.0, tables.nr * tables.dr, 16 * tables.nr)
        rho_grid = np.linspace(0.0, tables.nrho * tables.drho, 16 * tables.nrho)

        def dense_of(table_1d, delta, xs):
            c = lammps_spline_coeffs(table_1d)
            p = xs / delta
            idx = np.clip(p.astype(int), 0, len(table_1d) - 2)
            t = np.minimum(p - idx, 1.0)
            cc = c[idx]
            return ((cc[:, 0] * t + cc[:, 1]) * t + cc[:, 2]) * t + cc[:, 3]

        rhor_p = jnp.asarray(
            np.stack(
                [_fit_piecewise_poly(r_grid, dense_of(tables.rhor[t], tables.dr, r_grid),
                                     n_seg, degree) for t in range(T)]
            ),
            dtype,
        )
        z2r_p = jnp.asarray(
            np.stack(
                [
                    _fit_piecewise_poly(
                        r_grid, dense_of(tables.z2r[i, j], tables.dr, r_grid), n_seg, degree
                    )
                    for i in range(T)
                    for j in range(T)
                ]
            ),
            dtype,
        )
        inv_rmax = 1.0 / float(r_grid[-1])

        def eval_rhor(r, tj):
            return _poly_eval(rhor_p, tj, r, inv_rmax, n_seg)

        def eval_z2r(r, pair_t):
            return _poly_eval(z2r_p, pair_t, r, inv_rmax, n_seg)

        # F(rho) keeps the exact spline: the raw table has fine-scale
        # structure polynomials cannot follow, and it is a per-ATOM lookup
        # (N gathers per eval, ~M x fewer than the pair tables) — cheap.
        frho_c = jnp.asarray(
            np.stack([lammps_spline_coeffs(tables.frho[t]) for t in range(T)]), dtype
        )
        inv_drho = 1.0 / tables.drho

        def eval_frho(rho, ti):
            return spline_eval_onehot(frho_c, rho, inv_drho, table_idx=ti)

    if gather_via_matmul:
        assert mode == "cheb", "gather_via_matmul is implemented for the cheb mode"
        # express the static j-gather and the per-atom reduction as
        # constant 0/1 matmuls — MXU work instead of gather/scatter, and
        # XLA fuses all elementwise math between the two matmuls. Shapes
        # are 2D (N, P=N*M) throughout.
        N, M = nbr_table.slot_j.shape
        P = N * M
        gj = np.zeros((N, P), dtype=np.float32)
        rows = np.repeat(np.arange(N), M)
        gj[nbr_table.slot_j.reshape(-1), np.arange(P)] = 1.0
        red = np.zeros((P, N), dtype=np.float32)
        red[np.arange(P), rows] = 1.0
        gj_c = jnp.asarray(gj, dtype)
        red_c = jnp.asarray(red, dtype)
        shift_flat = jnp.asarray(nbr_table.shift.reshape(P, 3).T, dtype)   # (3, P)
        valid_flat = jnp.asarray(nbr_table.valid.reshape(P), bool)
        i_of_pair = jnp.asarray(rows)
        tj_flat = jnp.asarray(nbr_table.slot_j.reshape(P))

        def per_atom(positions, type_idx, alive, shifts_unused):
            pos_t = positions.T                                  # (3, N)
            pj = pos_t @ gj_c                                    # (3, P)
            pi = pos_t[:, i_of_pair]                             # static gather
            disp = pi - (pj + shift_flat)
            r = jnp.sqrt(jnp.maximum(jnp.sum(disp * disp, axis=0), 1e-12))  # (P,)
            af = alive.astype(r.dtype)
            alive_j = af @ gj_c
            mask = valid_flat & (alive_j > 0.5) & (af[i_of_pair] > 0.5) & (r < cutoff)
            fmask = mask.astype(r.dtype)
            rsafe = jnp.where(mask, r, cutoff)
            tj = type_idx[tj_flat] if T > 1 else None
            rho_i = (eval_rhor(rsafe, tj) * fmask) @ red_c        # (N,)
            F_i = jnp.where(alive, eval_frho(rho_i, type_idx), 0.0)
            pair_t = type_idx[i_of_pair] * T + tj if T > 1 else None
            phi = eval_z2r(rsafe, pair_t) / rsafe * fmask
            return F_i + 0.5 * (phi @ red_c)

    else:

        def per_atom(positions, type_idx, alive, shifts_unused):
            pj = positions[slot_j]                              # (N, M, 3)
            disp = positions[:, None, :] - (pj + shift)
            r = jnp.sqrt(jnp.maximum(jnp.sum(disp * disp, axis=-1), 1e-12))
            tj = type_idx[slot_j]
            mask = valid & alive[:, None] & alive[slot_j] & (r < cutoff)
            fmask = mask.astype(r.dtype)
            rsafe = jnp.where(mask, r, cutoff)
            rho_i = jnp.sum(eval_rhor(rsafe, tj) * fmask, axis=1)
            F_i = jnp.where(alive, eval_frho(rho_i, type_idx), 0.0)
            pair_t = type_idx[:, None] * T + tj
            phi = eval_z2r(rsafe, pair_t) / rsafe * fmask
            return F_i + 0.5 * jnp.sum(phi, axis=1)

    def energy(positions, type_idx, alive, shifts_unused=None):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts_unused))

    return Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff, name="eam")


# ----------------------------------------------------------------------
# Rigid-lattice path: the geometry never moves, so every pair distance is
# a compile-time constant and the EAM energy collapses to dense quadratic
# forms over the occupancy — zero distance computation in the hot loop.
# ----------------------------------------------------------------------
def make_eam_rigid(tables: EAMTables, spec, dtype=jnp.float32) -> Potential:
    """EAM for rigid (non-relaxed) MC as precomputed quadratic forms.

    In VSSR-MC without relaxation, slot positions are static templates, so
    for every candidate slot pair (i, j) the distance — and therefore the
    exact LAMMPS-spline values rho_t(r_ij) and phi_tt'(r_ij) — is known
    when the system is built. Summing over periodic images on the host
    (float64, exact splines) gives per-source-type density matrices
    W_rho[t'] (N, N) and pair matrices Phi[t, t'] (N, N), and the energy
    of occupancy a (one-hot per type, derived from alive/type_idx) is

        rho_i  = sum_t' (W_rho[t'] @ a_t')_i
        E      = sum_i sum_t a_t,i F_t(rho_i) + 1/2 a_t,i (Phi[t,t'] @ a_t')_i

    — two small dense matmuls plus the embedding lookup per evaluation,
    with EXACT LAMMPS table values (no Chebyshev fit at all). Requires a
    vocabulary of single-atom adsorbates (slot positions must not depend
    on the code); positions passed at runtime are ignored.
    """
    K1, G = spec.code_offsets.shape[:2]
    if G != 1 or np.abs(spec.code_offsets).max() > 1e-12:
        raise ValueError(
            "make_eam_rigid requires single-atom adsorbates with code-"
            "independent slot positions (group vocabularies move atoms)"
        )
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    T = len(tables.numbers)
    N = spec.n_slots
    nbr = build_static_neighbor_table(spec, tables.cutoff, relax_slack=0.0)
    centers = np.concatenate([spec.pristine_positions, spec.site_coords])

    # exact f64 spline values at the static distances
    rho_c = [lammps_spline_coeffs(tables.rhor[t]) for t in range(T)]
    z2r_c = {(a, b): lammps_spline_coeffs(tables.z2r[a, b]) for a in range(T) for b in range(T)}

    def spline_np(coeffs, r, delta):
        p = np.asarray(r) / delta
        idx = np.clip(p.astype(int), 0, coeffs.shape[0] - 2)
        t = np.minimum(p - idx, 1.0)
        c = coeffs[idx]
        return ((c[:, 0] * t + c[:, 1]) * t + c[:, 2]) * t + c[:, 3]

    W_rho = np.zeros((T, N, N))
    Phi = np.zeros((T, T, N, N))
    cutoff = float(tables.cutoff)
    for i in range(N):
        js = nbr.slot_j[i][nbr.valid[i]]
        shs = nbr.shift[i][nbr.valid[i]]
        r = np.linalg.norm(centers[i] - (centers[js] + shs), axis=1)
        within = r < cutoff
        js, r = js[within], r[within]
        for tsrc in range(T):
            vals = spline_np(rho_c[tsrc], r, tables.dr)
            np.add.at(W_rho[tsrc][i], js, vals)
        for ta in range(T):
            for tb in range(T):
                vals = spline_np(z2r_c[(ta, tb)], r, tables.dr) / r
                np.add.at(Phi[ta, tb][i], js, vals)

    W_rho_j = jnp.asarray(W_rho, dtype)          # (T, N, N)
    Phi_j = jnp.asarray(Phi, dtype)              # (T, T, N, N)
    frho_c = jnp.asarray(
        np.stack([lammps_spline_coeffs(tables.frho[t]) for t in range(T)]), dtype
    )
    inv_drho = 1.0 / tables.drho

    def _per_atom(positions, type_idx, alive, shifts):
        a = (jax.nn.one_hot(type_idx, T, dtype=dtype)
             * alive.astype(dtype)[:, None])                     # (N, T)
        aT = a.T                                                 # (T, N)
        rho = jnp.einsum("tij,tj->i", W_rho_j, aT,
                         precision="highest")                    # (N,)
        from surface_sampling_tpu.ops.splines import spline_eval_onehot

        F = spline_eval_onehot(frho_c, rho, inv_drho, table_idx=type_idx)
        pair = jnp.einsum("stij,tj->si", Phi_j, aT,
                          precision="highest")                   # (T, N)
        e_pair = 0.5 * jnp.sum(aT * pair, axis=0)                # (N,)
        return jnp.where(alive, F, 0.0) + e_pair

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(_per_atom(positions, type_idx, alive, shifts))

    return Potential(
        energy=energy, per_atom_energy=_per_atom, cutoff=cutoff, name="eam-rigid"
    )
