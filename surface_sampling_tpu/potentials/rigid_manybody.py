"""Rigid-lattice fast paths for the many-body potentials (Tersoff, SW).

The same observation that turns rigid-lattice EAM into precomputed
quadratic forms (potentials/eam.make_eam_rigid) applies to the bond-order
and three-body potentials the reference drives through LAMMPS
(mcmc/potentials/GaN.tersoff via lammps_opt_template.txt; the KIM SW
model for Si(111)): in VSSR-MC without relaxation every slot position is
a static template, so every pair distance, every bond angle, and hence
every radial/angular factor is known in float64 when the system is built.
What remains at MC time is pure occupancy algebra:

  Tersoff:  zeta_ij(ti, tj) = C[pair, ti, tj, :] @ x_flat       (one matvec)
            b = (1 + (beta zeta)^n)^(-1/2n)                      (elementwise)
            E = sum_p x_i x_j . [1/2 fc (fR + b fA)](ti, tj)     (contraction)

  SW:       E2 = sum_p  x_i x_j . Phi2[p, ti, tj]
            E3 = sum_t  x_i x_j x_k . Phi3[t, ti, tj, tk]

with x the (N, T) alive-masked one-hot species occupancy. The species
axis keeps multi-type chemistry (GaN: Ga/N adsorbates) exact — the
precomputed tables carry every (ti, tj[, tk]) combination and the one-hot
contraction selects the realized one. No geometry, no neighbor search,
no truncation (the static tables enumerate every in-range image pair the
cutoff admits, where the dynamic path's padded top_k list can overflow).

Positions passed at runtime are ignored; requires a single-atom adsorbate
vocabulary (code-independent slot positions), like make_eam_rigid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.potentials.base import Potential
from surface_sampling_tpu.potentials.sw import SWTables
from surface_sampling_tpu.potentials.tersoff import TersoffTables


def _require_rigid_vocab(spec) -> None:
    G = spec.code_offsets.shape[1]
    if G != 1 or np.abs(spec.code_offsets).max() > 1e-12:
        raise ValueError(
            "rigid many-body paths require single-atom adsorbates with "
            "code-independent slot positions (group vocabularies move atoms)"
        )


# Refuse precomputed tables beyond this budget: the C table is
# (n_pairs, T, T, N*T) ~ O(N^2 * nbr * T^3) and the per-center f64
# temporaries are (M, M, T, T, T) — on large slabs both can exhaust host
# memory long before any allocation error points at the cause. Callers
# (cli/common.py) catch the ValueError and keep the dynamic path.
MAX_RIGID_TABLE_BYTES = 4 << 30


def _check_rigid_budget(spec, cutoff: float, T: int, itemsize: int,
                        max_bytes: int = MAX_RIGID_TABLE_BYTES) -> None:
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    valid = np.asarray(build_static_neighbor_table(spec, cutoff, relax_slack=0.0).valid)
    n_pairs = int(valid.sum())
    max_nbr = int(valid.sum(axis=1).max()) if n_pairs else 0
    table = n_pairs * T * T * spec.n_slots * T * itemsize
    temp = max_nbr * max_nbr * T**3 * 8
    if table + temp > max_bytes:
        raise ValueError(
            f"rigid many-body tables would need ~{(table + temp) / 2**30:.1f} GiB "
            f"(n_slots={spec.n_slots}, pairs={n_pairs}, T={T}) — beyond the "
            f"{max_bytes / 2**30:.0f} GiB budget; use the dynamic geometry path"
        )


def _static_pairs(spec, cutoff: float):
    """Enumerate every in-range static (center, neighbor-image) pair.

    Yields (i, js, shifts, r, unit) per center with float64 geometry.
    """
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    nbr = build_static_neighbor_table(spec, cutoff, relax_slack=0.0)
    centers = np.concatenate([spec.pristine_positions, spec.site_coords])
    for i in range(spec.n_slots):
        sel = np.asarray(nbr.valid[i])
        js = np.asarray(nbr.slot_j[i])[sel]
        shs = np.asarray(nbr.shift[i])[sel]
        dvec = centers[js] + shs - centers[i]
        r = np.linalg.norm(dvec, axis=1)
        within = r < cutoff
        js, dvec, r = js[within], dvec[within], r[within]
        unit = dvec / np.maximum(r, 1e-300)[:, None]
        yield i, js, r, unit


def _fc_np(r, R, D):
    """Vectorized Tersoff cutoff (broadcasts r against R/D tables)."""
    mid = 0.5 - 0.5 * np.sin(0.5 * np.pi * (r - R) / np.maximum(D, 1e-12))
    return np.where(r < R - D, 1.0, np.where(r > R + D, 0.0, mid))


def make_tersoff_rigid(tables: TersoffTables, spec, dtype=jnp.float32) -> Potential:
    """Tersoff on a rigid lattice as occupancy algebra over exact-f64
    precomputed radial/angular factors (see module docstring)."""
    _require_rigid_vocab(spec)
    T = len(tables.elements)
    _check_rigid_budget(spec, tables.cutoff, T,
                        np.dtype(jnp.zeros((), dtype).dtype).itemsize)
    N = spec.n_slots
    P = tables.params
    cutoff = tables.cutoff
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)

    # diagonal (ti, tj, tj) two-body tables, shape (T, T)
    idx = np.arange(T)
    R2, D2 = P["R"][:, idx, idx], P["D"][:, idx, idx]
    A2, lam1 = P["A"][:, idx, idx], P["lam1"][:, idx, idx]
    B2, lam2 = P["B"][:, idx, idx], P["lam2"][:, idx, idx]

    pair_i, pair_j = [], []
    fc2_l, fr2_l, fa2_l, C_l = [], [], [], []
    for i, js, r, unit in _static_pairs(spec, cutoff):
        M = len(js)
        cos = unit @ unit.T                                   # (M, M)
        ra = r[:, None, None]                                 # (M, 1, 1)
        fc_ab = _fc_np(ra, R2, D2)                            # (M, T, T)
        fr_ab = A2 * np.exp(-lam1 * ra)
        fa_ab = -B2 * np.exp(-lam2 * ra)
        # triple factors, broadcast over (b, ti, tj, tk)
        rb = r[:, None, None, None]                           # (M, 1, 1, 1)
        fc3 = _fc_np(rb, P["R"], P["D"])                      # (M, T, T, T)
        c2 = P["c"] ** 2
        d2 = P["d"] ** 2
        dcos = P["h"] - cos[:, :, None, None, None]           # (M, M, T, T, T)
        g = P["gamma"] * (1.0 + c2 / d2 - c2 / (d2 + dcos**2))
        base = P["lam3"] * (r[:, None] - r[None, :])[:, :, None, None, None]
        arg = np.where(P["m"] > 2.0, base**3, base)
        contrib = fc3[None, :] * g * np.exp(np.clip(arg, -60.0, 60.0))  # (M,M,T,T,T)
        contrib[np.arange(M), np.arange(M)] = 0.0             # k != j (same entry)
        rows = np.zeros((M, T, T, N, T))
        np.add.at(
            rows.transpose(3, 0, 1, 2, 4), js, np.transpose(contrib, (1, 0, 2, 3, 4))
        )
        pair_i.extend([i] * M)
        pair_j.extend(int(j) for j in js)
        fc2_l.append(fc_ab.astype(np_dtype))
        fr2_l.append(fr_ab.astype(np_dtype))
        fa2_l.append(fa_ab.astype(np_dtype))
        C_l.append(rows.reshape(M, T, T, N * T).astype(np_dtype))

    n_pairs = len(pair_i)
    zero3 = np.zeros((0, T, T, N * T), np_dtype)
    zero2 = np.zeros((0, T, T), np_dtype)
    C_j = jnp.asarray(np.concatenate(C_l) if n_pairs else zero3, dtype)
    fc2_j = jnp.asarray(np.concatenate(fc2_l) if n_pairs else zero2, dtype)
    fr2_j = jnp.asarray(np.concatenate(fr2_l) if n_pairs else zero2, dtype)
    fa2_j = jnp.asarray(np.concatenate(fa2_l) if n_pairs else zero2, dtype)
    pi_j = jnp.asarray(np.asarray(pair_i, np.int32))
    pj_j = jnp.asarray(np.asarray(pair_j, np.int32))
    beta2 = jnp.asarray(
        np.array([[P["beta"][a, b, b] for b in range(T)] for a in range(T)]), dtype
    )
    n2 = jnp.asarray(
        np.array([[P["n"][a, b, b] for b in range(T)] for a in range(T)]), dtype
    )

    def _per_atom(positions, type_idx, alive, shifts):
        x = jax.nn.one_hot(type_idx, T, dtype=dtype) * alive[:, None].astype(dtype)
        zeta = jnp.einsum("pabq,q->pab", C_j, x.reshape(-1), precision="highest")
        bz = jnp.maximum(beta2 * zeta, 1e-30)
        b = (1.0 + bz**n2) ** (-1.0 / (2.0 * jnp.maximum(n2, 1e-12)))
        e_ptt = 0.5 * fc2_j * (fr2_j + b * fa2_j)                # (P, T, T)
        sel = x[pi_j][:, :, None] * x[pj_j][:, None, :]
        e_p = jnp.sum(e_ptt * sel, axis=(1, 2))
        return jax.ops.segment_sum(e_p, pi_j, num_segments=N)

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(_per_atom(positions, type_idx, alive, shifts))

    return Potential(
        energy=energy, per_atom_energy=_per_atom, cutoff=cutoff, name="tersoff-rigid"
    )


def make_sw_rigid(tables: SWTables, spec, dtype=jnp.float32) -> Potential:
    """Stillinger-Weber on a rigid lattice, in the same pair-grouped form
    as Tersoff: the triple sum over k collapses into a per-pair matvec

        S_ij(ti, tj) = C3[pair, ti, tj, :] @ x_flat
        E            = sum_p x_i x_j . (Phi2/2 + S)[p, ti, tj]

    so the evaluation is one matmul + one contraction — no per-triple
    gathers (a first triple-indexed formulation ran 50x slower on TPU)."""
    _require_rigid_vocab(spec)
    T = len(tables.elements)
    _check_rigid_budget(spec, tables.cutoff, T,
                        np.dtype(jnp.zeros((), dtype).dtype).itemsize)
    N = spec.n_slots
    P = tables.params
    cutoff = tables.cutoff
    np_dtype = np.dtype(jnp.zeros((), dtype).dtype)

    pair_i, pair_j, phi2_l, C3_l = [], [], [], []

    idx = np.arange(T)
    sig2, a2 = P["sig"][:, idx, idx], P["a"][:, idx, idx]       # (T, T)
    A2, eps2 = P["A"][:, idx, idx], P["eps"][:, idx, idx]
    B2, p2, q2 = P["B"][:, idx, idx], P["p"][:, idx, idx], P["q"][:, idx, idx]

    for i, js, r, unit in _static_pairs(spec, cutoff):
        M = len(js)
        cos = unit @ unit.T
        ra = r[:, None, None]                                   # (M, 1, 1)
        gap2 = ra - a2 * sig2
        in2 = gap2 < -1e-9
        sr = sig2 / np.maximum(ra, 1e-12)
        rad2 = np.where(in2, np.exp(sig2 / np.where(in2, gap2, -1.0)), 0.0)
        with np.errstate(invalid="ignore"):
            tab2 = np.where(
                in2, 0.5 * A2 * eps2 * (B2 * sr**p2 - sr**q2) * rad2, 0.0
            )                                                   # (M, T, T)
        # per-leg gamma-scaled radial factor of the (ti,tj,tk) entry
        rb = r[:, None, None, None]                             # (M, 1, 1, 1)
        gap3 = rb - P["a"] * P["sig"]
        in3 = gap3 < -1e-9
        hrad = np.where(in3, np.exp(P["gam"] * P["sig"] / np.where(in3, gap3, -1.0)), 0.0)
        dcos = cos[:, :, None, None, None] - P["cos0"]          # (M, M, T, T, T)
        # leg ij uses r[a] (axis 0), leg ik uses r[b] (axis 1)
        contrib = 0.5 * P["lam"] * P["eps"] * dcos * dcos * hrad[:, None] * hrad[None, :]
        contrib[np.arange(M), np.arange(M)] = 0.0
        rows = np.zeros((M, T, T, N, T))
        np.add.at(
            rows.transpose(3, 0, 1, 2, 4), js, np.transpose(contrib, (1, 0, 2, 3, 4))
        )
        keep = (np.abs(tab2).sum(axis=(1, 2)) > 0) | (
            np.abs(rows).sum(axis=(1, 2, 3, 4)) > 0
        )
        kept = np.where(keep)[0]
        pair_i.extend([i] * len(kept))
        pair_j.extend(int(js[a]) for a in kept)
        phi2_l.append(tab2[kept].astype(np_dtype))
        C3_l.append(rows[kept].reshape(len(kept), T, T, N * T).astype(np_dtype))

    n_pairs = len(pair_i)
    phi2_j = jnp.asarray(
        np.concatenate(phi2_l) if n_pairs else np.zeros((0, T, T), np_dtype), dtype
    )
    C3_j = jnp.asarray(
        np.concatenate(C3_l) if n_pairs else np.zeros((0, T, T, N * T), np_dtype),
        dtype,
    )
    p2i = jnp.asarray(np.asarray(pair_i, np.int32))
    p2j = jnp.asarray(np.asarray(pair_j, np.int32))

    def _per_atom(positions, type_idx, alive, shifts):
        x = jax.nn.one_hot(type_idx, T, dtype=dtype) * alive[:, None].astype(dtype)
        s3 = jnp.einsum("pabq,q->pab", C3_j, x.reshape(-1), precision="highest")
        sel = x[p2i][:, :, None] * x[p2j][:, None, :]
        e_p = jnp.sum((phi2_j + s3) * sel, axis=(1, 2))
        return jax.ops.segment_sum(e_p, p2i, num_segments=N)

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(_per_atom(positions, type_idx, alive, shifts))

    return Potential(
        energy=energy, per_atom_energy=_per_atom, cutoff=cutoff, name="sw-rigid"
    )
