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


def _fc_np(r: float, R: float, D: float) -> float:
    if r < R - D:
        return 1.0
    if r > R + D:
        return 0.0
    return 0.5 - 0.5 * np.sin(0.5 * np.pi * (r - R) / max(D, 1e-12))


def make_tersoff_rigid(tables: TersoffTables, spec, dtype=jnp.float32) -> Potential:
    """Tersoff on a rigid lattice as occupancy algebra over exact-f64
    precomputed radial/angular factors (see module docstring)."""
    _require_rigid_vocab(spec)
    T = len(tables.elements)
    N = spec.n_slots
    P = tables.params
    cutoff = tables.cutoff

    pair_i, pair_j = [], []
    fc2_l, fr2_l, fa2_l, C_l = [], [], [], []
    for i, js, r, unit in _static_pairs(spec, cutoff):
        M = len(js)
        cos = unit @ unit.T                                   # (M, M)
        for a in range(M):
            fc_ab = np.zeros((T, T))
            fr_ab = np.zeros((T, T))
            fa_ab = np.zeros((T, T))
            for ti in range(T):
                for tj in range(T):
                    R2, D2 = P["R"][ti, tj, tj], P["D"][ti, tj, tj]
                    fc_ab[ti, tj] = _fc_np(r[a], R2, D2)
                    fr_ab[ti, tj] = P["A"][ti, tj, tj] * np.exp(-P["lam1"][ti, tj, tj] * r[a])
                    fa_ab[ti, tj] = -P["B"][ti, tj, tj] * np.exp(-P["lam2"][ti, tj, tj] * r[a])
            row = np.zeros((T, T, N, T))
            for b in range(M):
                if b == a:
                    continue
                for ti in range(T):
                    for tj in range(T):
                        for tk in range(T):
                            fc_ik = _fc_np(r[b], P["R"][ti, tj, tk], P["D"][ti, tj, tk])
                            if fc_ik == 0.0:
                                continue
                            c2 = P["c"][ti, tj, tk] ** 2
                            d2 = P["d"][ti, tj, tk] ** 2
                            hh = P["h"][ti, tj, tk]
                            g = P["gamma"][ti, tj, tk] * (
                                1.0 + c2 / d2 - c2 / (d2 + (hh - cos[a, b]) ** 2)
                            )
                            base = P["lam3"][ti, tj, tk] * (r[a] - r[b])
                            arg = base**3 if P["m"][ti, tj, tk] > 2.0 else base
                            row[ti, tj, js[b], tk] += fc_ik * g * np.exp(
                                np.clip(arg, -60.0, 60.0)
                            )
            pair_i.append(i)
            pair_j.append(int(js[a]))
            fc2_l.append(fc_ab)
            fr2_l.append(fr_ab)
            fa2_l.append(fa_ab)
            C_l.append(row.reshape(T, T, N * T))

    n_pairs = len(pair_i)
    C_j = jnp.asarray(np.stack(C_l) if n_pairs else np.zeros((0, T, T, N * T)), dtype)
    fc2_j = jnp.asarray(np.stack(fc2_l) if n_pairs else np.zeros((0, T, T)), dtype)
    fr2_j = jnp.asarray(np.stack(fr2_l) if n_pairs else np.zeros((0, T, T)), dtype)
    fa2_j = jnp.asarray(np.stack(fa2_l) if n_pairs else np.zeros((0, T, T)), dtype)
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
    N = spec.n_slots
    P = tables.params
    cutoff = tables.cutoff

    pair_i, pair_j, phi2_l, C3_l = [], [], [], []

    def _radial_np(r, sig, a):
        gap = r - a * sig
        if gap >= -1e-9:
            return 0.0
        return np.exp(sig / gap)

    for i, js, r, unit in _static_pairs(spec, cutoff):
        M = len(js)
        cos = unit @ unit.T
        for a in range(M):
            tab2 = np.zeros((T, T))
            for ti in range(T):
                for tj in range(T):
                    sig = P["sig"][ti, tj, tj]
                    aa = P["a"][ti, tj, tj]
                    if r[a] >= aa * sig - 1e-9:
                        continue
                    sr = sig / r[a]
                    tab2[ti, tj] = 0.5 * (
                        P["A"][ti, tj, tj]
                        * P["eps"][ti, tj, tj]
                        * (P["B"][ti, tj, tj] * sr ** P["p"][ti, tj, tj] - sr ** P["q"][ti, tj, tj])
                        * _radial_np(r[a], sig, aa)
                    )
            row3 = np.zeros((T, T, N, T))
            any3 = False
            for b in range(M):
                if b == a:
                    continue
                for ti in range(T):
                    for tj in range(T):
                        for tk in range(T):
                            sig3 = P["sig"][ti, tj, tk]
                            a3 = P["a"][ti, tj, tk]
                            gap_ij = r[a] - a3 * sig3
                            gap_ik = r[b] - a3 * sig3
                            if gap_ij >= -1e-9 or gap_ik >= -1e-9:
                                continue
                            gam = P["gam"][ti, tj, tk]
                            dcos = cos[a, b] - P["cos0"][ti, tj, tk]
                            val = (
                                P["lam"][ti, tj, tk]
                                * P["eps"][ti, tj, tk]
                                * dcos
                                * dcos
                                * np.exp(gam * sig3 / gap_ij)
                                * np.exp(gam * sig3 / gap_ik)
                            )
                            if val != 0.0:
                                row3[ti, tj, js[b], tk] += 0.5 * val
                                any3 = True
            if np.any(tab2) or any3:
                pair_i.append(i)
                pair_j.append(int(js[a]))
                phi2_l.append(tab2)
                C3_l.append(row3.reshape(T, T, N * T))

    n_pairs = len(pair_i)
    phi2_j = jnp.asarray(np.stack(phi2_l) if n_pairs else np.zeros((0, T, T)), dtype)
    C3_j = jnp.asarray(np.stack(C3_l) if n_pairs else np.zeros((0, T, T, N * T)), dtype)
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
