"""Surface-energy models: potential energy -> acceptance energy.

The reference wraps this logic in ASE Calculator subclasses
(EnsembleNFFSurface.get_surface_energy, calculators.py:379-446;
LAMMPSSurfCalc, calculators.py:696; NFFPourbaix, calculators.py:138-361).
Here a surface-energy model is a pure function

    surface_energy(E_pot, counts) -> scalar

with ``counts`` the per-element atom counts of the realized state. The
semigrand offset/chem-pot formula is exactly linear in the counts, so it
compiles to one dot product.

``make_state_energy_fn`` assembles the full per-move evaluation the
criterion calls (reference call stack: criterion -> get_surface_energy ->
relax_structure -> optimizer -> calculator; SURVEY §3.1): realize the
trial occupancy, optionally FIRE-relax with the frozen-bulk mask, apply
the OOB clamp, and map to the acceptance energy.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.constants import HARTREE_TO_EV, Z_FROM_SYMBOL
from surface_sampling_tpu.core.relax import (
    energy_threshold,
    FireConfig,
    fire_relax,
    lbfgs_relax as _lbfgs,
)
from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.core.state import (
    DeviceSpec,
    element_counts,
    realize_alive,
    realize_free_mask,
    realize_positions,
    realize_type_idx,
)
from surface_sampling_tpu.potentials.base import Potential


def identity_surface_energy(e_pot, counts):
    """Surface energy == potential energy (the reference's LAMMPSSurfCalc /
    LAMMPSRunSurfCalc behaviour, calculators.py:696-753,755-812)."""
    return e_pot


def make_chem_pot_surface_energy(spec: SurfaceSpec, chem_pots: dict[str, float]) -> Callable:
    """Plain semigrand surface energy E_pot - sum_e mu_e * n_e (the
    reference's default when no bulk-reference offset table is supplied;
    mcmc.py chem-pot bookkeeping without calculators.py offsets)."""
    coeff = np.zeros(len(spec.element_zs))
    for sym, mu in chem_pots.items():
        idx = np.where(spec.element_zs == Z_FROM_SYMBOL[sym])[0]
        if len(idx):
            coeff[int(idx[0])] = mu
    coeff_j = jnp.asarray(coeff)

    def surface_energy(e_pot, counts):
        return e_pot - jnp.dot(counts, coeff_j.astype(counts.dtype))

    return surface_energy


def make_offset_surface_energy(
    spec: SurfaceSpec,
    chem_pots: dict[str, float],
    offset_data: dict,
    offset_units: str = "atomic",
) -> Callable:
    """Semigrand surface energy with bulk-reference and chemical-potential
    offsets (Du et al. Nat Comput Sci 2023, Methods; reference
    calculators.py:379-446).

    surface_energy = E_pot - sum_e coeff_e * n_e, with

        coeff_ref = s*E_bulk[ref_formula]
                    - sum_{e != ref} (stoic_e/stoic_ref) (s*E_bulk[e] + mu_e)
        coeff_e   = s*E_bulk[e] + mu_e          (e != ref)

    where s = HARTREE_TO_EV if the offset table is in atomic units
    (calculators.py:429-432). Linear in counts -> one dot product.
    """
    bulk_energies = offset_data["bulk_energies"]
    stoics = offset_data["stoics"]
    ref_formula = offset_data["ref_formula"]
    ref_element = offset_data["ref_element"]
    scale = HARTREE_TO_EV if offset_units == "atomic" else 1.0

    coeff = np.zeros(len(spec.element_zs))
    sym_of = {Z_FROM_SYMBOL[s]: s for s in list(chem_pots) + list(stoics) + [ref_element]}
    ref_coeff = scale * bulk_energies[ref_formula]
    for i, z in enumerate(spec.element_zs):
        sym = sym_of.get(int(z))
        if sym is None or sym == ref_element:
            continue
        mu = chem_pots.get(sym, 0.0)
        be = scale * bulk_energies.get(sym, 0.0)
        coeff[i] = be + mu
        ratio = stoics.get(sym, 0.0) / stoics[ref_element]
        ref_coeff -= ratio * (be + mu)
    ref_slot = int(np.where(spec.element_zs == Z_FROM_SYMBOL[ref_element])[0][0])
    coeff[ref_slot] = ref_coeff
    coeff_j = jnp.asarray(coeff)

    def surface_energy(e_pot, counts):
        return e_pot - jnp.dot(counts, coeff_j.astype(counts.dtype))

    return surface_energy


@dataclass(frozen=True)
class RelaxConfig:
    """Relaxation policy inside the acceptance energy (reference:
    calc_settings relax_atoms/relax_steps, system.py:110, dynamics.py:140)."""

    steps: int = 20
    fmax: float = 0.01
    max_step: float = 0.2
    method: str = "fire"          # fire | lbfgs
    # neighbor policy inside the relax loop: "once" refreshes the edge
    # TOPOLOGY at the start of each relaxation and recomputes only the
    # geometry per force call (the reference's behavior — dynamics.py:129
    # builds the list per relaxation, not per force call); "every_step"
    # re-ranks the candidate pairs at every force evaluation. "once"
    # applies when the relaxing potential exposes the topology hooks
    # (NN potentials built with static_nbr); others always re-search.
    refresh_edges: str = "once"   # once | every_step


@dataclass(frozen=True)
class SymmetricSlabConfig:
    """Symmetric-slab energy mode (reference system.py:111-119, 348-357 +
    utils/slab.py symmetrize_slab): the MC manipulates the top half; the
    energy is evaluated on the slab with every non-base atom mirrored below
    the base plane. Here the mirror is a static reflection of the realized
    slot arrays — shapes stay fixed (N + N - n_base slots), so the mode
    composes with scan/vmap like any other system.

    base_z: the z of the reflection plane (mean of the base atoms).
    n_base: number of base atoms (not mirrored).
    """

    base_z: float
    n_base: int


def symmetrize_arrays(sym: SymmetricSlabConfig, positions, numbers, alive):
    """Append mirrored copies of all non-base slots."""
    refl = positions.at[:, 2].set(2.0 * sym.base_z - positions[:, 2])
    m_pos = refl[sym.n_base:]
    m_num = numbers[sym.n_base:]
    m_alive = alive[sym.n_base:]
    return (
        jnp.concatenate([positions, m_pos]),
        jnp.concatenate([numbers, m_num]),
        jnp.concatenate([alive, m_alive]),
    )


class StateEnergy(NamedTuple):
    surface_energy: jnp.ndarray     # acceptance energy (OOB-clamped)
    potential_energy: jnp.ndarray
    positions: jnp.ndarray          # relaxed (or ideal) geometry
    oob: jnp.ndarray                # bool


def make_state_energy_fn(
    d: DeviceSpec,
    potential: Potential,
    surface_energy_fn: Callable = identity_surface_energy,
    relax: RelaxConfig | None = None,
    symmetric: SymmetricSlabConfig | None = None,
    relax_potential: Potential | None = None,
) -> Callable:
    """Build ``fn(site_state) -> StateEnergy`` — the inner evaluation of
    every MC step. Pure; jit/vmap/scan-safe.

    With ``symmetric`` set, the potential sees the mirrored double slab
    (counts double accordingly for the mirrored atoms); relaxation then
    moves the top half with the mirror positions re-derived per force
    evaluation so the slab stays exactly symmetric (the reference relaxes
    the symmetrized copy, system.py:355-357).

    ``relax_potential`` relaxes the geometry under a DIFFERENT model than
    the one producing the acceptance energy — the reference's Si(111) 5x5
    tutorial mechanism, where ``minimize`` runs under the SRS modified
    Stillinger-Weber (tutorials/Si_111_5x5/lammps_opt_template.txt:18)
    while the MC acceptance energy is the SW85 potential energy of the
    relaxed geometry (lammps_energy_template.txt:18, ``run 0``). Only
    meaningful with ``relax`` set; the final energy is always evaluated
    with ``potential`` and re-checked against the OOB clamp.
    """

    fire_cfg = None
    if relax is not None:
        fire_cfg = FireConfig(steps=relax.steps, fmax=relax.fmax, max_step=relax.max_step)

    def state_energy(site_state) -> StateEnergy:
        pos0 = realize_positions(d, site_state)
        type_idx = realize_type_idx(d, site_state)
        alive = realize_alive(d, site_state)
        counts = element_counts(d, site_state, dtype=pos0.dtype)
        if symmetric is not None:
            from surface_sampling_tpu.core.state import realize_numbers

            numbers = realize_numbers(d, site_state)
            # mirrored element counts: non-base alive atoms count twice
            elem = d.z_to_element[numbers]
            onehot = jax.nn.one_hot(elem, d.n_elements, dtype=pos0.dtype)
            counts = counts + jnp.sum(
                onehot[symmetric.n_base:]
                * alive[symmetric.n_base:, None].astype(pos0.dtype),
                axis=0,
            )
            _, numbers_full, alive_full = symmetrize_arrays(symmetric, pos0, numbers, alive)
            type_idx_full = d.type_of_z[numbers_full]
            n_base, base_z = symmetric.n_base, symmetric.base_z

            def make_e_of(pot):
                def e_of(p_top):
                    refl = p_top.at[:, 2].set(2.0 * base_z - p_top[:, 2])
                    p_full = jnp.concatenate([p_top, refl[n_base:]])
                    return pot.energy(p_full, type_idx_full, alive_full, d.shifts)

                return e_of

        else:

            def make_e_of(pot):
                def e_of(p):
                    return pot.energy(p, type_idx, alive, d.shifts)

                return e_of

        e_of = make_e_of(potential)
        e_bound = jnp.asarray(energy_threshold(pos0.shape[0]), pos0.dtype)
        if fire_cfg is None:
            # rigid fast path: potentials built with a static candidate
            # table on code-independent geometry expose rigid_energy
            # (ops/static_edges.py) — the per-move edge build collapses
            # to exact bf16 one-hot MXU dots over host-precomputed
            # payloads. pos0 IS the static geometry here (unrelaxed
            # slot realization), so the paths agree (pinned in
            # tests/test_static_edges.py).
            rigid = getattr(potential, "__dict__", {}).get("rigid_energy")
            if rigid is not None and symmetric is None:
                e_pot = rigid(type_idx, alive)
            else:
                e_pot = e_of(pos0)
            nan = jnp.isnan(e_pot)
            oob = (jnp.abs(e_pot) > e_bound) | nan
            e_pot = jnp.where(oob, e_bound, e_pot)
            pos = pos0
        else:
            free = realize_free_mask(d, site_state)
            relaxer = fire_relax if relax.method == "fire" else _lbfgs
            relax_pot = potential if relax_potential is None else relax_potential
            hooks = getattr(relax_pot, "__dict__", {})
            fixed_topo = (
                relax.refresh_edges == "once"
                and symmetric is None
                and "edge_topology" in hooks
            )
            if fixed_topo:
                # reference neighbor semantics (dynamics.py:129): select
                # the edge topology once at the start geometry; each FIRE
                # force call only recomputes distances/units under it
                topo = hooks["edge_topology"](pos0, alive)

                def relax_e_of(p):
                    return hooks["energy_with_edges"](
                        p, type_idx, alive, d.shifts,
                        edges=hooks["edges_of"](p, topo),
                    )

            else:
                relax_e_of = (
                    e_of if relax_potential is None else make_e_of(relax_potential)
                )
            res = relaxer(relax_e_of, pos0, free, fire_cfg)
            pos, oob = res.positions, res.oob
            if relax_potential is None and not fixed_topo:
                e_pot = res.energy
            else:
                # fresh-edge acceptance energy (always `potential`, always
                # the standard edge path) so relaxed and unrelaxed states
                # are scored by the identical evaluator
                e_pot = e_of(pos)
                oob = oob | (jnp.abs(e_pot) > e_bound) | jnp.isnan(e_pot)
                e_pot = jnp.where(oob, e_bound, e_pot)

        se = surface_energy_fn(e_pot, counts)
        se = jnp.where(oob, e_bound, se)
        return StateEnergy(surface_energy=se, potential_energy=e_pot, positions=pos, oob=oob)

    return state_energy
