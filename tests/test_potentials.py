"""Golden-value tests for classical potentials.

The EAM checks pin the published Foiles et al. PRB 33, 7983 (1986)
cohesive energies for the universal-3 Cu/Au tables — the same physics the
reference exercises through LAMMPS in tests/test_Cu.py / test_Au.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.potentials import (
    builtin_eam,
    make_eam,
    make_lennard_jones,
    make_morse,
)
from surface_sampling_tpu.ops.neighbors import pair_shifts
from surface_sampling_tpu.structure import bulk


def _bulk_inputs(sym, a, rep=3, dtype=jnp.float32, cutoff=6.0):
    st = bulk(sym, "fcc", a=a).repeat(rep)
    pos = jnp.asarray(st.positions, dtype)
    shifts = jnp.asarray(pair_shifts(st.cell, cutoff), dtype)
    ti = jnp.zeros(len(st), dtype=jnp.int32)
    alive = jnp.ones(len(st), dtype=bool)
    return st, pos, ti, alive, shifts


@pytest.mark.parametrize(
    "table,sym,a0,ecoh",
    [("Cu_u3", "Cu", 3.615, -3.54), ("Au_u3", "Au", 4.08, -3.93)],
)
def test_eam_cohesive_energy(table, sym, a0, ecoh):
    pot = make_eam(builtin_eam(table))
    st, pos, ti, alive, shifts = _bulk_inputs(sym, a0)
    e = float(pot.energy(pos, ti, alive, shifts)) / len(st)
    assert abs(e - ecoh) < 2e-3  # f32 tolerance; x64 reproduces to 1e-8


def test_eam_bulk_forces_vanish():
    pot = make_eam(builtin_eam("Cu_u3"))
    _, pos, ti, alive, shifts = _bulk_inputs("Cu", 3.615, rep=2)
    f = pot.forces(pos, ti, alive, shifts)
    assert float(jnp.abs(f).max()) < 1e-4


def test_eam_lattice_constant_is_minimum():
    pot = make_eam(builtin_eam("Cu_u3"))

    def e_at(a):
        st, pos, ti, alive, shifts = _bulk_inputs("Cu", a, rep=2)
        return float(pot.energy(pos, ti, alive, shifts)) / len(st)

    e0 = e_at(3.615)
    assert e_at(3.55) > e0
    assert e_at(3.68) > e0


def test_eam_dead_slots_contribute_nothing():
    """Masked (vacant) slots must not change the energy — the core invariant
    that makes fixed-shape adsorption/desorption correct."""
    pot = make_eam(builtin_eam("Cu_u3"))
    st, pos, ti, alive, shifts = _bulk_inputs("Cu", 3.615, rep=2)
    e_ref = float(pot.energy(pos, ti, alive, shifts))
    # append 5 dead slots at arbitrary (even overlapping) positions
    pos2 = jnp.concatenate([pos, pos[:5] + 0.1])
    ti2 = jnp.concatenate([ti, ti[:5]])
    alive2 = jnp.concatenate([alive, jnp.zeros(5, dtype=bool)])
    e2 = float(pot.energy(pos2, ti2, alive2, shifts))
    assert np.isclose(e_ref, e2, atol=1e-5)
    f2 = pot.forces(pos2, ti2, alive2, shifts)
    assert float(jnp.abs(f2[-5:]).max()) == 0.0


def test_eam_per_atom_sums_to_total():
    pot = make_eam(builtin_eam("Au_u3"))
    _, pos, ti, alive, shifts = _bulk_inputs("Au", 4.08, rep=2)
    pa = pot.per_atom_energy(pos, ti, alive, shifts)
    tot = pot.energy(pos, ti, alive, shifts)
    assert np.isclose(float(jnp.sum(pa)), float(tot), rtol=1e-6)


def test_lj_dimer_minimum():
    pot = make_lennard_jones(epsilon=1.0, sigma=1.0, cutoff=5.0)
    shifts = jnp.zeros((1, 3))
    rmin = 2.0 ** (1.0 / 6.0)
    pos = jnp.array([[0.0, 0, 0], [rmin, 0, 0]])
    ti = jnp.zeros(2, dtype=jnp.int32)
    alive = jnp.ones(2, dtype=bool)
    e = float(pot.energy(pos, ti, alive, shifts))
    assert np.isclose(e, -1.0, atol=1e-5)
    f = pot.forces(pos, ti, alive, shifts)
    assert float(jnp.abs(f).max()) < 1e-4


def test_morse_dimer_minimum():
    pot = make_morse(D=0.7, alpha=1.5, r0=2.2, cutoff=6.0)
    shifts = jnp.zeros((1, 3))
    pos = jnp.array([[0.0, 0, 0], [2.2, 0, 0]])
    e = float(pot.energy(pos, jnp.zeros(2, jnp.int32), jnp.ones(2, bool), shifts))
    assert np.isclose(e, -0.7, atol=1e-5)


def test_eam_jit_and_vmap():
    """The potential must compose with jit and vmap (chain axis)."""
    pot = make_eam(builtin_eam("Cu_u3"))
    _, pos, ti, alive, shifts = _bulk_inputs("Cu", 3.615, rep=2)
    batch_pos = jnp.stack([pos, pos.at[0].add(0.3)])  # displace one atom
    e = jax.jit(jax.vmap(lambda p: pot.energy(p, ti, alive, shifts)))(batch_pos)
    assert e.shape == (2,)
    assert e[1] > e[0]  # perturbed structure has higher energy


def test_eam_alloy_two_funcfl():
    """Multi-element funcfl combination (Cu+Au alloy tables): cross pair
    interactions exist and pure-element limits match the single tables."""
    from surface_sampling_tpu.potentials import builtin_eam
    from surface_sampling_tpu.potentials.eam import EAMTables, tables_from_funcfl

    cu, au = builtin_eam("Cu_u3"), builtin_eam("Au_u3")
    # reconstruct element dicts from the stored tables (same grids)
    def as_funcfl(t):
        return {
            "number": int(t.numbers[0]), "nrho": t.nrho, "drho": t.drho,
            "nr": t.nr, "dr": t.dr, "cutoff": t.cutoff,
            "frho": t.frho[0], "zr": np.sqrt(np.maximum(t.z2r[0, 0], 0) / 27.2 / 0.529),
            "rhor": t.rhor[0],
        }

    alloy = tables_from_funcfl([as_funcfl(cu), as_funcfl(au)])
    assert alloy.z2r.shape[0] == 2
    # cross term is the geometric mixing of the pure terms
    assert np.allclose(
        alloy.z2r[0, 1], np.sqrt(np.maximum(alloy.z2r[0, 0], 0) *
                                 np.maximum(alloy.z2r[1, 1], 0)), atol=1e-8
    )
    pot = make_eam(alloy)
    # mixed dimer energy is finite and differs from both pure dimers
    shifts = jnp.zeros((1, 3))
    pos = jnp.array([[0.0, 0, 0], [2.6, 0, 0]])
    alive = jnp.ones(2, bool)
    e_mix = float(pot.energy(pos, jnp.asarray([0, 1]), alive, shifts))
    e_cu = float(pot.energy(pos, jnp.asarray([0, 0]), alive, shifts))
    e_au = float(pot.energy(pos, jnp.asarray([1, 1]), alive, shifts))
    assert np.isfinite(e_mix) and e_mix != e_cu and e_mix != e_au
