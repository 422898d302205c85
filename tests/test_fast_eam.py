"""Correctness of the fast EAM path (static pairs + polynomial tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import geometric_schedule, EngineConfig
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.potentials import builtin_eam
from surface_sampling_tpu.potentials.eam import make_eam_static
from surface_sampling_tpu.systems import cu100_eam


def test_fast_matches_exact_on_physical_states():
    """cheb mode matches the exact path on MC-sampled (physical) states;
    below its r_lo=1.5 A fit floor it substitutes an equally-rejecting
    repulsion wall, so unphysical overlap states are excluded here."""
    sys_exact = cu100_eam()
    sys_fast = cu100_eam(fast=True)
    temps = geometric_schedule(1.0, 5, 0.9)
    _, rec = sys_exact.run.run(
        jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=6, record_positions=False)
    )
    f_exact = jax.jit(lambda ss: sys_exact.run.state_energy_fn(ss).surface_energy)
    f_fast = jax.jit(lambda ss: sys_fast.run.state_energy_fn(ss).surface_energy)
    for ss in np.asarray(rec.site_state):
        e1, e2 = float(f_exact(jnp.asarray(ss))), float(f_fast(jnp.asarray(ss)))
        assert abs(e1 - e2) < 5e-4, (e1, e2)


def test_fast_wall_still_rejects_overlaps():
    """States with overlapping adsorbates must stay prohibitively high in
    both paths (the MC rejects them either way)."""
    sys_exact = cu100_eam()
    sys_fast = cu100_eam(fast=True)
    S = len(sys_exact.spec.site_coords)
    ss = jnp.ones(S, jnp.int32)  # every site filled -> many r < 1.5 pairs
    e_empty = float(sys_fast.run.state_energy_fn(jnp.zeros(S, jnp.int32)).surface_energy)
    e_fast = float(sys_fast.run.state_energy_fn(ss).surface_energy)
    e_exact = float(sys_exact.run.state_energy_fn(ss).surface_energy)
    assert e_fast > e_empty + 50.0
    assert e_exact > e_empty + 50.0


def test_fast_spline_mode_matches_exact():
    """mode='spline' on the static pair table must equal the dense path to
    f32 roundoff (identical physics, reduced pair set)."""
    sys_exact = cu100_eam()
    tables = builtin_eam("Cu_u3")
    nbr = build_static_neighbor_table(sys_exact.spec, tables.cutoff, relax_slack=0.05)
    pot = make_eam_static(tables, nbr, mode="spline")
    from surface_sampling_tpu.core import MCMCRun

    run2 = MCMCRun(sys_exact.spec, pot)
    S = len(sys_exact.spec.site_coords)
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        ss = jax.random.randint(k, (S,), 0, 2)
        e1 = float(sys_exact.run.state_energy_fn(ss).surface_energy)
        e2 = float(run2.state_energy_fn(ss).surface_energy)
        # relative term covers f32 rounding on huge (overlap-state) energies
        assert abs(e1 - e2) < 2e-4 + 1e-6 * abs(e1), (e1, e2)


def test_fast_full_run_finds_same_physics():
    """Annealed runs on both paths find the same energy basin (trajectories
    may diverge at razor-edge accept decisions on transient overlap states,
    where the wall substitutes a different-but-equally-huge energy)."""
    temps = geometric_schedule(1.0, 8, 0.85)
    cfg = EngineConfig(sweep_size=10)
    _, rec_exact = cu100_eam().run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    _, rec_fast = cu100_eam(fast=True).run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    best_exact = float(np.min(np.asarray(rec_exact.energy)))
    best_fast = float(np.min(np.asarray(rec_fast.energy)))
    assert abs(best_exact - best_fast) < 1.5  # same basin scale (eV)


def test_rigid_quadratic_form_matches_exact_eam():
    """make_eam_rigid (precomputed W_rho / Phi quadratic forms, exact f64
    host splines) must reproduce the dense exact-spline EAM energy on
    template geometries for Cu(100) and the Au(110) golden system."""
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.potentials.eam import builtin_eam, make_eam, make_eam_rigid
    from surface_sampling_tpu.systems import au110_eam, cu100_eam

    for name, sysf, tbl in [("cu100", cu100_eam, "Cu_u3"), ("au110", au110_eam, "Au_u3")]:
        sys_ = sysf()
        tables = builtin_eam(tbl)
        rigid = make_eam_rigid(tables, sys_.spec)
        exact = make_eam(tables)
        d = sys_.run.d
        rng = np.random.default_rng(1)
        for _ in range(6):
            ss = jnp.asarray(rng.integers(0, 2, sys_.spec.n_sites), jnp.int32)
            pos = realize_positions(d, ss)
            ti = realize_type_idx(d, ss)
            al = realize_alive(d, ss)
            e_r = float(rigid.energy(pos, ti, al, d.shifts))
            e_x = float(exact.energy(pos, ti, al, d.shifts))
            assert abs(e_r - e_x) < 5e-3, (name, e_r, e_x)
        # per-atom energies agree too (Boltzmann-weighted proposals use them)
        pa_r = np.asarray(rigid.per_atom_energy(pos, ti, al, d.shifts))
        pa_x = np.asarray(exact.per_atom_energy(pos, ti, al, d.shifts))
        al_np = np.asarray(al)
        assert np.abs((pa_r - pa_x)[al_np]).max() < 5e-3


def test_rigid_rejects_group_vocabularies():
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.potentials.eam import builtin_eam, make_eam_rigid
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5)["ontop"]
    tables = builtin_eam("Cu_u3")
    spec = make_spec(slab, sites, ["HO"], potential_numbers=tables.numbers,
                     cutoff=tables.cutoff)
    with pytest.raises(ValueError):
        make_eam_rigid(tables, spec)


def test_rigid_multitype_alloy_matches_dense():
    """T=2 branch of make_eam_rigid: a CuAu alloy (combined funcfl tables,
    LAMMPS multi-funcfl convention) on a Cu slab with {Cu, Au} adsorbates
    matches the dense exact-spline EAM on random mixed occupancies."""
    from surface_sampling_tpu.core import MCMCRun, make_spec
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.potentials.eam import (
        builtin_eam,
        combine_tables,
        make_eam,
        make_eam_rigid,
    )
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites

    tables = combine_tables([builtin_eam("Cu_u3"), builtin_eam("Au_u3")])
    assert list(tables.numbers) == [29, 79]
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.8)["ontop"]
    spec = make_spec(slab, sites, ["Cu", "Au"], potential_numbers=tables.numbers,
                     cutoff=tables.cutoff)
    rigid = make_eam_rigid(tables, spec)
    dense = make_eam(tables)
    run = MCMCRun(spec, dense)
    rng = np.random.default_rng(3)
    for _ in range(6):
        ss = jnp.asarray(rng.integers(0, 3, spec.n_sites), jnp.int32)  # 0/Cu/Au
        pos = realize_positions(run.d, ss)
        ti = realize_type_idx(run.d, ss)
        al = realize_alive(run.d, ss)
        e_r = float(rigid.energy(pos, ti, al, run.d.shifts))
        e_d = float(dense.energy(pos, ti, al, run.d.shifts))
        assert abs(e_r - e_d) < 5e-3, (e_r, e_d)
