"""Tests for breadth extras: supercell generator, trajectory relax, even
adsorption, spec serialization, lammps-data writer, GMM criteria."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import FireConfig, make_spec
from surface_sampling_tpu.core.engine import count_adsorption_sites, even_site_prefill
from surface_sampling_tpu.core.relax import fire_relax_traj
from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.structure import bulk
from surface_sampling_tpu.structure.io import write_lammps_data
from surface_sampling_tpu.structure.slabs import SupercellSurfaceGenerator, fcc100


def test_supercell_surface_generator():
    cu = bulk("Cu", "fcc", 3.6147)
    gen = SupercellSurfaceGenerator(cu, (1, 0, 0), min_slab_layers=2, vacuum=8.0)
    prim = gen.get_primitive_slab()
    sc = gen.get_supercell_slab(2.0, 2.0)
    # 2x2 supercell has ~4x the atoms of the primitive slab
    assert len(sc) == 4 * len(prim)
    assert gen.hkl_to_hkil == (1, 0, -1, 0)
    # rotation keeps density (0 deg rotation sanity)
    sc_rot = gen.get_supercell_slab(2.0, 2.0, rotation=90.0)
    assert abs(len(sc_rot) - len(sc)) <= len(prim)


def test_fire_relax_traj_records_frames():
    pot = make_lennard_jones(1.0, 1.0, 5.0)
    shifts = jnp.zeros((1, 3))
    pos0 = jnp.array([[0.0, 0, 0], [1.4, 0, 0]])

    def e_of(p):
        return pot.energy(p, jnp.zeros(2, jnp.int32), jnp.ones(2, bool), shifts)

    res, frames, frame_e = fire_relax_traj(
        e_of, pos0, jnp.ones(2, bool), FireConfig(steps=40, fmax=1e-3), record_interval=5
    )
    assert frames.shape == (8, 2, 3)
    assert frame_e.shape == (8,)
    # energies decrease along the recorded trajectory
    fe = np.asarray(frame_e)
    assert fe[-1] <= fe[0]
    assert np.isclose(float(res.energy), -1.0, atol=1e-2)


def _tiny_spec():
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=10.0)
    sites = np.array([[0, 0, 13.0], [1.3, 0, 13.0], [0, 1.3, 13.0], [1.3, 1.3, 13.0]])
    return make_spec(slab, sites, ["Cu", "O"], potential_numbers=[29, 8], cutoff=4.0)


def test_even_site_prefill():
    spec = _tiny_spec()
    ss = even_site_prefill(spec, 3, rng=np.random.default_rng(0))
    assert (ss > 0).sum() == 3
    assert set(np.unique(ss)) <= {0, 1, 2}


def test_count_adsorption_sites():
    spec = _tiny_spec()
    conn = np.array([1, 1, 2, 4])  # site coordination classes
    ss = np.array([1, 0, 2, 1])
    counts = count_adsorption_sites(ss, conn)
    assert counts == {1: 1, 2: 1, 4: 1}


def test_spec_serialization_roundtrip():
    spec = _tiny_spec()
    d = spec.todict()
    back = SurfaceSpec.fromdict(d)
    assert back.n_sites == spec.n_sites
    assert back.vocab[0].name == "Cu"
    np.testing.assert_allclose(back.site_coords, spec.site_coords)
    np.testing.assert_array_equal(back.code_numbers, spec.code_numbers)
    # JSON-roundtrip safe
    import json

    back2 = SurfaceSpec.fromdict(json.loads(json.dumps(d)))
    np.testing.assert_allclose(back2.pristine_positions, spec.pristine_positions)


def test_write_lammps_data(tmp_path):
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=10.0)
    p = tmp_path / "data.lammps"
    write_lammps_data(p, slab)
    text = p.read_text()
    assert "8 atoms" in text
    assert "1 atom types" in text
    assert "Atoms # atomic" in text


def test_gmm_bic_aic_prefer_true_component_count():
    from surface_sampling_tpu.analysis import GMMUncertainty

    rng = np.random.default_rng(0)
    X = np.concatenate([rng.normal(0, 1, (300, 3)), rng.normal(8, 1, (300, 3))])
    bics = {}
    for k in (1, 2, 5):
        gu = GMMUncertainty(n_components=k)
        gu.fit_gmm(X)
        bics[k] = gu.bic(X)
    assert bics[2] < bics[1]
    assert bics[2] < bics[5]


def test_symmetric_slab_energy_mode():
    """Symmetric-slab mode: energy equals a direct evaluation of the
    manually mirrored structure (reference system.py:348-357 semantics)."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core import MCMCRun, SymmetricSlabConfig
    from surface_sampling_tpu.core.state import realize_alive, realize_numbers, realize_positions
    from surface_sampling_tpu.ops.neighbors import pair_shifts

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=20.0)
    slab = slab.sorted_by_z()
    sites = np.array([[0.0, 0.0, slab.positions[:, 2].max() + 1.8]])
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=3.5)
    pot = make_lennard_jones(epsilon=0.4, sigma=2.2, cutoff=3.5)
    base_z = float(slab.positions[:4, 2].mean())   # bottom layer = base
    sym = SymmetricSlabConfig(base_z=base_z, n_base=4)
    run_sym = MCMCRun(spec, pot, symmetric=sym)

    ss = jnp.ones(1, jnp.int32)
    out = run_sym.state_energy_fn(ss)

    # manual mirror of the realized alive atoms
    d = run_sym.d
    pos = np.asarray(realize_positions(d, ss))
    alive = np.asarray(realize_alive(d, ss))
    refl = pos.copy()
    refl[:, 2] = 2 * base_z - refl[:, 2]
    full_pos = np.concatenate([pos, refl[4:]])
    full_alive = np.concatenate([alive, alive[4:]])
    shifts = jnp.asarray(d.shifts)
    e_manual = float(
        pot.energy(
            jnp.asarray(full_pos, jnp.float32),
            jnp.zeros(len(full_pos), jnp.int32),
            jnp.asarray(full_alive),
            shifts,
        )
    )
    assert np.isclose(float(out.potential_energy), e_manual, rtol=1e-6)
    # symmetric energy differs from the plain-slab energy (mirror interacts)
    run_plain = MCMCRun(spec, pot)
    e_plain = float(run_plain.state_energy_fn(ss).potential_energy)
    assert abs(e_plain - float(out.potential_energy)) > 1e-3


def test_write_poscar_format(tmp_path):
    """POSCAR writer: VASP5 format with grouped species, counts, and
    positions (structure/io.py analog of pymatgen's POSCAR export used
    by the reference's SupercellSurfaceGenerator.save_slab)."""
    from surface_sampling_tpu.structure import Structure
    from surface_sampling_tpu.structure.io import write_poscar

    st = Structure.from_symbols(
        ["Cu", "O", "Cu"], [[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.eye(3) * 5.0)
    p = tmp_path / "POSCAR"
    write_poscar(p, st)
    lines = p.read_text().splitlines()
    assert float(lines[1]) == 1.0            # scale
    # species line + counts line consistent with 2 Cu + 1 O
    syms = lines[5].split()
    counts = [int(x) for x in lines[6].split()]
    assert sorted(zip(syms, counts)) == [("Cu", 2), ("O", 1)]
    assert sum(counts) == 3


def test_symmetry_reduce_sites_square_lattice():
    """symm_reduce keeps one representative per symmetry orbit: the four
    equivalent hollow sites of a 2x2 fcc(100) surface reduce to one."""
    from surface_sampling_tpu.structure.sites import symmetry_reduce_sites
    from surface_sampling_tpu.structure.slabs import fcc100

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=10.0)
    z = slab.positions[:, 2].max() + 1.5
    a = 3.6147 / np.sqrt(2.0)
    hollows = np.array([[x * a + a / 2, y * a + a / 2, z]
                        for x in range(2) for y in range(2)])
    red = symmetry_reduce_sites(slab, hollows)
    assert 1 <= len(red) < 4
    # every representative is one of the originals
    for r in red:
        assert np.min(np.linalg.norm(hollows - r, axis=1)) < 1e-8


def test_chain_ensemble_mesh_axes():
    import jax

    from surface_sampling_tpu.parallel.mesh import chain_ensemble_mesh

    mesh = chain_ensemble_mesh(4, 2)
    assert mesh.axis_names == ("chains", "ensemble")
    assert mesh.devices.shape == (4, 2)
    assert len({d.id for d in mesh.devices.flat}) == 8


def test_make_chem_pot_surface_energy():
    """Plain semigrand surface energy E - sum_e mu_e n_e (core/energy.py:
    the reference's default bookkeeping when no offset table exists)."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.core.energy import make_chem_pot_surface_energy
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(["Cu", "Cu"], [[0, 0, 0], [1, 1, 1]],
                                  np.eye(3) * 10.0)
    sites = np.array([[0, 0, 3.0]])
    spec = make_spec(slab, sites, ["O"], potential_numbers=[29], cutoff=4.0)
    se = make_chem_pot_surface_energy(spec, {"Cu": -3.5, "O": -1.25})
    i_cu = int(np.where(spec.element_zs == 29)[0][0])
    i_o = int(np.where(spec.element_zs == 8)[0][0])
    counts = np.zeros(len(spec.element_zs)); counts[i_cu] = 2; counts[i_o] = 1
    got = float(se(jnp.asarray(-10.0), jnp.asarray(counts)))
    assert np.isclose(got, -10.0 - (2 * -3.5 + 1 * -1.25))


def test_notebook_tutorials_generated_and_valid():
    """The notebook-form tutorials (reference tutorials/*.ipynb parity:
    example, SrTiO3_001, GaN_0001, latent_space_clustering,
    prepare_surface) are committed under notebooks/ and regenerate
    deterministically from the example scripts via tools/make_notebooks."""
    import json
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    import sys

    sys.path.insert(0, str(repo / "tools"))
    import make_notebooks as mn

    for nb_name, script in mn.MAPPING.items():
        nb_path = repo / "notebooks" / nb_name
        assert nb_path.exists(), nb_name
        nb = json.loads(nb_path.read_text())
        assert nb["nbformat"] == 4
        kinds = [c["cell_type"] for c in nb["cells"]]
        assert kinds[0] == "markdown" and "code" in kinds
        # committed file matches a fresh render of the script
        cells = mn.script_to_cells(repo / "examples" / script)
        assert [c["source"] for c in cells] == [c["source"] for c in nb["cells"]]
