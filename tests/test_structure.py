"""Tests for the host-side structure layer (lattice, slabs, sites, io)."""

import numpy as np
import pytest

from surface_sampling_tpu.constants import parse_formula
from surface_sampling_tpu.structure import (
    Structure,
    bulk,
    find_adsorption_sites,
    surface_from_bulk,
    symmetrize_slab,
)
from surface_sampling_tpu.structure.io import (
    read_cif,
    read_xyz,
    write_cif,
    write_xyz,
)
from surface_sampling_tpu.structure.slabs import fcc100, fcc110, fcc111


def test_bulk_fcc_counts():
    cu = bulk("Cu", "fcc", a=3.6147)
    assert len(cu) == 4
    assert cu.formula == "Cu4"
    assert np.isclose(cu.volume, 3.6147**3)


def test_parse_formula():
    assert parse_formula("SrTiO3") == {"Sr": 1, "Ti": 1, "O": 3}
    assert parse_formula("H2O") == {"H": 2, "O": 1}


def test_fcc_nearest_neighbor_distance():
    a = 3.6147
    cu = bulk("Cu", "fcc", a=a).repeat(2)
    d = cu.all_distances(mic=True)
    np.fill_diagonal(d, np.inf)
    assert np.isclose(d.min(), a / np.sqrt(2), atol=1e-8)


def test_fcc100_slab_geometry():
    a = 3.6147
    slab = fcc100("Cu", size=(2, 2, 2), a=a, vacuum=15.0)
    assert len(slab) == 8
    # two layers separated by a/2
    z = np.unique(np.round(slab.positions[:, 2], 6))
    assert len(z) == 2
    assert np.isclose(z[1] - z[0], a / 2)
    # vacuum padding
    assert np.isclose(slab.positions[:, 2].min(), 15.0)


def test_surface_from_bulk_100_matches_fcc100_density():
    a = 3.6147
    cu = bulk("Cu", "fcc", a=a)
    slab, surf_mask = surface_from_bulk(cu, (1, 0, 0), size=(2, 2), layers=2, vacuum=15.0)
    # 100 surface cell of fcc has 2 atoms per (1x1) layer-pair repeat
    assert len(slab) % 4 == 0
    assert surf_mask.sum() >= 4
    d = slab.all_distances(mic=True)
    np.fill_diagonal(d, np.inf)
    assert np.isclose(d.min(), a / np.sqrt(2), atol=1e-6)


def test_surface_from_bulk_111():
    a = 3.6147
    cu = bulk("Cu", "fcc", a=a)
    slab, _ = surface_from_bulk(cu, (1, 1, 1), size=(2, 2), layers=3, vacuum=10.0)
    d = slab.all_distances(mic=True)
    np.fill_diagonal(d, np.inf)
    assert np.isclose(d.min(), a / np.sqrt(2), atol=1e-6)
    # interlayer spacing for fcc(111) is a/sqrt(3)
    z = np.unique(np.round(slab.positions[:, 2], 4))
    assert np.isclose(np.diff(z).min(), a / np.sqrt(3), atol=1e-3)


def test_fcc111_builder():
    a = 3.6147
    slab = fcc111("Cu", size=(2, 2, 3), a=a, vacuum=10.0)
    d = slab.all_distances(mic=True)
    np.fill_diagonal(d, np.inf)
    assert np.isclose(d.min(), a / np.sqrt(2), atol=1e-8)


def test_adsorption_sites_fcc100():
    a = 3.6147
    slab = fcc100("Cu", size=(2, 2, 2), a=a, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5)
    # fcc100 2x2: 4 ontop sites
    assert len(sites["ontop"]) == 4
    assert len(sites["bridge"]) >= 4
    assert len(sites["hollow"]) >= 2
    # all sites sit planar_distance above the surface plane
    top_z = slab.positions[:, 2].max()
    assert np.allclose(sites["all"][:, 2], top_z + 1.5)
    # dedup: no two sites closer than near_reduce in fractional space
    allsites = sites["all"]
    frac = np.linalg.solve(slab.cell.T, allsites.T).T
    for i in range(len(frac)):
        for j in range(i + 1, len(frac)):
            d = frac[i] - frac[j]
            d[:2] -= np.round(d[:2])
            assert np.linalg.norm(d) >= 0.01


def test_symmetrize_slab():
    a = 4.08
    slab = fcc100("Au", size=(2, 2, 3), a=a, vacuum=15.0)
    sym = symmetrize_slab(slab, num_base_atoms=4)
    assert len(sym) == len(slab) + len(slab) - 4
    # center of mass z should be close to base layer z
    zbase = slab.sorted_by_z().positions[:4, 2].mean()
    refl = sym.positions[:, 2]
    assert np.isclose(refl.min(), 2 * zbase - slab.positions[:, 2].max(), atol=1e-6)


def test_cif_roundtrip(tmp_path):
    slab = fcc110("Au", size=(2, 2, 2), a=4.08, vacuum=12.0)
    p = tmp_path / "slab.cif"
    write_cif(p, slab)
    back = read_cif(p)
    assert back.formula == slab.formula
    assert np.allclose(back.cell, slab.cell, atol=1e-5)
    # positions equal up to wrapping
    df = back.scaled_positions - slab.scaled_positions
    df -= np.round(df)
    assert np.abs(df).max() < 1e-5


def test_xyz_roundtrip(tmp_path):
    st = bulk("Ga", "fcc", a=4.0)
    p = tmp_path / "s.xyz"
    write_xyz(p, st)
    back = read_xyz(p)
    assert back.formula == st.formula
    assert np.allclose(back.positions, st.positions)
    assert np.allclose(back.cell, st.cell)


def test_layers_tagging():
    slab = fcc100("Cu", size=(2, 2, 3), a=3.6, vacuum=10.0)
    tags = slab.get_layers()
    assert tags.max() == 3
    # topmost layer is tag 1
    top = slab.positions[:, 2].max()
    assert np.all(tags[np.isclose(slab.positions[:, 2], top)] == 1)


def test_structure_add_and_select():
    s1 = bulk("Cu", "fcc", 3.6)
    s2 = bulk("Au", "fcc", 3.6).translated([0, 0, 20])
    s = s1 + s2
    assert len(s) == 8
    sel = s.select(s.numbers == 79)
    assert sel.formula == "Au4"


def test_surface_symmetry_ops_fcc100():
    """fcc(100) slab has the p4m surface group: 8 point ops (x lattice
    translations detected as distinct fractional t's)."""
    from surface_sampling_tpu.structure.sites import find_surface_symmetry_ops

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=10.0)
    ops = find_surface_symmetry_ops(slab)
    # rotation parts present: at least identity, C4, C2, mirrors
    ws = {tuple(W.flatten()) for W, t in ops}
    assert (1, 0, 0, 1) in ws            # identity
    assert (0, -1, 1, 0) in ws           # 90-degree rotation
    assert (-1, 0, 0, -1) in ws          # 180
    assert (1, 0, 0, -1) in ws or (-1, 0, 0, 1) in ws  # mirror
    assert len(ops) >= 8


def test_symm_reduce_collapses_equivalent_sites():
    """On fcc(100) 2x2, the 4 ontop sites are all symmetry-equivalent ->
    one representative (the reference's Cu test uses symm_reduce=True)."""
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=10.0)
    full = find_adsorption_sites(slab, planar_distance=1.5)
    red = find_adsorption_sites(slab, planar_distance=1.5, symm_reduce=True)
    assert len(red["ontop"]) == 1
    assert len(red["bridge"]) < len(full["bridge"])
    assert len(red["hollow"]) < len(full["hollow"])
    # reduced sites are a subset of the full set
    for s in red["ontop"]:
        assert np.min(np.linalg.norm(full["ontop"] - s, axis=1)) < 1e-8
