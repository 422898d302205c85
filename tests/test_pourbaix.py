"""Pourbaix subsystem tests.

The generate_pourbaix_atoms expectations are the reference's own golden
values (tests/pourbaix/test_pourbaix_atoms.py:32-144) evaluated against
the same serialized Sr-Ir-O diagrams.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.pourbaix import (
    PhaseDiagramLite,
    PourbaixAtom,
    PourbaixDiagramLite,
    SurfaceOHCompatibility,
    generate_pourbaix_atoms,
    load_pourbaix_atoms,
    make_pourbaix_surface_energy,
    save_pourbaix_atoms,
)

PD = "tests/data/pourbaix/pd_dict.json"
PBX = "tests/data/pourbaix/pbx_dict.json"


def test_generate_pourbaix_atoms_phi1():
    pa = generate_pourbaix_atoms(PD, PBX, phi=1.0, pH=0.0, elements=("Sr", "Ir", "O"))
    assert len(pa) == 4
    sr = pa["Sr"]
    assert sr.dominant_species == "Sr[+1]" or sr.dominant_species == "Sr[+2]"
    assert sr.dominant_species == "Sr[+2]"
    assert sr.species_conc == 1e-6
    assert sr.num_e == 2
    assert sr.num_H == 0
    assert sr.atom_std_state_energy == pytest.approx(-1.68949, rel=1e-5)
    assert sr.delta_G2_std == pytest.approx(-5.79807, rel=1e-5)
    ir = pa["Ir"]
    assert ir.dominant_species == "IrO2"
    assert ir.species_conc == 1
    assert ir.num_e == 4
    assert ir.num_H == 4
    assert ir.atom_std_state_energy == pytest.approx(-8.83843, rel=1e-5)
    assert ir.delta_G2_std == pytest.approx(1.76738, rel=1e-5)
    o = pa["O"]
    assert o.dominant_species == "H2O"
    assert o.num_e == -2 and o.num_H == -2
    assert o.atom_std_state_energy == pytest.approx(-5.26469, rel=1e-5)
    assert o.delta_G2_std == pytest.approx(-2.45830, rel=1e-4)
    h = pa["H"]
    assert h.dominant_species == "H[+1]"
    assert h.num_e == 1 and h.num_H == 1
    assert h.atom_std_state_energy == pytest.approx(-4.0356, rel=1e-4)
    assert h.delta_G2_std == 0.0


def test_generate_pourbaix_atoms_phi0():
    pa = generate_pourbaix_atoms(PD, PBX, phi=0.0, pH=0.0, elements=("Sr", "Ir", "O"))
    ir = pa["Ir"]
    assert ir.dominant_species == "Ir"
    assert ir.num_e == 0 and ir.num_H == 0
    assert ir.delta_G2_std == pytest.approx(0.0, abs=1e-8)
    assert pa["Sr"].dominant_species == "Sr[+2]"


def test_pourbaix_atom_dict_roundtrip(tmp_path):
    pa = generate_pourbaix_atoms(PD, PBX, 1.0, 0.0, ("Sr", "Ir", "O"))
    d = pa["Ir"].as_dict()
    back = PourbaixAtom.from_dict(d)
    assert back == pa["Ir"]
    save_pourbaix_atoms(tmp_path / "pa.json", pa)
    loaded = load_pourbaix_atoms(tmp_path / "pa.json")
    assert loaded["Sr"] == pa["Sr"]


def test_pourbaix_surface_energy_linearity():
    """Phi(pH, phi) must equal the hand-computed two-step expression."""
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(["Ir", "Ir", "O"], np.eye(3)[:3] * 2, np.eye(3) * 10)
    sites = np.array([[0, 0, 3.0]])
    spec = make_spec(slab, sites, ["O", "H"], potential_numbers=[77, 8, 1], cutoff=4.0)
    pa = generate_pourbaix_atoms(PD, PBX, 1.0, 2.0, ("Sr", "Ir", "O"))
    phi, pH, T = 1.0, 2.0, 0.0257
    se_fn = make_pourbaix_surface_energy(spec, pa, phi=phi, pH=pH, temp=T)
    # counts ordered by element_zs (H=1, O=8, Ir=77)
    assert spec.element_zs.tolist() == [1, 8, 77]
    counts = jnp.asarray([1.0, 2.0, 2.0])
    e_pot = -30.0
    got = float(se_fn(e_pot, counts))

    def g2(a):
        return (
            a.delta_G2_std - a.num_e * phi - np.log(10) * a.num_H * T * pH
            + T * np.log(a.species_conc)
        )

    want = e_pot - (
        1 * (pa["H"].atom_std_state_energy + g2(pa["H"]))
        + 2 * (pa["O"].atom_std_state_energy + g2(pa["O"]))
        + 2 * (pa["Ir"].atom_std_state_energy + g2(pa["Ir"]))
    )
    assert got == pytest.approx(want, rel=1e-5)


def test_pourbaix_adsorbate_corrections():
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(["Ir"], [[0, 0, 0]], np.eye(3) * 10)
    sites = np.array([[0, 0, 2.0], [0, 0, 4.0], [2, 0, 2.0]])
    spec = make_spec(slab, sites, ["HO", "H2O"], potential_numbers=[77, 8, 1], cutoff=4.0)
    pa = generate_pourbaix_atoms(PD, PBX, 0.0, 0.0, ("Sr", "Ir", "O"))
    base = make_pourbaix_surface_energy(spec, pa, 0.0, 0.0)
    corr = make_pourbaix_surface_energy(
        spec, pa, 0.0, 0.0, adsorbate_corrections={"OH": 0.23}
    )
    # composition Ir + 2x OH + 1x H2O -> nH=3, nO=3, HO_diff=0 -> 3 OH groups?
    # reference convention: HO_diff = max(nH-nO,0)=0, groups = min(nO,nH)=3
    assert spec.element_zs.tolist() == [1, 8, 77]
    counts = jnp.asarray([3.0, 3.0, 1.0])
    assert float(corr(-10.0, counts)) == pytest.approx(
        float(base(-10.0, counts)) + 3 * 0.23, rel=1e-6
    )
    # excess H: nH=4, nO=1 -> HO_diff=3, eff H=-2 -> clamp to 0 groups
    counts2 = jnp.asarray([4.0, 1.0, 1.0])
    assert float(corr(-10.0, counts2)) == pytest.approx(float(base(-10.0, counts2)), rel=1e-6)


def test_surface_oh_compatibility():
    c = SurfaceOHCompatibility()
    # 2 OH on a slab: nH=2, nO=2 -> 2 groups
    assert c.get_adjustment({"Ir": 4, "O": 2, "H": 2}) == pytest.approx(2 * (0.23 - 0.30))
    # water-only excess H: nH=4, nO=2 -> HO_diff=2, groups=0
    assert c.get_adjustment({"Ir": 4, "O": 2, "H": 4}) == 0.0
    assert c.get_adjustment({"Ir": 4}) == 0.0


def test_spec_sampling_surface_atoms_prefill():
    from surface_sampling_tpu.core.spec import make_spec_sampling_surface_atoms
    from surface_sampling_tpu.core.state import device_spec, realize_numbers
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(
        ["Ir", "Ir", "O", "O"],
        [[0, 0, 0], [2, 0, 0], [0, 0, 2], [2, 0, 2]],
        np.eye(3) * 8,
    )
    mask = np.array([False, False, True, True])  # the two O are surface atoms
    spec, ss0 = make_spec_sampling_surface_atoms(
        slab, mask, ["O", "H"], potential_numbers=[77, 8, 1], cutoff=4.0
    )
    assert spec.n_pristine == 2
    assert spec.n_sites == 2
    d = device_spec(spec)
    nums = np.asarray(realize_numbers(d, jnp.asarray(ss0)))
    # realized structure has the same multiset of atoms as the original
    assert sorted(nums[nums > 0].tolist()) == sorted(slab.numbers.tolist())


class TestMP2020Compatibility:
    """Golden values for the pymatgen-free MP2020 + aqueous scheme
    (pourbaix/compatibility.py), pinned against the published constants
    (Wang et al. 2021 / MP2020Compatibility.yaml; the reference applies
    the pymatgen objects, scripts/create_surface_formation_entries.py:
    17-22,305-323)."""

    def _total(self, comp, structure=None, hubbards=None):
        from surface_sampling_tpu.pourbaix.compatibility import MP2020Compatibility

        adj = MP2020Compatibility().get_adjustments(comp, structure, hubbards)
        return sum(v for _, v in adj)

    def test_fe2o3(self):
        # pymatgen-documented example: 2 Fe(+U) + 3 O(oxide)
        got = self._total({"Fe": 2, "O": 3}, hubbards={"Fe": 5.3, "O": 0.0})
        assert abs(got - (2 * -2.256 + 3 * -0.687)) < 1e-9

    def test_lamno3(self):
        got = self._total({"La": 1, "Mn": 1, "O": 3},
                          hubbards={"La": 0.0, "Mn": 3.9, "O": 0.0})
        assert abs(got - (-1.668 + 3 * -0.687)) < 1e-9

    def test_u_gated_on_hubbards(self):
        # computed WITHOUT the standard U: no mixing correction
        got = self._total({"Mn": 1, "O": 1}, hubbards={"Mn": 0.0, "O": 0.0})
        assert abs(got - (-0.687)) < 1e-9

    def test_halide(self):
        got = self._total({"Na": 1, "Cl": 1})
        assert abs(got - (-0.614)) < 1e-9
        # Cl not the anion when O is present
        got = self._total({"Na": 1, "Cl": 1, "O": 1})
        assert abs(got - (-0.687)) < 1e-9

    def test_metal_no_anion(self):
        assert self._total({"Cu": 4}) == 0.0

    def test_peroxide_superoxide_classification(self):
        import numpy as np

        from surface_sampling_tpu.pourbaix.compatibility import classify_oxide
        from surface_sampling_tpu.structure import Structure

        def o2(d):
            return Structure.from_symbols(
                ["Li", "O", "O"], [[5, 5, 1], [5, 5, 5], [5, 5, 5 + d]],
                np.eye(3) * 10)

        assert classify_oxide(o2(1.30)) == "superoxide"
        assert classify_oxide(o2(1.45)) == "peroxide"
        assert classify_oxide(o2(2.50)) == "oxide"
        assert classify_oxide(None, {"Fe": 2, "O": 3}) == "oxide"

    def test_aqueous_fit(self):
        from surface_sampling_tpu.pourbaix.compatibility import AqueousCompatibility

        aq = AqueousCompatibility()
        # fitted H2: 3*(-5.192751548333333 + 0.229) - (-4.94795546875)
        #            - (-2.4583) = -7.48499917625 eV
        assert abs(aq.fit_h2_energy - (-7.48499917625)) < 1e-9
        # per-H correction vs a -3.39 eV/atom GGA H reference: substitutes
        # the fitted H2 reference (h_ref - fit_h2/2)
        h_ref = -3.39
        assert abs(aq.h_correction(h_ref) - (h_ref - 0.5 * -7.48499917625)) < 1e-12
        e = aq.process_entry_energy(-10.0, {"Ir": 1, "O": 1, "H": 2}, h_ref=h_ref)
        assert abs(e - (-10.0 + 2 * aq.h_correction(h_ref))) < 1e-12
        # the raw h_ref must CANCEL in a downstream formation energy:
        # E' - n_H*h_ref == E - n_H*(fit_h2/2), independent of h_ref
        for href2 in (-3.39, 0.0, -1.0):
            e2 = aq.process_entry_energy(-10.0, {"H": 2}, h_ref=href2)
            assert abs((e2 - 2 * href2) - (-10.0 - 2 * 0.5 * aq.fit_h2_energy)) < 1e-9
        # no hydrogen -> untouched
        assert aq.process_entry_energy(-10.0, {"Ir": 1, "O": 1}, h_ref=-3.39) == -10.0
