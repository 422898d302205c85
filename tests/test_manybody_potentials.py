"""Tersoff and Stillinger-Weber golden tests + GaN/Si system smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import EngineConfig, RelaxConfig, geometric_schedule
from surface_sampling_tpu.ops.neighbors import neighbor_list, pair_shifts
from surface_sampling_tpu.potentials import (
    builtin_tersoff,
    make_sw,
    make_tersoff,
    sw_tables,
)
from surface_sampling_tpu.structure import bulk
from surface_sampling_tpu.systems import gan0001_tersoff, si111_sw


def test_sw_si_cohesive_energy():
    """Stillinger & Weber PRB 31, 5262 (1985): diamond Si at a=5.431 has
    E_coh = -4.3363 eV/atom (the value the potential was fit to)."""
    with jax.enable_x64(True):
        t = sw_tables()
        pot = make_sw(t, max_neighbors=20, dtype=jnp.float64)
        st = bulk("Si", "diamond", a=5.431).repeat(2)
        shifts = jnp.asarray(pair_shifts(st.cell, t.cutoff))
        e = float(
            pot.energy(
                jnp.asarray(st.positions),
                jnp.zeros(len(st), jnp.int32),
                jnp.ones(len(st), bool),
                shifts,
            )
        ) / len(st)
        assert abs(e - (-4.3363)) < 1e-3
        f = pot.forces(
            jnp.asarray(st.positions),
            jnp.zeros(len(st), jnp.int32),
            jnp.ones(len(st), bool),
            shifts,
        )
        assert float(jnp.abs(f).max()) < 1e-8


def test_sw_tables_from_kim_matches_lammps_convention():
    """sw_tables_from_kim inverts the ThreeBodyCluster-driver convention
    exactly: SW85 forward-mapped into KIM constants (A*eps*sig^q,
    B*sig^(p-q), lam*eps, gam*sig, a*sig) must reproduce SW85 energies
    bit-for-bit — eps is folded into A/lam, everything else re-derived."""
    from surface_sampling_tpu.potentials.sw import SW_SI_1985, sw_tables_from_kim

    v = SW_SI_1985["entries"][("Si", "Si", "Si")]
    kim = {
        "elements": ("Si",),
        "entries": {
            ("Si", "Si", "Si"): {
                "A": v["A"] * v["eps"] * v["sig"] ** v["q"],
                "B": v["B"] * v["sig"] ** (v["p"] - v["q"]),
                "p": v["p"],
                "q": v["q"],
                "sigma": v["sig"],
                "lambda": v["lam"] * v["eps"],
                "gamma": v["gam"] * v["sig"],
                "cutoff": v["a"] * v["sig"],
                "costheta0": v["cos0"],
            }
        },
    }
    with jax.enable_x64(True):
        t_ref = sw_tables()
        t_kim = sw_tables_from_kim(kim)
        assert abs(t_kim.cutoff - t_ref.cutoff) < 1e-12
        st = bulk("Si", "diamond", a=5.431).repeat(2)
        rng = np.random.default_rng(7)
        pos = st.positions + rng.normal(0.0, 0.05, st.positions.shape)
        args = (
            jnp.asarray(pos),  # off-lattice so phi3 != 0
            jnp.zeros(len(st), jnp.int32),
            jnp.ones(len(st), bool),
            jnp.asarray(pair_shifts(st.cell, t_ref.cutoff)),
        )
        e_ref = float(make_sw(t_ref, max_neighbors=20, dtype=jnp.float64).energy(*args))
        e_kim = float(make_sw(t_kim, max_neighbors=20, dtype=jnp.float64).energy(*args))
        assert abs(e_kim - e_ref) < 1e-9 * abs(e_ref)
    with pytest.raises(ValueError, match="missing fields"):
        bad = {"elements": ("Si",), "entries": {("Si", "Si", "Si"): {"A": 1.0}}}
        sw_tables_from_kim(bad)


def _sw85_kim_numbers():
    """SW85 forward-mapped into the un-reduced ThreeBodyCluster constants
    (same mapping as test_sw_tables_from_kim_matches_lammps_convention)."""
    from surface_sampling_tpu.potentials.sw import SW_SI_1985

    v = dict(SW_SI_1985["entries"][("Si", "Si", "Si")])
    return {
        "A": v["A"] * v["eps"] * v["sig"] ** v["q"],
        "B": v["B"] * v["sig"] ** (v["p"] - v["q"]),
        "p": v["p"], "q": v["q"], "sigma": v["sig"],
        "lambda": v["lam"] * v["eps"], "gamma": v["gam"] * v["sig"],
        "costheta0": v["cos0"], "cutoff": v["a"] * v["sig"],
    }


def _sw_energy(tables):
    st = bulk("Si", "diamond", a=5.431).repeat(2)
    rng = np.random.default_rng(7)
    pos = st.positions + rng.normal(0.0, 0.05, st.positions.shape)
    return float(make_sw(tables, max_neighbors=20, dtype=jnp.float64).energy(
        jnp.asarray(pos), jnp.zeros(len(st), jnp.int32),
        jnp.ones(len(st), bool), jnp.asarray(pair_shifts(st.cell, tables.cutoff)),
    ))


def test_parse_kim_threebody_file_layouts():
    """The KIM ThreeBodyCluster parameter-FILE parser handles the layouts
    a dropped .params file can come in: species prologue + bare numbers
    (driver field order), labeled triplets, a comment header declaring a
    scrambled column order, and the 8-number form without costheta0 —
    all reproducing SW85 energies through the documented mapping."""
    from surface_sampling_tpu.potentials.sw import parse_kim_threebody

    k = _sw85_kim_numbers()
    with jax.enable_x64(True):
        e_ref = _sw_energy(sw_tables())
        order9 = ["A", "B", "p", "q", "sigma", "lambda", "gamma",
                  "costheta0", "cutoff"]
        # 1) species prologue + bare numbers in driver order
        bare = "# SRS-like file\n1\nSi\n" + " ".join(
            f"{k[f]:.12g}" for f in order9) + "\n"
        np.testing.assert_allclose(
            _sw_energy(parse_kim_threebody(bare)), e_ref, rtol=1e-9)
        # 2) labeled triplet, no prologue
        labeled = "Si Si Si " + " ".join(f"{k[f]:.12g}" for f in order9)
        np.testing.assert_allclose(
            _sw_energy(parse_kim_threebody(labeled)), e_ref, rtol=1e-9)
        # 3) comment header declares a scrambled column order
        scram = ["cutoff", "sigma", "A", "B", "p", "q", "lambda", "gamma",
                 "costheta_0"]
        hdr = ("# columns: " + " ".join(scram) + "\n1\nSi\n"
               + " ".join(f"{k[f if f != 'costheta_0' else 'costheta0']:.12g}"
                          for f in scram))
        np.testing.assert_allclose(
            _sw_energy(parse_kim_threebody(hdr)), e_ref, rtol=1e-9)
        # 4) 8 numbers, costheta0 omitted -> tetrahedral default
        order8 = [f for f in order9 if f != "costheta0"]
        bare8 = "1\nSi\n" + " ".join(f"{k[f]:.12g}" for f in order8)
        np.testing.assert_allclose(
            _sw_energy(parse_kim_threebody(bare8)), e_ref, rtol=1e-9)
    # malformed: wrong number count
    with pytest.raises(ValueError, match="expected"):
        parse_kim_threebody("1\nSi\n1.0 2.0 3.0")
    # bare numbers with two species is ambiguous
    with pytest.raises(ValueError, match="single-species"):
        parse_kim_threebody("2\nSi C\n" + " ".join(["1.0"] * 9))


def test_load_sw_any_sniffs_both_conventions(tmp_path):
    from surface_sampling_tpu.potentials.sw import load_sw_any

    k = _sw85_kim_numbers()
    order9 = ["A", "B", "p", "q", "sigma", "lambda", "gamma", "costheta0",
              "cutoff"]
    pk = tmp_path / "srs.params"
    pk.write_text("1\nSi\n" + " ".join(f"{k[f]:.12g}" for f in order9))
    v = sw_tables().params
    psw = tmp_path / "si.sw"
    psw.write_text(
        "Si Si Si " + " ".join(
            f"{float(v[f][0, 0, 0]):.12g}"
            for f in ("eps", "sig", "a", "lam", "gam", "cos0",
                      "A", "B", "p", "q", "tol"))
    )
    with jax.enable_x64(True):
        e_ref = _sw_energy(sw_tables())
        np.testing.assert_allclose(_sw_energy(load_sw_any(pk)), e_ref, rtol=1e-9)
        np.testing.assert_allclose(_sw_energy(load_sw_any(psw)), e_ref, rtol=1e-9)


import os as _os
from pathlib import Path as _Path

_SRS_CANDIDATES = [
    _Path(__file__).parents[1]
    / "surface_sampling_tpu/potentials/data/srs_1996_si.params",
]
if _os.environ.get("SST_SRS_PARAMS"):
    _SRS_CANDIDATES.insert(0, _Path(_os.environ["SST_SRS_PARAMS"]))
_SRS_FILE = next((p for p in _SRS_CANDIDATES if p.exists()), None)


@pytest.mark.skipif(_SRS_FILE is None, reason=(
    "SRS-1996 KIM parameter file not present (not redistributable "
    "offline): drop ThreeBodyCluster_SRS_StephensonRadnySmith_1996_Si's "
    ".params file at surface_sampling_tpu/potentials/data/srs_1996_si."
    "params or point SST_SRS_PARAMS at it to activate the dual-potential "
    "tutorial golden"))
def test_si111_srs_dual_potential_golden():
    """With the (user-dropped) SRS parameter file, the Si(111) 5x5
    tutorial's dual-potential split runs exactly as the reference does:
    relax under SRS-1996, accept on SW85 energies of the relaxed
    geometry (lammps_opt_template.txt:18 vs lammps_energy_template.txt:18).
    The pristine SW85 acceptance anchor must be unchanged and an SRS
    relaxation must lower the SRS energy of a perturbed slab."""
    import jax.numpy as jnp

    sys_ = si111_sw(relax=RelaxConfig(steps=20, fmax=0.02),
                    relax_model=_SRS_FILE)
    assert sys_.run.relax_potential is not None
    # SW85 acceptance energy of the pristine tutorial slab is the anchor
    from surface_sampling_tpu.core.state import (
        realize_alive, realize_positions, realize_type_idx,
    )

    d = sys_.run.d
    ss0 = jnp.zeros(len(sys_.spec.site_coords), jnp.int32)
    pos = realize_positions(d, ss0)
    e_sw = float(sys_.potential.energy(
        pos, realize_type_idx(d, ss0), realize_alive(d, ss0), d.shifts))
    assert abs(e_sw - (-379.42511)) < 5e-3
    # SRS relaxation reduces SRS energy on a perturbed geometry
    rp = sys_.run.relax_potential
    rng = np.random.default_rng(0)
    pos_p = jnp.asarray(np.asarray(pos) + rng.normal(0, 0.03, pos.shape))
    alive = realize_alive(d, ss0)
    ti = realize_type_idx(d, ss0)
    e0 = float(rp.energy(pos_p, ti, alive, d.shifts))
    from surface_sampling_tpu.core.relax import FireConfig, fire_relax
    from surface_sampling_tpu.core.state import realize_free_mask

    free = realize_free_mask(d, ss0)
    out = fire_relax(
        lambda p: rp.energy(p, ti, alive, d.shifts),
        pos_p, free_mask=free, cfg=FireConfig(steps=30, fmax=0.02))
    e1 = float(rp.energy(out.positions, ti, alive, d.shifts))
    assert e1 < e0


def test_tersoff_gan_cohesive_energy():
    """Nord et al. J. Phys. Condens. Matter 15, 5649 (2003): wurtzite GaN
    cohesive energy -4.526 eV/atom near a=3.19."""
    with jax.enable_x64(True):
        t = builtin_tersoff("GaN_nord2003")
        pot = make_tersoff(t, max_neighbors=20, dtype=jnp.float64)
        gan = bulk(["Ga", "N"], "wurtzite", a=3.19, c=5.19).repeat(2)
        ti = jnp.asarray([t.elements.index(s) for s in gan.symbols], jnp.int32)
        shifts = jnp.asarray(pair_shifts(gan.cell, t.cutoff))
        e = float(
            pot.energy(jnp.asarray(gan.positions), ti, jnp.ones(len(gan), bool), shifts)
        ) / len(gan)
        assert abs(e - (-4.526)) < 5e-3


def test_tersoff_gan_tutorial_slab_matches_lammps():
    """The reference's GaN_0001 tutorial prints 'Energy -144.059 eV' for its
    3x3 pristine slab (LAMMPS Tersoff); our implementation on the exact
    slab geometry (vendored from the tutorial pkl) must match."""
    from pathlib import Path

    data = np.load(
        Path(__file__).parents[1]
        / "surface_sampling_tpu/systems_data/GaN_0001_3x3.npz"
    )
    with jax.enable_x64(True):
        from surface_sampling_tpu.ops.neighbors import pair_shifts_for

        t = builtin_tersoff("GaN_nord2003")
        pot = make_tersoff(t, max_neighbors=24, dtype=jnp.float64)
        sym_of = {31: "Ga", 7: "N"}
        ti = jnp.asarray(
            [t.elements.index(sym_of[int(z)]) for z in data["numbers"]], jnp.int32
        )
        frac = np.linalg.solve(data["cell"].T, data["positions"].T).T
        shifts = jnp.asarray(pair_shifts_for(data["cell"], frac, t.cutoff))
        e = float(
            pot.energy(jnp.asarray(data["positions"]), ti, jnp.ones(len(ti), bool), shifts)
        )
        assert abs(e - (-144.0586923519652)) < 1e-8   # pinned (tutorial: -144.059)
        assert abs(e - (-144.059)) < 1e-3


def test_neighbor_list_counts_fcc():
    """fcc with cutoff between 1st and 2nd shell -> exactly 12 neighbors."""
    a = 3.6
    st = bulk("Cu", "fcc", a=a).repeat(2)
    cutoff = a * 0.85  # between a/sqrt(2)=0.707a and a
    shifts = jnp.asarray(pair_shifts(st.cell, cutoff))
    _, r, _, mask, overflow = neighbor_list(
        jnp.asarray(st.positions), shifts, jnp.ones(len(st), bool), cutoff, 16
    )
    assert not bool(overflow)
    assert np.all(np.asarray(mask.sum(axis=1)) == 12)


def test_neighbor_list_overflow_flag():
    a = 3.6
    st = bulk("Cu", "fcc", a=a).repeat(2)
    cutoff = a * 1.1  # 1st+2nd shells = 18 neighbors > 8
    shifts = jnp.asarray(pair_shifts(st.cell, cutoff))
    *_, overflow = neighbor_list(
        jnp.asarray(st.positions), shifts, jnp.ones(len(st), bool), cutoff, 8
    )
    assert bool(overflow)


def test_table_rank_select_matches_full_search():
    """neighbor_list_from_table's rank-select compaction must reproduce
    the all-image search's edge SET (j + distance, order-free) for every
    center under a random alive mask, and raise the same overflow flag
    when a center exceeds max_neighbors."""
    from surface_sampling_tpu.core.state import realize_alive, realize_positions
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
    from surface_sampling_tpu.ops.neighbors import neighbor_list_from_table
    from surface_sampling_tpu.systems import cu100_eam

    sys_ = cu100_eam()
    spec, d = sys_.spec, sys_.run.d
    cutoff = sys_.potential.cutoff
    tbl = build_static_neighbor_table(spec, cutoff, relax_slack=0.05)
    ss = jax.random.randint(jax.random.PRNGKey(3), (spec.n_sites,), 0, 2)
    pos = realize_positions(d, ss)
    alive = realize_alive(d, ss)
    args = (pos, alive, jnp.asarray(tbl.slot_j), jnp.asarray(tbl.shift, pos.dtype),
            jnp.asarray(tbl.valid), cutoff)

    disp_f, r_f, j_f, m_f, of_f = neighbor_list(
        pos, jnp.asarray(pair_shifts(spec.cell, cutoff)), alive, cutoff, 64
    )
    disp_t, r_t, j_t, m_t, of_t = neighbor_list_from_table(*args, 64)
    assert not bool(of_f) and not bool(of_t)
    m_f, m_t = np.asarray(m_f), np.asarray(m_t)
    for n in range(pos.shape[0]):
        set_f = {(int(j), round(float(r), 5))
                 for j, r in zip(np.asarray(j_f)[n][m_f[n]], np.asarray(r_f)[n][m_f[n]])}
        set_t = {(int(j), round(float(r), 5))
                 for j, r in zip(np.asarray(j_t)[n][m_t[n]], np.asarray(r_t)[n][m_t[n]])}
        assert set_f == set_t, (n, set_f ^ set_t)
    # displacements consistent with distances where selected
    r_chk = np.linalg.norm(np.asarray(disp_t), axis=-1)
    assert np.allclose(r_chk[m_t], np.asarray(r_t)[m_t], atol=1e-5)
    # truncation: tiny max_neighbors must flag overflow on both paths
    *_, of_small = neighbor_list_from_table(*args, 4)
    assert bool(of_small)


def test_gan_system_canonical_smoke():
    """Canonical GaN sampling from an even prefill (the reference's
    prepare_canonical(even_adsorption_sites=True) path, mcmc.py:163-179).
    Adsorption on this Tersoff surface is ~+7 eV uphill, so Metropolis
    prep at T=0.5 would take ~exp(14)/ads steps — prefill is the mode the
    reference tutorial uses, and it keeps the smoke test O(seconds)."""
    from surface_sampling_tpu.core.engine import even_site_prefill

    sys = gan0001_tersoff(size=(2, 2), layers=3)
    temps = geometric_schedule(0.5, 3, 0.9)
    cfg = EngineConfig(sweep_size=4, canonical=True, num_ads_atoms=4, record_positions=False)
    ss0 = even_site_prefill(sys.spec, 4, rng=np.random.default_rng(0))
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, site_state=ss0, cfg=cfg)
    assert np.all(np.asarray(rec.n_ads) == 4)
    assert np.all(np.isfinite(np.asarray(rec.energy)))


def test_prepare_canonical_bounded_force_fill():
    """prepare_canonical with max_steps + force_fill always reaches the
    target occupancy, even when every adsorption is strongly uphill and
    Metropolis alone would (like the reference's unbounded loop,
    mcmc.py:183-185) effectively never terminate."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core.engine import prepare_canonical_fn

    sys = gan0001_tersoff(size=(2, 2), layers=3)
    cfg = EngineConfig(sweep_size=2, canonical=True, num_ads_atoms=5)
    prep = jax.jit(
        prepare_canonical_fn(
            sys.run.d, sys.run.state_energy_fn, 5, cfg, max_steps=8, force_fill=True
        )
    )
    state = sys.run.init_state(jax.random.PRNGKey(2))
    out = prep(state, jnp.asarray(0.2))
    ss = np.asarray(out.site_state)
    assert int((ss > 0).sum()) == 5
    assert ss.min() >= 0 and ss.max() < sys.run.d.n_codes


def test_si_system_relaxed_smoke():
    sys = si111_sw(size=(2, 2), relax=RelaxConfig(steps=5, fmax=0.05))
    temps = geometric_schedule(0.5, 2, 0.9)
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=3))
    assert np.all(np.isfinite(np.asarray(rec.energy)))


def test_si111_5x5_tutorial_geometry():
    """The default si111_sw() is the reference tutorial's exact system:
    100 atoms (5x5 x 2 bilayers, primitive hexagonal cell, verified
    atom-for-atom against Si_111_5x5_pristine_slab.pkl), bottom 75 frozen
    (lammps_config.json bulk_index: 75)."""
    sys_ = si111_sw()
    spec = sys_.spec
    assert spec.n_pristine == 100
    assert int(spec.frozen_pristine.sum()) == 75
    # frozen = the 75 LOWEST atoms (reference: group bulk id <= 75 on a
    # z-sorted slab)
    z = spec.pristine_positions[:, 2]
    assert z[spec.frozen_pristine].max() < z[~spec.frozen_pristine].min()
    np.testing.assert_allclose(spec.cell[0, 0], 19.2463943, atol=1e-6)
    np.testing.assert_allclose(spec.cell[1, 1], 16.6678664, atol=1e-6)
    # bilayer geometry: planes at 0, 0.786, 3.143, 3.929 (+offset)
    uz = np.unique(np.round(z - z.min(), 3))
    np.testing.assert_allclose(uz, [0.0, 0.786, 3.143, 3.929], atol=2e-3)


def test_si111_pristine_energy_physical():
    """Regression for two stacked bugs: (1) surface_from_bulk wrapped AFTER
    shearing the c-vector, overlapping diamond-(111) atoms at 0.78 A;
    (2) the reference's absolute |E| > 1000 eV OOB bound falsely clamped
    large slabs. The 100-atom tutorial slab must report its real SW85
    energy (~ -3.6 eV/atom: 4-bonded bulk at -4.336, under-coordinated
    termination layers higher), not the clamp value. The exact value is
    pinned as a golden (f32 path)."""
    sys_ = si111_sw()
    out = sys_.run.state_energy_fn(jnp.zeros(sys_.spec.n_sites, jnp.int32))
    n = sys_.spec.n_pristine
    epa = float(out.potential_energy) / n
    assert not bool(out.oob)
    assert -4.34 < epa < -3.0, epa
    # golden pin: SW85 energy of the reference's exact pristine 5x5 slab
    # (the tutorial's energy model; lammps_energy_template.txt:18)
    np.testing.assert_allclose(float(out.potential_energy), -379.42511, atol=5e-3)
    # geometry: diamond NN distance preserved in the slab
    from surface_sampling_tpu.structure import bulk, surface_from_bulk

    slab, _ = surface_from_bulk(bulk("Si", "diamond", a=5.431), (1, 1, 1),
                                size=(2, 2), layers=3, vacuum=10.0)
    d = slab.all_distances(mic=True)
    np.fill_diagonal(d, np.inf)
    assert abs(d.min() - 2.3517) < 1e-3


def test_si111_dual_potential_relax():
    """relax_model= relaxes under a DIFFERENT SW parameterization while
    acceptance energies stay on SW85 — the reference's SRS/SW85 split
    (lammps_opt_template.txt:18 vs lammps_energy_template.txt:18).

    Variational check: relaxing under perturbed tables then evaluating
    with SW85 can never beat relaxing under SW85 itself."""
    from surface_sampling_tpu.potentials.sw import SW_SI_1985, sw_tables

    # a 'modified SW': three-body term strengthened 30%
    mod = {"elements": ("Si",),
           "entries": {("Si", "Si", "Si"): dict(SW_SI_1985["entries"][("Si", "Si", "Si")])}}
    mod["entries"][("Si", "Si", "Si")]["lam"] *= 1.3
    rt = sw_tables(mod)

    relax = RelaxConfig(steps=15, fmax=0.02)
    sys_a = si111_sw(size=(2, 2), relax=relax)
    sys_b = si111_sw(size=(2, 2), relax=relax, relax_model=rt)
    # perturb the adsorbate-free slab indirectly: use one adsorbate so the
    # free layer has something to relax against
    ss = jnp.zeros(sys_a.spec.n_sites, jnp.int32).at[0].set(1)
    out_a = sys_a.run.state_energy_fn(ss)
    out_b = sys_b.run.state_energy_fn(ss)
    assert np.isfinite(float(out_a.potential_energy))
    assert np.isfinite(float(out_b.potential_energy))
    # both energies are SW85 energies; relaxing under the true model wins
    assert float(out_a.potential_energy) <= float(out_b.potential_energy) + 1e-4
    # and the relaxed geometries actually differ (the split is live)
    assert float(jnp.abs(out_a.positions - out_b.positions).max()) > 1e-5


def test_tersoff_rigid_matches_dynamic():
    """make_tersoff_rigid (occupancy algebra over f64-precomputed static
    factors) must reproduce the dynamic Tersoff path on random multi-type
    occupancies of the GaN system — including empty, full, and mixed
    Ga/N states."""
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.potentials import builtin_tersoff, make_tersoff
    from surface_sampling_tpu.potentials.rigid_manybody import make_tersoff_rigid

    sys = gan0001_tersoff(size=(2, 2), layers=3)
    spec, d = sys.spec, sys.run.d
    tables = builtin_tersoff("GaN_nord2003")
    dyn = make_tersoff(tables, max_neighbors=48)
    rig = make_tersoff_rigid(tables, spec)

    rng = np.random.default_rng(3)
    S = spec.n_sites
    states = [np.zeros(S, np.int32), np.full(S, 1, np.int32), np.full(S, 2, np.int32)]
    for _ in range(5):
        states.append(rng.integers(0, d.n_codes, S).astype(np.int32))

    e_dyn_fn = jax.jit(lambda ss: dyn.energy(
        realize_positions(d, ss), realize_type_idx(d, ss), realize_alive(d, ss), d.shifts))
    e_rig_fn = jax.jit(lambda ss: rig.energy(
        realize_positions(d, ss), realize_type_idx(d, ss), realize_alive(d, ss), d.shifts))
    for ss in states:
        ssj = jnp.asarray(ss)
        e_d, e_r = float(e_dyn_fn(ssj)), float(e_rig_fn(ssj))
        assert np.isclose(e_d, e_r, rtol=1e-5, atol=2e-3), (ss[:8], e_d, e_r)

    # per-atom energies agree too (canonical boltzmann weighting uses them)
    ss = jnp.asarray(states[-1])
    pa_d = np.asarray(jax.jit(lambda s: dyn.per_atom_energy(
        realize_positions(d, s), realize_type_idx(d, s), realize_alive(d, s), d.shifts))(ss))
    pa_r = np.asarray(jax.jit(lambda s: rig.per_atom_energy(
        realize_positions(d, s), realize_type_idx(d, s), realize_alive(d, s), d.shifts))(ss))
    np.testing.assert_allclose(pa_d, pa_r, rtol=1e-4, atol=2e-3)


def test_sw_rigid_matches_dynamic():
    """make_sw_rigid must reproduce the dynamic SW path on random Si(111)
    occupancies."""
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.potentials import make_sw, sw_tables
    from surface_sampling_tpu.potentials.rigid_manybody import make_sw_rigid
    from surface_sampling_tpu.systems import si111_sw

    sys = si111_sw()
    spec, d = sys.spec, sys.run.d
    tables = sw_tables()
    dyn = make_sw(tables, max_neighbors=32)
    rig = make_sw_rigid(tables, spec)

    rng = np.random.default_rng(4)
    S = spec.n_sites
    # moderate occupancies: the padded dynamic list must not overflow, so
    # both formulations see the identical pair/triple sets
    states = [np.zeros(S, np.int32)]
    for _ in range(4):
        ss = np.zeros(S, np.int32)
        pick = rng.choice(S, size=S // 4, replace=False)
        ss[pick] = 1
        states.append(ss)
    e_dyn_fn = jax.jit(lambda ss: dyn.energy(
        realize_positions(d, ss), realize_type_idx(d, ss), realize_alive(d, ss), d.shifts))
    e_rig_fn = jax.jit(lambda ss: rig.energy(
        realize_positions(d, ss), realize_type_idx(d, ss), realize_alive(d, ss), d.shifts))
    for ss in states:
        ssj = jnp.asarray(ss)
        e_d, e_r = float(e_dyn_fn(ssj)), float(e_rig_fn(ssj))
        assert np.isclose(e_d, e_r, rtol=1e-5, atol=2e-3), (ss[:8], e_d, e_r)

    # over-crowded state: the dynamic top_k list truncates (silently fewer
    # pairs) while the rigid tables enumerate everything — rigid must be
    # the larger (exact) repulsive energy
    full = jnp.asarray(np.ones(S, np.int32))
    assert float(e_rig_fn(full)) >= float(e_dyn_fn(full)) - 1e-3


def test_relax_fixed_topology_matches_refreshed_tersoff_sw():
    """refresh_edges="once" (one topology build per relaxation —
    reference dynamics.py:129) must land on the same relaxed energies as
    every-step re-ranking for the classical many-body potentials too."""
    import dataclasses

    from surface_sampling_tpu.systems import gan0001_tersoff, si111_sw

    once = RelaxConfig(steps=6, fmax=0.02, refresh_edges="once")
    every = dataclasses.replace(once, refresh_edges="every_step")
    for build, kw in ((gan0001_tersoff, dict(size=(2, 2), layers=3)),
                      (si111_sw, dict(size=(2, 2)))):
        s1 = build(relax=once, **kw)
        s2 = build(relax=every, **kw)
        assert "edge_topology" in s1.potential.__dict__
        ss = jnp.zeros(s1.spec.n_sites, jnp.int32).at[1].set(1)
        r1 = s1.run.state_energy_fn(ss)
        r2 = s2.run.state_energy_fn(ss)
        assert not bool(r1.oob) and not bool(r2.oob)
        np.testing.assert_allclose(float(r1.potential_energy),
                                   float(r2.potential_energy), atol=5e-3)
