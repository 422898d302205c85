"""End-to-end CLI tests (tiny workloads, CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

from surface_sampling_tpu.potentials.eam import builtin_eam, save_tables_npz
from surface_sampling_tpu.structure.io import load_structures_npz, write_cif
from surface_sampling_tpu.structure.slabs import fcc100


@pytest.fixture()
def cu_setup(tmp_path):
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=15.0)
    slab_path = tmp_path / "slab.cif"
    write_cif(slab_path, slab)
    eam_path = tmp_path / "Cu_u3.eam.npz"
    save_tables_npz(eam_path, builtin_eam("Cu_u3"))
    settings = {
        "system_settings": {
            "surface_name": "Cu_100_test",
            "planar_distance": 1.5,
            "near_reduce": 0.01,
        },
        "sampling_settings": {
            "total_sweeps": 3,
            "sweep_size": 2,
            "start_temp": 1.0,
            "alpha": 0.99,
            "adsorbates": ["Cu"],
            "n_chains": 2,
            "run_folder": str(tmp_path / "run"),
        },
        "calc_settings": {"calc_name": "eam", "potential_file": str(eam_path)},
    }
    settings_path = tmp_path / "settings.json"
    settings_path.write_text(json.dumps(settings))
    return tmp_path, slab_path, settings_path


def test_sample_surface_cli(cu_setup, capsys):
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(settings_path), "--slab", str(slab_path)])
    run = tmp_path / "run"
    assert (run / "stats.csv").exists()
    assert (run / "summary_stats.png").exists()
    assert (run / "checkpoint.npz").exists()
    assert (run / "history.npz").exists()
    assert list(run.glob("best_energy_*.cif"))
    out = capsys.readouterr().out
    assert "Best surface energy" in out


def test_cut_surfaces_cli(tmp_path):
    from surface_sampling_tpu.cli.cut_surfaces import main
    from surface_sampling_tpu.structure import bulk

    bulk_path = tmp_path / "bulk.cif"
    write_cif(bulk_path, bulk("Cu", "fcc", 3.6147))
    main(["--bulk", str(bulk_path), "--miller", "1", "0", "0",
          "--size", "2", "2", "--layers", "2", "--out", str(tmp_path / "slabs")])
    assert list((tmp_path / "slabs").glob("*.cif"))


def test_perturb_and_filter_cli(tmp_path):
    from surface_sampling_tpu.cli.filter_stoichiometries import main as filter_main
    from surface_sampling_tpu.cli.perturb_structures import main as perturb_main
    from surface_sampling_tpu.structure import bulk

    p = tmp_path / "bulk.cif"
    write_cif(p, bulk("Cu", "fcc", 3.6147))
    perturb_main(["--structures", str(p), "--amplitude", "0.05",
                  "--n-perturb", "3", "--out", str(tmp_path / "pert")])
    sts, _ = load_structures_npz(tmp_path / "pert" / "perturbed.npz")
    assert len(sts) == 3

    filter_main(["--structures", str(tmp_path / "pert" / "perturbed.npz"),
                 "--ranges", json.dumps({"Cu": [4, 4]}),
                 "--out", str(tmp_path / "filtered.npz")])
    kept, _ = load_structures_npz(tmp_path / "filtered.npz")
    assert len(kept) == 3
    filter_main(["--structures", str(tmp_path / "pert" / "perturbed.npz"),
                 "--ranges", json.dumps({"Cu": [0, 1]}),
                 "--out", str(tmp_path / "filtered2.npz")])
    kept2, _ = load_structures_npz(tmp_path / "filtered2.npz")
    assert len(kept2) == 0


def test_pourbaix_cli(tmp_path):
    """Pourbaix sampling over a toy Sr-Ir-O slab with an LJ backbone."""
    from surface_sampling_tpu.cli.sample_pourbaix_surface import main
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(
        ["Ir", "Ir", "Sr", "O"],
        [[0, 0, 5], [2, 0, 5], [0, 2, 5], [2, 2, 6.5]],
        np.diag([4.0, 4.0, 20.0]),
    )
    slab_path = tmp_path / "slab.cif"
    write_cif(slab_path, slab)
    settings = {
        "system_settings": {"surface_name": "SrIrO_test", "planar_distance": 1.5,
                            "cutoff": 4.0},
        "sampling_settings": {
            "total_sweeps": 2, "sweep_size": 2, "start_temp": 1.0,
            "perform_annealing": False, "adsorbates": ["O", "H", "HO"],
            "n_chains": 1, "run_folder": str(tmp_path / "run"),
        },
        "calc_settings": {
            "calc_name": "lj", "epsilon": 0.3, "sigma": 1.8, "cutoff": 4.0,
            "phase_diagram": "tests/data/pourbaix/pd_dict.json",
            "pourbaix_diagram": "tests/data/pourbaix/pbx_dict.json",
            "phi": 0.5, "pH": 7.0,
            "elements": ["Sr", "Ir", "O"],
            "adsorbate_corrections": {"OH": 0.23},
        },
    }
    settings_path = tmp_path / "settings.json"
    settings_path.write_text(json.dumps(settings))
    main(["--settings", str(settings_path), "--slab", str(slab_path)])
    run = tmp_path / "run"
    assert (run / "pourbaix_atoms.json").exists()
    assert (run / "stats.csv").exists()


def test_formation_entries_cli(tmp_path):
    from surface_sampling_tpu.cli.create_surface_formation_entries import main
    from surface_sampling_tpu.structure import Structure

    st = Structure.from_symbols(
        ["Ir", "O", "H"], [[0, 0, 0], [0, 0, 2], [0, 0, 3]], np.eye(3) * 10
    )
    p = tmp_path / "s.cif"
    write_cif(p, st)
    settings = {"calc_settings": {"calc_name": "lj", "epsilon": 0.1, "sigma": 1.5,
                                  "cutoff": 4.0}}
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings))
    out = tmp_path / "entries.json"
    main(["--structures", str(p), "--settings", str(sp),
          "--phase-diagram", "tests/data/pourbaix/pd_dict.json",
          "--oh-correction", "--out", str(out)])
    entries = json.loads(out.read_text())
    assert len(entries) == 1
    assert entries[0]["composition"] == {"Ir": 1, "O": 1, "H": 1}
    assert np.isfinite(entries[0]["formation_energy"])
    assert entries[0]["parameters"]["hubbards"]["Mn"] if "Mn" in entries[0]["composition"] else True
    # oxide correction shifts the energy by exactly -0.687 eV per O;
    # relaxation must not raise the energy
    out2 = tmp_path / "entries2.json"
    main(["--structures", str(p), "--settings", str(sp),
          "--phase-diagram", "tests/data/pourbaix/pd_dict.json",
          "--oh-correction", "--oxide-correction", "--out", str(out2)])
    e2 = json.loads(out2.read_text())
    assert np.isclose(e2[0]["energy"] - entries[0]["energy"], -0.687)
    out3 = tmp_path / "entries3.json"
    main(["--structures", str(p), "--settings", str(sp),
          "--phase-diagram", "tests/data/pourbaix/pd_dict.json",
          "--relax", "--relax-steps", "10", "--out", str(out3)])
    e3 = json.loads(out3.read_text())
    assert e3[0]["energy"] <= entries[0]["energy"] + 1e-6


def test_sample_surface_cli_tempering(cu_setup):
    tmp_path, slab_path, settings_path = cu_setup
    import json as _json

    s = _json.loads(settings_path.read_text())
    s["sampling_settings"]["tempering"] = True
    s["sampling_settings"]["n_chains"] = 8
    s["sampling_settings"]["t_min"] = 0.05
    s["sampling_settings"]["t_max"] = 1.0
    s["sampling_settings"]["run_folder"] = str(tmp_path / "run_pt")
    p2 = tmp_path / "settings_pt.json"
    p2.write_text(_json.dumps(s))
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(p2), "--slab", str(slab_path)])
    run = tmp_path / "run_pt"
    assert (run / "stats.csv").exists()
    text = (run / "stats.csv").read_text()
    assert text.startswith("round,swap_rate")
    assert (run / "checkpoint.npz").exists()


def test_sample_surface_cli_population_annealing(cu_setup):
    """sampling_settings.population_annealing drives the PA runner
    (parallel/population.py) from the config layer like tempering does,
    producing the free-energy estimate artifact (pa_free_energy.json)
    plus per-sweep ESS/resampling telemetry."""
    tmp_path, slab_path, settings_path = cu_setup
    import json as _json

    s = _json.loads(settings_path.read_text())
    s["sampling_settings"].update(
        population_annealing=True, n_chains=8, total_sweeps=5,
        resample_threshold=0.7,
        run_folder=str(tmp_path / "run_pa"))
    p2 = tmp_path / "settings_pa.json"
    p2.write_text(_json.dumps(s))
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(p2), "--slab", str(slab_path)])
    run = tmp_path / "run_pa"
    text = (run / "stats.csv").read_text()
    assert text.startswith("sweep,temp,energy_mean,energy_min,ess_frac,dlogz")
    fe = json.loads((run / "pa_free_energy.json").read_text())
    assert np.isfinite(fe["log_Z_ratio"])
    assert 0 < fe["ess_frac_min"] <= 1.0
    sq = json.loads((run / "sampling_quality.json").read_text())
    assert sq["log_Z_ratio"] == fe["log_Z_ratio"]
    assert (run / "checkpoint.npz").exists()
    assert list(run.glob("best_energy_*.cif"))
    h = np.load(run / "history.npz")
    assert h["energy"].shape == (5, 8)
    assert h["dlogz"].shape == (5,)


def test_population_annealing_checkpoint_interval_bitwise(cu_setup):
    """checkpoint_interval chunking is bitwise-neutral for PA runs: the
    chain states AND the resampling key are the exact carry across
    chunks, and each chunk reweights from the previous chunk's last
    temperature (the t_prev argument)."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    base = json.loads(settings_path.read_text())
    base["sampling_settings"].update(
        population_annealing=True, n_chains=4, total_sweeps=6,
        resample_threshold=1.0)   # resample every sweep: keys must line up

    def run(folder, interval=None):
        s = dict(base); s["sampling_settings"] = dict(base["sampling_settings"])
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if interval:
            s["sampling_settings"]["checkpoint_interval"] = interval
        sp = tmp_path / f"s_{folder}.json"
        sp.write_text(json.dumps(s))
        main(["--settings", str(sp), "--slab", str(slab_path)])
        return np.load(tmp_path / folder / "history.npz")

    plain = run("pa_plain")
    chunked = run("pa_chunk", interval=2)
    np.testing.assert_array_equal(chunked["energy"], plain["energy"])
    np.testing.assert_array_equal(chunked["dlogz"], plain["dlogz"])
    np.testing.assert_array_equal(chunked["ess"], plain["ess"])


def test_sample_bulk_cli(tmp_path):
    """Bulk-defect sampling: all lattice sites prefilled and exchangeable
    (scripts/sample_bulk.py analog)."""
    from surface_sampling_tpu.cli.sample_bulk import main
    from surface_sampling_tpu.potentials.eam import builtin_eam, save_tables_npz
    from surface_sampling_tpu.structure import bulk

    bulk_path = tmp_path / "bulk.cif"
    write_cif(bulk_path, bulk("Cu", "fcc", 3.6147))
    eam_path = tmp_path / "Cu_u3.eam.npz"
    save_tables_npz(eam_path, builtin_eam("Cu_u3"))
    settings = {
        "system_settings": {"cutoff": 4.95},
        "sampling_settings": {
            "total_sweeps": 2, "sweep_size": 2, "start_temp": 0.5,
            "adsorbates": ["Cu"], "n_chains": 2,
            "run_folder": str(tmp_path / "run_bulk"),
        },
        "calc_settings": {"calc_name": "eam", "potential_file": str(eam_path),
                          "fast": False},
    }
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings))
    main(["--settings", str(sp), "--bulk", str(bulk_path)])
    assert (tmp_path / "run_bulk" / "stats.csv").exists()


def test_sample_surface_cli_distance_decay(cu_setup):
    """Canonical run with distance-decay switch weights through the CLI."""
    tmp_path, slab_path, settings_path = cu_setup
    s = json.loads(settings_path.read_text())
    s["sampling_settings"].update(
        canonical=True, num_ads_atoms=3, require_distance_decay=True,
        distance_decay_factor=0.8, run_folder=str(tmp_path / "run_dd"),
    )
    p2 = tmp_path / "settings_dd.json"
    p2.write_text(json.dumps(s))
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(p2), "--slab", str(slab_path)])
    assert (tmp_path / "run_dd" / "stats.csv").exists()


def test_sample_surface_cli_sw_rigid(tmp_path):
    """calc_name 'sw' with default SW85 tables drives the CLI end-to-end;
    assemble_system must upgrade the non-relaxed run onto the rigid
    occupancy-algebra path (potentials/rigid_manybody.make_sw_rigid)."""
    from surface_sampling_tpu.cli.common import assemble_system, load_settings
    from surface_sampling_tpu.cli.sample_surface import main
    from surface_sampling_tpu.structure.slabs import bulk, surface_from_bulk

    slab, _ = surface_from_bulk(bulk("Si", "diamond", a=5.431), (1, 1, 1),
                                size=(2, 2), layers=2, vacuum=10.0)
    slab_path = tmp_path / "si.cif"
    write_cif(slab_path, slab)
    settings = {
        "system_settings": {"surface_name": "Si_sw", "planar_distance": 1.6},
        "sampling_settings": {"total_sweeps": 2, "sweep_size": 2,
                              "start_temp": 1.0, "adsorbates": ["Si"],
                              "n_chains": 2,
                              "run_folder": str(tmp_path / "run_sw")},
        "calc_settings": {"calc_name": "sw"},
    }
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings))

    asys = assemble_system(load_settings(sp), slab)
    assert asys.potential.name == "sw-rigid"

    main(["--settings", str(sp), "--slab", str(slab_path)])
    assert (tmp_path / "run_sw" / "stats.csv").exists()


def test_sampling_quality_artifact(cu_setup):
    """Runs with >=8 sweeps must write sampling_quality.json (tau_int +
    pooled ESS from analysis/statistics)."""
    tmp_path, slab_path, settings_path = cu_setup
    settings = json.loads(settings_path.read_text())
    settings["sampling_settings"]["total_sweeps"] = 10
    settings["sampling_settings"]["run_folder"] = str(tmp_path / "run_q")
    sp = tmp_path / "settings_q.json"
    sp.write_text(json.dumps(settings))
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(sp), "--slab", str(slab_path)])
    q = json.loads((tmp_path / "run_q" / "sampling_quality.json").read_text())
    assert q["tau_int_sweeps"] >= 0.0
    assert q["pooled_ess"] > 0.0
    assert q["sweeps"] == 10


def test_resume_bitwise(cu_setup):
    """--resume continues a killed run EXACTLY: a 3-sweep run resumed to 6
    sweeps reproduces the tail of an uninterrupted 6-sweep run bitwise
    (chain states carry the PRNG keys, so the continuation consumes the
    identical key stream; reference analog: starting_iteration,
    mcmc/mcmc.py:313)."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    base = json.loads(settings_path.read_text())

    # uninterrupted 6-sweep run
    full = dict(base); full["sampling_settings"] = dict(base["sampling_settings"])
    full["sampling_settings"]["total_sweeps"] = 6
    full["sampling_settings"]["run_folder"] = str(tmp_path / "run_full")
    sp_full = tmp_path / "settings_full.json"
    sp_full.write_text(json.dumps(full))
    main(["--settings", str(sp_full), "--slab", str(slab_path)])
    e_full = np.load(tmp_path / "run_full" / "history.npz")["energy"]

    # "killed" after 3 sweeps
    part = dict(base); part["sampling_settings"] = dict(base["sampling_settings"])
    part["sampling_settings"]["total_sweeps"] = 3
    part["sampling_settings"]["run_folder"] = str(tmp_path / "run_part")
    sp_part = tmp_path / "settings_part.json"
    sp_part.write_text(json.dumps(part))
    main(["--settings", str(sp_part), "--slab", str(slab_path)])
    e_part = np.load(tmp_path / "run_part" / "history.npz")["energy"]
    np.testing.assert_array_equal(e_part, e_full[:, :3])

    # resume in place to the full 6-sweep target
    res = dict(base); res["sampling_settings"] = dict(base["sampling_settings"])
    res["sampling_settings"]["total_sweeps"] = 6
    res["sampling_settings"]["run_folder"] = str(tmp_path / "run_part")
    sp_res = tmp_path / "settings_res.json"
    sp_res.write_text(json.dumps(res))
    main(["--settings", str(sp_res), "--slab", str(slab_path),
          "--resume", str(tmp_path / "run_part")])

    hist = np.load(tmp_path / "run_part" / "history.npz")
    assert int(hist["start_sweep"]) == 3
    np.testing.assert_array_equal(hist["energy"], e_full[:, 3:])

    # stats.csv appended: 1 header + 6 rows, sweep numbers 1..6
    rows = (tmp_path / "run_part" / "stats.csv").read_text().strip().splitlines()
    assert len(rows) == 7
    assert [r.split(",")[0] for r in rows[1:]] == [str(i) for i in range(1, 7)]

    # resumed checkpoint records completion; resuming again refuses
    from surface_sampling_tpu.io import load_checkpoint

    _, idx, temps, _ = load_checkpoint(tmp_path / "run_part" / "checkpoint.npz")
    assert idx == 6 and len(temps) == 6
    with pytest.raises(ValueError, match="already completed"):
        main(["--settings", str(sp_res), "--slab", str(slab_path),
              "--resume", str(tmp_path / "run_part")])


def test_even_prefill_states_per_chain_randomized():
    """even_adsorption_sites prefill must decorrelate chains: same even
    site placement, per-chain random species codes (the multi-chain analog
    of the reference's per-run code randomization, mcmc/mcmc.py:163-179)."""
    from surface_sampling_tpu.cli.common import even_prefill_states
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.structure import find_adsorption_sites

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5, near_reduce=0.01)["all"]
    spec = make_spec(slab, sites, ["O", "OH"], potential_numbers=[29], cutoff=5.0)
    ss = even_prefill_states(spec, num_ads_atoms=4, n_chains=16, seed=0)
    assert ss.shape == (16, spec.n_sites)
    assert (np.sum(ss > 0, axis=1) == 4).all()
    # all chains share the even placement...
    occ_sets = {tuple(np.flatnonzero(row > 0)) for row in ss}
    # ...but their species codes differ (2-code vocab, 4 slots, 16 chains:
    # identical codes everywhere has probability 2^-60)
    assert len({tuple(row.tolist()) for row in ss}) > 1
    # determinism: same seed reproduces the batch exactly
    np.testing.assert_array_equal(ss, even_prefill_states(spec, 4, 16, 0))
    assert occ_sets  # placement well-defined


def test_formation_entries_cli_full_pipeline(tmp_path):
    """--mp2020 --aqueous --oh-correction: the full reference correction
    stack (MP2020 -> aqueous H re-reference -> surface OH), itemized per
    entry and summing exactly."""
    from surface_sampling_tpu.cli.create_surface_formation_entries import main
    from surface_sampling_tpu.structure import Structure

    st = Structure.from_symbols(
        ["Mn", "O", "H"], [[0, 0, 0], [0, 0, 2], [0, 0, 3]], np.eye(3) * 10
    )
    p = tmp_path / "s.cif"
    write_cif(p, st)
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps({"calc_settings": {"calc_name": "lj", "epsilon": 0.1,
                                                "sigma": 1.5, "cutoff": 4.0}}))
    out0 = tmp_path / "plain.json"
    main(["--structures", str(p), "--settings", str(sp),
          "--phase-diagram", "tests/data/pourbaix/pd_dict.json", "--out", str(out0)])
    out1 = tmp_path / "full.json"
    main(["--structures", str(p), "--settings", str(sp),
          "--phase-diagram", "tests/data/pourbaix/pd_dict.json",
          "--mp2020", "--aqueous", "--oh-correction", "--out", str(out1)])
    plain = json.loads(out0.read_text())[0]
    full = json.loads(out1.read_text())[0]
    labels = {c["label"] for c in full["corrections"]}
    assert "MP2020 anion (oxide)" in labels
    assert "MP2020 GGA+U (Mn)" in labels       # hubbards default to MP U for Mn
    assert "aqueous H re-reference" in labels
    assert "surface OH (ZPE-TS + H-bond)" in labels
    total = sum(c["value"] for c in full["corrections"])
    assert np.isclose(full["energy"] - plain["energy"], total)
    # MP2020 pieces are the published constants
    vals = {c["label"]: c["value"] for c in full["corrections"]}
    assert np.isclose(vals["MP2020 anion (oxide)"], -0.687)
    assert np.isclose(vals["MP2020 GGA+U (Mn)"], -1.668)
    assert np.isclose(vals["surface OH (ZPE-TS + H-bond)"], 0.23 - 0.30)


def test_resume_tempering_bitwise(cu_setup):
    """Tempering --resume continues the replica-exchange run EXACTLY: the
    checkpointed swap key + round counter reproduce the uninterrupted
    run's swap sequence bitwise."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    base = json.loads(settings_path.read_text())
    base["sampling_settings"]["tempering"] = True
    base["sampling_settings"]["n_chains"] = 4
    base["sampling_settings"]["t_min"] = 0.3
    base["sampling_settings"]["t_max"] = 1.5

    def run(total, folder, resume=None):
        s = dict(base); s["sampling_settings"] = dict(base["sampling_settings"])
        s["sampling_settings"]["total_sweeps"] = total
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        sp = tmp_path / f"settings_{folder}_{total}.json"
        sp.write_text(json.dumps(s))
        argv = ["--settings", str(sp), "--slab", str(slab_path)]
        if resume:
            argv += ["--resume", str(tmp_path / resume)]
        main(argv)
        return np.load(tmp_path / folder / "history.npz")

    full = run(6, "t_full")
    part = run(3, "t_part")
    np.testing.assert_array_equal(part["energy"], full["energy"][:3])
    res = run(6, "t_part", resume="t_part")
    assert int(res["start_round"]) == 3
    np.testing.assert_array_equal(res["energy"], full["energy"][3:])
    np.testing.assert_array_equal(res["swap_rate"], full["swap_rate"][3:])
    rows = (tmp_path / "t_part" / "stats.csv").read_text().strip().splitlines()
    assert len(rows) == 7 and rows[1].startswith("1,") and rows[-1].startswith("6,")


def test_checkpoint_interval_chunked_bitwise(cu_setup):
    """sampling_settings.checkpoint_interval chunks the sweep scan for
    mid-run durability; chunking must be bitwise-neutral (the chain
    states crossing chunk boundaries ARE the scan carry), and a resumed
    chunked run continues exactly."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    base = json.loads(settings_path.read_text())

    def run(total, folder, interval=None, resume=None):
        s = dict(base); s["sampling_settings"] = dict(base["sampling_settings"])
        s["sampling_settings"]["total_sweeps"] = total
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if interval:
            s["sampling_settings"]["checkpoint_interval"] = interval
        sp = tmp_path / f"s_{folder}_{total}.json"
        sp.write_text(json.dumps(s))
        argv = ["--settings", str(sp), "--slab", str(slab_path)]
        if resume:
            argv += ["--resume", str(tmp_path / resume)]
        main(argv)
        return np.load(tmp_path / folder / "history.npz")

    plain = run(6, "c_plain")
    chunked = run(6, "c_chunk", interval=2)
    np.testing.assert_array_equal(chunked["energy"], plain["energy"])
    np.testing.assert_array_equal(chunked["site_state"], plain["site_state"])

    # odd split (2+2+1) compiles two shapes and still matches
    odd = run(5, "c_odd", interval=2)
    np.testing.assert_array_equal(odd["energy"], plain["energy"][:, :5])

    # resume a chunked run to the full target: continues bitwise
    res = run(6, "c_odd", interval=2, resume="c_odd")
    np.testing.assert_array_equal(res["energy"], plain["energy"][:, 5:])


def test_tempering_checkpoint_interval_bitwise(cu_setup):
    """checkpoint_interval chunking is bitwise-neutral for tempering runs
    too (states AND the swap key are the exact carry across chunks)."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    base = json.loads(settings_path.read_text())
    base["sampling_settings"].update(
        tempering=True, n_chains=4, t_min=0.3, t_max=1.5, total_sweeps=6)

    def run(folder, interval=None):
        s = dict(base); s["sampling_settings"] = dict(base["sampling_settings"])
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if interval:
            s["sampling_settings"]["checkpoint_interval"] = interval
        sp = tmp_path / f"s_{folder}.json"
        sp.write_text(json.dumps(s))
        main(["--settings", str(sp), "--slab", str(slab_path)])
        return np.load(tmp_path / folder / "history.npz")

    plain = run("tc_plain")
    chunked = run("tc_chunk", interval=2)
    np.testing.assert_array_equal(chunked["energy"], plain["energy"])
    np.testing.assert_array_equal(chunked["swap_rate"], plain["swap_rate"])


def test_save_structures_per_sweep(cu_setup):
    """sampling_settings.save_structures exports one structure per sweep
    (reference SurfaceSystem.save_structures, mcmc/system.py:488-534):
    'best' = per-sweep minimum across chains; frames are valid
    extended-XYZ with the lattice tag."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    s = json.loads(settings_path.read_text())
    s["sampling_settings"]["save_structures"] = "best"
    s["sampling_settings"]["run_folder"] = str(tmp_path / "run_sv")
    sp = tmp_path / "settings_sv.json"
    sp.write_text(json.dumps(s))
    main(["--settings", str(sp), "--slab", str(slab_path)])
    traj = (tmp_path / "run_sv" / "traj_best.xyz").read_text().splitlines()
    sweeps = s["sampling_settings"]["total_sweeps"]
    # count frames: each frame = natoms line + comment + natoms rows
    frames = 0
    i = 0
    while i < len(traj):
        n = int(traj[i]); assert "Lattice=" in traj[i + 1]
        i += 2 + n; frames += 1
    assert frames == sweeps

    # canonical run: constant composition -> native multi-frame writer
    s2 = json.loads(settings_path.read_text())
    s2["sampling_settings"].update(save_structures="chain0", canonical=True,
                                   num_ads_atoms=3, prep_max_steps=100,
                                   prep_force_fill=True,
                                   run_folder=str(tmp_path / "run_sv2"))
    sp2 = tmp_path / "settings_sv2.json"
    sp2.write_text(json.dumps(s2))
    main(["--settings", str(sp2), "--slab", str(slab_path)])
    traj2 = (tmp_path / "run_sv2" / "traj_chain0.xyz").read_text().splitlines()
    n0 = int(traj2[0])
    frames2 = sum(1 for ln in traj2 if ln.strip().isdigit() and int(ln) == n0)
    assert frames2 == s2["sampling_settings"]["total_sweeps"]


def test_pourbaix_cli_sample_surface_atoms(tmp_path):
    """sample_surface_atoms=true: existing surface atoms become
    exchangeable adsorbates with a prefilled site_state (reference
    scripts/sample_pourbaix_surface.py:214-238). The run must start with
    those atoms occupied and keep sampling finite energies."""
    from surface_sampling_tpu.cli.sample_pourbaix_surface import main
    from surface_sampling_tpu.structure import Structure

    slab = Structure.from_symbols(
        ["Ir", "Ir", "Sr", "Sr", "O", "O"],
        [[0, 0, 5], [2, 0, 5], [0, 2, 5], [2, 2, 5], [0, 0, 6.6], [2, 2, 6.6]],
        np.diag([4.0, 4.0, 20.0]),
    )
    slab_path = tmp_path / "slab.cif"
    write_cif(slab_path, slab)
    settings = {
        "system_settings": {"surface_name": "SrIrO_satoms", "planar_distance": 1.5,
                            "cutoff": 4.0, "surface_atom_tol": 1.0},
        "sampling_settings": {
            "total_sweeps": 3, "sweep_size": 3, "start_temp": 1.0,
            "perform_annealing": False, "adsorbates": ["O", "HO"],
            "n_chains": 2, "sample_surface_atoms": True,
            "run_folder": str(tmp_path / "run_sa"),
        },
        "calc_settings": {
            "calc_name": "lj", "epsilon": 0.3, "sigma": 1.8, "cutoff": 4.0,
            "phase_diagram": "tests/data/pourbaix/pd_dict.json",
            "pourbaix_diagram": "tests/data/pourbaix/pbx_dict.json",
            "phi": 0.5, "pH": 7.0, "elements": ["Sr", "Ir", "O"],
        },
    }
    sp = tmp_path / "settings_sa.json"
    sp.write_text(json.dumps(settings))
    main(["--settings", str(sp), "--slab", str(slab_path)])
    run = tmp_path / "run_sa"
    hist = np.load(run / "history.npz")
    assert np.isfinite(hist["energy"]).all()
    # the two O surface atoms (within 1.0 A of the top) became prefilled
    # sites: occupancy starts at 2 occupied sites per chain and the
    # O-atom sites are exchangeable (n_ads recorded per sweep)
    assert hist["n_ads"].shape == (2, 3)
    rows = (run / "stats.csv").read_text().strip().splitlines()
    assert len(rows) == 4


def test_clustering_cli(tmp_path):
    """End-to-end latent-space clustering driver (reference
    scripts/clustering.py): embeddings from the trained PaiNN model,
    Ward clustering, per-cluster representative selection + artifacts."""
    from pathlib import Path as _P

    from surface_sampling_tpu.cli.clustering import main
    from surface_sampling_tpu.structure import Structure
    from surface_sampling_tpu.structure.io import save_structures_npz

    data = np.load(_P("surface_sampling_tpu/systems_data/SrTiO3_001_2x2.npz"))
    base = Structure(data["numbers"], data["positions"], data["cell"])
    rng = np.random.default_rng(0)
    sts = []
    for k in range(6):
        st = Structure(base.numbers.copy(), base.positions.copy(), base.cell.copy())
        st.positions = st.positions + 0.05 * k * rng.standard_normal(st.positions.shape)
        sts.append(st)
    p = tmp_path / "structs.npz"
    save_structures_npz(p, sts)

    settings = {"calc_settings": {
        "calc_name": "nff",
        "model_paths": ["surface_sampling_tpu/models/data/srtio3_painn_01.npz"],
        "elements": ["Sr", "Ti", "O"],
        "model_units": "kcal/mol",
    }}
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings))
    out = tmp_path / "clust"
    main(["--structures", str(p), "--settings", str(sp),
          "--metric", "energy", "--criterion", "maxclust",
          "--cutoff", "3", "--out", str(out)])
    d = np.load(out / "clustering.npz")
    assert d["embeddings"].shape[0] == 6
    assert len(np.unique(d["labels"])) <= 3
    assert len(d["selected"]) == len(np.unique(d["labels"]))
    assert list(out.glob("selected*.npz")) or list(out.glob("*.cif")) or \
           (out / "clustering.npz").exists()


def test_cli_error_handling(cu_setup, tmp_path):
    """Misconfiguration surfaces as clear errors, not tracebacks deep in
    JAX: invalid JSON, non-object settings, missing resume checkpoint,
    chain-count mismatch on resume."""
    tmp_path2, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(SystemExit, match="not valid JSON"):
        main(["--settings", str(bad), "--slab", str(slab_path)])

    arr = tmp_path / "arr.json"
    arr.write_text("[1, 2]")
    with pytest.raises(SystemExit, match="JSON object"):
        main(["--settings", str(arr), "--slab", str(slab_path)])

    with pytest.raises(FileNotFoundError):
        main(["--settings", str(settings_path), "--slab", str(slab_path),
              "--resume", str(tmp_path / "nope" / "checkpoint.npz")])

    # run 2 chains, then resume demanding 4: clear mismatch error
    s = json.loads(settings_path.read_text())
    s["sampling_settings"]["run_folder"] = str(tmp_path / "run_mm")
    sp = tmp_path / "s_mm.json"
    sp.write_text(json.dumps(s))
    main(["--settings", str(sp), "--slab", str(slab_path)])
    s["sampling_settings"]["n_chains"] = 4
    s["sampling_settings"]["total_sweeps"] = 6
    sp.write_text(json.dumps(s))
    with pytest.raises(ValueError, match="chains"):
        main(["--settings", str(sp), "--slab", str(slab_path),
              "--resume", str(tmp_path / "run_mm")])


def test_platform_flag(cu_setup):
    """--platform cpu pins the backend for a CLI run (the supported way
    to smoke-run on a TPU host; env JAX_PLATFORMS is ignored by
    axon-style plugins). Under the test conftest the platform is already
    cpu, so this verifies the flag routes through force_platform and the
    run still completes."""
    import jax

    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(settings_path), "--slab", str(slab_path),
          "--platform", "cpu"])
    assert jax.default_backend() == "cpu"
    assert (tmp_path / "run" / "stats.csv").exists()


def test_finetune_cli_end_to_end(tmp_path):
    """sst-finetune: labelled JSON -> trained PaiNN npz + history.csv; the
    checkpoint round-trips through the painn loader (the sampling CLIs'
    calc_settings.model_paths format)."""
    import jax.numpy as jnp

    from surface_sampling_tpu.cli.finetune import main
    from surface_sampling_tpu.potentials import make_lennard_jones
    from surface_sampling_tpu.structure.atoms import Structure

    pot = make_lennard_jones(epsilon=0.4, sigma=2.0, cutoff=6.0)
    rng = np.random.default_rng(5)
    shifts = jnp.zeros((1, 3))
    records = []
    for _ in range(10):
        n = 5
        pos = rng.uniform(0, 5.0, (n, 3))
        for _ in range(40):
            d = pos[:, None] - pos[None, :]
            r = np.linalg.norm(d, axis=-1) + np.eye(n) * 10
            if r.min() > 1.8:
                break
            i, j = np.unravel_index(np.argmin(r), r.shape)
            pos[i] += 0.3 * (pos[i] - pos[j]) / max(r[i, j], 0.5)
        e, f = pot.energy_and_forces(jnp.asarray(pos, jnp.float32),
                                     jnp.zeros(n, jnp.int32),
                                     jnp.ones(n, bool), shifts)
        records.append({"numbers": [18] * n, "positions": pos.tolist(),
                        "cell": (np.eye(3) * 100.0).tolist(),
                        "energy": float(e), "forces": np.asarray(f).tolist()})
    data = tmp_path / "labelled.json"
    data.write_text(json.dumps(records))
    cfgj = tmp_path / "cfg.json"
    cfgj.write_text(json.dumps({"feat_dim": 16, "n_rbf": 6, "cutoff": 6.0,
                                "n_layers": 2, "max_neighbors": 5}))

    out = tmp_path / "ft"
    main(["--data", str(data), "--family", "painn", "--config", str(cfgj),
          "--epochs", "25", "--lr", "3e-3", "--batch-size", "4",
          "--out", str(out), "--seed", "0"])
    assert (out / "model.npz").exists() and (out / "history.csv").exists()
    hist = [float(r.split(",")[1]) for r in
            (out / "history.csv").read_text().splitlines()[1:]]
    assert hist[-1] < hist[0]

    from surface_sampling_tpu.models.convert_nff import load_params_npz

    params, cfg = load_params_npz(out / "model.npz")
    assert cfg.feat_dim == 16

    # mesh path: data-parallel over the virtual 8-device mesh
    out2 = tmp_path / "ft_mesh"
    main(["--data", str(data), "--family", "painn", "--config", str(cfgj),
          "--epochs", "3", "--batch-size", "8", "--train-ratio", "0.8",
          "--val-ratio", "0.1", "--mesh", "8", "--out", str(out2)])
    assert (out2 / "model.npz").exists()

    # ensemble path
    out3 = tmp_path / "ft_ens"
    main(["--data", str(data), "--family", "painn", "--config", str(cfgj),
          "--epochs", "3", "--batch-size", "4", "--ensemble", "2",
          "--out", str(out3)])
    assert (out3 / "model_01.npz").exists() and (out3 / "model_02.npz").exists()


def test_predict_cli(cu_setup, tmp_path, capsys):
    """sst-predict: structures + calc_settings -> predictions.npz (and
    label metrics when --labels is given)."""
    base, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.predict import main
    from surface_sampling_tpu.structure.io import write_cif
    from surface_sampling_tpu.utils.misc import load_structures_any

    st = load_structures_any(slab_path)[0]
    files = []
    rng = np.random.default_rng(0)
    records = []
    for i in range(3):
        s2 = st.copy()
        s2.positions = s2.positions + rng.normal(0, 0.02, s2.positions.shape)
        f = tmp_path / f"s{i}.cif"
        write_cif(f, s2)
        files.append(str(f))
        records.append({"numbers": s2.numbers.tolist(),
                        "positions": s2.positions.tolist(),
                        "cell": np.asarray(s2.cell).tolist(),
                        "energy": 0.0})
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps(records))
    out = tmp_path / "pred.npz"
    main(["--structures", *files, "--settings", str(settings_path),
          "--out", str(out), "--labels", str(labels)])
    d = np.load(out)
    assert d["energies"].shape == (3,)
    assert d["forces"].shape[0] == 3 and np.isfinite(d["forces"]).all()
    m = json.loads((tmp_path / "metrics.json").read_text())
    assert m["n_frames"] == 3 and np.isfinite(m["energy_mae_eV"])


def test_predict_cli_nn_embeddings(tmp_path):
    """sst-predict with an NN ensemble: energy_std and pooled embeddings
    flow through the outputs hook."""
    from surface_sampling_tpu.cli.predict import main
    from surface_sampling_tpu.structure.atoms import Structure
    from surface_sampling_tpu.structure.io import write_cif
    import surface_sampling_tpu.systems as systems
    from pathlib import Path as _P

    base = _P(systems.__file__).parent
    d = np.load(base / "systems_data" / "SrTiO3_001_2x2.npz")
    st = Structure(d["numbers"], d["positions"], d["cell"])
    f = tmp_path / "slab.cif"
    write_cif(f, st)
    settings = tmp_path / "settings.json"
    settings.write_text(json.dumps({"calc_settings": {
        "calc_name": "nff",
        "model_paths": [str(base / "models" / "data" / f"srtio3_painn_{i:02d}.npz")
                        for i in (1, 2)],
        "elements": ["Sr", "Ti", "O"],
    }}))
    out = tmp_path / "pred.npz"
    main(["--structures", str(f), "--settings", str(settings),
          "--out", str(out), "--embeddings"])
    p = np.load(out)
    assert p["energies"].shape == (1,) and np.isfinite(p["energies"]).all()
    assert p["energy_std"][0] > 0.0          # 2-member ensemble spread
    assert p["embeddings"].shape[0] == 1 and np.isfinite(p["embeddings"]).all()


def test_chunk_retry_on_device_error(cu_setup, monkeypatch):
    """A transient device error inside a chunk is retried from the host
    snapshot of the scan carry (sampling_settings.chunk_retries, default 1)
    and the recovered run is bitwise identical to an undisturbed one
    (elastic recovery for the remote-TPU path, where long executions can
    die with transient UNAVAILABLE faults)."""
    import jax

    import surface_sampling_tpu.parallel as par
    from surface_sampling_tpu.cli.sample_surface import main

    tmp_path, slab_path, settings_path = cu_setup
    base = json.loads(settings_path.read_text())

    def run(folder, interval=None, fail_on_call=None, retries=None):
        s = dict(base); s["sampling_settings"] = dict(base["sampling_settings"])
        s["sampling_settings"]["total_sweeps"] = 6
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if interval:
            s["sampling_settings"]["checkpoint_interval"] = interval
        if retries is not None:
            s["sampling_settings"]["chunk_retries"] = retries
        sp = tmp_path / f"s_{folder}.json"
        sp.write_text(json.dumps(s))

        real_make = par.make_chain_run
        if fail_on_call is not None:
            calls = {"n": 0}

            def flaky_make(run_fn, **kwargs):
                crun = real_make(run_fn, **kwargs)

                def flaky(states, temps):
                    calls["n"] += 1
                    if calls["n"] == fail_on_call:
                        raise jax.errors.JaxRuntimeError(
                            "UNAVAILABLE: injected transient TPU device error")
                    return crun(states, temps)

                return flaky

            monkeypatch.setattr(par, "make_chain_run", flaky_make)
        try:
            main(["--settings", str(sp), "--slab", str(slab_path)])
        finally:
            monkeypatch.setattr(par, "make_chain_run", real_make)
        return np.load(tmp_path / folder / "history.npz")

    plain = run("r_plain", interval=2)
    # second chunk fails once; default chunk_retries=1 recovers bitwise
    recovered = run("r_flaky", interval=2, fail_on_call=2)
    np.testing.assert_array_equal(recovered["energy"], plain["energy"])
    np.testing.assert_array_equal(recovered["site_state"], plain["site_state"])

    # chunk_retries=0 fails fast
    with pytest.raises(jax.errors.JaxRuntimeError):
        run("r_fatal", interval=2, fail_on_call=2, retries=0)


def _incremental_setup(tmp_path):
    """Elongated Ti strip (bands at cutoff 4 A) + a toy trained-PaiNN npz:
    the smallest CLI-reachable system for sampling_settings.incremental."""
    import jax

    from surface_sampling_tpu.models.convert_nff import save_params_npz
    from surface_sampling_tpu.models.painn import PaiNNConfig, init_painn
    from surface_sampling_tpu.structure import Structure

    rng = np.random.default_rng(5)
    xs = np.arange(21) * 2.0 + 0.3
    pos = np.stack([xs, np.full(21, 2.0), np.full(21, 5.0)], axis=1)
    pos[:, 1] += rng.uniform(-0.3, 0.3, 21)
    slab = Structure.from_symbols(["Ti"] * 21, pos, np.diag([42.0, 4.2, 16.0]))
    slab_path = tmp_path / "slab.cif"
    write_cif(slab_path, slab)

    cfg = PaiNNConfig(feat_dim=16, n_rbf=6, cutoff=4.0, n_layers=2,
                      readout_hidden=8, max_neighbors=10, excl_vol=True,
                      sigma=1.2, power=8.0)
    params = init_painn(jax.random.PRNGKey(0), cfg)
    model_path = tmp_path / "toy_painn.npz"
    save_params_npz(model_path, params, cfg)

    settings = {
        "system_settings": {"surface_name": "toy_inc", "planar_distance": 1.9,
                            "cutoff": 4.0},
        "sampling_settings": {
            "total_sweeps": 4, "sweep_size": 3, "start_temp": 1.0,
            "alpha": 0.99, "adsorbates": ["O", "Sr"], "n_chains": 2,
            "incremental": True, "run_folder": str(tmp_path / "run_inc"),
        },
        "calc_settings": {
            "calc_name": "nff", "model_paths": [str(model_path)],
            "elements": ["Ti", "O", "Sr"], "model_units": "kcal/mol",
        },
    }
    return slab, slab_path, settings


def test_sample_surface_cli_incremental(tmp_path):
    """sampling_settings.incremental=true drives the delta-energy
    (cached-feature) MC engine through the standard CLI
    (core/incremental.py — the supercell fast path; the reference
    recomputes the whole slab per move, mcmc/mcmc.py:233). Artifacts match
    the standard run's schema and the final checkpoint energies equal a
    fresh FULL evaluation of the final occupancies — cache exactness
    through the whole CLI run, chunking included."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import assemble_system
    from surface_sampling_tpu.cli.sample_surface import main
    from surface_sampling_tpu.io import load_checkpoint

    slab, slab_path, settings = _incremental_setup(tmp_path)
    settings["sampling_settings"]["checkpoint_interval"] = 2  # 2 chunks
    sp = tmp_path / "settings_inc.json"
    sp.write_text(json.dumps(settings))
    main(["--settings", str(sp), "--slab", str(slab_path)])

    run = tmp_path / "run_inc"
    hist = np.load(run / "history.npz")
    assert hist["energy"].shape == (2, 4)
    assert np.isfinite(hist["energy"]).all()
    rows = (run / "stats.csv").read_text().strip().splitlines()
    assert len(rows) == 5
    assert list(run.glob("best_energy_*.cif"))

    # the assembled potential carries the inc hook the run used
    asys = assemble_system(json.loads(sp.read_text()), slab)
    assert "inc_args" in asys.potential.__dict__

    # exactness: checkpointed energies == full evaluation of the occupancy
    states, idx, _, _ = load_checkpoint(run / "checkpoint.npz")
    assert idx == 4
    se_full = jax.jit(jax.vmap(
        lambda ss: asys.run.state_energy_fn(ss).surface_energy
    ))(jnp.asarray(states.site_state))
    np.testing.assert_allclose(np.asarray(states.energy),
                               np.asarray(se_full), rtol=1e-5, atol=1e-4)
    # history's last sweep agrees with the checkpoint
    np.testing.assert_allclose(hist["energy"][:, -1],
                               np.asarray(states.energy), rtol=1e-6)


def test_sample_surface_cli_incremental_guards(tmp_path):
    """incremental=true refuses unsupported mode combinations with clear
    errors (PA — cache replication through the resampler is peak-memory
    prohibitive at the supercell sizes the engine targets; MTM;
    non-metropolis criteria; non-banding or non-PaiNN systems).
    Tempering is NOT refused — it composes (see
    test_sample_surface_cli_incremental_tempering)."""
    from surface_sampling_tpu.cli.sample_surface import main

    slab, slab_path, settings = _incremental_setup(tmp_path)

    def run_with(samp_extra, calc_extra=None, folder="run_g"):
        s = json.loads(json.dumps(settings))
        s["sampling_settings"].update(samp_extra)
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if calc_extra:
            s["calc_settings"].update(calc_extra)
        sp = tmp_path / f"s_{folder}.json"
        sp.write_text(json.dumps(s))
        main(["--settings", str(sp), "--slab", str(slab_path)])

    with pytest.raises(ValueError, match="population_annealing"):
        run_with({"population_annealing": True}, folder="g_pa")
    with pytest.raises(ValueError, match="mtm_trials"):
        run_with({"mtm_trials": 4}, folder="g_mtm")
    with pytest.raises(ValueError, match="metropolis"):
        run_with({"criterion": "distance", "filter_distance": 1.0},
                 folder="g_crit")
    # fast path off -> no inc hook -> clear refusal
    with pytest.raises(ValueError, match="inc_args"):
        run_with({}, calc_extra={"fast": False}, folder="g_nofast")
    # tempered path has its own guard set
    with pytest.raises(ValueError, match="mtm_trials"):
        run_with({"tempering": True, "mtm_trials": 4, "n_chains": 4},
                 folder="g_tmtm")
    with pytest.raises(ValueError, match="inc_args"):
        run_with({"tempering": True, "n_chains": 4},
                 calc_extra={"fast": False}, folder="g_tnofast")


def test_sample_surface_cli_incremental_relax(cu_setup):
    """incremental=true + relax_atoms=true routes to the warm-started
    ball-local relax engine (core/local_relax.py — the reference's
    per-move in-place optimize, mcmc/dynamics.py:83, restricted to the
    moved site's hop ball). Potential-agnostic (Cu EAM here). Checks:
    artifact schema, checkpointed energies match a re-evaluation of the
    carried relaxed geometry, chunked --resume is bitwise (positions ARE
    checkpoint state), and guards refuse MTM."""
    import jax
    import jax.numpy as jnp

    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.common import assemble_system
    from surface_sampling_tpu.cli.sample_surface import main
    from surface_sampling_tpu.io import load_checkpoint
    from surface_sampling_tpu.structure.io import read_cif

    base = json.loads(settings_path.read_text())
    base["calc_settings"].update(relax_atoms=True, relax_steps=4,
                                 fmax=0.05, relax_ball_hops=1)
    base["sampling_settings"].update(total_sweeps=4, checkpoint_interval=2)

    def run(total, folder, resume=None, extra=None):
        s = json.loads(json.dumps(base))
        s["sampling_settings"]["total_sweeps"] = total
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        s["sampling_settings"]["incremental"] = True
        if extra:
            s["sampling_settings"].update(extra)
        sp = tmp_path / f"s_{folder}_{total}.json"
        sp.write_text(json.dumps(s))
        argv = ["--settings", str(sp), "--slab", str(slab_path)]
        if resume:
            argv += ["--resume", str(tmp_path / resume)]
        main(argv)
        return np.load(tmp_path / folder / "history.npz")

    full = run(4, "lr_full")
    assert full["energy"].shape == (2, 4)
    assert np.isfinite(full["energy"]).all()

    # checkpointed energies are true energies of the carried geometry
    slab = read_cif(slab_path)
    asys = assemble_system(base, slab)
    assert "local_relax_args" in asys.potential.__dict__
    states, idx, _, _ = load_checkpoint(tmp_path / "lr_full" / "checkpoint.npz")
    assert idx == 4
    from surface_sampling_tpu.core.state import realize_alive, realize_type_idx

    d = asys.run.d
    for c in range(2):
        ss = jnp.asarray(states.site_state[c])
        e_re = asys.potential.energy(
            jnp.asarray(states.relaxed_positions[c]),
            realize_type_idx(d, ss), realize_alive(d, ss), d.shifts)
        np.testing.assert_allclose(float(states.energy[c]), float(e_re),
                                   rtol=1e-5, atol=1e-4)

    # bitwise chunked resume
    part = run(2, "lr_part")
    np.testing.assert_array_equal(part["energy"], full["energy"][:, :2])
    res = run(4, "lr_part", resume="lr_part")
    np.testing.assert_array_equal(res["energy"], full["energy"][:, 2:])
    np.testing.assert_array_equal(res["site_state"], full["site_state"][:, 2:])

    with pytest.raises(ValueError, match="mtm_trials"):
        run(4, "lr_mtm", extra={"mtm_trials": 4})


def test_sample_surface_cli_ff_relax(tmp_path):
    """calc_settings.relax_descent='frozen_far_field' routes the
    incremental+relax combination to the approximate-descent ball engine
    (core/ff_relax.py): the per-move FIRE descends a compact ball
    subproblem against frozen far-field features, acceptance energies
    stay full-cell (pinned by re-evaluating the carried geometry), and
    checkpoints keep the MCState schema so chunked --resume is bitwise.
    Guards: non-PaiNN calculators and tempering are refused."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import assemble_system
    from surface_sampling_tpu.cli.sample_surface import main
    from surface_sampling_tpu.io import load_checkpoint
    from surface_sampling_tpu.structure.io import read_cif

    slab, slab_path, settings = _incremental_setup(tmp_path)
    base = json.loads(json.dumps(settings))
    base["calc_settings"].update(relax_atoms=True, relax_steps=3,
                                 fmax=0.05, relax_ball_hops=1,
                                 relax_descent="frozen_far_field")
    base["sampling_settings"].update(total_sweeps=4, checkpoint_interval=2,
                                     sweep_size=2)

    def run(total, folder, resume=None, extra=None):
        s = json.loads(json.dumps(base))
        s["sampling_settings"]["total_sweeps"] = total
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        if extra:
            s["sampling_settings"].update(extra)
        sp = tmp_path / f"s_{folder}_{total}.json"
        sp.write_text(json.dumps(s))
        argv = ["--settings", str(sp), "--slab", str(slab_path)]
        if resume:
            argv += ["--resume", str(tmp_path / resume)]
        main(argv)
        return np.load(tmp_path / folder / "history.npz")

    full = run(4, "ff_full")
    assert full["energy"].shape == (2, 4)
    assert np.isfinite(full["energy"]).all()

    # acceptance energies are true full-cell energies of the carried
    # relaxed geometry
    slab_l = read_cif(slab_path)
    asys = assemble_system(base, slab_l)
    assert asys.potential.__dict__["local_relax_args"]["descent"] == \
        "frozen_far_field"
    states, idx, _, _ = load_checkpoint(tmp_path / "ff_full" / "checkpoint.npz")
    assert idx == 4
    from surface_sampling_tpu.core.state import realize_alive, realize_type_idx

    d = asys.run.d
    for c in range(2):
        ss = jnp.asarray(states.site_state[c])
        e_re = asys.potential.energy(
            jnp.asarray(states.relaxed_positions[c]),
            realize_type_idx(d, ss), realize_alive(d, ss), d.shifts)
        np.testing.assert_allclose(float(states.energy[c]), float(e_re),
                                   rtol=1e-5, atol=1e-4)

    # bitwise chunked resume (caches rebuilt at chunk boundaries)
    part = run(2, "ff_part")
    np.testing.assert_array_equal(part["energy"], full["energy"][:, :2])
    res = run(4, "ff_part", resume="ff_part")
    np.testing.assert_array_equal(res["energy"], full["energy"][:, 2:])
    np.testing.assert_array_equal(res["site_state"], full["site_state"][:, 2:])

    with pytest.raises(ValueError, match="tempering"):
        run(4, "ff_temp", extra={"tempering": True, "n_chains": 2})


def test_sample_surface_cli_ff_relax_needs_painn(cu_setup):
    """relax_descent='frozen_far_field' on a non-PaiNN calculator is a
    clear refusal (the engine needs the ff_pack hook)."""
    tmp_path, slab_path, settings_path = cu_setup
    from surface_sampling_tpu.cli.sample_surface import main

    s = json.loads(settings_path.read_text())
    s["calc_settings"].update(relax_atoms=True, relax_steps=2, fmax=0.05,
                              relax_descent="frozen_far_field")
    s["sampling_settings"].update(total_sweeps=2, incremental=True)
    sp = tmp_path / "s_ffpainn.json"
    sp.write_text(json.dumps(s))
    with pytest.raises(ValueError, match="ff_pack"):
        main(["--settings", str(sp), "--slab", str(slab_path)])


def test_sample_surface_cli_incremental_tempering(tmp_path):
    """incremental=true composes with tempering=true: nothing in the
    delta-energy math depends on temperature, so the replica-exchange
    runner sweeps IncState replicas and the swap phase gathers the
    feature caches along with the configuration they describe
    (parallel/tempering.py::_swap_phase is pytree-generic; reference has
    neither engine — mcmc/mcmc.py:233 anneals one chain with full
    evaluations). Checks: (1) artifact schema matches a tempered run;
    (2) cache exactness — checkpointed replica energies equal a fresh
    FULL evaluation of the final occupancies; (3) --resume from a chunk
    boundary is bitwise identical to an uninterrupted chunked run (the
    caches are rebuilt from the occupancy at every chunk boundary, so
    both paths rebuild from the same occupancy at the same round)."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import assemble_system
    from surface_sampling_tpu.cli.sample_surface import main
    from surface_sampling_tpu.io import load_checkpoint

    slab, slab_path, settings = _incremental_setup(tmp_path)
    base = json.loads(json.dumps(settings))
    base["sampling_settings"].update(
        tempering=True, n_chains=4, t_min=0.3, t_max=1.5,
        checkpoint_interval=2)

    def run(total, folder, resume=None):
        s = json.loads(json.dumps(base))
        s["sampling_settings"]["total_sweeps"] = total
        s["sampling_settings"]["run_folder"] = str(tmp_path / folder)
        sp = tmp_path / f"s_{folder}_{total}.json"
        sp.write_text(json.dumps(s))
        argv = ["--settings", str(sp), "--slab", str(slab_path)]
        if resume:
            argv += ["--resume", str(tmp_path / resume)]
        main(argv)
        return np.load(tmp_path / folder / "history.npz")

    full = run(4, "it_full")
    assert full["energy"].shape == (4, 4)
    assert np.isfinite(full["energy"]).all()
    assert full["swap_rate"].shape == (4,)

    # exactness: checkpointed replica energies == full eval of occupancy
    asys = assemble_system(base, slab)
    states, idx, _, _ = load_checkpoint(tmp_path / "it_full" / "checkpoint.npz")
    assert idx == 4
    se_full = jax.jit(jax.vmap(
        lambda ss: asys.run.state_energy_fn(ss).surface_energy
    ))(jnp.asarray(states.site_state))
    np.testing.assert_allclose(np.asarray(states.energy),
                               np.asarray(se_full), rtol=1e-5, atol=1e-4)

    # bitwise resume: 2 rounds + resume-to-4 == uninterrupted chunked run
    part = run(2, "it_part")
    np.testing.assert_array_equal(part["energy"], full["energy"][:2])
    res = run(4, "it_part", resume="it_part")
    assert int(res["start_round"]) == 2
    np.testing.assert_array_equal(res["energy"], full["energy"][2:])
    np.testing.assert_array_equal(res["swap_rate"], full["swap_rate"][2:])
    np.testing.assert_array_equal(res["site_state"], full["site_state"][2:])
