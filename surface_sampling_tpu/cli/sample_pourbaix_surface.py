"""Electrochemical VSSR-MC driver (scripts/sample_pourbaix_surface.py analog).

Adds to sample_surface: per-element dominant-species generation from
serialized phase/Pourbaix diagrams at (pH, phi), the Pourbaix grand
potential as the acceptance energy, optional surface-atom sampling
(existing surface atoms become exchangeable), and OH/H2O group moves.

calc_settings keys used here: phase_diagram (pd_dict.json path),
pourbaix_diagram (pbx_dict.json path), pH, phi, temperature,
adsorbate_corrections, elements; sampling_settings.sample_surface_atoms.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--settings", required=True)
    ap.add_argument("--slab", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--resume", default=None, metavar="CKPT",
                    help="checkpoint.npz (or run folder) to resume from")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    from surface_sampling_tpu.cli.common import (
        build_potential,
        load_settings,
        load_slab,
        make_run_folder,
        run_sampling,
        AssembledSystem,
    )
    from surface_sampling_tpu.core import MCMCRun, RelaxConfig, make_spec
    from surface_sampling_tpu.core.spec import make_spec_sampling_surface_atoms
    from surface_sampling_tpu.pourbaix import (
        generate_pourbaix_atoms,
        make_pourbaix_surface_energy,
        save_pourbaix_atoms,
    )
    from surface_sampling_tpu.structure import find_adsorption_sites

    settings = load_settings(args.settings)
    slab = load_slab(args.slab)
    sys_s = settings["system_settings"]
    calc_s = settings["calc_settings"]
    samp = settings["sampling_settings"]
    surface_name = sys_s.get("surface_name", slab.formula)
    sys_s["surface_name"] = surface_name

    run_folder = make_run_folder(settings, surface_name, base_dir=args.base_dir)
    (run_folder / "settings.json").write_text(json.dumps(settings, indent=2, default=str))

    phi = float(calc_s.get("phi", 0.0))
    pH = float(calc_s.get("pH", 7.0))
    elements = calc_s.get("elements") or sorted(set(slab.symbols))
    pbx_atoms = generate_pourbaix_atoms(
        calc_s["phase_diagram"], calc_s["pourbaix_diagram"], phi, pH, elements
    )
    save_pourbaix_atoms(run_folder / "pourbaix_atoms.json", pbx_atoms)

    potential, numbers, pot_cutoff = build_potential(calc_s, sys_s)
    adsorbates = samp.get("adsorbates", ["HO", "H2O", "O", "H"])

    sites = find_adsorption_sites(
        slab,
        planar_distance=sys_s.get("planar_distance", 2.0),
        near_reduce=sys_s.get("near_reduce", 0.01),
        no_obtuse_hollow=sys_s.get("no_obtuse_hollow", True),
    )[sys_s.get("ads_site_type", "all")]

    site_state0 = None
    if samp.get("sample_surface_atoms", False):
        z = slab.positions[:, 2]
        surf_mask = (z.max() - z) < sys_s.get("surface_atom_tol", 1.2)
        spec, site_state0 = make_spec_sampling_surface_atoms(
            slab,
            surf_mask,
            adsorbates,
            potential_numbers=numbers,
            cutoff=sys_s.get("cutoff", pot_cutoff),
            extra_site_coords=sites,
            surface_depth=sys_s.get("surface_depth"),
            surface_name=surface_name,
        )
    else:
        spec = make_spec(
            slab,
            sites,
            adsorbates,
            potential_numbers=numbers,
            cutoff=sys_s.get("cutoff", pot_cutoff),
            surface_depth=sys_s.get("surface_depth"),
            surface_name=surface_name,
        )

    se_fn = make_pourbaix_surface_energy(
        spec,
        pbx_atoms,
        phi=phi,
        pH=pH,
        temp=float(calc_s.get("temperature", 0.0257)),
        adsorbate_corrections=calc_s.get("adsorbate_corrections"),
    )
    relax = None
    if calc_s.get("relax_atoms", False):
        relax = RelaxConfig(steps=calc_s.get("relax_steps", 20), fmax=calc_s.get("fmax", 0.01))
    run = MCMCRun(spec, potential, surface_energy_fn=se_fn, relax=relax)
    asys = AssembledSystem(spec, potential, run, settings)

    t0 = time.perf_counter()
    results = run_sampling(asys, run_folder, seed=args.seed, site_state0=site_state0,
                           resume=args.resume)
    print(f"Time taken = {time.perf_counter() - t0:.3f} seconds")
    print(f"Best Pourbaix potential: {results['best_energy']:.4f} eV")
    print(f"Run folder: {results['run_folder']}")


if __name__ == "__main__":
    main()
