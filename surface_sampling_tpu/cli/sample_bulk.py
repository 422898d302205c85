"""Bulk-defect VSSR-MC driver (scripts/sample_bulk.py analog).

Every atom of the input bulk structure becomes a prefilled virtual site
(the reference prefills ``occ`` with all lattice indices,
scripts/sample_bulk.py:180-216), so semigrand moves create vacancies and
antisites; canonical moves shuffle the existing species.
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
    ap.add_argument("--bulk", required=True, help="bulk structure (.cif/.xyz/.npz)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--base-dir", default=None)
    ap.add_argument("--resume", default=None, metavar="CKPT",
                    help="checkpoint.npz (or run folder) to resume from")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    from surface_sampling_tpu.cli.common import (
        AssembledSystem,
        build_potential,
        load_settings,
        load_slab,
        make_run_folder,
        run_sampling,
    )
    from surface_sampling_tpu.core import MCMCRun, RelaxConfig, make_offset_surface_energy
    from surface_sampling_tpu.core.spec import make_spec_sampling_surface_atoms

    settings = load_settings(args.settings)
    bulk_st = load_slab(args.bulk)
    sys_s = settings["system_settings"]
    calc_s = settings["calc_settings"]
    samp = settings["sampling_settings"]
    surface_name = sys_s.get("surface_name", bulk_st.formula + "_bulk")
    sys_s["surface_name"] = surface_name
    run_folder = make_run_folder(settings, surface_name, base_dir=args.base_dir)
    (run_folder / "settings.json").write_text(json.dumps(settings, indent=2, default=str))

    potential, numbers, pot_cutoff = build_potential(calc_s, sys_s)
    adsorbates = samp.get("adsorbates") or sorted(set(bulk_st.symbols))
    # every lattice site is a movable site
    spec, site_state0 = make_spec_sampling_surface_atoms(
        bulk_st,
        np.ones(len(bulk_st), dtype=bool),
        adsorbates,
        potential_numbers=numbers,
        cutoff=sys_s.get("cutoff", pot_cutoff),
        surface_name=surface_name,
    )
    se_fn = None
    if calc_s.get("offset", False):
        se_fn = make_offset_surface_energy(
            spec, calc_s.get("chem_pots", {}), calc_s["offset_data"],
            offset_units=calc_s.get("offset_units", "atomic"),
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
    print(f"Best energy: {results['best_energy']:.4f} eV -> {results['run_folder']}")


if __name__ == "__main__":
    main()
