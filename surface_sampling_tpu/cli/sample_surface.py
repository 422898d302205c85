"""Gas/vacuum VSSR-MC run driver (scripts/sample_surface.py analog).

Usage:
    sst-sample-surface --settings config.json --slab slab.cif [--seed 0]

The settings JSON uses the reference's three-section schema; see
surface_sampling_tpu/cli/common.py. A provenance copy of the merged
settings is written into the run folder (scripts/sample_surface.py:151).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--settings", required=True, help="three-section JSON settings file")
    ap.add_argument("--slab", required=True, help="pristine slab (.cif/.xyz/.npz)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--base-dir", default=None, help="base directory for run folders")
    ap.add_argument("--resume", default=None, metavar="CKPT",
                    help="checkpoint.npz (or run folder) to resume from; "
                         "total_sweeps is the full target, only the remaining "
                         "sweeps run (exact continuation incl. PRNG keys)")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    from surface_sampling_tpu.cli.common import (
        assemble_system,
        load_settings,
        load_slab,
        make_run_folder,
        run_sampling,
    )

    settings = load_settings(args.settings)
    slab = load_slab(args.slab)
    surface_name = settings["system_settings"].get("surface_name", slab.formula)
    settings["system_settings"]["surface_name"] = surface_name
    run_folder = make_run_folder(settings, surface_name, base_dir=args.base_dir)
    (run_folder / "settings.json").write_text(json.dumps(settings, indent=2, default=str))

    asys = assemble_system(settings, slab)
    t0 = time.perf_counter()
    results = run_sampling(asys, run_folder, seed=args.seed, resume=args.resume)
    print(f"Time taken = {time.perf_counter() - t0:.3f} seconds")
    print(f"Best surface energy: {results['best_energy']:.4f} eV")
    print(f"Run folder: {results['run_folder']}")


if __name__ == "__main__":
    main()
