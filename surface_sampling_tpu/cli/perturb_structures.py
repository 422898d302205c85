"""Random rattle of structures +/- lattice, with optional before/after
energies (scripts/perturb_structures.py analog)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, nargs="+")
    ap.add_argument("--amplitude", type=float, default=0.1)
    ap.add_argument("--n-perturb", type=int, default=1, help="perturbations per structure")
    ap.add_argument("--displace-lattice", action="store_true")
    ap.add_argument("--settings", default=None, help="JSON with calc_settings for energies")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="perturbed")
    args = ap.parse_args(argv)

    from surface_sampling_tpu.structure.io import save_structures_npz
    from surface_sampling_tpu.utils.misc import load_structures_any, randomize_structure

    structures = []
    for f in args.structures:
        structures.extend(load_structures_any(f))

    energy_fn = None
    if args.settings:
        import jax.numpy as jnp

        from surface_sampling_tpu.cli.common import build_potential
        from surface_sampling_tpu.ops.neighbors import pair_shifts_for

        settings = json.loads(Path(args.settings).read_text())
        pot, numbers, cutoff = build_potential(settings.get("calc_settings", settings), {})
        z_to_type = {int(z): t for t, z in enumerate(numbers)}

        def energy_fn(st):
            shifts = jnp.asarray(pair_shifts_for(st.cell, st.scaled_positions, cutoff))
            ti = jnp.asarray([z_to_type.get(int(z), 0) for z in st.numbers], jnp.int32)
            return float(
                pot.energy(jnp.asarray(st.positions, jnp.float32), ti,
                           jnp.ones(len(st), bool), jnp.asarray(shifts, jnp.float32))
            )

    rng = np.random.default_rng(args.seed)
    out_structures, energies = [], []
    for st in structures:
        for _ in range(args.n_perturb):
            p = randomize_structure(st, args.amplitude, args.displace_lattice, rng=rng)
            out_structures.append(p)
            energies.append(energy_fn(p) if energy_fn else np.nan)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_structures_npz(out / "perturbed.npz", out_structures, energies)
    print(f"Wrote {len(out_structures)} structures -> {out/'perturbed.npz'}")


if __name__ == "__main__":
    main()
