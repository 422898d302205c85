"""Create surface formation-energy entries for Pourbaix analysis
(scripts/create_surface_formation_entries.py analog).

Computes NN (or classical) energies of sampled surfaces, applies the
surface-OH compatibility corrections (pourbaix/utils.py), subtracts
elemental reference energies from a phase diagram, and writes a JSON list
of {composition, energy, formation_energy} entries.
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, nargs="+")
    ap.add_argument("--settings", required=True, help="JSON with calc_settings")
    ap.add_argument("--phase-diagram", required=True, help="pd_dict.json for element refs")
    ap.add_argument("--oh-correction", action="store_true",
                    help="apply SurfaceOHCompatibility corrections")
    ap.add_argument("--out", default="surface_formation_entries.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import build_potential
    from surface_sampling_tpu.ops.neighbors import pair_shifts_for
    from surface_sampling_tpu.pourbaix import PhaseDiagramLite, SurfaceOHCompatibility
    from surface_sampling_tpu.utils.misc import load_structures_any

    settings = json.loads(Path(args.settings).read_text())
    pot, numbers, cutoff = build_potential(settings.get("calc_settings", settings), {})
    z_to_type = {int(z): t for t, z in enumerate(numbers)}
    pd = PhaseDiagramLite.from_mson(args.phase_diagram)
    compat = SurfaceOHCompatibility()

    structures = []
    for f in args.structures:
        structures.extend(load_structures_any(f))

    entries = []
    for st in structures:
        shifts = jnp.asarray(pair_shifts_for(st.cell, st.scaled_positions, cutoff), jnp.float32)
        ti = jnp.asarray([z_to_type.get(int(z), 0) for z in st.numbers], jnp.int32)
        e = float(
            pot.energy(jnp.asarray(st.positions, jnp.float32), ti,
                       jnp.ones(len(st), bool), shifts)
        )
        comp = dict(Counter(st.symbols))
        if args.oh_correction:
            e = compat.process_entry_energy(e, comp)
        e_form = e - sum(n * pd.el_refs[el] for el, n in comp.items() if el in pd.el_refs)
        entries.append({"composition": comp, "energy": e, "formation_energy": e_form})

    Path(args.out).write_text(json.dumps(entries, indent=1))
    print(f"Wrote {len(entries)} entries -> {args.out}")


if __name__ == "__main__":
    main()
