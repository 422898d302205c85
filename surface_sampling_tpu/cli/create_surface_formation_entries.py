"""Create surface formation-energy entries for Pourbaix analysis
(scripts/create_surface_formation_entries.py analog).

Computes NN (or classical) energies of sampled surfaces — optionally after
an on-device FIRE relaxation (reference --relax/optimize_slab) — applies
composition-based energy corrections, subtracts elemental reference
energies from a phase diagram, and writes a JSON list of entries.

Corrections (all opt-in, mirroring the reference's pipeline,
scripts/create_surface_formation_entries.py:305-323,394-399):
  * --mp2020: the full MaterialsProject2020Compatibility scheme as
    explicit tables (pourbaix/compatibility.py): structure-classified
    oxide/peroxide/superoxide anion corrections, the other tabulated
    anions, and the GGA/GGA+U mixing corrections for transition metals in
    O/F compounds (gated on the entry's hubbards matching the MP U set).
  * --aqueous: MaterialsProjectAqueousCompatibility re-design — shifts
    H-containing entries onto the hydrogen scale fitted so DFT water
    formation matches the experimental MU_H2O (reference O2/H2O fit
    inputs, script lines 55-57).
  * --oh-correction: SurfaceOHCompatibility ZPE-TS (+0.23 eV/OH) and
    hydrogen-bond (-0.30 eV/OH) terms (pourbaix/utils.py).
  * --oxide-correction [EV_PER_O]: legacy single per-O constant (subset
    of --mp2020; kept for compatibility).

Each output entry records GGA+U metadata (run_type, hubbards) like the
reference's ComputedStructureEntry parameters
(create_surface_formation_entries.py:42-49,165-180), plus the itemized
corrections applied, so entries remain auditable for downstream
surface-Pourbaix construction.
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path

# reference create_surface_formation_entries.py:42-49
DFT_U_VALUES = {"La": 0.0, "Mn": 3.9, "Pt": 0.0, "O": 0.0, "Ir": 0.0, "H": 0.0}
MP2020_OXIDE_CORRECTION = -0.687  # eV per O (MP2020 anion correction, oxides)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, nargs="+")
    ap.add_argument("--settings", required=True, help="JSON with calc_settings")
    ap.add_argument("--phase-diagram", required=True, help="pd_dict.json for element refs")
    ap.add_argument("--mp2020", action="store_true",
                    help="apply the full MP2020 anion + GGA/GGA+U corrections")
    ap.add_argument("--aqueous", action="store_true",
                    help="apply the aqueous-compatibility hydrogen re-reference")
    ap.add_argument("--oh-correction", action="store_true",
                    help="apply SurfaceOHCompatibility corrections")
    ap.add_argument("--oxide-correction", nargs="?", type=float,
                    const=MP2020_OXIDE_CORRECTION, default=None, metavar="EV_PER_O",
                    help="MP2020-style per-O anion correction "
                         f"(default {MP2020_OXIDE_CORRECTION} eV/O when given bare)")
    ap.add_argument("--relax", action="store_true",
                    help="FIRE-relax each structure before the energy evaluation")
    ap.add_argument("--relax-steps", type=int, default=20)
    ap.add_argument("--fmax", type=float, default=0.01)
    ap.add_argument("--out", default="surface_formation_entries.json")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import build_potential
    from surface_sampling_tpu.ops.neighbors import pair_shifts_for
    from surface_sampling_tpu.pourbaix import PhaseDiagramLite, SurfaceOHCompatibility
    from surface_sampling_tpu.pourbaix.compatibility import (
        AqueousCompatibility,
        MP2020Compatibility,
        MP_U_VALUES,
    )
    from surface_sampling_tpu.utils.misc import load_structures_any

    settings = json.loads(Path(args.settings).read_text())
    pot, numbers, cutoff = build_potential(settings.get("calc_settings", settings), {})
    z_to_type = {int(z): t for t, z in enumerate(numbers)}
    pd = PhaseDiagramLite.from_mson(args.phase_diagram)
    compat = SurfaceOHCompatibility()
    mp2020 = MP2020Compatibility() if args.mp2020 else None
    aqueous = AqueousCompatibility() if args.aqueous else None

    structures = []
    for f in args.structures:
        structures.extend(load_structures_any(f))

    relax_fn = None
    if args.relax:
        import jax

        from surface_sampling_tpu.core.relax import FireConfig, fire_relax

        fcfg = FireConfig(steps=args.relax_steps, fmax=args.fmax)

        @jax.jit
        def relax_fn(positions, ti, alive, shifts):
            def e_fn(pos):
                return pot.energy(pos, ti, alive, shifts)

            res = fire_relax(e_fn, positions, jnp.ones(positions.shape[0], bool), fcfg)
            return res.positions

    entries = []
    for st in structures:
        shifts = jnp.asarray(pair_shifts_for(st.cell, st.scaled_positions, cutoff), jnp.float32)
        ti = jnp.asarray([z_to_type.get(int(z), 0) for z in st.numbers], jnp.int32)
        alive = jnp.ones(len(st), bool)
        pos = jnp.asarray(st.positions, jnp.float32)
        if relax_fn is not None:
            pos = relax_fn(pos, ti, alive, shifts)
        e = float(pot.energy(pos, ti, alive, shifts))
        comp = dict(Counter(st.symbols))
        hubbards = {el: DFT_U_VALUES.get(el, MP_U_VALUES.get(el, 0.0)) for el in comp}
        applied = []
        if mp2020 is not None:
            for label, v in mp2020.get_adjustments(comp, structure=st,
                                                   hubbards=hubbards):
                e += v
                applied.append({"label": label, "value": v})
        if aqueous is not None and comp.get("H", 0) > 0:
            h_ref = pd.el_refs.get("H", 0.0)
            v = comp["H"] * aqueous.h_correction(h_ref)
            e += v
            applied.append({"label": "aqueous H re-reference", "value": v})
        if args.oh_correction:
            v = compat.get_adjustment(comp)
            e += v
            applied.append({"label": "surface OH (ZPE-TS + H-bond)", "value": v})
        if args.oxide_correction is not None:
            v = args.oxide_correction * comp.get("O", 0)
            e += v
            applied.append({"label": "legacy per-O", "value": v})
        e_form = e - sum(n * pd.el_refs[el] for el, n in comp.items() if el in pd.el_refs)
        entries.append({
            "composition": comp,
            "energy": e,
            "formation_energy": e_form,
            "corrections": applied,
            "parameters": {
                "run_type": "GGA+U",
                "is_hubbard": True,
                "hubbards": hubbards,
            },
        })

    Path(args.out).write_text(json.dumps(entries, indent=1))
    print(f"Wrote {len(entries)} entries -> {args.out}")


if __name__ == "__main__":
    main()
