"""Batched prediction driver: energies/forces/uncertainty over structures.

CLI surface for the prediction helpers the reference keeps library-side
(mcmc/uncertainty/prediction.py:14-138: get_prediction / get_embedding;
driven from its clustering and active-learning notebooks). Evaluates any
calc_settings-buildable potential (EAM/Tersoff/SW/PaiNN/CHGNet/MACE, NN
ensembles included) over a set of structure files and writes one npz:

    energies (B,), energy_std (B,; 0 unless an NN ensemble),
    forces (B, N_max, 3) zero-padded, n_atoms (B,),
    embeddings (B, F) mean-pooled per structure (NN families, --embeddings)

Optionally computes error metrics against a labelled dataset
(--labels labelled.json with the same frame order): energy/force MAE,
written to metrics.json next to the npz.

    sst-predict --structures run/*.cif --settings settings.json \\
        --out predictions.npz [--embeddings] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, nargs="+",
                    help="structure files (.cif/.xyz/.npz/.json trajectories)")
    ap.add_argument("--settings", required=True, help="JSON with calc_settings")
    ap.add_argument("--out", default="predictions.npz")
    ap.add_argument("--embeddings", action="store_true",
                    help="also store mean-pooled per-structure embeddings "
                         "(NN families)")
    ap.add_argument("--labels", default=None,
                    help="labelled dataset (JSON list/npz) with energies/"
                         "forces in the same frame order -> metrics.json")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import build_potential, load_settings
    from surface_sampling_tpu.ops.neighbors import pair_shifts_for
    from surface_sampling_tpu.utils.misc import load_structures_any

    settings = load_settings(args.settings)
    structures = []
    for f in args.structures:
        structures.extend(load_structures_any(f))
    if not structures:
        raise SystemExit("no structures loaded")

    pot, numbers, cutoff = build_potential(settings["calc_settings"],
                                           settings.get("system_settings", {}))
    outputs_fn = pot.__dict__.get("outputs")
    z_to_type = {int(z): t for t, z in enumerate(numbers)}
    n_max = max(len(s) for s in structures)

    energies, stds, n_atoms, forces, embs = [], [], [], [], []
    for st in structures:
        shifts = jnp.asarray(
            pair_shifts_for(st.cell, st.scaled_positions, cutoff), jnp.float32)
        pos = jnp.asarray(st.positions, jnp.float32)
        ti = jnp.asarray([z_to_type.get(int(z), 0) for z in st.numbers],
                         jnp.int32)
        alive = jnp.ones(len(st), bool)
        e, f = pot.energy_and_forces(pos, ti, alive, shifts)
        energies.append(float(e))
        n_atoms.append(len(st))
        fp = np.zeros((n_max, 3))
        fp[: len(st)] = np.asarray(f)
        forces.append(fp)
        std = 0.0
        if outputs_fn is not None:
            out = outputs_fn(pos, ti, alive, shifts)
            std = float(np.asarray(out.get("energy_std", 0.0)))
            if args.embeddings and "embedding" in out:
                embs.append(np.asarray(out["embedding"]).mean(axis=0))
        stds.append(std)

    arrays = dict(
        energies=np.asarray(energies),
        energy_std=np.asarray(stds),
        forces=np.stack(forces),
        n_atoms=np.asarray(n_atoms, np.int32),
    )
    if embs:
        arrays["embeddings"] = np.stack(embs)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, **arrays)

    if args.labels:
        from surface_sampling_tpu.models.dataset import load_labelled_structures

        _, e_ref, f_ref = load_labelled_structures(args.labels)
        if len(e_ref) != len(structures):
            raise SystemExit(
                f"--labels has {len(e_ref)} frames, inputs have "
                f"{len(structures)}")
        e_mae = float(np.mean(np.abs(arrays["energies"] - np.asarray(e_ref))))
        f_err = [
            float(np.mean(np.abs(arrays["forces"][i, : n] - np.asarray(f_ref[i]))))
            for i, n in enumerate(n_atoms)
        ]
        metrics = {
            "energy_mae_eV": e_mae,
            "energy_mae_meV_per_atom": float(np.mean(
                np.abs(arrays["energies"] - np.asarray(e_ref))
                / np.asarray(n_atoms))) * 1e3,
            "force_mae_eV_A": float(np.mean(f_err)),
            "n_frames": len(structures),
        }
        out.with_name("metrics.json").write_text(json.dumps(metrics, indent=2))
        print(json.dumps(metrics))

    print(f"Wrote {out} ({len(structures)} structures, "
          f"mean E = {np.mean(arrays['energies']):.4f} eV)")


if __name__ == "__main__":
    main()
