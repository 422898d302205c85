"""Training dataset loading (mcmc/uncertainty/json_dataset.py analog).

The reference loads CHGNet-style MPtrj JSON (structure + energy/forces per
frame) into graph batches for fine-tuning. Here datasets load into the
framework's PaddedBatch tensors for models/train.py, from:

  * MPtrj-style JSON: {material_id: {graph_id: {"structure": pymatgen-dict,
    "energy_per_atom" | "uncorrected_energy_per_atom": float,
    "force": [[fx,fy,fz], ...]}}}
  * flat JSON lists: [{"numbers"|"symbols", "positions", "cell",
    "energy", "forces"}, ...]
  * npz bundles written by structure.io.save_structures_npz (+forces key).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from surface_sampling_tpu.constants import Z_FROM_SYMBOL
from surface_sampling_tpu.structure.atoms import Structure


def _structure_from_pymatgen_dict(d: dict) -> Structure:
    cell = np.asarray(d["lattice"]["matrix"], dtype=np.float64)
    symbols, frac = [], []
    for site in d["sites"]:
        specie = site["species"][0]["element"]
        symbols.append(specie)
        frac.append(site["abc"])
    st = Structure.from_symbols(symbols, np.zeros((len(symbols), 3)), cell)
    st.set_scaled_positions(np.asarray(frac))
    return st


def load_labelled_structures(path: str | Path, with_magmoms: bool = False):
    """Load (structures, energies, forces[, magmoms]) from a labelled
    dataset file — or a DIRECTORY of MPtrj JSON shards, merged like the
    reference's StructureJsonData (json_dataset.py:66-77). Magmoms are
    per-atom arrays (None where the frame has no "magmom" label)."""
    path = Path(path)
    if path.is_dir():
        structures, energies, forces, magmoms = [], [], [], []
        for sub in sorted(path.glob("*.json")):
            s, e, f, m = load_labelled_structures(sub, with_magmoms=True)
            structures += s; energies += list(e); forces += f; magmoms += m
        energies = np.asarray(energies)
        return ((structures, energies, forces, magmoms) if with_magmoms
                else (structures, energies, forces))
    if path.suffix == ".npz":
        d = np.load(path)
        sts = [Structure(n, p, c) for n, p, c in zip(d["numbers"], d["positions"], d["cells"])]
        forces = d["forces"] if "forces" in d.files else np.zeros_like(d["positions"])
        mags = list(d["magmoms"]) if "magmoms" in d.files else [None] * len(sts)
        if with_magmoms:
            return sts, d["energies"], list(forces), mags
        return sts, d["energies"], list(forces)
    data = json.loads(path.read_text())
    structures, energies, forces, magmoms = [], [], [], []
    if isinstance(data, list):
        for rec in data:
            if "numbers" in rec:
                st = Structure(np.asarray(rec["numbers"], np.int32),
                               np.asarray(rec["positions"]), np.asarray(rec["cell"]))
            else:
                st = Structure.from_symbols(rec["symbols"], np.asarray(rec["positions"]),
                                            np.asarray(rec["cell"]))
            structures.append(st)
            energies.append(float(rec["energy"]))
            forces.append(np.asarray(rec.get("forces", np.zeros((len(st), 3)))))
            m = rec.get("magmoms", rec.get("magmom"))
            magmoms.append(np.asarray(m, dtype=np.float64) if m is not None else None)
    else:
        # MPtrj-style nested dict (json_dataset.py:26-147)
        for frames in data.values():
            for frame in frames.values():
                st = _structure_from_pymatgen_dict(frame["structure"])
                epa = frame.get("energy_per_atom",
                                frame.get("uncorrected_energy_per_atom"))
                energies.append(float(epa) * len(st))
                forces.append(np.asarray(frame.get("force", np.zeros((len(st), 3)))))
                m = frame.get("magmom")
                magmoms.append(np.asarray(m, dtype=np.float64) if m is not None else None)
                structures.append(st)
    if with_magmoms:
        return structures, np.asarray(energies), forces, magmoms
    return structures, np.asarray(energies), forces


def make_uncertainty_dataset(structures, cutoff: float, n_max=None):
    """Unlabelled scoring batch: pad structures into one PaddedBatch with
    zero energy/force labels (mcmc/uncertainty/utils.py:12-26 analog —
    the reference builds an nff Dataset of AtomsBatches; here scoring and
    training share the same fixed-shape tensors)."""
    from surface_sampling_tpu.models.train import pad_structures

    energies = np.zeros(len(structures))
    forces = [np.zeros((len(s), 3)) for s in structures]
    return pad_structures(structures, energies, forces, cutoff, n_max=n_max)


def make_clustering_dataset(structures, center_idx_list, cutoff: float, n_max=None):
    """Scoring batch plus per-structure center masks (B, N): True on the
    atoms whose embeddings should be pooled (e.g. surface atoms only) —
    mcmc/uncertainty/utils.py:40-59 analog, where ``center_idx`` feeds
    torch_scatter pooling; here it is a padded boolean mask consumed by
    models.prediction.get_embedding(..., center_mask=...)."""
    batch = make_uncertainty_dataset(structures, cutoff, n_max=n_max)
    B, N = batch.numbers.shape
    center_mask = np.zeros((B, N), bool)
    for b, idx in enumerate(center_idx_list):
        center_mask[b, np.asarray(idx, dtype=np.int64)] = True
    return batch, center_mask


def get_train_val_test_loader(
    path: str | Path,
    cutoff: float,
    batch_size: int = 16,
    train_ratio: float = 0.8,
    val_ratio: float = 0.1,
    seed: int = 0,
):
    """Split a labelled dataset into padded train/val/test batch lists
    (json_dataset.py:149-246 analog)."""
    from surface_sampling_tpu.models.train import pad_structures

    structures, energies, forces, magmoms = load_labelled_structures(
        path, with_magmoms=True)
    have_magmoms = any(m is not None for m in magmoms)
    n = len(structures)
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_train = int(round(n * train_ratio))
    n_val = int(round(n * val_ratio))
    splits = {
        "train": order[:n_train],
        "val": order[n_train : n_train + n_val],
        "test": order[n_train + n_val :],
    }
    n_max = max(len(s) for s in structures)

    def batches_of(idx):
        out = []
        for lo in range(0, len(idx), batch_size):
            sel = idx[lo : lo + batch_size]
            if len(sel) == 0:
                continue
            out.append(
                pad_structures(
                    [structures[i] for i in sel],
                    [energies[i] for i in sel],
                    [forces[i] for i in sel],
                    cutoff,
                    n_max=n_max,
                    magmoms=[magmoms[i] for i in sel] if have_magmoms else None,
                )
            )
        return out

    return batches_of(splits["train"]), batches_of(splits["val"]), batches_of(splits["test"])
