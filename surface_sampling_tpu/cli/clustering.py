"""Latent-space clustering driver (scripts/clustering.py analog).

Loads sampled structures, computes PaiNN embeddings + a selection metric
(energy | force_std | gmm | random) in one batched device pass per
structure group, clusters (PCA + Ward) and saves one representative per
cluster.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def compute_embeddings_and_metric(structures, calc_settings: dict, metric: str):
    """Per-structure mean-pooled embeddings + metric values (reference:
    scripts/clustering.py:236-257, calculators.py:34-135)."""
    import jax
    import jax.numpy as jnp

    from surface_sampling_tpu.cli.common import build_potential
    from surface_sampling_tpu.models.ensemble import ensemble_forces_std
    from surface_sampling_tpu.ops.neighbors import pair_shifts_for

    pot, numbers, cutoff = build_potential(calc_settings, {})
    outputs_fn = pot.__dict__["outputs"]
    z_to_type = {int(z): t for t, z in enumerate(numbers)}

    embeddings, metrics = [], []
    for st in structures:
        frac = st.scaled_positions
        shifts = jnp.asarray(pair_shifts_for(st.cell, frac, cutoff), jnp.float32)
        pos = jnp.asarray(st.positions, jnp.float32)
        ti = jnp.asarray([z_to_type.get(int(z), 0) for z in st.numbers], jnp.int32)
        alive = jnp.ones(len(st), bool)
        out = outputs_fn(pos, ti, alive, shifts)
        emb = np.asarray(out["embedding"]).mean(axis=0)   # mean-pool atoms
        embeddings.append(emb)
        if metric == "energy":
            metrics.append(float(out["energy"]))
        elif metric == "force_std":
            metrics.append(float(np.asarray(out.get("energy_std", 0.0))))
        else:
            metrics.append(0.0)
    embeddings = np.stack(embeddings)
    metrics = np.asarray(metrics)
    if metric == "gmm":
        from surface_sampling_tpu.analysis import GMMUncertainty

        gu = GMMUncertainty(n_components=min(8, len(embeddings)))
        # huge sampled sets stream through the chunked-EM JAX fit
        # (analysis.uncertainty.fit_gmm_em); small ones use sklearn
        gu.fit_gmm(embeddings,
                   method="em" if len(embeddings) > 20000 else "sklearn")
        metrics = np.asarray(gu.get_uncertainty(embeddings))
    elif metric == "random":
        metrics = np.random.default_rng(0).random(len(embeddings))
    return embeddings, metrics


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--structures", required=True, nargs="+",
                    help="structure files (.npz bundles, .cif, .xyz, .txt list)")
    ap.add_argument("--settings", required=True, help="JSON with calc_settings")
    ap.add_argument("--cutoff", type=float, default=0.5,
                    help="clustering cutoff (distance or maxclust)")
    ap.add_argument("--criterion", choices=["distance", "maxclust"], default="maxclust")
    ap.add_argument("--metric", choices=["force_std", "energy", "gmm", "random"],
                    default="force_std")
    ap.add_argument("--out", default="clustering_out")
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    from surface_sampling_tpu.analysis import perform_clustering, select_data_and_save
    from surface_sampling_tpu.utils.misc import load_structures_any

    settings = json.loads(Path(args.settings).read_text())
    calc_settings = settings.get("calc_settings", settings)

    structures = []
    for f in args.structures:
        structures.extend(load_structures_any(f))
    print(f"Loaded {len(structures)} structures")

    embeddings, metrics = compute_embeddings_and_metric(structures, calc_settings, args.metric)
    labels = perform_clustering(embeddings, args.cutoff, args.criterion)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    idx = select_data_and_save(structures, labels, metrics, args.metric, save_folder=out)
    np.savez_compressed(out / "clustering.npz", embeddings=embeddings,
                        labels=labels, metrics=metrics, selected=idx)
    print(f"{len(np.unique(labels))} clusters; selected {len(idx)} structures -> {out}")


if __name__ == "__main__":
    main()
