"""Latent-space clustering of sampled structures — mirror of the
reference's latent_space_clustering.ipynb. Samples SrTiO3 surfaces, embeds
them with the PaiNN ensemble, clusters (PCA + Ward) and picks diverse
representatives. Run: python examples/04_latent_clustering.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.analysis import perform_clustering, select_representatives
from surface_sampling_tpu.core import EngineConfig
from surface_sampling_tpu.core.state import realize_alive, realize_positions, realize_type_idx
from surface_sampling_tpu.systems import srtio3_001_painn


def main():
    sys = srtio3_001_painn()
    temps = np.repeat(1.0, 8)
    state, rec = sys.run.run(
        jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=4, record_positions=False)
    )
    d = sys.run.d
    outputs = sys.potential.__dict__["outputs"]

    @jax.jit
    def embed(ssj):
        return outputs(
            realize_positions(d, ssj),
            realize_type_idx(d, ssj),
            realize_alive(d, ssj),
            d.shifts,
        )

    embeddings, energies = [], []
    for ss in np.asarray(rec.site_state):
        ssj = jnp.asarray(ss)
        out = embed(ssj)
        alive = np.asarray(realize_alive(d, ssj))
        emb = np.asarray(out["embedding"])[alive].mean(axis=0)
        embeddings.append(emb)
        energies.append(float(out["energy"]))

    labels = perform_clustering(np.stack(embeddings), clustering_cutoff=3,
                                cutoff_criterion="maxclust")
    picks = select_representatives(labels, -np.asarray(energies), metric="energy")
    print(f"{len(embeddings)} structures -> {len(np.unique(labels))} clusters")
    print("selected sweep indices:", picks.tolist())


if __name__ == "__main__":
    main()
