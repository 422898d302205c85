"""End-to-end active-learning loop — the reference's paper workflow
(sample -> embed -> cluster -> select-by-uncertainty -> fine-tune) in one
script, all in-framework.

A small PaiNN is trained on LJ-labelled structures, drives VSSR-MC
sampling, the sampled structures are clustered in its latent space, the
most-uncertain representative per cluster is labelled with the ground-truth
potential, and the model is fine-tuned on the enlarged dataset.
Run: python examples/08_active_learning.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.analysis import perform_clustering, select_representatives
from surface_sampling_tpu.core import EngineConfig, MCMCRun, geometric_schedule, make_spec
from surface_sampling_tpu.core.state import device_spec, realize_alive, realize_positions
from surface_sampling_tpu.models import PaiNNConfig
from surface_sampling_tpu.models.ensemble import ensemble_apply
from surface_sampling_tpu.models.nn_calculator import make_painn_potential
from surface_sampling_tpu.models.train import TrainConfig, init_ensemble, pad_structures, train_painn
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.structure import Structure
from surface_sampling_tpu.structure.slabs import fcc100
from surface_sampling_tpu.structure.sites import find_adsorption_sites


def main():
    rng = np.random.default_rng(0)
    a = 3.6147
    # ontop sites only: min adsorbate spacing a/sqrt(2)=2.56 A keeps the LJ
    # labels O(1) eV so the toy training stays well-conditioned
    truth = make_lennard_jones(epsilon=0.4, sigma=2.3, cutoff=5.0)
    slab = fcc100("Cu", size=(3, 3, 2), a=a, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=2.0)["ontop"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=5.0)

    cfg = PaiNNConfig(feat_dim=16, n_rbf=8, cutoff=5.0, n_layers=2,
                      readout_hidden=8, max_neighbors=32)
    n_members = 2
    params = init_ensemble(jax.random.PRNGKey(0), cfg, n_members)

    def label(structures):
        es, fs = [], []
        shifts = jnp.asarray(spec.shifts, jnp.float32)
        for st in structures:
            ti = jnp.zeros(len(st), jnp.int32)
            alive = jnp.ones(len(st), bool)
            e, f = truth.energy_and_forces(
                jnp.asarray(st.positions, jnp.float32), ti, alive, shifts)
            es.append(float(e))
            fs.append(np.asarray(f))
        return es, fs

    # seed dataset: random occupancies
    dspec = device_spec(spec)

    def realize_structs(sss):
        out = []
        for ss in sss:
            ssj = jnp.asarray(ss, jnp.int32)
            pos = np.asarray(realize_positions(dspec, ssj))
            alive = np.asarray(realize_alive(dspec, ssj))
            out.append(Structure(np.full(int(alive.sum()), 29), pos[alive], spec.cell))
        return out

    seed_ss = [rng.integers(0, 2, len(sites)) for _ in range(16)]
    train_structs = realize_structs(seed_ss)
    es, fs = label(train_structs)
    n_max = spec.n_slots

    for al_round in range(2):
        batch = pad_structures(train_structs, es, fs, cfg.cutoff, n_max=n_max)
        params, hist = train_painn(
            params, cfg, [batch],
            TrainConfig(epochs=40, learning_rate=3e-3), ensemble=True,
        )
        print(f"round {al_round}: trained on {len(train_structs)} structures, "
              f"loss {hist[0]:.4f} -> {hist[-1]:.4f}")

        # sample with the current model
        pot = make_painn_potential(params, cfg, [29], units="eV", ensemble=True)
        run = MCMCRun(spec, pot)
        # hot, nearly-flat ladder: we want *diverse* states for labelling,
        # not the ground state
        temps = geometric_schedule(1.0, 8, 0.97)
        _, rec = run.run(jax.random.PRNGKey(al_round + 1), temps,
                         cfg=EngineConfig(sweep_size=6, record_positions=False))

        # embed + uncertainty per sampled structure (params passed as an
        # argument so the jit cache survives across AL rounds)
        d = run.d
        shifts_j = jnp.asarray(spec.shifts, jnp.float32)

        @jax.jit
        def embed(p, ssj):
            return ensemble_apply(
                p, cfg, realize_positions(d, ssj),
                jnp.where(realize_alive(d, ssj), 29, 0).astype(jnp.int32),
                realize_alive(d, ssj), shifts_j)

        embs, uncs, sss = [], [], []
        for ss in np.asarray(rec.site_state):
            ssj = jnp.asarray(ss)
            out = embed(params, ssj)
            alive = np.asarray(realize_alive(d, ssj))
            embs.append(np.asarray(out["embedding"])[alive].mean(axis=0))
            uncs.append(float(out["energy_std"]))
            sss.append(ss)
        labels = perform_clustering(np.stack(embs), clustering_cutoff=3,
                                    cutoff_criterion="maxclust")
        picks = select_representatives(labels, np.asarray(uncs), metric="force_std")
        print(f"  sampled {len(sss)} states -> {len(np.unique(labels))} clusters; "
              f"labelling {len(picks)} most-uncertain representatives "
              f"(std {np.asarray(uncs)[picks].round(3)})")
        new_structs = realize_structs([sss[i] for i in picks])
        new_es, new_fs = label(new_structs)
        train_structs += new_structs
        es = list(es) + new_es
        fs = list(fs) + new_fs

    print("done: final dataset", len(train_structs), "structures")


if __name__ == "__main__":
    main()
