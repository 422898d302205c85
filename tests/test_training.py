"""PaiNN training + prediction helper tests: fit a tiny PaiNN to LJ data."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.models import PaiNNConfig, init_painn
from surface_sampling_tpu.models.prediction import (
    get_embedding,
    get_errors,
    get_prediction,
    get_residual,
    get_system_val,
)
from surface_sampling_tpu.models.train import (
    TrainConfig,
    init_ensemble,
    pad_structures,
    train_painn,
)
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.structure import Structure


@pytest.fixture(scope="module")
def lj_dataset():
    """Random Ar-like clusters labelled with LJ energies/forces."""
    pot = make_lennard_jones(epsilon=0.5, sigma=2.2, cutoff=6.0)
    rng = np.random.default_rng(0)
    structures, energies, forces = [], [], []
    shifts = jnp.zeros((1, 3))
    for _ in range(12):
        n = 5
        pos = rng.uniform(0, 5.0, (n, 3))
        # push apart overlapping atoms
        for _ in range(40):
            d = pos[:, None] - pos[None, :]
            r = np.linalg.norm(d, axis=-1) + np.eye(n) * 10
            if r.min() > 1.9:
                break
            i, j = np.unravel_index(np.argmin(r), r.shape)
            pos[i] += 0.3 * (pos[i] - pos[j]) / max(r[i, j], 0.5)
        st = Structure.from_symbols(["Ar"] * n, pos, np.eye(3) * 100.0)
        ti = jnp.zeros(n, jnp.int32)
        alive = jnp.ones(n, bool)
        e, f = pot.energy_and_forces(jnp.asarray(pos, jnp.float32), ti, alive, shifts)
        structures.append(st)
        energies.append(float(e))
        forces.append(np.asarray(f))
    return structures, energies, forces


def test_training_reduces_loss(lj_dataset):
    structures, energies, forces = lj_dataset
    cfg = PaiNNConfig(feat_dim=16, n_rbf=8, cutoff=6.0, n_layers=2, readout_hidden=8,
                      max_neighbors=6)
    batch = pad_structures(structures, energies, forces, cfg.cutoff)
    params = init_painn(jax.random.PRNGKey(0), cfg)
    params, hist = train_painn(
        params, cfg, [batch], TrainConfig(epochs=60, learning_rate=3e-3)
    )
    assert hist[-1] < 0.5 * hist[0]


def test_ensemble_training(lj_dataset):
    structures, energies, forces = lj_dataset
    cfg = PaiNNConfig(feat_dim=8, n_rbf=6, cutoff=6.0, n_layers=1, readout_hidden=8,
                      max_neighbors=6)
    batch = pad_structures(structures, energies, forces, cfg.cutoff)
    params = init_ensemble(jax.random.PRNGKey(1), cfg, 2)
    params, hist = train_painn(
        params, cfg, [batch], TrainConfig(epochs=20, learning_rate=3e-3), ensemble=True
    )
    assert hist[-1] < hist[0]
    # trained ensemble predicts with spread
    pred = get_prediction(params, cfg, batch, ensemble=True)
    assert np.all(np.asarray(pred["energy_std"]) >= 0)


def test_prediction_helpers(lj_dataset):
    structures, energies, forces = lj_dataset
    cfg = PaiNNConfig(feat_dim=8, n_rbf=6, cutoff=6.0, n_layers=1, readout_hidden=8,
                      max_neighbors=6)
    batch = pad_structures(structures, energies, forces, cfg.cutoff)
    params = init_painn(jax.random.PRNGKey(2), cfg)
    pred = get_prediction(params, cfg, batch)
    B = len(structures)
    assert pred["energy"].shape == (B,)
    emb = get_embedding(pred, batch.numbers)
    assert emb.shape[0] == B
    errs = get_errors(pred, batch)
    assert errs["energy_mae_per_atom"].shape == (B,)
    res = get_residual(pred, batch)
    assert res.shape == (B,)
    sv = get_system_val(np.asarray(pred["forces"]), batch.numbers, "max")
    assert sv.shape == (B,)


def test_mace_trains_and_is_invariant(lj_dataset):
    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply
    from surface_sampling_tpu.models.train import train_painn

    structures, energies, forces = lj_dataset
    cfg = MACEConfig(feat_dim=16, n_rbf=6, cutoff=6.0, n_layers=2,
                     max_neighbors=6, readout_hidden=8)
    batch = pad_structures(structures, energies, forces, cfg.cutoff)
    params = init_mace(jax.random.PRNGKey(0), cfg)
    params, hist = train_painn(
        params, cfg, [batch], TrainConfig(epochs=50, learning_rate=3e-3),
        apply_fn=mace_apply,
    )
    assert hist[-1] < 0.6 * hist[0]

    # invariances
    pos = jnp.asarray(structures[0].positions, jnp.float32)
    nums = jnp.asarray(structures[0].numbers)
    alive = jnp.ones(len(nums), bool)
    shifts = jnp.zeros((1, 3))
    e0 = float(mace_apply(params, cfg, pos, nums, alive, shifts)["energy"])
    e_t = float(mace_apply(params, cfg, pos + 2.5, nums, alive, shifts)["energy"])
    assert np.isclose(e0, e_t, atol=1e-4)
    th = 0.8
    rot = jnp.asarray([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]],
                      jnp.float32)
    e_r = float(mace_apply(params, cfg, pos @ rot.T, nums, alive, shifts)["energy"])
    assert np.isclose(e0, e_r, atol=1e-3)


def test_mace_potential_mc_smoke(lj_dataset):
    from surface_sampling_tpu.core import MCMCRun, make_spec
    from surface_sampling_tpu.core.events import make_semigrand_step
    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, make_mace_potential
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites

    cfg = MACEConfig(feat_dim=8, n_rbf=4, cutoff=4.0, n_layers=1, max_neighbors=16)
    params = init_mace(jax.random.PRNGKey(1), cfg)
    slab = fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5)["ontop"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=4.0)
    pot = make_mace_potential(params, cfg, [29])
    run = MCMCRun(spec, pot)
    state = run.init_state(jax.random.PRNGKey(2))
    step = jax.jit(lambda s: make_semigrand_step(run.d, run.state_energy_fn)(
        s, jnp.asarray(1.0)))
    for _ in range(3):
        state, info = step(state)
    assert np.isfinite(float(state.energy))


def test_mace_l2_invariants_under_general_rotation(lj_dataset):
    """L_max=2 path: energy invariant under a general 3D rotation (exercises
    the Y2 tensor, A1.T.A1 and tr(T^3) contractions), and the l=2 features
    actually contribute (l_max=2 output differs from l_max=1)."""
    import dataclasses as _dc

    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply

    structures, _, _ = lj_dataset
    cfg2 = MACEConfig(feat_dim=16, n_rbf=6, cutoff=6.0, n_layers=2,
                      max_neighbors=6, readout_hidden=8, l_max=2)
    params2 = init_mace(jax.random.PRNGKey(3), cfg2)
    pos = jnp.asarray(structures[0].positions, jnp.float32)
    nums = jnp.asarray(structures[0].numbers)
    alive = jnp.ones(len(nums), bool)
    shifts = jnp.zeros((1, 3))
    e0 = float(mace_apply(params2, cfg2, pos, nums, alive, shifts)["energy"])

    # general rotation: compose z and x rotations
    a, b = 0.7, 1.1
    rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    rx = np.array([[1.0, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    rot = jnp.asarray(rx @ rz, jnp.float32)
    e_r = float(mace_apply(params2, cfg2, pos @ rot.T, nums, alive, shifts)["energy"])
    assert np.isclose(e0, e_r, atol=2e-3), (e0, e_r)

    # reflection invariance too (all invariants are parity-even)
    e_m = float(mace_apply(params2, cfg2, pos * jnp.asarray([-1.0, 1.0, 1.0]),
                           nums, alive, shifts)["energy"])
    assert np.isclose(e0, e_m, atol=2e-3)

    # l=2 features are live: same weights with l_max=1 must differ
    cfg1 = _dc.replace(cfg2, l_max=1)
    params1 = init_mace(jax.random.PRNGKey(3), cfg1)
    e1 = float(mace_apply(params1, cfg1, pos, nums, alive, shifts)["energy"])
    assert not np.isclose(e0, e1, atol=1e-6)


def test_mace_npz_roundtrip_and_cli(tmp_path):
    """save_mace_npz/load_mace_npz roundtrip bit-exactly and the CLI
    sample_surface driver runs with calc_name 'mace'."""
    import json

    from surface_sampling_tpu.models.mace import (
        MACEConfig,
        init_mace,
        load_mace_npz,
        mace_apply,
        save_mace_npz,
    )
    from surface_sampling_tpu.structure.io import write_cif
    from surface_sampling_tpu.structure.slabs import fcc100

    cfg = MACEConfig(feat_dim=8, n_rbf=4, cutoff=4.0, n_layers=1,
                     max_neighbors=16, l_max=2)
    params = init_mace(jax.random.PRNGKey(4), cfg)
    p = tmp_path / "mace.npz"
    save_mace_npz(p, params, cfg)
    params2, cfg2 = load_mace_npz(p)
    assert cfg2 == cfg
    chex.assert_trees_all_close(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, params2))

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=10.0)
    slab_path = tmp_path / "slab.cif"
    write_cif(slab_path, slab)
    settings = {
        "system_settings": {"surface_name": "Cu_mace", "planar_distance": 1.5,
                            "cutoff": 4.0},
        "sampling_settings": {"total_sweeps": 2, "sweep_size": 2,
                              "start_temp": 1.0, "adsorbates": ["Cu"],
                              "n_chains": 2,
                              "run_folder": str(tmp_path / "run")},
        "calc_settings": {"calc_name": "mace", "model_path": str(p),
                          "elements": ["Cu"]},
    }
    sp = tmp_path / "settings.json"
    sp.write_text(json.dumps(settings))
    from surface_sampling_tpu.cli.sample_surface import main

    main(["--settings", str(sp), "--slab", str(slab_path)])
    assert (tmp_path / "run" / "stats.csv").exists()


def test_mace_state_dict_converter_roundtrip(tmp_path):
    """convert_mace.py (the MACE sibling of convert_nff/convert_chgnet):
    params -> torch-style state dict -> params is exact, through both the
    in-memory dict, an npz, and a torch-pickled .pt; official-package
    alias names map; unknown foreign keys are refused (strict)."""
    import pytest

    from surface_sampling_tpu.models.convert_mace import (
        convert_mace_state_dict,
        export_mace_state_dict,
        load_mace_state_dict,
    )
    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply

    for eq in (False, True):
        cfg = MACEConfig(feat_dim=8, n_rbf=4, cutoff=4.0, n_layers=2,
                         max_neighbors=8, l_max=2, equivariant_messages=eq)
        params = init_mace(jax.random.PRNGKey(7), cfg)
        sd = export_mace_state_dict(params)
        assert sd["layers.0.rad0.weight"].shape == (8, 4)  # torch (out, in)
        params2, cfg2 = convert_mace_state_dict(sd)        # dims inferred
        assert (cfg2.feat_dim, cfg2.n_rbf, cfg2.n_layers, cfg2.l_max,
                cfg2.equivariant_messages) == (8, 4, 2, 2, eq)
        chex.assert_trees_all_close(
            jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, params2))

    # same energies through the converted params
    pos = jnp.asarray(np.random.default_rng(0).uniform(0, 4, (6, 3)), jnp.float32)
    nums = jnp.full(6, 29, jnp.int32)
    alive = jnp.ones(6, bool)
    shifts = jnp.zeros((1, 3))
    e1 = float(mace_apply(params, cfg, pos, nums, alive, shifts)["energy"])
    # geometry hyperparams (cutoff/max_neighbors) are not in a state
    # dict — evaluate under the true cfg; weights are what converted
    e2 = float(mace_apply(params2, cfg, pos, nums, alive, shifts)["energy"])
    assert e1 == e2

    # npz and torch .pt loading paths
    np.savez(tmp_path / "sd.npz", **sd)
    p3, _ = load_mace_state_dict(tmp_path / "sd.npz", cfg)
    chex.assert_trees_all_close(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, p3))
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "sd.pt")
    p4, _ = load_mace_state_dict(tmp_path / "sd.pt", cfg)
    chex.assert_trees_all_close(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, p4))

    # official mace-package alias names for the 1:1 pieces
    sd_alias = dict(sd)
    sd_alias["node_embedding.linear.weight"] = sd_alias.pop("atom_embed")
    sd_alias["atomic_energies_fn.atomic_energies"] = sd_alias.pop("atom_ref")
    for t in range(cfg.n_layers):
        sd_alias[f"readouts.{t}.linear.weight"] = sd_alias.pop(
            f"layers.{t}.readout.weight")
        sd_alias[f"readouts.{t}.linear.bias"] = sd_alias.pop(
            f"layers.{t}.readout.bias")
    p5, _ = convert_mace_state_dict(sd_alias, cfg)
    chex.assert_trees_all_close(
        jax.tree.map(jnp.asarray, params), jax.tree.map(jnp.asarray, p5))

    # foreign keys with no counterpart are refused, not dropped
    sd_bad = dict(sd)
    sd_bad["interactions.0.conv_tp.weight"] = np.zeros((2, 2))
    with pytest.raises(ValueError, match="no counterpart"):
        convert_mace_state_dict(sd_bad, cfg)


def test_mace_equivariant_messages(lj_dataset):
    """equivariant_messages=True: vector/tensor node features are carried
    across layers through parity-even CG paths. The energy must stay exactly
    O(3)-invariant, forces must rotate covariantly, the new paths must be
    live (zeroing them changes the output), and the npz roundtrip must
    preserve the flag."""
    import dataclasses as _dc

    from surface_sampling_tpu.models.mace import (
        MACEConfig,
        init_mace,
        load_mace_npz,
        mace_apply,
        save_mace_npz,
    )

    structures, _, _ = lj_dataset
    cfg = MACEConfig(feat_dim=12, n_rbf=5, cutoff=6.0, n_layers=2,
                     max_neighbors=6, readout_hidden=8, l_max=2,
                     equivariant_messages=True)
    params = init_mace(jax.random.PRNGKey(7), cfg)
    pos = jnp.asarray(structures[0].positions, jnp.float32)
    nums = jnp.asarray(structures[0].numbers)
    alive = jnp.ones(len(nums), bool)
    shifts = jnp.zeros((1, 3))

    def energy(p):
        return mace_apply(params, cfg, p, nums, alive, shifts)["energy"]

    e0 = float(energy(pos))
    a, b = 0.7, 1.1
    rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    rx = np.array([[1.0, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    rot = jnp.asarray(rx @ rz, jnp.float32)
    e_r = float(energy(pos @ rot.T))
    assert np.isclose(e0, e_r, atol=2e-3), (e0, e_r)
    # parity: every CG path is a proper tensor, so mirrors are exact too
    e_m = float(energy(pos * jnp.asarray([-1.0, 1.0, 1.0])))
    assert np.isclose(e0, e_m, atol=2e-3), (e0, e_m)

    # force covariance: F(R x) == F(x) R^T
    f = jax.grad(energy)
    f0 = np.asarray(f(pos))
    f_r = np.asarray(f(pos @ rot.T))
    np.testing.assert_allclose(f_r, f0 @ np.asarray(rot).T, atol=5e-3)

    # liveness: the second layer must actually read the carried V features
    dead = jax.tree.map(lambda x: x, params)
    dead["layers"][1] = dict(dead["layers"][1])
    for k in ("w0v", "w1v", "w1t", "w2v", "w2t"):
        dead["layers"][1][k] = {"w": jnp.zeros_like(jnp.asarray(params["layers"][1][k]["w"]))}
    e_dead = float(mace_apply(dead, cfg, pos, nums, alive, shifts)["energy"])
    assert abs(e0 - e_dead) > 5e-7, "equivariant paths are dead"

    # roundtrip keeps the flag and the values
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = f"{td}/mace_eq.npz"
        save_mace_npz(p, params, cfg)
        params2, cfg2 = load_mace_npz(p)
        assert cfg2.equivariant_messages is True
        assert cfg2 == cfg
        e2 = float(mace_apply(params2, cfg2, pos, nums, alive, shifts)["energy"])
        assert np.isclose(e0, e2, atol=1e-6)

    # trainability of the full equivariant stack
    from surface_sampling_tpu.models.train import train_painn

    structures, energies, forces = lj_dataset
    batch = pad_structures(structures, energies, forces, cfg.cutoff)
    params, hist = train_painn(
        params, cfg, [batch], TrainConfig(epochs=40, learning_rate=3e-3),
        apply_fn=mace_apply,
    )
    assert hist[-1] < 0.8 * hist[0]


def test_mace_l3_invariance_and_liveness(lj_dataset):
    """l_max=3: rank-3 atomic basis. Energy must be invariant under a
    general rotation AND mirror (every added contraction is parity-even);
    the l=3 features must be live (differ from l_max=2 at shared seed
    semantics); forces stay covariant."""
    import dataclasses as _dc

    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply

    structures, _, _ = lj_dataset
    cfg3 = MACEConfig(feat_dim=12, n_rbf=5, cutoff=6.0, n_layers=2,
                      max_neighbors=6, readout_hidden=8, l_max=3)
    params3 = init_mace(jax.random.PRNGKey(5), cfg3)
    pos = jnp.asarray(structures[0].positions, jnp.float32)
    nums = jnp.asarray(structures[0].numbers)
    alive = jnp.ones(len(nums), bool)
    shifts = jnp.zeros((1, 3))

    def energy(p):
        return mace_apply(params3, cfg3, p, nums, alive, shifts)["energy"]

    e0 = float(energy(pos))
    a, b = 0.9, 0.4
    rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    rx = np.array([[1.0, 0, 0], [0, np.cos(b), -np.sin(b)], [0, np.sin(b), np.cos(b)]])
    rot = jnp.asarray(rx @ rz, jnp.float32)
    e_r = float(energy(pos @ rot.T))
    assert np.isclose(e0, e_r, atol=2e-3), (e0, e_r)
    e_m = float(energy(pos * jnp.asarray([1.0, -1.0, 1.0])))
    assert np.isclose(e0, e_m, atol=2e-3), (e0, e_m)

    # force covariance through the rank-3 contractions
    f = jax.grad(energy)
    f0 = np.asarray(f(pos))
    f_r = np.asarray(f(pos @ rot.T))
    np.testing.assert_allclose(f_r, f0 @ np.asarray(rot).T, atol=5e-3)

    # liveness: boosting the w3 path must change the energy (the init-scale
    # contribution is quadratic-small, so probe with amplified weights)
    boost = jax.tree.map(lambda x: x, params3)
    for li in range(2):
        boost["layers"][li] = dict(boost["layers"][li])
        boost["layers"][li]["w3"] = {
            "w": 10.0 * jnp.asarray(params3["layers"][li]["w3"]["w"])
        }
    e_boost = float(mace_apply(boost, cfg3, pos, nums, alive, shifts)["energy"])
    assert abs(e0 - e_boost) > 1e-5, "l=3 path is dead"

    # y3 is traceless on every index pair
    from surface_sampling_tpu.models.mace import _y3_tensor

    u = jnp.asarray(np.random.default_rng(0).normal(size=(7, 3)), jnp.float32)
    u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
    y3 = _y3_tensor(u)
    np.testing.assert_allclose(np.asarray(jnp.einsum("naab->nb", y3)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.einsum("naba->nb", y3)), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.einsum("nbaa->nb", y3)), 0.0, atol=1e-6)


def test_mptrj_magmom_finetune_path():
    """The MPtrj fine-tuning path end to end (reference
    json_dataset.py targets='efsm'): a directory of MPtrj JSON shards
    with magmom labels loads into magmom-carrying PaddedBatches, and
    TrainConfig(magmom_weight>0) trains the CHGNet magmom head — the
    magmom term must contribute to the loss and the step must reduce it."""
    import json as _json
    import tempfile
    from pathlib import Path

    from surface_sampling_tpu.models.chgnet import (
        CHGNetConfig,
        chgnet_apply,
        init_chgnet,
    )
    from surface_sampling_tpu.models.dataset import get_train_val_test_loader
    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn, train_painn

    rng = np.random.default_rng(0)
    cell = np.eye(3) * 6.0

    def frame(seed):
        r = np.random.default_rng(seed)
        pos = r.random((4, 3)) * 4.0 + 1.0
        return {
            "structure": {
                "lattice": {"matrix": cell.tolist()},
                "sites": [
                    {"species": [{"element": el}], "abc": (p / 6.0).tolist()}
                    for el, p in zip(["Mn", "O", "Mn", "O"], pos)
                ],
            },
            "energy_per_atom": float(-5.0 + 0.1 * r.standard_normal()),
            "force": (0.1 * r.standard_normal((4, 3))).tolist(),
            "magmom": [3.5, 0.1, 3.4, 0.05],
        }

    with tempfile.TemporaryDirectory() as td:
        for shard in range(2):
            frames = {f"{i}": frame(10 * shard + i) for i in range(3)}
            if shard == 1:
                del frames["2"]["magmom"]   # one UNLABELED frame (common in MPtrj)
            (Path(td) / f"shard{shard}.json").write_text(_json.dumps({
                f"mp-{shard}": frames
            }))
        cfg = CHGNetConfig(atom_fea_dim=16, bond_fea_dim=16, angle_fea_dim=16,
                           num_radial=7, num_angular=7, n_conv=1,
                           max_neighbors=24, max_bond_neighbors=8,
                           mlp_hidden_dims=(16, 16, 16))
        train, val, test = get_train_val_test_loader(
            td, cfg.atom_graph_cutoff, batch_size=3,
            train_ratio=0.67, val_ratio=0.16)
        assert train and train[0].magmoms is not None
        assert train[0].magmoms.shape == train[0].numbers.shape
        # unlabeled frames carry mask 0 so they cannot pull the magmom
        # head toward the zero padding
        all_masks = np.concatenate([b.magmom_mask for b in train + val + test])
        assert set(all_masks.tolist()) <= {0.0, 1.0}
        assert all_masks.sum() == len(all_masks) - 1

        params = init_chgnet(jax.random.PRNGKey(0), cfg)
        loss_m = make_loss_fn(cfg, TrainConfig(magmom_weight=0.5),
                              apply_fn=chgnet_apply)
        loss_0 = make_loss_fn(cfg, TrainConfig(magmom_weight=0.0),
                              apply_fn=chgnet_apply)
        import jax.numpy as jnp

        def dev(b):
            from surface_sampling_tpu.models.train import PaddedBatch
            return PaddedBatch(*[None if x is None else jnp.asarray(x) for x in b])

        lm, l0 = float(loss_m(params, dev(train[0]))), float(loss_0(params, dev(train[0])))
        assert np.isfinite(lm) and np.isfinite(l0) and lm > l0  # magmom term engaged

        new_params, hist = train_painn(
            params, cfg, train,
            TrainConfig(magmom_weight=0.5, epochs=3, learning_rate=3e-3),
            apply_fn=chgnet_apply)
        assert np.isfinite(hist[-1]) and hist[-1] < hist[0]


def test_mace_dense_routing_matches_gather():
    """MACE's "dense" message_mode (one one-hot MXU matmul routing every
    neighbor feature of a layer) must reproduce the "gather" formulation
    exactly — energies AND position-grads — in the fullest config (l_max=3
    + equivariant messages, so all 9 routed tensors are exercised)."""
    import dataclasses

    from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply

    rng = np.random.default_rng(4)
    n = 14
    cell = np.eye(3) * 7.5
    pos = rng.uniform(1.0, 6.5, (n, 3))
    nums = jnp.asarray(rng.integers(1, 30, n), jnp.int32)
    alive = jnp.asarray(rng.uniform(size=n) > 0.15)
    shifts = jnp.concatenate(
        [jnp.zeros((1, 3))]
        + [jnp.asarray(cell[None, i] * s, jnp.float32)
           for i in range(2) for s in (1, -1)])
    cfg_g = MACEConfig(feat_dim=16, n_rbf=6, cutoff=5.0, n_layers=2,
                       max_neighbors=10, l_max=3, equivariant_messages=True,
                       message_mode="gather")
    cfg_d = dataclasses.replace(cfg_g, message_mode="dense")
    params = init_mace(jax.random.PRNGKey(7), cfg_g)
    pos = jnp.asarray(pos, jnp.float32)

    def e_of(cfg):
        return lambda p: mace_apply(params, cfg, p, nums, alive, shifts)["energy"]

    e_g, g_g = jax.value_and_grad(e_of(cfg_g))(pos)
    e_d, g_d = jax.value_and_grad(e_of(cfg_d))(pos)
    np.testing.assert_allclose(float(e_g), float(e_d), rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_d),
                               rtol=1e-5, atol=1e-5)


def test_mace_static_table_matches_dynamic():
    """make_mace_potential(static_nbr=...) (the MC hot path: candidate-
    pair table instead of the all-image neighbor search) must match the
    dynamic path on realized slot geometries."""
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.core.static_neighbors import (
        build_static_neighbor_table,
    )
    from surface_sampling_tpu.models.mace import (
        MACEConfig,
        init_mace,
        make_mace_potential,
    )
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=1.8)["all"]
    cfg = MACEConfig(feat_dim=16, n_rbf=6, cutoff=5.0, n_layers=2,
                     max_neighbors=24)
    params = init_mace(jax.random.PRNGKey(2), cfg)
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29],
                     cutoff=cfg.cutoff, surface_name="cu_mace")
    tbl = build_static_neighbor_table(spec, cfg.cutoff, relax_slack=0.05)
    pot_dyn = make_mace_potential(params, cfg, [29])
    pot_tbl = make_mace_potential(params, cfg, [29], static_nbr=tbl)
    assert "mace_args" in pot_dyn.__dict__ and "mace_args" not in pot_tbl.__dict__

    from surface_sampling_tpu.core.state import device_spec

    d = device_spec(spec)
    rng = np.random.default_rng(0)
    for trial in range(3):
        ss = jnp.asarray(rng.integers(0, 2, spec.n_sites), jnp.int32)
        pos = realize_positions(d, ss)
        ti = realize_type_idx(d, ss)
        alive = realize_alive(d, ss)
        e_d = float(pot_dyn.energy(pos, ti, alive, d.shifts))
        e_t = float(pot_tbl.energy(pos, ti, alive, d.shifts))
        np.testing.assert_allclose(e_d, e_t, rtol=1e-6, atol=1e-5)


def test_loss_fn_resolves_pallas_routing_for_double_grad():
    """The force loss is a second-order derivative (grad-of-grad through
    the energy); both fused families carry second-order custom VJPs
    (PaiNN: the fused bwd2 kernel; CHGNet: _conv_bwd_op's XLA double-VJP)
    so explicit "pallas" modes must survive make_loss_fn and produce
    finite grads. Regression for the TPU-only failure ('Linearization
    failed ... does not support reverse-mode autodiff') that CPU tests
    could not see while "auto" resolved to "gather" there."""
    from surface_sampling_tpu.models.chgnet import CHGNetConfig, chgnet_apply, init_chgnet
    from surface_sampling_tpu.models.train import PaddedBatch, make_loss_fn

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 4.0, (1, 6, 3)), jnp.float32)
    numbers = jnp.full((1, 6), 18, jnp.int32)
    shifts = jnp.zeros((1, 1, 3))
    batch = PaddedBatch(pos, numbers, shifts,
                        jnp.zeros(1), jnp.zeros((1, 6, 3)))

    cfg = PaiNNConfig(feat_dim=8, n_rbf=4, cutoff=6.0, n_layers=1,
                      readout_hidden=8, max_neighbors=5,
                      message_mode="pallas")
    loss_fn = make_loss_fn(cfg, TrainConfig())
    params = init_painn(jax.random.PRNGKey(0), cfg)
    g = jax.grad(loss_fn)(params, batch)
    chex.assert_tree_all_finite(g)

    ccfg = CHGNetConfig(atom_fea_dim=8, bond_fea_dim=8, angle_fea_dim=8,
                        n_conv=1, conv_mode="pallas")
    closs = make_loss_fn(ccfg, TrainConfig(), apply_fn=chgnet_apply)
    cparams = init_chgnet(jax.random.PRNGKey(1), ccfg)
    cg = jax.grad(closs)(cparams, batch)
    chex.assert_tree_all_finite(cg)
