"""Tests for utils (logging/folders/schedules/plots) and checkpointing."""

import logging

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.io import load_checkpoint, save_checkpoint
from surface_sampling_tpu.utils import (
    SilenceLogger,
    create_anneal_schedule,
    setup_folders,
    setup_logger,
)
from surface_sampling_tpu.utils.sampling import per_chain_schedules


def test_setup_logger_and_silence(tmp_path, capsys):
    log = setup_logger("t1", tmp_path / "mc.log")
    log.info("hello")
    assert "hello" in (tmp_path / "mc.log").read_text()
    with SilenceLogger():
        log.info("muted")
    assert "muted" not in (tmp_path / "mc.log").read_text()


def test_setup_folders(tmp_path):
    p = setup_folders("CuTest", canonical=True, total_sweeps=5, base_dir=tmp_path)
    assert p.exists()
    assert p.name.endswith("_canonical")
    assert "sweeps_5" in p.name
    p2 = setup_folders("CuTest", base_dir=tmp_path)
    assert p2.name.endswith("_semigrand")


def test_anneal_schedule_geometric(tmp_path):
    t = create_anneal_schedule(1.0, 10, alpha=0.9, save_folder=tmp_path)
    assert len(t) == 10
    assert np.allclose(t, 0.9 ** np.arange(10))
    assert (tmp_path / "anneal_schedule.csv").exists()


def test_anneal_schedule_multiple():
    t = create_anneal_schedule(0.2, 600, multiple_anneal=True)
    assert len(t) == 600
    assert t.min() >= 0.079
    assert t.max() <= 0.2 + 1e-9


def test_per_chain_schedules():
    m = per_chain_schedules(4, 6, 1.0, 0.9, stagger=0.5)
    assert m.shape == (4, 6)
    assert m[3, 0] > m[0, 0]


def test_checkpoint_roundtrip_exact_resume(tmp_path):
    """Resuming from a checkpoint must continue the exact PRNG stream."""
    from surface_sampling_tpu.core import EngineConfig, make_run_fn
    from surface_sampling_tpu.systems import cu100_eam

    sys = cu100_eam()
    cfg = EngineConfig(sweep_size=3, record_positions=False)
    run_fn = jax.jit(make_run_fn(sys.run.d, sys.run.state_energy_fn, cfg))
    temps = jnp.asarray([1.0, 0.8, 0.6, 0.5], jnp.float32)

    state0 = sys.run.init_state(jax.random.PRNGKey(0))
    # run 2 sweeps, checkpoint, run 2 more
    s_mid, _ = run_fn(state0, temps[:2])
    save_checkpoint(tmp_path / "ck.npz", s_mid, 2, np.asarray(temps))
    s_loaded, sweep_idx, temps_back, _ = load_checkpoint(tmp_path / "ck.npz")
    assert sweep_idx == 2
    s_direct, rec_direct = run_fn(s_mid, temps[2:])
    s_resumed, rec_resumed = run_fn(s_loaded, jnp.asarray(temps_back[2:], jnp.float32))
    np.testing.assert_array_equal(
        np.asarray(s_direct.site_state), np.asarray(s_resumed.site_state)
    )
    np.testing.assert_allclose(
        np.asarray(rec_direct.energy), np.asarray(rec_resumed.energy), rtol=1e-6
    )


def test_plots_render(tmp_path):
    from surface_sampling_tpu.utils.plot import (
        plot_anneal_schedule,
        plot_atom_type_histograms,
        plot_clustering_results,
        plot_decay_curve,
        plot_distance_weight_matrix,
        plot_energy_analysis,
        plot_specific_weights,
        plot_summary_stats,
    )

    e = np.random.rand(10)
    plot_summary_stats(e, e, (e * 5).astype(int), 10, save_folder=tmp_path)
    plot_energy_analysis(e, e, save_folder=tmp_path)
    plot_anneal_schedule(e, save_folder=tmp_path)
    plot_atom_type_histograms({"O": np.random.randint(0, 4, 20)}, save_folder=tmp_path)
    plot_clustering_results(np.random.rand(20, 2), 3, np.random.randint(1, 4, 20),
                            save_folder=tmp_path)
    plot_distance_weight_matrix(np.random.rand(5, 5), save_folder=tmp_path)
    plot_decay_curve(np.random.rand(10), np.random.rand(10), save_folder=tmp_path)
    plot_specific_weights(np.random.rand(6, 3), np.random.rand(6), 2, save_folder=tmp_path)
    assert (tmp_path / "summary_stats.png").exists()
    assert (tmp_path / "clustering_results.png").exists()


def test_phase_timer_and_block_and_time():
    import time as _time

    from surface_sampling_tpu.utils.tracing import PhaseTimer, block_and_time

    t = PhaseTimer()
    with t.phase("a"):
        _time.sleep(0.01)
    with t.phase("a"):
        _time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2
    assert t.phases["a"] >= 0.02
    assert "a:" in t.report() and "b:" in t.report()

    out, dt = block_and_time(lambda x: jnp.sum(x * 2), jnp.ones(16))
    assert float(out) == 32.0
    assert dt >= 0


def test_preprocess_traj_layer_trimming(tmp_path):
    """Trim bottom 1 layer from a 3-layer slab: atom count drops by one
    layer, remaining structure shifts down by the interlayer spacing
    (reference mcmc/uncertainty/utils.py preprocess_traj behavior)."""
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.utils.misc import group_layers_with_indices, preprocess_traj

    a = 3.6147
    slab = fcc100("Cu", size=(2, 2, 3), a=a, vacuum=10.0)
    layer_z, layer_idx = group_layers_with_indices(slab.positions[:, 2])
    assert len(layer_z) == 3
    assert all(len(i) == 4 for i in layer_idx)

    (red,) = preprocess_traj([slab], z_cutoff=1)
    assert len(red) == 8
    # bottom of the trimmed slab sits where the original bottom layer was
    assert np.isclose(red.positions[:, 2].min(), slab.positions[:, 2].min())
    # z-sort only when z_cutoff is None
    (srt,) = preprocess_traj([slab])
    assert len(srt) == 12
    assert np.all(np.diff(srt.positions[:, 2]) >= -1e-12)
    with np.testing.assert_raises(ValueError):
        preprocess_traj([slab], z_cutoff=3)


def test_clustering_dataset_center_mask():
    """make_clustering_dataset pads center indices into a mask that
    restricts get_embedding pooling to the selected atoms."""
    from surface_sampling_tpu.models.dataset import (
        make_clustering_dataset,
        make_uncertainty_dataset,
    )
    from surface_sampling_tpu.models.prediction import get_embedding
    from surface_sampling_tpu.structure import bulk

    sts = [bulk("Cu", "fcc", 3.6), bulk("Au", "fcc", 4.08).repeat((2, 1, 1))]
    batch, mask = make_clustering_dataset(sts, [[0, 1], [2]], cutoff=4.0)
    assert batch.numbers.shape == (2, 8)
    assert mask.sum() == 3 and mask[0, 0] and mask[0, 1] and mask[1, 2]
    ub = make_uncertainty_dataset(sts, cutoff=4.0)
    assert np.allclose(ub.energy, 0.0)
    # fake per-atom embeddings: pooled value = mean over masked atoms only
    emb = np.arange(2 * 8 * 1, dtype=float).reshape(2, 8, 1)
    pooled = get_embedding({"embedding": emb}, batch.numbers, center_mask=mask)
    assert np.isclose(pooled[0, 0], (0 + 1) / 2)
    assert np.isclose(pooled[1, 0], emb[1, 2, 0])


def test_plot_surfaces(tmp_path):
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.utils.plot import plot_surfaces

    slabs = [fcc100("Cu", size=(2, 2, 2), a=3.6, vacuum=8.0) for _ in range(3)]
    plot_surfaces(slabs, save_folder=tmp_path)
    assert (tmp_path / "surfaces.png").exists()
