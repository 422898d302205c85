"""Measure MC energy-evaluation throughput for every model family on the
current device (TPU by default; the CI/driver headline stays bench.py).

Each row: one prebuilt system (systems.py), vmapped over a chain batch
sized to the family's memory footprint, timing steady-state jitted
surface-energy evaluations (the unit cost of the MC hot loop — SURVEY §6
cost model). Writes JSON lines; docs/BENCHMARKS.md holds the curated
table.

Usage:  python tools/bench_all.py [--families cu100_rigid,painn,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _throughput(run, n_chains: int, iters: int = 3) -> dict:
    from surface_sampling_tpu.parallel import chain_states

    f = jax.jit(jax.vmap(lambda ss: run.state_energy_fn(ss).surface_energy))
    states = chain_states(run.d, jax.random.PRNGKey(0), n_chains)
    ss = states.site_state
    t0 = time.perf_counter()
    r = f(ss)
    r.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(ss)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return {
        "chains": n_chains,
        "evals_per_sec": round(n_chains / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }


def bench_cu100_rigid():
    from surface_sampling_tpu.core import MCMCRun
    from surface_sampling_tpu.potentials import builtin_eam
    from surface_sampling_tpu.potentials.eam import make_eam_rigid
    from surface_sampling_tpu.systems import cu100_eam

    sys = cu100_eam(fast=True)
    run = MCMCRun(sys.spec, make_eam_rigid(builtin_eam("Cu_u3"), sys.spec))
    return _throughput(run, 16384, iters=10)


def bench_cu100_pallas():
    from surface_sampling_tpu.core import MCMCRun
    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
    from surface_sampling_tpu.ops.pallas_eam import make_eam_pallas_potential
    from surface_sampling_tpu.potentials import builtin_eam
    from surface_sampling_tpu.systems import cu100_eam

    sys = cu100_eam(fast=True)
    tables = builtin_eam("Cu_u3")
    nbr = build_static_neighbor_table(sys.spec, tables.cutoff, relax_slack=0.05)
    run = MCMCRun(sys.spec, make_eam_pallas_potential(tables, nbr))
    return _throughput(run, 8192, iters=10)


def bench_au110_rigid():
    from surface_sampling_tpu.systems import au110_eam

    return _throughput(au110_eam(fast=True).run, 8192)


def bench_au110_canonical():
    from surface_sampling_tpu.systems import au110_eam

    # exact-spline EAM path (the Au regression physics); modest chain count
    # because the spline-gather program compiles slowly at large batches
    return _throughput(au110_eam().run, 1024, iters=10)


def bench_gan_tersoff():
    from surface_sampling_tpu.systems import gan0001_tersoff

    return _throughput(gan0001_tersoff(size=(2, 2), layers=3).run, 512)


def bench_gan_tersoff_rigid():
    from surface_sampling_tpu.core import MCMCRun
    from surface_sampling_tpu.potentials import builtin_tersoff, make_tersoff_rigid
    from surface_sampling_tpu.systems import gan0001_tersoff

    sys = gan0001_tersoff(size=(2, 2), layers=3)
    run = MCMCRun(sys.spec, make_tersoff_rigid(builtin_tersoff("GaN_nord2003"), sys.spec))
    return _throughput(run, 8192, iters=10)


def bench_gan_relaxed():
    """GaN Tersoff with the reference tutorial's relax-per-move policy
    (GaN_0001.ipynb: LAMMPS minimize, relax_steps budget) — FIRE on
    device, fixed edge topology per relaxation."""
    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.systems import gan0001_tersoff

    sys = gan0001_tersoff(size=(2, 2), layers=3,
                          relax=RelaxConfig(steps=20, fmax=0.01))
    return _throughput(sys.run, 64)


def bench_si_sw():
    from surface_sampling_tpu.systems import si111_sw

    return _throughput(si111_sw().run, 512)


def bench_si_relaxed():
    """Si(111) 5x5 SW with relax-per-move (tutorial: cg minimize under
    the relax model) — FIRE on device, fixed edge topology."""
    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.systems import si111_sw

    sys = si111_sw(relax=RelaxConfig(steps=20, fmax=0.01))
    return _throughput(sys.run, 64)


def bench_si_sw_rigid():
    from surface_sampling_tpu.core import MCMCRun
    from surface_sampling_tpu.potentials import make_sw_rigid, sw_tables
    from surface_sampling_tpu.systems import si111_sw

    sys = si111_sw()
    run = MCMCRun(sys.spec, make_sw_rigid(sw_tables(), sys.spec))
    return _throughput(run, 2048, iters=10)


def bench_painn():
    from surface_sampling_tpu.systems import srtio3_001_painn

    return _throughput(srtio3_001_painn().run, 128)


def bench_painn_relaxed():
    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys = srtio3_001_painn(relax=RelaxConfig(steps=20, fmax=0.01))
    return _throughput(sys.run, 16)


def bench_mace():
    """MACE-family MC throughput (random-init weights — the reference
    ships none; shapes/architecture are what costs): Cu(100) slab,
    l_max=2 invariant model, dense one-hot routing on TPU."""
    from surface_sampling_tpu.core import MCMCRun, make_spec
    from surface_sampling_tpu.models.mace import (
        MACEConfig,
        init_mace,
        make_mace_potential,
    )
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites

    from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table

    slab = fcc100("Cu", size=(3, 3, 3), a=3.6147, vacuum=12.0)
    sites = find_adsorption_sites(slab, planar_distance=1.8)["all"]
    cfg = MACEConfig(feat_dim=64, n_rbf=8, cutoff=5.0, n_layers=2,
                     max_neighbors=48)
    params = init_mace(jax.random.PRNGKey(0), cfg)
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29],
                     cutoff=cfg.cutoff, surface_name="Cu_100_mace")
    nbr = build_static_neighbor_table(spec, cfg.cutoff, relax_slack=0.1)
    pot = make_mace_potential(params, cfg, [29], static_nbr=nbr)
    return _throughput(MCMCRun(spec, pot), 64)


def bench_chgnet():
    from surface_sampling_tpu.systems import lamno3_001_chgnet

    return _throughput(lamno3_001_chgnet().run, 64)


def _train_throughput(params, cfg, loss_fn, slab_npz, batch_size, iters):
    """Shared fine-tune-step timer: B jittered frames of the fixture slab,
    energy+force loss -> grads through the fused kernels' custom VJPs ->
    one adam update. Unit: training structures/s (labels are synthetic;
    shapes are what costs)."""
    import numpy as np
    import optax

    from surface_sampling_tpu.models.train import pad_structures
    from surface_sampling_tpu.structure.atoms import Structure

    cutoff = getattr(cfg, "cutoff", None) or cfg.atom_graph_cutoff
    data = np.load(slab_npz)
    rng = np.random.default_rng(0)
    structures, energies, forces = [], [], []
    for _ in range(batch_size):
        pos = data["positions"] + rng.normal(0, 0.03, data["positions"].shape)
        structures.append(Structure(data["numbers"], pos, data["cell"]))
        energies.append(0.0)
        forces.append(np.zeros_like(pos))
    batch = pad_structures(structures, energies, forces, cutoff)
    batch = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32)
                         if x.dtype.kind == "f" else jnp.asarray(x), batch)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        loss, g = jax.value_and_grad(loss_fn)(params, batch)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, batch)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters
    return {
        "chains": batch_size,
        "evals_per_sec": round(batch_size / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }


def bench_painn_train(batch_size: int = 16, iters: int = 10):
    """PaiNN fine-tune step throughput on the flagship SrTiO3 slab."""
    from pathlib import Path

    from surface_sampling_tpu.models.convert_nff import load_params_npz
    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn
    import surface_sampling_tpu.systems as systems

    base = Path(systems.__file__).parent
    params, cfg = load_params_npz(base / "models" / "data" / "srtio3_painn_01.npz")
    loss_fn = make_loss_fn(cfg, TrainConfig())
    return _train_throughput(params, cfg, loss_fn,
                             base / "systems_data" / "SrTiO3_001_2x2.npz",
                             batch_size, iters)


def bench_chgnet_train(batch_size: int = 8, iters: int = 10):
    """CHGNet fine-tune step throughput on the LaMnO3 slab (efm targets)."""
    from pathlib import Path

    from surface_sampling_tpu.models.chgnet import chgnet_apply
    from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn
    import surface_sampling_tpu.systems as systems

    base = Path(systems.__file__).parent
    params, cfg = load_chgnet_npz(base / "models" / "data" / "lamno3_chgnet.npz")
    loss_fn = make_loss_fn(cfg, TrainConfig(), apply_fn=chgnet_apply)
    return _train_throughput(params, cfg, loss_fn,
                             base / "systems_data" / "LaMnO3_001_2x2x3.npz",
                             batch_size, iters)


FAMILIES = {
    "cu100_rigid": bench_cu100_rigid,
    "cu100_pallas": bench_cu100_pallas,
    "au110_canonical": bench_au110_canonical,
    "au110_rigid": bench_au110_rigid,
    "gan_tersoff": bench_gan_tersoff,
    "gan_tersoff_rigid": bench_gan_tersoff_rigid,
    "gan_relaxed": bench_gan_relaxed,
    "si_sw": bench_si_sw,
    "si_relaxed": bench_si_relaxed,
    "si_sw_rigid": bench_si_sw_rigid,
    "painn": bench_painn,
    "painn_relaxed": bench_painn_relaxed,
    "painn_train": bench_painn_train,
    "chgnet": bench_chgnet,
    "chgnet_train": bench_chgnet_train,
    "mace": bench_mace,
}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    args = ap.parse_args(argv)
    for name in args.families.split(","):
        name = name.strip()
        if not name:
            continue
        try:
            row = FAMILIES[name]()
            row["family"] = name
            row["platform"] = jax.devices()[0].platform
        except Exception as e:  # noqa: BLE001 - report and continue
            row = {"family": name, "error": str(e)[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
