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


def _slots_of(run) -> int:
    d = run.d
    return int(d.pristine_positions.shape[0]
               + d.site_coords.shape[0] * d.code_offsets.shape[1])


def _throughput(run, n_chains: int, iters: int = 3) -> dict:
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )
    from surface_sampling_tpu.parallel import chain_states

    f = jax.jit(jax.vmap(lambda ss: run.state_energy_fn(ss).surface_energy),
                compiler_options=scoped_vmem_compiler_options(
                    _slots_of(run),
                    relax_banded=getattr(run, "relax", None) is not None))
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


def bench_painn_super(supercell, n_chains, banded=True):
    """Supercell flagship rows (SURVEY §5.7's scaling axis). ``banded``
    toggles the block-banded fused routing (ops/banding.py) the system
    builder enables by default — banded=False measures the unbanded
    kernel for the docs comparison."""
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys = srtio3_001_painn(supercell=supercell)
    if not banded:
        # rebuild the potential without the routing band
        import dataclasses as _dc
        import json as _json
        from pathlib import Path

        import surface_sampling_tpu.systems as systems_mod
        from surface_sampling_tpu.core import MCMCRun, make_offset_surface_energy
        from surface_sampling_tpu.core.static_neighbors import (
            build_static_neighbor_table,
        )
        from surface_sampling_tpu.models.convert_nff import load_params_npz
        from surface_sampling_tpu.models.ensemble import stack_params
        from surface_sampling_tpu.models.nn_calculator import make_painn_potential

        base = Path(systems_mod.__file__).parent
        plist, cfg = [], None
        for i in range(1, 4):
            p, cfg = load_params_npz(base / "models" / "data" / f"srtio3_painn_{i:02d}.npz")
            plist.append(p)
        cfg = _dc.replace(cfg, max_neighbors=64)
        offset_data = _json.loads((base / "systems_data" / "srtio3_offset_data.json").read_text())
        nbr = build_static_neighbor_table(sys.spec, cfg.cutoff, relax_slack=0.1)
        pot = make_painn_potential(
            stack_params(plist), cfg, [38, 22, 8], units="kcal/mol",
            ensemble=True, stoidict=offset_data["stoidict"], static_nbr=nbr)
        se_fn = make_offset_surface_energy(sys.spec, {"Sr": -2.0, "Ti": 0.0, "O": 0.0},
                                           offset_data, offset_units="atomic")
        run = MCMCRun(sys.spec, pot, surface_energy_fn=se_fn)
        return _throughput(run, n_chains)
    return _throughput(sys.run, n_chains)


def bench_painn_super_inc(supercell, n_chains, sweep_size=32, n_sweeps=4):
    """Delta-locality MC throughput (core/incremental.py): steps/s of the
    cached-feature semigrand chain, where a move recomputes only its
    hop-ball blocks via the subset-grid banded kernel. The comparable
    full-path number is the same cell's evals_per_sec row — incremental
    steps/s should stay roughly flat with cell size at fixed density
    (VERDICT round-2 item 3)."""
    import numpy as np

    from surface_sampling_tpu.core.incremental import (
        make_incremental_painn_from_system,
        make_incremental_run,
        make_incremental_semigrand_step,
    )
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys = srtio3_001_painn(supercell=supercell)
    eng = make_incremental_painn_from_system(sys)
    step = make_incremental_semigrand_step(eng)
    vmem_opts = scoped_vmem_compiler_options(_slots_of(sys.run))
    run = jax.jit(jax.vmap(make_incremental_run(step, sweep_size),
                           in_axes=(0, None)),
                  compiler_options=vmem_opts)
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    rng = np.random.default_rng(0)
    ss0 = jnp.asarray(
        rng.integers(0, eng.n_codes, (n_chains, eng.n_sites)), jnp.int32)
    # init must be jitted WITH the vmem options too: eagerly-dispatched
    # pallas calls compile under the default 16 MB scoped-vmem limit,
    # which the 4x4 cell's full-grid banded kernel exceeds
    states = jax.jit(jax.vmap(eng.init_state),
                     compiler_options=vmem_opts)(keys, ss0)
    temps = jnp.full((n_sweeps,), 0.8, jnp.float32)
    t0 = time.perf_counter()
    out, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    compile_s = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        out, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    dt = (time.perf_counter() - t0) / iters
    steps = n_chains * sweep_size * n_sweeps
    return {
        "chains": n_chains,
        "steps_per_sec": round(steps / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }


def bench_painn_bf16(supercell=(1, 1), n_chains=128, n_states=128):
    """Single-pass pure-bf16 routing opt-in (ops/pallas_routing.py
    "bf16"): ~2x on the routing dots — the guarded high-temperature speed
    mode. Also measures the error artifact for the opt-in over a DIVERSE
    batch of random occupancies (coverage 5-35%, every state distinct),
    split by the geometric hard-wall filter (the same 1.5 A
    `make_distance_accept` predicate `metropolis_distance` applies):

    * PHYSICAL states (pass the filter): abs/spread of e_fast - e_ref —
      what the Metropolis dE actually sees when the opt-in is on.
    * OVERLAP states (fail the filter): their energies are NN
      extrapolation + exclusion-volume artifacts in BOTH modes; they only
      need to stay rejected. `overlap_min_efast_eV` vs `phys_max_eref_eV`
      is the over-reject check: the fast mode never maps an
      overlap state into (or below) the physical energy window.
    """
    import numpy as np

    from surface_sampling_tpu.core.events import make_distance_accept
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys_fast = srtio3_001_painn(supercell=supercell, pallas_routing="bf16")
    row = _throughput(sys_fast.run, n_chains)
    sys_ref = srtio3_001_painn(supercell=supercell)
    f_fast = jax.jit(jax.vmap(
        lambda ss: sys_fast.run.state_energy_fn(ss).surface_energy))
    f_ref = jax.jit(jax.vmap(
        lambda ss: sys_ref.run.state_energy_fn(ss).surface_energy))
    d = sys_ref.run.d
    S, n_codes = d.site_coords.shape[0], d.n_codes
    rng = np.random.default_rng(0)
    # coverage window scaled so a useful fraction of draws passes the
    # hard-wall filter at any cell size (pass probability falls roughly
    # exponentially in the expected number of close site pairs ~ S)
    cov_hi = min(0.35, 0.35 * 64.0 / S)
    cov = rng.uniform(0.01, cov_hi, (n_states, 1))
    codes = rng.integers(1, n_codes, (n_states, S))
    ss = jnp.asarray(np.where(rng.random((n_states, S)) < cov, codes, 0),
                     jnp.int32)
    dist_ok = np.asarray(jax.jit(jax.vmap(make_distance_accept(d, 1.5)))(ss))
    e_fast = np.concatenate([np.asarray(f_fast(ss[i:i + n_chains]))
                             for i in range(0, n_states, n_chains)])
    e_ref = np.concatenate([np.asarray(f_ref(ss[i:i + n_chains]))
                            for i in range(0, n_states, n_chains)])
    err = e_fast - e_ref
    # sanity window RELATIVE to the pristine surface energy — supercell
    # absolute values carry the stoidict per-structure intercept
    # (systems.py srtio3_001_painn docstring), so an absolute window
    # would reject every supercell state
    e0 = float(np.asarray(f_ref(jnp.zeros((1, S), jnp.int32))[0]))
    phys = dist_ok & (np.abs(e_ref - e0) < 500.0)
    row["n_phys"] = int(phys.sum())
    row["n_states"] = n_states
    if phys.any():
        dp = err[phys]
        row["abs_err_mean_eV"] = round(float(np.abs(dp).mean()), 5)
        row["abs_err_max_eV"] = round(float(np.abs(dp).max()), 5)
        # state-to-state spread (what Metropolis dE actually sees)
        row["err_spread_eV"] = round(float(dp.std()), 5)
    if (~phys).any():
        # parity-of-failure: BOTH routings map overlap states to
        # unphysical NN-extrapolation energies (can be hugely negative) —
        # the guard is the geometric prior / relaxation, not the energy,
        # in the exact mode just as in the fast mode
        row["overlap_min_efast_eV"] = round(float(e_fast[~phys].min()), 3)
        row["overlap_min_eref_eV"] = round(float(e_ref[~phys].min()), 3)
        row["phys_max_eref_eV"] = round(float(e_ref[phys].max()), 3)
    return row


def bench_painn_relaxed(supercell=(1, 1), n_chains=16):
    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys = srtio3_001_painn(supercell=supercell,
                           relax=RelaxConfig(steps=20, fmax=0.01))
    return _throughput(sys.run, n_chains)


def bench_painn_localrelax(supercell=(1, 1), n_chains=16, hops=1,
                           sweep_size=8, n_sweeps=2):
    """Warm-started ball-local relaxation MC (core/local_relax.py): full
    MC moves/s where each move FIRE-relaxes only the moved site's hop
    ball from the chain's carried relaxed geometry (vs the full path's
    fixed 20-step budget over every free atom from ideal positions —
    bench_painn_relaxed). States feed forward between timing iterations
    so the measurement reflects the warm steady state."""
    import numpy as np

    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.core.local_relax import (
        build_ball_masks,
        make_local_relax_eval,
        make_local_relax_run,
        make_local_relax_semigrand_step,
    )
    from surface_sampling_tpu.core.static_neighbors import (
        build_static_neighbor_table,
    )
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )
    from surface_sampling_tpu.parallel import chain_states
    from surface_sampling_tpu.systems import srtio3_001_painn

    relax = RelaxConfig(steps=20, fmax=0.01)
    # build with relax semantics: the potential's candidate table needs
    # the relax slack (0.6 A) — relaxed displacements escape the rigid
    # 0.1 A table (the CLI assembly does the same, cli/common.py)
    sys_ = srtio3_001_painn(supercell=supercell, relax=relax)
    d = sys_.run.d
    nbr = build_static_neighbor_table(sys_.spec, 5.0, relax_slack=0.6)
    balls = build_ball_masks(sys_.spec, nbr, hops=hops)
    evaluate = make_local_relax_eval(
        d, sys_.potential, surface_energy_fn=sys_.run.surface_energy_fn,
        relax=relax, ball_masks=balls)
    step = make_local_relax_semigrand_step(d, evaluate)
    run = jax.jit(jax.vmap(
        make_local_relax_run(step, sweep_size, record_positions=False),
        in_axes=(0, None)),
        compiler_options=scoped_vmem_compiler_options(
            _slots_of(sys_.run), relax_banded=True))
    states = chain_states(d, jax.random.PRNGKey(0), n_chains)
    temps = jnp.full((n_sweeps,), 0.8, jnp.float32)
    t0 = time.perf_counter()
    states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    compile_s = time.perf_counter() - t0
    # warm-up sweeps: let the chains relax their way to the steady state
    for _ in range(2):
        states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    dt = (time.perf_counter() - t0) / iters
    moves = n_chains * sweep_size * n_sweeps
    return {
        "chains": n_chains,
        "moves_per_sec": round(moves / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }


def _ff_parts(supercell, hops, seat=False, **eval_kw):
    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.core.ff_relax import (
        build_ff_tables,
        make_ff_relax_eval,
    )
    from surface_sampling_tpu.core.static_neighbors import (
        build_static_neighbor_table,
    )
    from surface_sampling_tpu.systems import srtio3_001_painn

    relax = RelaxConfig(steps=20, fmax=0.01)
    sys_ = srtio3_001_painn(supercell=supercell, relax=relax)
    d = sys_.run.d
    nbr = build_static_neighbor_table(sys_.spec, 5.0, relax_slack=0.6)
    tables = build_ff_tables(sys_.spec, nbr, hops=hops)
    seat_tables = build_ff_tables(sys_.spec, nbr, hops=0) if seat else None
    evaluate = make_ff_relax_eval(
        d, sys_.potential, surface_energy_fn=sys_.run.surface_energy_fn,
        relax=relax, tables=tables, seat_tables=seat_tables, **eval_kw)
    return sys_, d, relax, tables, evaluate


def bench_painn_ffrelax(supercell=(1, 1), n_chains=16, hops=1,
                        sweep_size=8, n_sweeps=2):
    """Frozen-far-field approximate-descent relax MC (core/ff_relax.py):
    full MC moves/s where the per-move FIRE descends a compact ball
    subproblem against frozen far-field features, and acceptance is a
    full-cell evaluation of the relaxed geometry. The comparable exact
    rows are painn_relaxed / painn_localrelax (same cell, same chains);
    the policy-divergence bound comes from bench_painn_ffdiv."""
    from surface_sampling_tpu.core.ff_relax import make_ff_run_mcstate, \
        make_ff_semigrand_step
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )
    from surface_sampling_tpu.parallel import chain_states

    sys_, d, relax, tables, evaluate = _ff_parts(supercell, hops)
    step = make_ff_semigrand_step(d, evaluate)
    run = jax.jit(jax.vmap(
        make_ff_run_mcstate(evaluate, step, sweep_size,
                            record_positions=False),
        in_axes=(0, None)),
        compiler_options=scoped_vmem_compiler_options(
            _slots_of(sys_.run), relax_banded=True))
    states = chain_states(d, jax.random.PRNGKey(0), n_chains)
    temps = jnp.full((n_sweeps,), 0.8, jnp.float32)
    t0 = time.perf_counter()
    states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        states, rec = run(states, temps)
    jax.block_until_ready(rec.energy)
    dt = (time.perf_counter() - t0) / iters
    moves = n_chains * sweep_size * n_sweeps
    return {
        "chains": n_chains,
        "moves_per_sec": round(moves / dt, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "compile_s": round(compile_s, 1),
        "n_ball": tables.n_ball,
        "n_sub": tables.n_sub,
        "ball_frac": round(tables.ball_frac, 4),
    }


def bench_painn_ffdiv(supercell=(2, 2), n_chains=8, hops=1, n_moves=48,
                      temp=0.8, rigid_seed=False):
    """Policy-divergence bound of the frozen-far-field descent vs the
    EXACT warm-started relax path (core/local_relax.py with a full-cell
    ball), measured per-move on identical states: both engines evaluate
    every proposal from the same pre-move state with the same keys; the
    chain advances along the EXACT trajectory. Reported: accepted-move
    overlap, |dSE| stats on in-bounds moves, and the relaxed-geometry
    RMSD over moved (free) rows."""
    import numpy as np

    from surface_sampling_tpu.core.events import metropolis_accept
    from surface_sampling_tpu.core.ff_relax import FFState, make_ff_init
    from surface_sampling_tpu.core.local_relax import make_local_relax_eval
    from surface_sampling_tpu.core.state import change_site
    from surface_sampling_tpu.ops.pallas_painn import (
        scoped_vmem_compiler_options,
    )

    sys_, d, relax, tables, evaluate = _ff_parts(supercell, hops)
    spec = sys_.spec
    N = int(np.asarray(d.pristine_positions).shape[0]
            + spec.n_sites * spec.group_size)
    balls_full = np.ones((spec.n_sites, N), bool)
    ex_eval = make_local_relax_eval(
        d, sys_.potential, surface_energy_fn=sys_.run.surface_energy_fn,
        relax=relax, ball_masks=balls_full)
    n_sites, n_codes = spec.n_sites, spec.n_codes

    def combined(state: FFState, _):
        key, k_site, k_code, k_acc = jax.random.split(state.key, 4)
        site = jax.random.randint(k_site, (), 0, n_sites)
        cur = state.site_state[site]
        u = jax.random.randint(k_code, (), 0, n_codes - 1)
        end = u + (u >= cur).astype(u.dtype)
        trial_ss = change_site(state.site_state, site, end)
        e_ff, _ = evaluate.evaluate1(
            trial_ss, state.relaxed_positions,
            (state.cache_s, state.cache_v), site)
        e_ex = ex_eval(trial_ss, state.relaxed_positions,
                       jnp.stack([site, site]).astype(jnp.int32))
        acc_ff = metropolis_accept(k_acc, state.energy,
                                   e_ff.surface_energy, temp)
        acc_ex = metropolis_accept(k_acc, state.energy,
                                   e_ex.surface_energy, temp)
        # advance along the exact trajectory; caches refreshed at its
        # geometry so the next move's FF comparison starts clean
        new_ss = jnp.where(acc_ex, trial_ss, state.site_state)
        new_pos = jnp.where(acc_ex, e_ex.positions, state.relaxed_positions)
        stx, caches = evaluate.finish(new_pos, new_ss)
        new_state = FFState(
            site_state=new_ss,
            energy=jnp.where(acc_ex, e_ex.surface_energy, state.energy),
            relaxed_positions=new_pos, key=key,
            cache_s=caches[0], cache_v=caches[1])
        free = jnp.any(e_ex.positions != state.relaxed_positions, axis=-1) \
            | jnp.any(e_ff.positions != state.relaxed_positions, axis=-1)
        nmoved = jnp.maximum(jnp.sum(free.astype(jnp.float32)), 1.0)
        rmsd = jnp.sqrt(jnp.sum(
            jnp.where(free[:, None], e_ff.positions - e_ex.positions, 0.0)
            ** 2) / nmoved)
        rec = dict(acc_ff=acc_ff, acc_ex=acc_ex,
                   se_ff=e_ff.surface_energy, se_ex=e_ex.surface_energy,
                   oob=e_ff.oob | e_ex.oob, rmsd=rmsd)
        return new_state, rec

    vm_opts = scoped_vmem_compiler_options(_slots_of(sys_.run),
                                           relax_banded=True)
    if rigid_seed:
        # large cells: drive the move loop from the host (one device
        # program per move) — a scan of exact full-cell relaxations is a
        # minutes-long single execution that trips axon's transient-
        # fault window
        step_j = jax.jit(jax.vmap(lambda s: combined(s, 0)),
                         compiler_options=vm_opts)

        def run(states):
            recs = []
            s = states
            for _ in range(n_moves):
                s, r = step_j(s)
                recs.append(r)
            return s, {k: jnp.stack([r[k] for r in recs], axis=1)
                       for k in recs[0]}
    else:
        run = jax.jit(jax.vmap(
            lambda s: jax.lax.scan(combined, s, jnp.arange(n_moves)),
            in_axes=0),
            compiler_options=vm_opts)
    if rigid_seed:
        # large cells: a vmapped from-ideal full relax is a single
        # 100 s+ device program that trips axon's transient-fault
        # window; seed both engines from the (identical) unrelaxed
        # lattice state instead — the per-move comparison protocol is
        # unchanged, both descents just start from a cold first move
        from surface_sampling_tpu.core.energy import make_state_energy_fn
        seed_fn = make_state_energy_fn(
            d, sys_.potential, surface_energy_fn=sys_.run.surface_energy_fn)
        init = jax.jit(
            jax.vmap(make_ff_init(d, evaluate, seed_fn)),
            compiler_options=scoped_vmem_compiler_options(
                _slots_of(sys_.run), relax_banded=True))
    else:
        init = jax.jit(
            jax.vmap(make_ff_init(d, evaluate, sys_.run.state_energy_fn)),
            compiler_options=scoped_vmem_compiler_options(
                _slots_of(sys_.run), relax_banded=True))
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    rng = np.random.default_rng(0)
    ss0 = jnp.asarray(
        (rng.random((n_chains, spec.n_sites)) < 0.15)
        * rng.integers(1, spec.n_codes, (n_chains, spec.n_sites)),
        jnp.int32)
    states = init(keys, ss0)
    t0 = time.perf_counter()
    _, recs = run(states)
    jax.block_until_ready(recs["se_ff"])
    wall = time.perf_counter() - t0
    acc_ff = np.asarray(recs["acc_ff"]).ravel()
    acc_ex = np.asarray(recs["acc_ex"]).ravel()
    oob = np.asarray(recs["oob"]).ravel()
    dse = np.abs(np.asarray(recs["se_ff"]) - np.asarray(recs["se_ex"])).ravel()
    rmsd = np.asarray(recs["rmsd"]).ravel()
    ok = ~oob
    # the decisions that matter: moves either engine ACCEPTS (rejected-by-
    # both trials never enter the chain — their dSE is NN extrapolation
    # noise on garbage states, bounded only by the OOB clamp)
    acc = ok & (acc_ff | acc_ex)
    row = {
        "chains": n_chains,
        "moves": int(n_moves * n_chains),
        "overlap": round(float((acc_ff == acc_ex).mean()), 4),
        "acc_rate_ff": round(float(acc_ff.mean()), 4),
        "acc_rate_ex": round(float(acc_ex.mean()), 4),
        "dse_mean_eV": round(float(dse[ok].mean()), 5) if ok.any() else None,
        "dse_max_eV": round(float(dse[ok].max()), 5) if ok.any() else None,
        "rmsd_mean_A": round(float(rmsd[ok].mean()), 5) if ok.any() else None,
        "rmsd_max_A": round(float(rmsd[ok].max()), 5) if ok.any() else None,
        "oob_rate": round(float(oob.mean()), 4),
        "wall_s": round(wall, 1),
        "ball_frac": round(tables.ball_frac, 4),
    }
    if acc.any():
        row["dse_acc_mean_eV"] = round(float(dse[acc].mean()), 5)
        row["dse_acc_max_eV"] = round(float(dse[acc].max()), 5)
        row["rmsd_acc_mean_A"] = round(float(rmsd[acc].mean()), 5)
        row["n_acc"] = int(acc.sum())
    return row


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


def bench_chgnet_super(supercell, n_chains, parity_states: int = 16):
    """CHGNet supercell rows (block-banded fused atom conv — the same
    ops/banding.py machinery as the PaiNN supercell path). Also checks
    banded-vs-unbanded surface-energy parity over random occupancies:
    one-hot routing is exact in bf16, so the windowed dot must agree
    with the full-width dot to float rounding."""
    import json as _json
    from pathlib import Path

    import numpy as np

    import surface_sampling_tpu.systems as systems_mod
    from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
    from surface_sampling_tpu.models.nn_calculator import make_chgnet_potential
    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.constants import Z_FROM_SYMBOL
    from surface_sampling_tpu.core.static_neighbors import (
        build_static_neighbor_table,
    )
    from surface_sampling_tpu.systems import lamno3_001_chgnet

    sys = lamno3_001_chgnet(supercell=supercell)
    row = _throughput(sys.run, n_chains)
    row["banded"] = sys.potential.__dict__.get("routing_banded", None)

    # unbanded rebuild for the parity check
    import dataclasses as _dc

    base = Path(systems_mod.__file__).parent
    params, cfg = load_chgnet_npz(base / "models" / "data" / "lamno3_chgnet.npz")
    cfg = _dc.replace(cfg, max_neighbors=96)
    type_numbers = [Z_FROM_SYMBOL[s] for s in ("La", "Mn", "O", "H")]
    nbr = build_static_neighbor_table(sys.spec, cfg.atom_graph_cutoff,
                                      relax_slack=0.1)
    pot_ref = make_chgnet_potential(params, cfg, type_numbers, units="eV",
                                    static_nbr=nbr)
    d = sys.run.d
    S, n_codes = d.site_coords.shape[0], d.n_codes
    rng = np.random.default_rng(0)
    cov = rng.uniform(0.05, 0.3, (parity_states, 1))
    ss = jnp.asarray(
        np.where(rng.random((parity_states, S)) < cov,
                 rng.integers(1, n_codes, (parity_states, S)), 0), jnp.int32)

    def e_of(pot):
        def f(s1):
            pos = realize_positions(d, s1)
            return pot.energy(pos, realize_type_idx(d, s1),
                              realize_alive(d, s1), d.shifts)

        return jax.jit(jax.vmap(f))

    e_band = np.asarray(e_of(sys.potential)(ss))
    e_ref = np.asarray(e_of(pot_ref)(ss))
    row["banded_parity_max_eV"] = round(float(np.abs(e_band - e_ref).max()), 7)
    return row


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


def bench_painn_train(batch_size: int = 16, iters: int = 10,
                      message_mode: str | None = None):
    """PaiNN fine-tune step throughput on the flagship SrTiO3 slab.
    ``message_mode`` pins the routing for the second-order (force-loss)
    path: None lets make_loss_fn resolve the default; "dense"/"pallas"
    measure the pure-XLA one-hot vs fused-kernel-VJP alternatives."""
    import dataclasses as _dc
    from pathlib import Path

    from surface_sampling_tpu.models.convert_nff import load_params_npz
    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn
    import surface_sampling_tpu.systems as systems

    base = Path(systems.__file__).parent
    params, cfg = load_params_npz(base / "models" / "data" / "srtio3_painn_01.npz")
    if message_mode is not None:
        cfg = _dc.replace(cfg, message_mode=message_mode)
    loss_fn = make_loss_fn(cfg, TrainConfig())
    return _train_throughput(params, cfg, loss_fn,
                             base / "systems_data" / "SrTiO3_001_2x2.npz",
                             batch_size, iters)


def bench_chgnet_train(batch_size: int = 8, iters: int = 10,
                       conv_mode: str | None = None):
    """CHGNet fine-tune step throughput on the LaMnO3 slab (efm targets).
    ``conv_mode`` as in bench_painn_train ("gather" = pure-XLA)."""
    import dataclasses as _dc
    from pathlib import Path

    from surface_sampling_tpu.models.chgnet import chgnet_apply
    from surface_sampling_tpu.models.convert_chgnet import load_chgnet_npz
    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn
    import surface_sampling_tpu.systems as systems

    base = Path(systems.__file__).parent
    params, cfg = load_chgnet_npz(base / "models" / "data" / "lamno3_chgnet.npz")
    if conv_mode is not None:
        cfg = _dc.replace(cfg, conv_mode=conv_mode)
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
    "painn_2x2super": lambda: bench_painn_super((2, 2), 16),
    "painn_2x2super_c32": lambda: bench_painn_super((2, 2), 32),
    "painn_2x2super_unbanded": lambda: bench_painn_super((2, 2), 16, banded=False),
    "painn_bf16": lambda: bench_painn_bf16((1, 1), 128),
    "painn_2x2super_bf16": lambda: bench_painn_bf16((2, 2), 16),
    "painn_3x3super_bf16": lambda: bench_painn_bf16((3, 3), 8),
    "painn_3x3super": lambda: bench_painn_super((3, 3), 8),
    "painn_3x3super_unbanded": lambda: bench_painn_super((3, 3), 8, banded=False),
    "painn_2x2super_inc": lambda: bench_painn_super_inc((2, 2), 16),
    "painn_3x3super_inc": lambda: bench_painn_super_inc((3, 3), 8),
    "painn_4x4super": lambda: bench_painn_super((4, 4), 8),
    "painn_4x4super_inc": lambda: bench_painn_super_inc((4, 4), 8),
    "painn_6x6super": lambda: bench_painn_super((6, 6), 4),
    "painn_6x6super_inc": lambda: bench_painn_super_inc((6, 6), 4),
    "painn_8x8super": lambda: bench_painn_super((8, 8), 2),
    "painn_8x8super_inc": lambda: bench_painn_super_inc((8, 8), 2),
    "painn_relaxed": bench_painn_relaxed,
    "painn_localrelax": lambda: bench_painn_localrelax((1, 1), 16),
    "painn_2x2super_relaxed": lambda: bench_painn_relaxed((2, 2), 16),
    "painn_2x2super_localrelax": lambda: bench_painn_localrelax((2, 2), 16),
    "painn_ffrelax": lambda: bench_painn_ffrelax((1, 1), 16),
    "painn_2x2super_ffrelax": lambda: bench_painn_ffrelax((2, 2), 16),
    "painn_6x6super_ffrelax": lambda: bench_painn_ffrelax((6, 6), 4),
    "painn_ffdiv": lambda: bench_painn_ffdiv((1, 1), 8),
    "painn_2x2super_ffdiv": lambda: bench_painn_ffdiv((2, 2), 8),
    "painn_train": bench_painn_train,
    "painn_train_pallas": lambda: bench_painn_train(message_mode="pallas"),
    "chgnet": bench_chgnet,
    "chgnet_2x2super": lambda: bench_chgnet_super((2, 2), 16),
    "chgnet_3x3super": lambda: bench_chgnet_super((3, 3), 8),
    "chgnet_train": bench_chgnet_train,
    "chgnet_train_pallas": lambda: bench_chgnet_train(conv_mode="pallas"),
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
