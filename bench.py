"""Headline benchmark: MC energy-evaluation throughput on real hardware.

Workload: the Cu(100) EAM toy system (reference tutorials/example.ipynb /
tests/test_Cu.py — 8-atom slab, 24 virtual sites, semigrand Metropolis,
annealed), run as a batch of vmapped chains. Each MC step costs one
force-field (surface-energy) evaluation without relaxation, so
steps/sec == energy evaluations/sec — the cost unit of the reference's
hot loop (SURVEY §6: 1 MC step ~ (1 + relax_steps) evals, serial).

Baseline: the reference runs ONE chain with LAMMPS EAM at ~40 MC steps/s
on a 4-core CPU (README.md:73 "a few seconds" for 20x2 steps + setup; we
use a measured-equivalent 40 evals/s as the denominator, documented in
BASELINE.md — the reference publishes no number).

The fast path uses the static candidate-pair table + piecewise-polynomial
EAM (gather-free; table deviation ~1e-6 eV, see tests/test_fast_eam.py).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_EVALS_PER_SEC = 40.0


def main() -> None:
    from surface_sampling_tpu.core import EngineConfig, geometric_schedule, make_run_fn
    from surface_sampling_tpu.parallel import chain_states, make_chain_run
    from surface_sampling_tpu.systems import cu100_eam

    n_chains = 16384
    sweeps = 8
    sweep_size = 32

    sys = cu100_eam(fast=True)
    run = sys.run
    try:
        # rigid quadratic-form path (fastest, exact splines: the geometry is
        # static, so rho = W @ alive and E_pair = 1/2 a^T Phi a are two small
        # precomputed matmuls per evaluation); falls back to the fused
        # Pallas kernel, then the XLA cheb path
        from surface_sampling_tpu.core import MCMCRun
        from surface_sampling_tpu.potentials import builtin_eam
        from surface_sampling_tpu.potentials.eam import make_eam_rigid

        tables = builtin_eam("Cu_u3")
        run = MCMCRun(sys.spec, make_eam_rigid(tables, sys.spec))
    except Exception:
        try:
            from surface_sampling_tpu.core import MCMCRun
            from surface_sampling_tpu.core.static_neighbors import (
                build_static_neighbor_table,
            )
            from surface_sampling_tpu.ops.pallas_eam import make_eam_pallas_potential
            from surface_sampling_tpu.potentials import builtin_eam

            tables = builtin_eam("Cu_u3")
            nbr = build_static_neighbor_table(sys.spec, tables.cutoff, relax_slack=0.05)
            run = MCMCRun(sys.spec, make_eam_pallas_potential(tables, nbr))
        except Exception:
            pass
    cfg = EngineConfig(sweep_size=sweep_size, record_positions=False)
    run_fn = make_run_fn(run.d, run.state_energy_fn, cfg)
    crun = make_chain_run(run_fn)

    states = chain_states(run.d, jax.random.PRNGKey(0), n_chains)
    e0 = jax.jit(jax.vmap(lambda ss: run.state_energy_fn(ss).surface_energy))(
        states.site_state
    )
    states = states._replace(energy=e0)
    temps = jnp.asarray(geometric_schedule(1.0, sweeps, 0.99), jnp.float32)

    # compile + warmup
    out, recs = crun(states, temps)
    jax.block_until_ready(recs.energy)

    t0 = time.perf_counter()
    out, recs = crun(states, temps)
    jax.block_until_ready(recs.energy)
    dt = time.perf_counter() - t0

    total_steps = n_chains * sweeps * sweep_size
    evals_per_sec = total_steps / dt

    # sanity: the annealed ensemble must find strongly bound minima
    best = float(np.min(np.asarray(recs.energy)))
    assert np.isfinite(best), "benchmark run produced non-finite energies"

    print(
        json.dumps(
            {
                "metric": "mc_energy_evals_per_sec_cu100_eam",
                "value": round(evals_per_sec, 1),
                "unit": "evals/s",
                "vs_baseline": round(evals_per_sec / BASELINE_EVALS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
