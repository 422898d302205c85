"""Headline benchmark: flagship MC energy-evaluation throughput on real TPU.

Workload (the BASELINE.json north star): the SrTiO3(001) semigrand MC
sweep driven by the reference's trained 3-member PaiNN ensemble
(tutorials/SrTiO3_001.ipynb / scripts/configs/sample_config_painn.json),
run as a batch of vmapped chains inside the scan engine. Each MC step
costs one ensemble surface-energy evaluation, so steps/sec == NN energy
evaluations/sec — the cost unit of the reference's hot loop (SURVEY §6:
1 MC step ~ (1 + relax_steps) evals, serial).

Baseline denominator: 5.8 ensemble evals/s for the reference's torch
path on its published RTX 2080 Ti — derivation in BASELINE.md
("Denominator derivations": 1050 ensemble evaluations per tutorial run,
'a few minutes' read as 3 minutes; the reference publishes no number, so
the figure is reconstructed from the tutorial's own runtime statement
and held at the generous-to-the-reference end to keep vs_baseline
conservative).

If the PaiNN path fails (e.g. model fixtures unavailable), the bench
falls back to the Cu(100) EAM rigid path (denominator 40 evals/s, also
derived in BASELINE.md) and SAYS SO on stderr. The executed path is
always logged to stderr; stdout carries exactly one JSON line:
{"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# BASELINE.md "Denominator derivations"
BASELINE_PAINN_EVALS_PER_SEC = 5.8    # reference torch ensemble, RTX 2080 Ti
BASELINE_EAM_EVALS_PER_SEC = 40.0     # reference LAMMPS EAM loop, 4-core CPU


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _run_mc(run, n_chains: int, sweeps: int, sweep_size: int):
    """Time the jitted chain-batched MC scan; returns evals/sec."""
    from surface_sampling_tpu.core import EngineConfig, geometric_schedule, make_run_fn
    from surface_sampling_tpu.parallel import chain_states, make_chain_run

    cfg = EngineConfig(sweep_size=sweep_size, record_positions=False)
    run_fn = make_run_fn(run.d, run.state_energy_fn, cfg)
    crun = make_chain_run(run_fn)

    states = chain_states(run.d, jax.random.PRNGKey(0), n_chains)
    e0 = jax.jit(jax.vmap(lambda ss: run.state_energy_fn(ss).surface_energy))(
        states.site_state
    )
    states = states._replace(energy=e0)
    temps = jnp.asarray(geometric_schedule(1.0, sweeps, 0.99), jnp.float32)

    t0 = time.perf_counter()
    out, recs = crun(states, temps)          # compile + warmup
    jax.block_until_ready(recs.energy)
    _log(f"compile+first run {time.perf_counter() - t0:.1f}s")

    # best-of-3 steady-state repetitions: single ~1 s executions through
    # the remote-TPU path see occasional multi-ms scheduling noise
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out, recs = crun(states, temps)
        jax.block_until_ready(recs.energy)
        dt = min(dt, time.perf_counter() - t0)

    best = float(np.min(np.asarray(recs.energy)))
    assert np.isfinite(best), "benchmark run produced non-finite energies"
    _log(f"steady state {dt * 1e3:.0f} ms for {n_chains * sweeps * sweep_size} steps; "
         f"best surface energy {best:.3f} eV")
    steps_per_sec = n_chains * sweeps * sweep_size / dt
    # second half of the BASELINE.json metric string ("Energy evals/sec +
    # MC sweeps/hr"): a sweep in the reference's sense is one MC step per
    # site (scripts/sample_surface.py sweep loop), so sweeps/hr follows
    # from steps/s and the site count
    n_sites = int(run.d.site_coords.shape[0])
    _log(f"MC sweeps/hr (1 sweep = {n_sites} site steps, all chains): "
         f"{steps_per_sec / n_sites * 3600.0:.0f} "
         f"(per chain: {steps_per_sec / n_sites / n_chains * 3600.0:.0f})")
    return steps_per_sec


def bench_painn() -> dict:
    """Flagship: SrTiO3(001) + trained PaiNN 3-ensemble semigrand MC."""
    from surface_sampling_tpu.systems import srtio3_001_painn

    _log("path: srtio3_painn_ensemble (flagship, BASELINE.json north star)")
    sys_ = srtio3_001_painn()
    evals = _run_mc(sys_.run, n_chains=128, sweeps=2, sweep_size=8)
    return {
        "metric": "mc_energy_evals_per_sec_srtio3_painn_ensemble",
        "value": round(evals, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals / BASELINE_PAINN_EVALS_PER_SEC, 2),
    }


def bench_cu_rigid() -> dict:
    """Fallback: Cu(100) EAM via rigid quadratic forms (exact splines)."""
    from surface_sampling_tpu.core import MCMCRun
    from surface_sampling_tpu.potentials import builtin_eam
    from surface_sampling_tpu.potentials.eam import make_eam_rigid
    from surface_sampling_tpu.systems import cu100_eam

    _log("path: cu100_eam_rigid (fallback)")
    sys_ = cu100_eam(fast=True)
    tables = builtin_eam("Cu_u3")
    run = MCMCRun(sys_.spec, make_eam_rigid(tables, sys_.spec))
    evals = _run_mc(run, n_chains=16384, sweeps=8, sweep_size=32)
    return {
        "metric": "mc_energy_evals_per_sec_cu100_eam",
        "value": round(evals, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals / BASELINE_EAM_EVALS_PER_SEC, 2),
    }


def main() -> None:
    try:
        result = bench_painn()
    except Exception as e:                          # noqa: BLE001
        _log(f"flagship PaiNN path FAILED ({type(e).__name__}: {e}); "
             "falling back to Cu(100) EAM rigid")
        result = bench_cu_rigid()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
