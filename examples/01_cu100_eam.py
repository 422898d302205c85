"""Cu(100) + EAM toy run — mirror of the reference's example.ipynb.

Semigrand-canonical VSSR-MC with annealing on the Cu(100) 2x2x2 slab,
batched over many chains. Run: python examples/01_cu100_eam.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import time

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core import EngineConfig, geometric_schedule, make_run_fn
from surface_sampling_tpu.parallel import chain_states, make_chain_run
from surface_sampling_tpu.systems import cu100_eam
from surface_sampling_tpu.utils.plot import plot_summary_stats


def main():
    n_chains, sweeps, sweep_size = 256, 20, 2   # reference: 1 chain, 20x2
    sys = cu100_eam(fast=True)
    cfg = EngineConfig(sweep_size=sweep_size, record_positions=False)
    run_fn = make_run_fn(sys.run.d, sys.run.state_energy_fn, cfg)
    crun = make_chain_run(run_fn)

    states = chain_states(sys.run.d, jax.random.PRNGKey(0), n_chains)
    e0 = jax.jit(jax.vmap(lambda s: sys.run.state_energy_fn(s).surface_energy))(
        states.site_state
    )
    states = states._replace(energy=e0)
    temps = jnp.asarray(geometric_schedule(1.0, sweeps, 0.99), jnp.float32)

    t0 = time.perf_counter()
    out, rec = crun(states, temps)
    jax.block_until_ready(rec.energy)
    dt = time.perf_counter() - t0

    e = np.asarray(rec.energy)
    print(f"{n_chains} chains x {sweeps} sweeps x {sweep_size} steps in {dt:.2f}s "
          f"({n_chains * sweeps * sweep_size / dt:.0f} steps/s)")
    print(f"best surface energy: {e.min():.4f} eV")
    plot_summary_stats(e.mean(0), np.asarray(rec.accept_rate).mean(0),
                       np.asarray(rec.n_ads).mean(0), sweeps, save_folder=".")
    print("wrote summary_stats.png")


if __name__ == "__main__":
    main()
