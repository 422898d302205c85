"""Population annealing on Cu(100) — anneal the whole chain population
with importance-reweighted resampling, and get free-energy differences
for free.

A capability beyond the reference (which anneals one chain,
mcmc/utils/sampling.py): at every temperature step the population is
reweighted by exp(-dBeta * E) and systematically resampled, so it stays
equilibrated along the whole schedule; the per-step log-mean-weight sums
to log[Z(T_final)/Z(T_0)] (validated against exact enumeration in
tests/test_distribution.py). Run: python examples/10_population_annealing.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core import EngineConfig, make_run_fn
from surface_sampling_tpu.core.engine import make_sweep_fn
from surface_sampling_tpu.core.events import make_semigrand_step
from surface_sampling_tpu.parallel import (
    chain_states,
    make_chain_run,
    make_population_annealing_run,
)
from surface_sampling_tpu.systems import cu100_eam


def main():
    sys_ = cu100_eam(fast=True)
    run = sys_.run
    C, R = 2048, 16
    temps = jnp.asarray(np.geomspace(2.0, 0.35, R), jnp.float32)

    # equilibrate the population at the hot end first
    states = chain_states(run.d, jax.random.PRNGKey(0), C)
    e0 = jax.jit(jax.vmap(lambda s: run.state_energy_fn(s).surface_energy))(
        states.site_state)
    states = states._replace(energy=e0)
    burn = make_chain_run(make_run_fn(
        run.d, run.state_energy_fn,
        EngineConfig(sweep_size=8, record_positions=False)))
    states, _ = burn(states, jnp.full(10, float(temps[0])))

    step_fn = make_semigrand_step(run.d, run.state_energy_fn)
    parun = make_population_annealing_run(make_sweep_fn(step_fn, 8),
                                          resample_threshold=0.9)
    states, rec = parun(states, temps, jax.random.PRNGKey(1))

    e = np.asarray(rec.energy)
    print(f"chains: {C}, schedule: {float(temps[0])} -> {float(temps[-1])} "
          f"in {R} steps")
    print(f"best surface energy: {e.min():.4f} eV "
          f"(final-population mean {e[-1].mean():.4f})")
    print(f"min ESS/C along the schedule: "
          f"{np.asarray(rec.ess).min() / C:.2f}; "
          f"{int(np.asarray(rec.resampled).sum())}/{R} steps resampled")
    print(f"log[Z(T_final)/Z(T_0)] estimate: "
          f"{float(np.sum(np.asarray(rec.dlogz))):.3f}")


if __name__ == "__main__":
    main()
