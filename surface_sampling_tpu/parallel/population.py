"""Population annealing over the chain batch axis.

A third batch-hardware sampling capability beyond the reference's single
annealed chain (mcmc/utils/sampling.py) and this package's parallel
tempering: anneal the WHOLE chain population together and, at every
temperature step, importance-reweight and resample the population so it
stays equilibrated at the new temperature (Hukushima & Iba 2003). On TPU
the resampling is one batched gather along the chain axis — the same
minimal-ICI-permute shape as tempering's swap phase.

Per step k (T_{k-1} -> T_k over a DECREASING schedule):

    log w_i   = -(1/T_k - 1/T_{k-1}) E_i
    ESS_k     = (sum w)^2 / sum w^2           (population health metric)
    dlogZ_k   = logsumexp(log w) - log C      (free-energy estimator:
                sum_k dlogZ_k -> log[Z(T_K)/Z(T_0)], a quantity neither
                the reference nor plain tempering can produce)
    resample  ~ systematic resampling of chain slots by w
    sweep     = one MC sweep per chain at T_k

Resampling is optional per step: with ``resample_threshold`` the
population only resamples when ESS/C drops below the threshold (standard
practice — resampling adds variance when weights are flat).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from surface_sampling_tpu.core.state import MCState


class PARecord(NamedTuple):
    energy: jnp.ndarray       # (R, C) per-sweep end energies
    ess: jnp.ndarray          # (R,) effective sample size of the weights
    dlogz: jnp.ndarray        # (R,) per-step log[Z(T_k)/T(T_{k-1})] estimate
    resampled: jnp.ndarray    # (R,) bool — whether this step resampled
    site_state: jnp.ndarray   # (R, C, S) per-sweep end site occupancies
    final_key: jax.Array      # resampling-PRNG carry after the last step —
                              # hand to the next chunk for bitwise-neutral
                              # chunking/resume (cli.common)


def _systematic_resample(key, log_w, n: int):
    """Systematic resampling: n slots drawn ~ w with minimal variance.
    Returns (C,) int32 source indices."""
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    u = (u0 + jnp.arange(n, dtype=cdf.dtype)) / n
    return jnp.clip(jnp.searchsorted(cdf, u), 0, n - 1).astype(jnp.int32)


def make_population_annealing_run(
    sweep_fn: Callable,
    resample_threshold: float = 1.0,
) -> Callable:
    """Build ``run(states, temps, key) -> (states, PARecord)``.

    ``sweep_fn(state, temp) -> (state, infos)`` is the single-chain sweep
    (core.engine.make_sweep_fn), vmapped here over the population.
    ``temps`` is the (R,) decreasing annealing schedule; ``states`` must
    carry energies consistent with their site_states (chain_states +
    a batched state_energy_fn pass). The population is assumed roughly
    equilibrated at temps[0] — run a few plain sweeps there first, or
    start the schedule at a temperature high enough that the initial
    distribution is effectively uniform.

    ``resample_threshold``: resample only when ESS/C < threshold
    (1.0 = always resample, 0.0 = never — pure reweighting estimator).

    ``run`` additionally accepts ``t_prev``, the temperature the incoming
    population is equilibrated at: the first schedule entry then
    reweights from t_prev -> temps[0]. Default (None) reweights the first
    entry from itself (zero-weight step) — the fresh-start semantics.
    Chunked drivers (cli.common checkpoint_interval) pass the previous
    chunk's last temperature so the cross-chunk reweight is not skipped.
    """
    vsweep = jax.vmap(sweep_fn, in_axes=(0, None))

    def run(states: MCState, temps, key, t_prev=None):
        C = states.energy.shape[0]
        beta = 1.0 / jnp.maximum(temps, 1e-12)
        b0 = beta[:1] if t_prev is None else 1.0 / jnp.maximum(
            jnp.asarray(t_prev, beta.dtype)[None], 1e-12)
        beta_prev = jnp.concatenate([b0, beta[:-1]])

        def step(carry, bt):
            states, key = carry
            b_prev, b_k = bt
            log_w = -(b_k - b_prev) * states.energy            # (C,)
            dlogz = jax.nn.logsumexp(log_w) - jnp.log(float(C))
            w = jax.nn.softmax(log_w)
            ess = 1.0 / jnp.sum(w * w)
            key, k_rs = jax.random.split(key)
            do_rs = ess < resample_threshold * C
            idx = jnp.where(
                do_rs,
                _systematic_resample(k_rs, log_w, C),
                jnp.arange(C, dtype=jnp.int32),
            )
            states = MCState(
                site_state=states.site_state[idx],
                energy=states.energy[idx],
                relaxed_positions=states.relaxed_positions[idx],
                key=states.key,  # keys stay with the chain slot
            )
            states, _ = vsweep(states, 1.0 / b_k)
            return (states, key), (states.energy, ess, dlogz, do_rs,
                                   states.site_state)

        (states, key), (e, ess, dlogz, rs, ss) = jax.lax.scan(
            step, (states, key), (beta_prev, beta)
        )
        return states, PARecord(energy=e, ess=ess, dlogz=dlogz, resampled=rs,
                                site_state=ss, final_key=key)

    return jax.jit(run)
