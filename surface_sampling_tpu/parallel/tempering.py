"""Parallel tempering (replica exchange) over the chain batch axis.

A new capability relative to the reference (which anneals one chain,
mcmc/utils/sampling.py): run C replicas at a temperature ladder and
exchange configurations between neighboring temperatures with the standard
acceptance  p = min(1, exp[(beta_i - beta_j)(E_i - E_j)]).  On TPU the
swap is a batched gather along the chain axis — under pjit/GSPMD a
sharded chain axis turns it into the minimal ICI permute automatically.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.state import MCState


def temperature_ladder(t_min: float, t_max: float, n: int) -> np.ndarray:
    """Geometric ladder from t_max (replica 0) down to t_min."""
    return np.geomspace(t_max, t_min, n)


class TemperRecord(NamedTuple):
    energy: jnp.ndarray        # (rounds, C)
    swap_rate: jnp.ndarray     # (rounds,)
    site_state: jnp.ndarray    # (rounds, C, S)
    swap_key: jnp.ndarray      # (rounds, 2) carried swap key AFTER each
    # round (uint32 key data) — row r feeds exact resume from round r+1


def _swap_phase(states, temps, key, parity, pair_ok=None):
    """Attempt swaps between pairs (i, i+1) with i of given parity.

    ``pair_ok`` (optional, shape (C,), bool) gates pair (i, i+1) — used by
    the DCN-aware schedule to confine swaps to ICI pods on most rounds.

    ``states`` is any chain-batched NamedTuple state with ``energy`` and
    ``key`` fields (core.state.MCState, or core.incremental.IncState whose
    feature caches must travel with the configuration they describe): the
    swap is a pytree-wide gather along the chain axis, except PRNG keys,
    which stay with the chain slot (the swap permutes configurations, not
    random streams).
    """
    C = temps.shape[0]
    idx = jnp.arange(C)
    is_left = (idx % 2) == parity
    partner = jnp.where(is_left, idx + 1, idx - 1)
    partner = jnp.clip(partner, 0, C - 1)
    valid = partner != idx
    valid &= jnp.where(is_left, partner < C, True)
    if pair_ok is not None:
        left_of = jnp.where(is_left, idx, partner)
        valid &= pair_ok[left_of]

    e = states.energy
    beta = 1.0 / jnp.maximum(temps, 1e-12)
    delta = (beta - beta[partner]) * (e - e[partner])
    u = jax.random.uniform(key, (C,))
    # the decision is made once per pair by its left member and mirrored
    left_idx = jnp.where(is_left, idx, partner)
    accept = (jnp.log(u[left_idx] + 1e-38) < delta[left_idx]) & valid
    take_from = jnp.where(accept, partner, idx)

    swapped = jax.tree.map(lambda x: x[take_from], states)
    swapped = swapped._replace(key=states.key)  # keys stay with the slot
    rate = jnp.sum(accept.astype(jnp.float32)) / jnp.maximum(
        jnp.sum(valid.astype(jnp.float32)), 1.0
    )
    return swapped, rate


def make_tempered_run(
    sweep_fn: Callable,
    n_rounds: int,
    pod_size: int | None = None,
    dcn_every: int = 4,
) -> Callable:
    """Build ``run(states, temps, key) -> (states, TemperRecord)``.

    The returned ``run(states, temps, key, start=0)`` takes the round
    offset as a TRACED 4th argument: it shifts the round counter
    (parity / DCN-cadence schedule) so a resumed or chunked run
    continues the exact swap sequence of an uninterrupted one while
    reusing one compilation per chunk length. Pass the checkpointed
    ``TemperRecord.swap_key`` row as ``key`` when resuming.

    ``sweep_fn(state, temp) -> (state, infos)`` is the single-chain sweep
    (core.engine.make_sweep_fn); it is vmapped here over the replica axis.
    One round = a sweep per replica + one alternating-parity swap phase.

    Multi-pod (DCN-aware) schedule: with ``pod_size`` set, the replica axis
    is laid out pod-major over a parallel.mesh.pod_mesh, so replicas
    [k*pod_size, (k+1)*pod_size) live on one ICI domain. Swap pairs that
    cross a pod boundary are then only attempted every ``dcn_every``-th
    round — on the other rounds the swap permutation is block-diagonal in
    pods and GSPMD lowers it with zero DCN traffic. The temperature ladder
    is contiguous across the boundary, so ergodicity is preserved (boundary
    pairs still exchange, just at a coarser cadence — DCN latency is paid
    O(1/dcn_every) of the time).
    """
    vsweep = jax.vmap(sweep_fn, in_axes=(0, 0))

    def run(states: MCState, temps, key, start=0):
        C = temps.shape[0]
        idx = jnp.arange(C)
        if pod_size is not None:
            crosses_pod = ((idx + 1) % pod_size == 0) & (idx + 1 < C)
        else:
            crosses_pod = jnp.zeros(C, bool)

        def body(carry, r):
            states, key = carry
            states, _ = vsweep(states, temps)
            key, k_swap = jax.random.split(key)
            dcn_round = (r % dcn_every) == (dcn_every - 1)
            pair_ok = jnp.where(dcn_round, True, ~crosses_pod)
            # parity must alternate WITHIN each round class: with an even
            # dcn_every, r % 2 is constant over DCN rounds and a boundary
            # pair of the other parity would never be attempted (the two
            # pod sub-ladders would decouple) — so DCN rounds alternate on
            # their own counter instead
            parity = jnp.where(dcn_round, (r // dcn_every) % 2, r % 2)
            states, rate = _swap_phase(states, temps, k_swap, parity, pair_ok=pair_ok)
            key_data = (
                jax.random.key_data(key)
                if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
            )
            rec = TemperRecord(
                energy=states.energy, swap_rate=rate,
                site_state=states.site_state, swap_key=key_data,
            )
            return (states, key), rec

        rounds = jnp.arange(n_rounds) + jnp.asarray(start, jnp.int32)
        (states, _), recs = jax.lax.scan(body, (states, key), rounds)
        return states, recs

    return jax.jit(run)
