"""Batched independent Markov chains: vmap on one chip, shard_map on a mesh.

This replaces the reference's one-chain-per-process model (SURVEY §2.3)
with the TPU-native shape: the chain axis is just a batch dimension of the
pure run function, so C chains cost ~one batched force-field evaluation
per step instead of C serial processes. Sharding the chain axis over an
ICI mesh is data parallelism with zero communication in the hot loop;
per-sweep metrics ride a single ``all_gather`` implicit in the output
sharding.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from surface_sampling_tpu.core.state import DeviceSpec, MCState, initial_state


def chain_states(
    d: DeviceSpec,
    key: jax.Array,
    n_chains: int,
    site_state=None,
) -> MCState:
    """Batch of fresh per-chain states (leading axis = chains)."""
    keys = jax.random.split(key, n_chains)
    make = partial(initial_state, d)
    if site_state is None:
        return jax.vmap(lambda k: make(k))(keys)
    site_state = jnp.asarray(site_state, jnp.int32)
    if site_state.ndim == 1:
        site_state = jnp.broadcast_to(site_state, (n_chains,) + site_state.shape)
    return jax.vmap(make)(keys, site_state)


def make_chain_run(run_fn: Callable, share_temps: bool = True,
                   compiler_options: dict | None = None) -> Callable:
    """vmap a single-chain ``run(state, temps)`` over the chain axis.

    With ``share_temps`` all chains follow one annealing schedule; otherwise
    ``temps`` carries a leading chain axis (basis for parallel tempering).
    ``compiler_options``: per-jit XLA options (e.g.
    ops.pallas_painn.scoped_vmem_compiler_options for large banded-kernel
    programs)."""
    in_axes = (0, None) if share_temps else (0, 0)
    return jax.jit(jax.vmap(run_fn, in_axes=in_axes),
                   compiler_options=compiler_options)


def make_sharded_chain_run(
    run_fn: Callable,
    mesh: Mesh,
    axis: str = "chains",
    share_temps: bool = True,
) -> Callable:
    """Shard the chain batch over a mesh axis with shard_map.

    Each device runs its local chain block with the same compiled program;
    there is no cross-device communication inside the MC loop (the chains
    are independent), so scaling is linear in devices on ICI. Outputs come
    back sharded along the chain axis.
    """
    vrun = jax.vmap(run_fn, in_axes=(0, None) if share_temps else (0, 0))
    state_spec = P(axis)
    temp_spec = P() if share_temps else P(axis)

    sharded = shard_map(
        vrun,
        mesh=mesh,
        in_specs=(state_spec, temp_spec),
        out_specs=state_spec,
        check_vma=False,
    )  # jax.shard_map (jax>=0.8)
    return jax.jit(sharded)


def shard_chain_states(states: MCState, mesh: Mesh, axis: str = "chains") -> MCState:
    """Place a chain-batched MCState with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), states)


def make_hierarchical_chain_run(
    run_fn: Callable,
    mesh: Mesh,
    axes: tuple[str, str] = ("pod", "chains"),
    share_temps: bool = True,
) -> Callable:
    """Shard the chain batch over a 2-D (pod x chip) mesh (parallel.mesh
    .pod_mesh): the leading chain axis is split over the flattened device
    grid, pod-major, so each pod owns a contiguous chain block.

    Chains are independent — the hot loop still runs with zero collectives
    on either fabric; the pod split only matters for the pieces that DO
    communicate (metric gathers, tempering swaps), which become two-stage:
    ICI within the pod row, DCN across rows only when a schedule asks
    for it. Use with shard_chain_states(states, mesh, axis=axes).

    PartitionSpec accepts a tuple axis, so this is exactly
    make_sharded_chain_run over both mesh dimensions.
    """
    return make_sharded_chain_run(run_fn, mesh, axis=axes, share_temps=share_temps)


def make_ensemble_sharded_energy(
    batched_member_energy: Callable,
    mesh: Mesh,
    ensemble_axis: str = "ensemble",
) -> Callable:
    """Ensemble parallelism: shard the NN-ensemble member axis over a mesh
    dimension (SURVEY §2.3's "expert-ish" axis).

    Args:
        batched_member_energy: (member_params, positions, ...) -> scalar
            per member — i.e. the fn normally vmapped over stacked params.
        mesh: mesh containing ``ensemble_axis``.

    Returns ``fn(stacked_params, *args) -> (mean_energy, member_energies)``
    where each device computes its local members and one ``all_gather``
    over ICI assembles the member energies (the only collective needed —
    chains stay embarrassingly parallel on the other axis).
    """

    def local(params_shard, *args):
        e_local = jax.vmap(lambda p: batched_member_energy(p, *args))(params_shard)
        e_all = jax.lax.all_gather(e_local, ensemble_axis, tiled=True)
        return jnp.mean(e_all), e_all

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(ensemble_axis), *([P()] * 4)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
