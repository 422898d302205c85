"""Device mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def chain_mesh(n_devices: int | None = None, axis: str = "chains") -> Mesh:
    """1-D mesh over all (or the first n) devices for chain batches."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def chain_ensemble_mesh(n_chain: int, n_ensemble: int) -> Mesh:
    """2-D mesh: chains x ensemble members (for sharded NN ensembles)."""
    devs = np.array(jax.devices()[: n_chain * n_ensemble]).reshape(n_chain, n_ensemble)
    return Mesh(devs, ("chains", "ensemble"))


def pod_mesh(n_pods: int, devices_per_pod: int | None = None) -> Mesh:
    """Hierarchical 2-D mesh for multi-pod deployments: outer axis "pod"
    crosses DCN, inner axis "chains" stays on ICI.

    ``jax.devices()`` orders devices slice/pod-major (process-major on
    multi-host), so a pod-major reshape keeps each row of the mesh inside
    one ICI domain: any collective over the "chains" axis rides ICI and
    only "pod"-axis traffic touches the data-center network. Chain batches
    shard over BOTH axes (they are independent, so the hot loop still has
    zero communication); DCN-aware schedules (tempering) use the axis split
    to confine frequent exchanges to ICI — see
    parallel/tempering.make_tempered_run(pod_size=..., dcn_every=...).
    """
    devs = jax.devices()
    if devices_per_pod is None:
        if len(devs) % n_pods:
            raise ValueError(f"{len(devs)} devices do not split into {n_pods} pods")
        devices_per_pod = len(devs) // n_pods
    need = n_pods * devices_per_pod
    if len(devs) < need:
        raise ValueError(f"need {need} devices, have {len(devs)}")
    grid = np.array(devs[:need]).reshape(n_pods, devices_per_pod)
    return Mesh(grid, ("pod", "chains"))
