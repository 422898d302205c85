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
