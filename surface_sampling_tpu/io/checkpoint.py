"""Real checkpoint/resume of MC runs.

The reference's checkpointing is informal (pickles of SurfaceSystem
copies + CIF dumps, SURVEY §5.4). Here the complete chain state is a tiny
pytree of device arrays — (site_state, energy, relaxed_positions, PRNG
key) plus the sweep index and temperature schedule — so a checkpoint is
one npz file and resume is exact (bitwise PRNG continuation).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.state import MCState


def save_checkpoint(
    path: str | Path,
    state: MCState,
    sweep_index: int,
    temps: np.ndarray,
    extra: dict | None = None,
) -> None:
    """Write an exact-resume checkpoint (single chain or a chain batch)."""
    payload = {
        "site_state": np.asarray(state.site_state),
        "energy": np.asarray(state.energy),
        "relaxed_positions": np.asarray(state.relaxed_positions),
        "key": np.asarray(jax.random.key_data(state.key))
        if jnp.issubdtype(state.key.dtype, jax.dtypes.prng_key)
        else np.asarray(state.key),
        "sweep_index": np.asarray(sweep_index),
        "temps": np.asarray(temps),
    }
    for k, v in (extra or {}).items():
        payload[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_checkpoint(path: str | Path):
    """Read a checkpoint; returns (MCState, sweep_index, temps, extra)."""
    d = np.load(path)
    key = jnp.asarray(d["key"], jnp.uint32)
    state = MCState(
        site_state=jnp.asarray(d["site_state"], jnp.int32),
        energy=jnp.asarray(d["energy"]),
        relaxed_positions=jnp.asarray(d["relaxed_positions"]),
        key=key,
    )
    extra = {k[len("extra_"):]: d[k] for k in d.files if k.startswith("extra_")}
    return state, int(d["sweep_index"]), d["temps"], extra
