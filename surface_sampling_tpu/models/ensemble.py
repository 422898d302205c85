"""NN ensembles as a vmapped weight axis.

The reference runs an ensemble of PaiNN models sequentially inside
`nff.EnsembleNFF` (one CUDA forward per member; calculators.py:366).
Here ensemble members are a leading axis of one stacked param pytree:
`vmap` turns the ensemble into batched matmuls on the same MXU pass, and
the axis can be sharded over a mesh dimension ("ensemble parallelism",
SURVEY §2.3) with zero code change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from surface_sampling_tpu.models.painn import PaiNNConfig, painn_apply


def stack_params(params_list):
    """Stack per-member param pytrees along a new leading ensemble axis."""
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *params_list)


def ensemble_apply(stacked_params, cfg: PaiNNConfig, positions, numbers, alive, shifts,
                   edges=None, band=None, msg_geom=None, l1_types=None,
                   collect_layers=False):
    """Forward all members; returns per-member outputs plus ensemble stats.

    energy/energy_std: scalar mean and std over members (the reference's
    EnsembleNFF semantics); forces_std is computed by callers from grads
    when needed. Embedding is the member-mean of final scalar features.
    ``edges`` lets callers reuse a precomputed (e.g. static-table) edge
    set; ``band`` enables block-banded routing (supercells); ``msg_geom``
    a pre-built fused-kernel geometry (e.g. ops/static_edges.py's rigid
    fast path — band is then already baked in)."""
    from surface_sampling_tpu.models.painn import (
        painn_edges,
        prepare_message_geometry,
        resolve_message_mode,
    )

    if edges is None:
        edges = painn_edges(cfg, positions, alive, shifts)  # shared across members
    # the padded kernel geometry (rbf/envelope/unit/neighbor layout) is
    # member-invariant too — build it once, not once per member (~6% of
    # the flagship ensemble evaluation)
    if msg_geom is None:
        msg_geom = (
            prepare_message_geometry(cfg, positions, edges, band=band)
            if resolve_message_mode(cfg) == "pallas"
            else None
        )
    outs = jax.vmap(
        lambda p: painn_apply(p, cfg, positions, numbers, alive, shifts, edges=edges,
                              msg_geom=msg_geom, l1_types=l1_types,
                              collect_layers=collect_layers)
    )(stacked_params)
    energies = outs["energy"]                       # (E,)
    res = {
        "member_energy": energies,
        "energy": jnp.mean(energies),
        "energy_std": jnp.std(energies),
        "per_atom_energy": jnp.mean(outs["per_atom_energy"], axis=0),
        "embedding": jnp.mean(outs["embedding"], axis=0),
        "member_embedding": outs["embedding"],
    }
    if collect_layers:
        # member-stacked layer-input caches (M, L, N, F) / (M, L, N, F, 3)
        res["layer_s"] = outs["layer_s"]
        res["layer_v"] = outs["layer_v"]
    return res


def ensemble_forces_std(stacked_params, cfg, positions, numbers, alive, shifts):
    """Per-atom std of forces across members (uncertainty metric used by
    the reference's clustering force_std, calculators.py:98-135)."""

    def member_forces(p):
        g = jax.grad(
            lambda pos: painn_apply(p, cfg, pos, numbers, alive, shifts)["energy"]
        )(positions)
        return -g

    f = jax.vmap(member_forces)(stacked_params)     # (E, N, 3)
    std = jnp.std(f, axis=0)                        # (N, 3)
    return jnp.where(alive[:, None], std, 0.0)
