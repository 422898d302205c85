"""Adapter: PaiNN (single or ensemble) -> the framework Potential API.

Counterpart of the reference's NeuralFF / EnsembleNFF / EnsembleNFFSurface
ASE calculators (mcmc/calculators/calculators.py:34-489). Handles the unit
conversion from the model's training units to eV (nff models train in
kcal/mol; NeuralFF converts on read — calculators.py uses
nff.utils.constants).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.constants import (
    HARTREE_TO_EV,
    KCAL_MOL_TO_EV,
    SYMBOL_FROM_Z,
)
from surface_sampling_tpu.models.ensemble import ensemble_apply
from surface_sampling_tpu.models.painn import PaiNNConfig, painn_apply
from surface_sampling_tpu.potentials.base import Potential

UNIT_FACTORS = {"kcal/mol": KCAL_MOL_TO_EV, "eV": 1.0, "ev": 1.0}


def make_painn_potential(
    params,
    cfg: PaiNNConfig,
    type_numbers,
    units: str = "kcal/mol",
    ensemble: bool = False,
    stoidict: dict | None = None,
    static_nbr=None,
    routing_band=None,
    spec=None,
) -> Potential:
    """Wrap PaiNN as a Potential over (positions, type_idx, alive, shifts).

    Args:
        params: single param pytree, or stacked pytree when ensemble=True.
        type_numbers: atomic number per potential type index (the spec's
            element typing; PaiNN embeds raw atomic numbers).
        units: training units of the checkpoint.
        stoidict: nff composition offsets in Hartree (offset_data.json's
            "stoidict": per-element linear coefficients + "offset" const) —
            the reference applies these inside nff's calculate so the
            optimizer and OOB guard see absolute energies (validated against
            the SrTiO3 tutorial's printed -467.52 eV pristine energy).
        static_nbr: optional core.static_neighbors.StaticNeighborTable for
            the system spec — ranks only the static candidate pairs instead
            of searching all image pairs (~2x faster MC evaluations). The
            positions passed in must then be slot-realized geometries of
            that spec (the MC hot path); arbitrary geometries (training,
            datasets) should omit it.
        routing_band: optional ops.banding.RoutingBand (built from the
            same static table) — block-banded routing inside the fused
            Pallas kernel, the supercell fast path.
        spec: optional core.spec.SurfaceSpec. When both ``spec`` and
            ``static_nbr`` are given and the spec's slot geometry is
            code-independent, the potential additionally carries a
            ``rigid_energy(type_idx, alive)`` hook backed by fully static
            edge geometry (ops/static_edges.py) — the per-move edge build
            collapses to three exact bf16 MXU dots. core/energy.py's
            non-relax state evaluation uses the hook automatically.
    """
    factor = UNIT_FACTORS[units]
    band = None
    if routing_band is not None:
        from surface_sampling_tpu.ops.pallas_painn import stage_band

        band = stage_band(routing_band)
    if static_nbr is not None:
        from surface_sampling_tpu.ops.neighbors import (
            make_table_edge_fn,
            make_table_topology_fns,
        )

        edge_fn = make_table_edge_fn(static_nbr, cfg.cutoff, cfg.max_neighbors)
        topo_fn, geom_fn = make_table_topology_fns(
            static_nbr, cfg.cutoff, cfg.max_neighbors
        )
    else:
        edge_fn = topo_fn = geom_fn = None
    znums = jnp.asarray(np.asarray(type_numbers), jnp.int32)
    if stoidict is not None:
        per_type = np.array(
            [stoidict.get(SYMBOL_FROM_Z[int(z)], 0.0) for z in np.asarray(type_numbers)]
        ) * HARTREE_TO_EV
        const_off = float(stoidict.get("offset", 0.0)) * HARTREE_TO_EV
        per_type_j = jnp.asarray(per_type)
    else:
        per_type_j, const_off = None, 0.0

    def comp_offset(type_idx, alive, dtype):
        if per_type_j is None:
            return jnp.asarray(0.0, dtype)
        per_atom_off = per_type_j.astype(dtype)[type_idx] * alive.astype(dtype)
        return jnp.sum(per_atom_off) + jnp.asarray(const_off, dtype)

    def outputs(positions, type_idx, alive, shifts, edges=None,
                collect_layers=False):
        numbers = znums[type_idx] * alive.astype(jnp.int32)
        if edges is None:
            edges = edge_fn(positions, alive) if edge_fn is not None else None
        if ensemble:
            return ensemble_apply(params, cfg, positions, numbers, alive, shifts,
                                  edges=edges, band=band,
                                  collect_layers=collect_layers)
        return painn_apply(params, cfg, positions, numbers, alive, shifts,
                           edges=edges, band=band,
                           collect_layers=collect_layers)

    def energy(positions, type_idx, alive, shifts, edges=None):
        e = outputs(positions, type_idx, alive, shifts,
                    edges=edges)["energy"] * factor
        return e + comp_offset(type_idx, alive, positions.dtype)

    def per_atom(positions, type_idx, alive, shifts):
        pa = outputs(positions, type_idx, alive, shifts)["per_atom_energy"] * factor
        if per_type_j is not None:
            pa = pa + per_type_j.astype(pa.dtype)[type_idx] * alive.astype(pa.dtype)
        return pa

    pot = Potential(
        energy=energy, per_atom_energy=per_atom, cutoff=cfg.cutoff, name="painn"
    )
    pot.__dict__["outputs"] = outputs  # embeddings/std for analysis layers
    # raw pieces for the frozen-far-field ball-relax engine
    # (core/ff_relax.py): it runs its own compact subproblem forward
    pot.__dict__["ff_pack"] = dict(
        params=params, cfg=cfg, znums=znums, factor=factor, ensemble=ensemble
    )
    pot.__dict__["ff_comp_offset"] = comp_offset
    if spec is not None and static_nbr is not None:
        from surface_sampling_tpu.ops.static_edges import (
            _static_positions,
            build_static_edge_pack,
            static_edge_geometry,
        )

        pack = build_static_edge_pack(spec, static_nbr, cfg, band=routing_band)
        if pack is not None:
            import dataclasses as _dc

            static_pos = jnp.asarray(_static_positions(spec), jnp.float32)
            # the static msg_geom only feeds the fused kernel — pin the
            # mode so CPU's "auto"->"gather" resolution can't fall back
            # onto the (dummy) disp/nbr_j fields of the edges tuple
            cfg_rigid = _dc.replace(cfg, message_mode="pallas")

            # layer-1 fast kernel (forward-only, exact): rigid MC never
            # differentiates. phi depends only on Z, so the species table
            # is deduplicated — two type slots sharing an atomic number
            # would otherwise make the sp8 one-hot rows two-hot and double
            # the layer-1 message silently.
            l1_types = tuple(sorted({int(z) for z in np.asarray(type_numbers)}))

            def rigid_outputs(type_idx, alive):
                numbers = znums[type_idx] * alive.astype(jnp.int32)
                msg_geom, edges = static_edge_geometry(pack, alive)
                if ensemble:
                    return ensemble_apply(
                        params, cfg_rigid, static_pos, numbers, alive, None,
                        edges=edges, band=band, msg_geom=msg_geom,
                        l1_types=l1_types)
                return painn_apply(
                    params, cfg_rigid, static_pos, numbers, alive, None,
                    edges=edges, msg_geom=msg_geom, l1_types=l1_types)

            def rigid_energy(type_idx, alive):
                e = rigid_outputs(type_idx, alive)["energy"] * factor
                return e + comp_offset(type_idx, alive, static_pos.dtype)

            pot.__dict__["rigid_energy"] = rigid_energy
            pot.__dict__["rigid_outputs"] = rigid_outputs
            pot.__dict__["static_edge_pack"] = pack
    if topo_fn is not None:
        # relax-loop hooks: refresh the edge TOPOLOGY once per relaxation
        # (reference dynamics.py:129 semantics), recompute geometry per
        # force call (core/energy.py RelaxConfig.refresh_edges="once")
        pot.__dict__["edge_topology"] = topo_fn
        pot.__dict__["edges_of"] = geom_fn
        pot.__dict__["energy_with_edges"] = energy
    if static_nbr is None:
        # rebuild hook: cli.common.assemble_system re-invokes with the
        # spec's static candidate table once the spec exists
        pot.__dict__["painn_args"] = dict(
            params=params, cfg=cfg, type_numbers=type_numbers, units=units,
            ensemble=ensemble, stoidict=stoidict,
        )
    return pot


def make_chgnet_potential(params, cfg, type_numbers, units: str = "eV",
                          static_nbr=None, routing_band=None) -> Potential:
    """Wrap the JAX CHGNet (models/chgnet.py) as a framework Potential —
    the counterpart of nff's CHGNetNFF calculator. CHGNet checkpoints
    predict energies in eV directly (intensive per-atom readout summed).
    ``static_nbr`` ranks the spec's candidate pairs instead of searching
    all image pairs (MC hot paths; see make_painn_potential).
    ``routing_band`` (ops.banding.RoutingBand) switches the fused atom
    conv to block-banded routing — the supercell fast path (forward-only;
    rigid MC)."""
    from surface_sampling_tpu.models.chgnet import chgnet_apply

    factor = UNIT_FACTORS[units]
    band = None
    if routing_band is not None:
        from surface_sampling_tpu.ops.pallas_painn import stage_band

        band = stage_band(routing_band)
    znums = jnp.asarray(np.asarray(type_numbers), jnp.int32)
    if static_nbr is not None:
        from surface_sampling_tpu.ops.neighbors import (
            make_table_edge_fn,
            make_table_topology_fns,
        )

        edge_fn = make_table_edge_fn(
            static_nbr, cfg.atom_graph_cutoff, cfg.max_neighbors
        )
        topo_fn, geom_fn = make_table_topology_fns(
            static_nbr, cfg.atom_graph_cutoff, cfg.max_neighbors
        )
    else:
        edge_fn = topo_fn = geom_fn = None

    def outputs(positions, type_idx, alive, shifts, edges=None):
        numbers = znums[type_idx] * alive.astype(jnp.int32)
        if edges is None:
            edges = edge_fn(positions, alive) if edge_fn is not None else None
        return chgnet_apply(params, cfg, positions, numbers, alive, shifts,
                            edges=edges, band=band)

    def energy(positions, type_idx, alive, shifts, edges=None):
        return outputs(positions, type_idx, alive, shifts,
                       edges=edges)["energy"] * factor

    def per_atom(positions, type_idx, alive, shifts):
        return outputs(positions, type_idx, alive, shifts)["per_atom_energy"] * factor

    pot = Potential(
        energy=energy,
        per_atom_energy=per_atom,
        cutoff=cfg.atom_graph_cutoff,
        name="chgnet",
    )
    pot.__dict__["outputs"] = outputs
    if topo_fn is not None:
        pot.__dict__["edge_topology"] = topo_fn
        pot.__dict__["edges_of"] = geom_fn
        pot.__dict__["energy_with_edges"] = energy
    if static_nbr is None:
        # rebuild hook: cli.common.assemble_system re-invokes with the
        # spec's static candidate table once the spec exists (same
        # mechanism as painn_args above)
        pot.__dict__["chgnet_args"] = dict(
            params=params, cfg=cfg, type_numbers=type_numbers, units=units
        )
    return pot
