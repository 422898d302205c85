"""Core MC machinery: spec, state, moves, relaxation, energies, engine."""

from surface_sampling_tpu.core.energy import (
    RelaxConfig,
    SymmetricSlabConfig,
    identity_surface_energy,
    make_chem_pot_surface_energy,
    make_offset_surface_energy,
    make_state_energy_fn,
)
from surface_sampling_tpu.core.engine import (
    EngineConfig,
    MCMCRun,
    geometric_schedule,
    make_run_fn,
    make_sweep_fn,
    prepare_canonical_fn,
)
from surface_sampling_tpu.core.events import (
    make_canonical_step,
    make_semigrand_step,
    metropolis_accept,
)
from surface_sampling_tpu.core.relax import FireConfig, fire_relax
from surface_sampling_tpu.core.spec import AdsorbateType, SurfaceSpec, make_spec
from surface_sampling_tpu.core.state import (
    DeviceSpec,
    MCState,
    change_site,
    device_spec,
    element_counts,
    exchange_sites,
    initial_state,
    realize_alive,
    realize_numbers,
    realize_positions,
    realize_type_idx,
)

__all__ = [
    "AdsorbateType",
    "DeviceSpec",
    "EngineConfig",
    "FireConfig",
    "MCMCRun",
    "MCState",
    "RelaxConfig",
    "SymmetricSlabConfig",
    "SurfaceSpec",
    "change_site",
    "device_spec",
    "element_counts",
    "exchange_sites",
    "fire_relax",
    "geometric_schedule",
    "identity_surface_energy",
    "initial_state",
    "make_canonical_step",
    "make_chem_pot_surface_energy",
    "make_offset_surface_energy",
    "make_run_fn",
    "make_semigrand_step",
    "make_spec",
    "make_state_energy_fn",
    "make_sweep_fn",
    "metropolis_accept",
    "prepare_canonical_fn",
    "realize_alive",
    "realize_numbers",
    "realize_positions",
    "realize_type_idx",
]
