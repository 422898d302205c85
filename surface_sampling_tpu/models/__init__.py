"""Neural potentials: PaiNN in JAX, ensembles, checkpoint conversion."""

from surface_sampling_tpu.models.ensemble import (
    ensemble_apply,
    ensemble_forces_std,
    stack_params,
)
from surface_sampling_tpu.models.chgnet import CHGNetConfig, chgnet_apply, init_chgnet
from surface_sampling_tpu.models.mace import MACEConfig, init_mace, mace_apply, make_mace_potential
from surface_sampling_tpu.models.nn_calculator import make_chgnet_potential, make_painn_potential
from surface_sampling_tpu.models.painn import PaiNNConfig, init_painn, painn_apply

__all__ = [
    "CHGNetConfig",
    "MACEConfig",
    "init_mace",
    "mace_apply",
    "make_mace_potential",
    "PaiNNConfig",
    "chgnet_apply",
    "init_chgnet",
    "make_chgnet_potential",
    "ensemble_apply",
    "ensemble_forces_std",
    "init_painn",
    "make_painn_potential",
    "painn_apply",
    "stack_params",
]
