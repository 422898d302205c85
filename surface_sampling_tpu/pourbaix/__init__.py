"""Electrochemical (Pourbaix) sampling support."""

from surface_sampling_tpu.pourbaix.atoms import (
    PourbaixAtom,
    generate_pourbaix_atoms,
    load_pourbaix_atoms,
    save_pourbaix_atoms,
)
from surface_sampling_tpu.pourbaix.entries import (
    PhaseDiagramLite,
    PourbaixDiagramLite,
)
from surface_sampling_tpu.pourbaix.potential import make_pourbaix_surface_energy
from surface_sampling_tpu.pourbaix.utils import SurfaceOHCompatibility

__all__ = [
    "PhaseDiagramLite",
    "PourbaixAtom",
    "PourbaixDiagramLite",
    "SurfaceOHCompatibility",
    "generate_pourbaix_atoms",
    "load_pourbaix_atoms",
    "make_pourbaix_surface_energy",
    "save_pourbaix_atoms",
]
