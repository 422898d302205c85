"""Host-side structure layer: lattices, slabs, adsorption sites, file I/O.

This layer replaces the reference's dependence on ase/pymatgen/CatKit
(reference: mcmc/system.py:9-18, mcmc/utils/slab.py) with a minimal
self-contained implementation. Everything here is one-time host
preprocessing; its outputs are plain numpy arrays handed to the device.
"""

from surface_sampling_tpu.structure.atoms import Structure
from surface_sampling_tpu.structure.slabs import (
    bulk,
    surface_from_bulk,
    symmetrize_slab,
)
from surface_sampling_tpu.structure.sites import find_adsorption_sites

__all__ = [
    "Structure",
    "bulk",
    "surface_from_bulk",
    "symmetrize_slab",
    "find_adsorption_sites",
]
