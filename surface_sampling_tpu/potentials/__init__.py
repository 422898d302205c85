"""Interatomic potentials: classical (EAM/Tersoff/SW/pair) and neural (PaiNN).

All potentials expose the same pure-function API (potentials/base.py) so
the MC engine, the relaxer and the chain-parallel runners are agnostic to
the physics backend — the TPU-native analog of the reference's ASE
Calculator protocol (mcmc/calculators/calculators.py:34-812).
"""

from surface_sampling_tpu.potentials.base import Potential
from surface_sampling_tpu.potentials.eam import (
    builtin_eam,
    load_tables_npz,
    make_eam,
    parse_funcfl,
    tables_from_funcfl,
)
from surface_sampling_tpu.potentials.pair import make_lennard_jones, make_morse
from surface_sampling_tpu.potentials.rigid_manybody import make_sw_rigid, make_tersoff_rigid
from surface_sampling_tpu.potentials.sw import (
    SW_SI_1985,
    make_sw,
    parse_sw,
    sw_tables,
    sw_tables_from_kim,
)
from surface_sampling_tpu.potentials.tersoff import (
    builtin_tersoff,
    load_tersoff,
    make_tersoff,
    parse_tersoff,
)

__all__ = [
    "SW_SI_1985",
    "builtin_tersoff",
    "load_tersoff",
    "make_sw",
    "make_sw_rigid",
    "make_tersoff",
    "make_tersoff_rigid",
    "parse_sw",
    "parse_tersoff",
    "sw_tables",
    "sw_tables_from_kim",
    "Potential",
    "builtin_eam",
    "load_tables_npz",
    "make_eam",
    "parse_funcfl",
    "tables_from_funcfl",
    "make_lennard_jones",
    "make_morse",
]
