"""Potential API: pure functions over fixed-shape masked atom arrays.

The reference delegates classical energies to LAMMPS (C++ subprocess or
C-API, mcmc/calculators/calculators.py:492-812) and neural energies to
torch. Here every potential is a pair of jittable pure functions closed
over constant parameter arrays, so a potential composes directly with
``vmap`` (chains), ``grad`` (forces), ``lax.scan`` (MC steps) and
``shard_map`` (device meshes).

Conventions:
    positions: (N, 3) float cartesian, padded to a static N.
    type_idx:  (N,) int32 index into the potential's type table.
    alive:     (N,) bool; padding/vacant slots are False and contribute 0.
    shifts:    (K, 3) cartesian periodic image shifts (zero shift first),
               precomputed on the host by ops.neighbors.pair_shifts from
               the (static) cell + cutoff. Periodicity enters only here.
Energies are eV, distances Angstrom, forces eV/Angstrom.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Potential:
    """A bundle of pure energy functions.

    Attributes:
        energy: (positions, type_idx, alive, shifts) -> scalar eV.
        per_atom_energy: same signature -> (N,) eV (zero on dead slots).
        cutoff: interaction cutoff in Angstrom.
        name: for logs.
    """

    energy: Callable
    per_atom_energy: Callable
    cutoff: float
    name: str = "potential"

    def forces(self, positions, type_idx, alive, shifts):
        """Forces = -dE/dpositions (autodiff; masked slots get 0)."""
        g = jax.grad(self.energy)(positions, type_idx, alive, shifts)
        return -jnp.where(alive[:, None], g, 0.0)

    def energy_and_forces(self, positions, type_idx, alive, shifts):
        e, g = jax.value_and_grad(self.energy)(positions, type_idx, alive, shifts)
        return e, -jnp.where(alive[:, None], g, 0.0)
