"""Simple analytic pair potentials (Lennard-Jones, Morse).

Used for fast engine tests and as reference baselines; the reference's
LAMMPS path supports the same styles. Energy shifting is off to match
LAMMPS defaults.
"""

from __future__ import annotations

import jax.numpy as jnp

from surface_sampling_tpu.ops.neighbors import image_distances, image_pair_mask
from surface_sampling_tpu.potentials.base import Potential


def make_lennard_jones(epsilon: float, sigma: float, cutoff: float) -> Potential:
    """LJ 12-6: 4 eps [(sigma/r)^12 - (sigma/r)^6]."""

    def per_atom(positions, type_idx, alive, shifts):
        r, _ = image_distances(positions, shifts)
        mask = image_pair_mask(alive, r, cutoff).astype(r.dtype)
        rsafe = jnp.where(mask > 0, r, cutoff)
        sr6 = (sigma / rsafe) ** 6
        e = 4.0 * epsilon * (sr6 * sr6 - sr6) * mask
        return 0.5 * jnp.sum(e, axis=(0, 2))

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts))

    return Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff, name="lj")


def make_morse(D: float, alpha: float, r0: float, cutoff: float) -> Potential:
    """Morse: D [exp(-2 a (r - r0)) - 2 exp(-a (r - r0))]."""

    def per_atom(positions, type_idx, alive, shifts):
        r, _ = image_distances(positions, shifts)
        mask = image_pair_mask(alive, r, cutoff).astype(r.dtype)
        rsafe = jnp.where(mask > 0, r, cutoff)
        ex = jnp.exp(-alpha * (rsafe - r0))
        e = D * (ex * ex - 2.0 * ex) * mask
        return 0.5 * jnp.sum(e, axis=(0, 2))

    def energy(positions, type_idx, alive, shifts):
        return jnp.sum(per_atom(positions, type_idx, alive, shifts))

    return Potential(energy=energy, per_atom_energy=per_atom, cutoff=cutoff, name="morse")
