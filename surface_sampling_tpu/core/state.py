"""Device-side state and pure occupancy-move functions.

The reference's move primitives append/delete atoms and reindex arrays
(mcmc/slab.py:235-422, with the unit-test contract in tests/test_slab.py);
here every move is an int write into ``site_state`` and the realized atom
arrays are gathers. The reference's save_state/restore_state rollback
(mcmc/system.py:149-182) becomes a ``jnp.where`` select in the criterion.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.spec import SurfaceSpec


class MCState(NamedTuple):
    """Per-chain Markov state (a tiny pytree; vmap adds a leading chain axis).

    Attributes:
        site_state: (S,) int32 adsorbate code per site (0 = empty) — the
            analog of the reference's ``occ`` (mcmc/system.py:91).
        energy: () cached surface energy of the current state (the reference
            caches it in ``results["surface_energy"]``, criterion.py:146).
        relaxed_positions: (N, 3) last accepted relaxed geometry (equals the
            ideal template when relaxation is off).
        key: PRNG key.
    """

    site_state: jnp.ndarray
    energy: jnp.ndarray
    relaxed_positions: jnp.ndarray
    key: jax.Array


class DeviceSpec(NamedTuple):
    """Constant arrays of a SurfaceSpec, staged onto the device once."""

    pristine_numbers: jnp.ndarray     # (P,)
    pristine_positions: jnp.ndarray   # (P, 3)
    frozen_pristine: jnp.ndarray      # (P,) bool
    site_coords: jnp.ndarray          # (S, 3)
    code_numbers: jnp.ndarray         # (K+1, G)
    code_offsets: jnp.ndarray         # (K+1, G, 3)
    code_natoms: jnp.ndarray          # (K+1,)
    z_to_element: jnp.ndarray         # (Zmax+2,)
    type_of_z: jnp.ndarray            # (Zmax+2,)
    shifts: jnp.ndarray               # (Kimg, 3)
    n_elements: int
    n_codes: int


def device_spec(spec: SurfaceSpec, dtype=jnp.float32) -> DeviceSpec:
    return DeviceSpec(
        pristine_numbers=jnp.asarray(spec.pristine_numbers, jnp.int32),
        pristine_positions=jnp.asarray(spec.pristine_positions, dtype),
        frozen_pristine=jnp.asarray(spec.frozen_pristine, bool),
        site_coords=jnp.asarray(spec.site_coords, dtype),
        code_numbers=jnp.asarray(spec.code_numbers, jnp.int32),
        code_offsets=jnp.asarray(spec.code_offsets, dtype),
        code_natoms=jnp.asarray(spec.code_natoms, jnp.int32),
        z_to_element=jnp.asarray(spec.z_to_element, jnp.int32),
        type_of_z=jnp.asarray(spec.type_of_z, jnp.int32),
        shifts=jnp.asarray(spec.shifts, dtype),
        n_elements=len(spec.element_zs),
        n_codes=spec.n_codes,
    )


# ----------------------------------------------------------------------
# Realization: site_state -> padded atom arrays (pure gathers)
# ----------------------------------------------------------------------
def realize_numbers(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """(N,) atomic numbers of all slots (0 = dead)."""
    ads = d.code_numbers[site_state]                    # (S, G)
    return jnp.concatenate([d.pristine_numbers, ads.reshape(-1)])


def realize_positions(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) ideal (unrelaxed) slot positions.

    Adsorbate slot positions = site coordinate + group template offset
    (reference: add_atom sets ads_coords[site], slab.py:309; group offsets
    slab.py:336).
    """
    offs = d.code_offsets[site_state]                   # (S, G, 3)
    ads_pos = d.site_coords[:, None, :] + offs          # (S, G, 3)
    return jnp.concatenate([d.pristine_positions, ads_pos.reshape(-1, 3)])


def realize_alive(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool alive mask."""
    return realize_numbers(d, site_state) > 0


def realize_free_mask(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool — slots whose positions may relax (alive and not frozen
    bulk; the analog of ase FixAtoms, mcmc/system.py:293)."""
    alive = realize_alive(d, site_state)
    frozen = jnp.concatenate(
        [d.frozen_pristine, jnp.zeros(alive.shape[0] - d.frozen_pristine.shape[0], bool)]
    )
    return alive & ~frozen


def realize_type_idx(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """(N,) potential type index per slot (dead slots get type 0, masked out)."""
    return d.type_of_z[realize_numbers(d, site_state)]


def element_counts(d: DeviceSpec, site_state: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(E,) per-element atom counts — one one-hot matmul (MXU friendly).

    Replaces the reference's ``Counter(atoms.get_chemical_symbols())``
    (calculators.py:414).
    """
    numbers = realize_numbers(d, site_state)
    elem = d.z_to_element[numbers]                      # (N,) slot or -1
    onehot = jax.nn.one_hot(elem, d.n_elements, dtype=dtype)  # -1 rows are all-zero
    return jnp.sum(onehot, axis=0)


# ----------------------------------------------------------------------
# Moves (the whole of mcmc/slab.py:235-422, as int writes)
# ----------------------------------------------------------------------
def change_site(site_state: jnp.ndarray, site_idx, new_code) -> jnp.ndarray:
    """Set site ``site_idx`` to adsorbate code ``new_code`` (0 = desorb)."""
    return site_state.at[site_idx].set(new_code)


def exchange_sites(site_state: jnp.ndarray, site1, site2) -> jnp.ndarray:
    """Swap the adsorbate codes of two sites (canonical move,
    mcmc/events/event.py:138-151)."""
    c1 = site_state[site1]
    c2 = site_state[site2]
    return site_state.at[site1].set(c2).at[site2].set(c1)


def num_adsorbate_atoms(d: DeviceSpec, site_state: jnp.ndarray) -> jnp.ndarray:
    """Total adsorbed atoms (the reference's ``num_adsorbates`` counts occ
    entries; we count atoms for group correctness)."""
    return jnp.sum(d.code_natoms[site_state])


def num_occupied_sites(site_state: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum((site_state > 0).astype(jnp.int32))


def initial_state(
    d: DeviceSpec,
    key: jax.Array,
    site_state: jnp.ndarray | np.ndarray | None = None,
    energy: float = 0.0,
) -> MCState:
    """Fresh MCState with the given (or empty) occupancy."""
    if site_state is None:
        site_state = jnp.zeros(d.site_coords.shape[0], jnp.int32)
    site_state = jnp.asarray(site_state, jnp.int32)
    return MCState(
        site_state=site_state,
        energy=jnp.asarray(energy, d.pristine_positions.dtype),
        relaxed_positions=realize_positions(d, site_state),
        key=key,
    )
