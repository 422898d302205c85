"""Pallas EAM kernel semantics, validated in interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core.state import realize_alive, realize_positions
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.ops.pallas_eam import make_pallas_eam_energy
from surface_sampling_tpu.potentials import builtin_eam
from surface_sampling_tpu.systems import cu100_eam


@pytest.fixture(scope="module")
def setup():
    base = cu100_eam(fast=True)
    tables = builtin_eam("Cu_u3")
    nbr = build_static_neighbor_table(base.spec, tables.cutoff, relax_slack=0.05)
    energy, batched = make_pallas_eam_energy(tables, nbr, interpret=True)
    return base, energy, batched


def _physical_configs(S):
    cfgs = [jnp.zeros(S, jnp.int32)]
    for i in (0, 3, 7, 11, 20):
        cfgs.append(jnp.zeros(S, jnp.int32).at[i].set(1))
    cfgs.append(jnp.zeros(S, jnp.int32).at[0].set(1).at[15].set(1))
    return jnp.stack(cfgs)


def test_kernel_matches_cheb_path(setup):
    base, energy, batched = setup
    d = base.run.d
    ssb = _physical_configs(len(base.spec.site_coords))
    pos = jax.vmap(lambda s: realize_positions(d, s))(ssb)
    alive = jax.vmap(lambda s: realize_alive(d, s))(ssb).astype(jnp.float32)
    e_kernel = np.asarray(batched(pos, alive))
    e_ref = np.asarray(
        jax.vmap(lambda s: base.run.state_energy_fn(s).potential_energy)(ssb)
    )
    # compare where the reference is not OOB-clamped
    ok = np.abs(e_ref) < 999.0
    assert ok.any()
    assert np.abs(e_kernel - e_ref)[ok].max() < 1e-3


def test_kernel_custom_vmap_route(setup):
    base, energy, batched = setup
    d = base.run.d
    ssb = _physical_configs(len(base.spec.site_coords))
    pos = jax.vmap(lambda s: realize_positions(d, s))(ssb)
    alive = jax.vmap(lambda s: realize_alive(d, s))(ssb).astype(jnp.float32)
    e_batched = np.asarray(batched(pos, alive))
    e_vmapped = np.asarray(jax.vmap(energy)(pos, alive))
    np.testing.assert_allclose(e_vmapped, e_batched, rtol=1e-6)
    # single-call (unbatched) route
    e_one = float(energy(pos[0], alive[0]))
    assert np.isclose(e_one, e_batched[0], rtol=1e-6)


def test_kernel_handles_nonmultiple_batch(setup):
    base, energy, batched = setup
    d = base.run.d
    ssb = _physical_configs(len(base.spec.site_coords))[:5]  # not a multiple of 8
    pos = jax.vmap(lambda s: realize_positions(d, s))(ssb)
    alive = jax.vmap(lambda s: realize_alive(d, s))(ssb).astype(jnp.float32)
    e = np.asarray(batched(pos, alive))
    assert e.shape == (5,)
    assert np.all(np.isfinite(e))
