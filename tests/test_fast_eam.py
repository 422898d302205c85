"""Correctness of the fast EAM path (static pairs + polynomial tables)."""

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core import geometric_schedule, EngineConfig
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.potentials import builtin_eam
from surface_sampling_tpu.potentials.eam import make_eam_static
from surface_sampling_tpu.systems import cu100_eam


def test_fast_matches_exact_on_random_occupancies():
    sys_exact = cu100_eam()
    sys_fast = cu100_eam(fast=True)
    S = len(sys_exact.spec.site_coords)
    key = jax.random.PRNGKey(0)
    f_exact = jax.jit(lambda ss: sys_exact.run.state_energy_fn(ss).surface_energy)
    f_fast = jax.jit(lambda ss: sys_fast.run.state_energy_fn(ss).surface_energy)
    for _ in range(10):
        key, k = jax.random.split(key)
        ss = jax.random.randint(k, (S,), 0, 2)
        e1, e2 = float(f_exact(ss)), float(f_fast(ss))
        assert abs(e1 - e2) < 5e-4, (e1, e2)


def test_fast_spline_mode_matches_exact():
    """mode='spline' on the static pair table must equal the dense path to
    f32 roundoff (identical physics, reduced pair set)."""
    sys_exact = cu100_eam()
    tables = builtin_eam("Cu_u3")
    nbr = build_static_neighbor_table(sys_exact.spec, tables.cutoff, relax_slack=0.05)
    pot = make_eam_static(tables, nbr, mode="spline")
    from surface_sampling_tpu.core import MCMCRun

    run2 = MCMCRun(sys_exact.spec, pot)
    S = len(sys_exact.spec.site_coords)
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, k = jax.random.split(key)
        ss = jax.random.randint(k, (S,), 0, 2)
        e1 = float(sys_exact.run.state_energy_fn(ss).surface_energy)
        e2 = float(run2.state_energy_fn(ss).surface_energy)
        assert abs(e1 - e2) < 2e-4, (e1, e2)


def test_fast_full_run_finds_same_physics():
    """A short annealed run on both paths lands in comparable minima."""
    temps = geometric_schedule(1.0, 6, 0.9)
    cfg = EngineConfig(sweep_size=8)
    _, rec_exact = cu100_eam().run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    _, rec_fast = cu100_eam(fast=True).run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    # identical PRNG stream + near-identical energies -> identical trajectory
    np.testing.assert_array_equal(
        np.asarray(rec_exact.site_state[-1]), np.asarray(rec_fast.site_state[-1])
    )
    np.testing.assert_allclose(
        np.asarray(rec_exact.energy), np.asarray(rec_fast.energy), atol=2e-3
    )
