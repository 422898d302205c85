"""Warm-started ball-local relaxation MC (core/local_relax.py).

Parity strategy: with a ball that covers every free slot and a fresh
(lattice-positioned) chain, one local-relax evaluation must run the exact
FIRE trajectory of the full relaxed path (core/energy.py), because the
start geometry, free mask and objective coincide. Locality: slots outside
the ball never move. Reference counterpart being re-designed: the per-move
warm-started optimize of mcmc/dynamics.py:83,140-141 driven from
mcmc/mcmc.py:233 (rejected moves restore positions, mcmc.py:246-252).
"""

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core import (
    MCMCRun,
    RelaxConfig,
    initial_state,
    make_spec,
    make_state_energy_fn,
)
from surface_sampling_tpu.core.local_relax import (
    build_ball_masks,
    make_local_relax_canonical_step,
    make_local_relax_eval,
    make_local_relax_run,
    make_local_relax_semigrand_step,
)
from surface_sampling_tpu.core.state import (
    change_site,
    num_occupied_sites,
    realize_positions,
)
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.structure.slabs import fcc100
from surface_sampling_tpu.structure.sites import find_adsorption_sites


def lj_relax_system(steps=8, fmax=0.02):
    slab = fcc100("Cu", size=(2, 2, 2), a=1.5 * 2**0.5, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=1.2)["all"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=3.0)
    pot = make_lennard_jones(epsilon=0.4, sigma=1.05, cutoff=3.0)
    relax = RelaxConfig(steps=steps, fmax=fmax)
    run = MCMCRun(spec, pot, relax=relax)
    nbr = build_static_neighbor_table(spec, 3.0, relax_slack=0.3)
    return spec, pot, run, relax, nbr


def test_full_ball_parity_with_full_relax_path():
    """hops large enough that the ball covers every slot + a fresh
    lattice-positioned chain => identical FIRE trajectory, energy and
    relaxed positions as make_state_energy_fn's relax branch."""
    spec, pot, run, relax, nbr = lj_relax_system()
    d = run.d
    balls = build_ball_masks(spec, nbr, hops=6)
    assert balls.all(), "test premise: ball covers the whole cell"
    evaluate = jax.jit(make_local_relax_eval(
        d, pot, relax=relax, ball_masks=balls))
    full = jax.jit(make_state_energy_fn(d, pot, relax=relax))

    state = initial_state(d, jax.random.PRNGKey(0))
    # fresh chain: positions are the lattice realization
    pos_prev = realize_positions(d, state.site_state)
    site = 3
    trial_ss = change_site(state.site_state, site, 1)
    e_loc = evaluate(trial_ss, pos_prev,
                     jnp.asarray([site, site], jnp.int32))
    e_full = full(trial_ss)
    np.testing.assert_allclose(float(e_loc.surface_energy),
                               float(e_full.surface_energy),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_loc.positions),
                               np.asarray(e_full.positions),
                               rtol=1e-6, atol=1e-6)
    assert bool(e_loc.oob) == bool(e_full.oob)


def test_far_field_frozen_outside_ball():
    """Slots outside the moved site's ball keep their positions bitwise."""
    spec, pot, run, relax, nbr = lj_relax_system()
    d = run.d
    balls = build_ball_masks(spec, nbr, hops=1)
    evaluate = jax.jit(make_local_relax_eval(
        d, pot, relax=relax, ball_masks=balls))
    rng = np.random.default_rng(1)
    ss0 = (rng.random(spec.n_sites) < 0.5).astype(np.int32)
    state = initial_state(d, jax.random.PRNGKey(1), site_state=ss0)
    pos_prev = realize_positions(d, state.site_state)
    site = 0
    trial_ss = change_site(state.site_state, site, 1)
    e = evaluate(trial_ss, pos_prev, jnp.asarray([site, site], jnp.int32))
    outside = ~balls[site]
    np.testing.assert_array_equal(np.asarray(e.positions)[outside],
                                  np.asarray(pos_prev)[outside])
    # something inside the ball did relax
    assert np.abs(np.asarray(e.positions) - np.asarray(pos_prev)).max() > 0


def test_semigrand_chain_runs_and_rolls_back():
    """A short vmapped local-relax chain: finite energies, rejected moves
    keep positions (functional rollback), record schema matches
    core.engine.SweepRecord."""
    spec, pot, run, relax, nbr = lj_relax_system(steps=4)
    d = run.d
    balls = build_ball_masks(spec, nbr, hops=1)
    evaluate = make_local_relax_eval(d, pot, relax=relax, ball_masks=balls)
    step = make_local_relax_semigrand_step(d, evaluate)
    run_fn = jax.jit(jax.vmap(make_local_relax_run(step, sweep_size=3),
                              in_axes=(0, None)))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    states = jax.vmap(lambda k: initial_state(d, k))(keys)
    # consistent starting energies from the full path
    full = jax.vmap(make_state_energy_fn(d, pot, relax=relax))
    e0 = full(states.site_state)
    states = states._replace(energy=e0.surface_energy,
                             relaxed_positions=e0.positions)
    temps = jnp.full((2,), 0.3, jnp.float32)
    out, rec = run_fn(states, temps)
    assert np.isfinite(np.asarray(rec.energy)).all()
    assert rec.site_state.shape == (2, 2, spec.n_sites)
    assert rec.positions.shape[-1] == 3
    # chain energies are true energies of the carried geometry: re-evaluate
    # the final states' potential energy at their relaxed positions
    for c in range(2):
        ss = out.site_state[c]
        from surface_sampling_tpu.core.state import (
            realize_alive,
            realize_type_idx,
        )
        e_re = pot.energy(out.relaxed_positions[c], realize_type_idx(d, ss),
                          realize_alive(d, ss), d.shifts)
        np.testing.assert_allclose(float(out.energy[c]), float(e_re),
                                   rtol=1e-5, atol=1e-5)


def test_canonical_step_conserves_composition():
    spec, pot, run, relax, nbr = lj_relax_system(steps=3)
    d = run.d
    balls = build_ball_masks(spec, nbr, hops=1)
    evaluate = make_local_relax_eval(d, pot, relax=relax, ball_masks=balls)
    step = jax.jit(make_local_relax_canonical_step(d, evaluate))
    rng = np.random.default_rng(3)
    ss0 = (rng.random(spec.n_sites) < 0.5).astype(np.int32)
    state = initial_state(d, jax.random.PRNGKey(3), site_state=ss0)
    pos0 = realize_positions(d, state.site_state)
    state = state._replace(relaxed_positions=pos0)
    comp0 = np.sort(np.asarray(state.site_state))
    for _ in range(6):
        state, info = step(state, jnp.asarray(0.5, jnp.float32))
    np.testing.assert_array_equal(np.sort(np.asarray(state.site_state)), comp0)
    assert np.isfinite(float(state.energy))
