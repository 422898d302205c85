"""Frozen-far-field approximate-descent ball relax (core/ff_relax.py).

Parity strategy mirrors tests/test_local_relax.py: with a ball covering
every slot (empty ring — nothing frozen), a fresh lattice-positioned
chain's FF descent minimizes the same objective as the full relaxed path
(core/energy.py), so energies and relaxed positions must coincide to fp
tolerance. Locality: rows outside the moved site's ball never move.
Acceptance energies are ALWAYS full-cell evaluations (no locality error
by construction) — pinned by re-evaluating carried chain energies.
Reference policy being re-designed: mcmc/dynamics.py:83,140-141.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import (
    RelaxConfig,
    initial_state,
    make_spec,
    make_state_energy_fn,
)
from surface_sampling_tpu.core.ff_relax import (
    build_ff_tables,
    make_ff_canonical_step,
    make_ff_init,
    make_ff_relax_eval,
    make_ff_run,
    make_ff_semigrand_step,
)
from surface_sampling_tpu.core.state import (
    change_site,
    realize_alive,
    realize_positions,
    realize_type_idx,
)
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.models.nn_calculator import make_painn_potential
from surface_sampling_tpu.models.painn import PaiNNConfig, init_painn
from surface_sampling_tpu.structure.slabs import fcc100
from surface_sampling_tpu.structure.sites import find_adsorption_sites


@pytest.fixture(scope="module")
def painn_relax_system():
    slab = fcc100("Cu", size=(2, 2, 2), a=1.5 * 2**0.5, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=1.2)["all"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=3.0)
    cfg = PaiNNConfig(feat_dim=16, n_rbf=6, cutoff=3.0, n_layers=2,
                      readout_hidden=8, max_neighbors=24,
                      excl_vol=True, sigma=1.05, power=12.0)
    params = init_painn(jax.random.PRNGKey(11), cfg)
    nbr = build_static_neighbor_table(spec, 3.0, relax_slack=0.3)
    pot = make_painn_potential(params, cfg, [29], units="eV",
                               static_nbr=nbr)
    relax = RelaxConfig(steps=8, fmax=0.02)
    return spec, pot, relax, nbr


def test_ff_tables_invariants(painn_relax_system):
    spec, pot, relax, nbr = painn_relax_system
    t = build_ff_tables(spec, nbr, hops=1)
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    assert t.rows.shape[0] == S and t.rows.max() < N
    assert t.slot_j.shape == t.slot_valid.shape == t.slot_shift_idx.shape
    for s in range(S):
        rows = t.rows[s][t.row_valid[s]]
        ball = t.rows[s][: t.n_ball][t.row_valid[s][: t.n_ball]]
        # the moved site's own slots are in the ball
        for g in range(G):
            assert P + s * G + g in ball
        # ball and ring are disjoint (no duplicates among valid rows)
        assert len(np.unique(rows)) == len(rows)
        # every valid candidate of every ball row lands inside the
        # subproblem (ball + ring) — the closure the runtime scatter
        # localization relies on
        row_set = set(rows.tolist())
        for i in ball:
            nbrs = t.slot_j[i][t.slot_valid[i]]
            assert set(nbrs.tolist()) <= row_set
    assert 0.0 < t.ball_frac <= 1.0


def test_full_ball_parity_with_full_relax_path(painn_relax_system):
    """hops large enough that every slot is in the ball (nothing frozen)
    + a fresh lattice-positioned chain => the FF descent minimizes the
    same objective as the full relaxed path; energies and positions
    coincide."""
    spec, pot, relax, nbr = painn_relax_system
    from surface_sampling_tpu.core.state import device_spec

    d = device_spec(spec)
    t = build_ff_tables(spec, nbr, hops=8)
    assert t.ball_frac == 1.0, "test premise: ball covers the whole cell"
    evaluate = make_ff_relax_eval(d, pot, relax=relax, tables=t)
    full = jax.jit(make_state_energy_fn(d, pot, relax=relax))
    init = jax.jit(make_ff_init(d, evaluate,
                                make_state_energy_fn(d, pot, relax=relax)))
    state = initial_state(d, jax.random.PRNGKey(0))
    ffs = init(state.key, state.site_state)
    pos_prev = realize_positions(d, state.site_state)
    site = 3
    trial_ss = change_site(state.site_state, site, 1)
    e_loc, _caches = jax.jit(evaluate.evaluate1)(
        trial_ss, pos_prev, (ffs.cache_s, ffs.cache_v), jnp.asarray(site))
    e_full = full(trial_ss)
    np.testing.assert_allclose(float(e_loc.surface_energy),
                               float(e_full.surface_energy),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e_loc.positions),
                               np.asarray(e_full.positions),
                               rtol=2e-3, atol=2e-3)
    assert bool(e_loc.oob) == bool(e_full.oob)


def test_far_field_frozen_outside_ball(painn_relax_system):
    """Rows outside the moved site's relax ball keep positions bitwise."""
    spec, pot, relax, nbr = painn_relax_system
    from surface_sampling_tpu.core.state import device_spec

    d = device_spec(spec)
    t = build_ff_tables(spec, nbr, hops=1)
    evaluate = make_ff_relax_eval(d, pot, relax=relax, tables=t)
    init = jax.jit(make_ff_init(d, evaluate,
                                make_state_energy_fn(d, pot, relax=relax)))
    rng = np.random.default_rng(1)
    ss0 = (rng.random(spec.n_sites) < 0.5).astype(np.int32)
    ffs = init(jax.random.PRNGKey(1), jnp.asarray(ss0))
    site = 0
    trial_ss = change_site(ffs.site_state, site, 1)
    e, _ = jax.jit(evaluate.evaluate1)(
        trial_ss, ffs.relaxed_positions, (ffs.cache_s, ffs.cache_v),
        jnp.asarray(site))
    N = ffs.relaxed_positions.shape[0]
    in_ball = np.zeros(N, bool)
    in_ball[t.rows[site][: t.n_ball][t.row_valid[site][: t.n_ball]]] = True
    np.testing.assert_array_equal(np.asarray(e.positions)[~in_ball],
                                  np.asarray(ffs.relaxed_positions)[~in_ball])
    assert np.abs(np.asarray(e.positions)
                  - np.asarray(ffs.relaxed_positions)).max() > 0


def test_ff_semigrand_chain_runs_and_rolls_back(painn_relax_system):
    """Short vmapped FF chains: finite energies, acceptance energies are
    true full-cell energies of the carried geometry, caches refresh on
    accept (pinned by re-evaluating the final state)."""
    spec, pot, relax_, nbr = painn_relax_system
    relax = RelaxConfig(steps=4, fmax=relax_.fmax)
    from surface_sampling_tpu.core.state import device_spec

    d = device_spec(spec)
    t = build_ff_tables(spec, nbr, hops=1)
    evaluate = make_ff_relax_eval(d, pot, relax=relax, tables=t)
    init = make_ff_init(d, evaluate,
                        make_state_energy_fn(d, pot, relax=relax))
    step = make_ff_semigrand_step(d, evaluate)
    run_fn = jax.jit(jax.vmap(make_ff_run(step, sweep_size=3),
                              in_axes=(0, None)))
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    states = jax.vmap(init)(keys, jnp.zeros((2, spec.n_sites), jnp.int32))
    temps = jnp.full((2,), 0.3, jnp.float32)
    out, rec = run_fn(states, temps)
    assert np.isfinite(np.asarray(rec.energy)).all()
    assert rec.site_state.shape == (2, 2, spec.n_sites)
    for c in range(2):
        ss = out.site_state[c]
        e_re = pot.energy(out.relaxed_positions[c], realize_type_idx(d, ss),
                          realize_alive(d, ss), d.shifts)
        np.testing.assert_allclose(float(out.energy[c]), float(e_re),
                                   rtol=1e-5, atol=1e-5)
        # caches are the layer inputs of a fresh forward at the carried
        # geometry (refresh-on-accept wiring)
        outs = pot.__dict__["outputs"](
            out.relaxed_positions[c], realize_type_idx(d, ss),
            realize_alive(d, ss), d.shifts, collect_layers=True)
        np.testing.assert_allclose(np.asarray(out.cache_s[c][0]),
                                   np.asarray(outs["layer_s"]),
                                   rtol=1e-5, atol=1e-6)


def test_ff_canonical_step_conserves_composition(painn_relax_system):
    spec, pot, relax_, nbr = painn_relax_system
    relax = RelaxConfig(steps=3, fmax=relax_.fmax)
    from surface_sampling_tpu.core.state import device_spec

    d = device_spec(spec)
    t = build_ff_tables(spec, nbr, hops=1)
    evaluate = make_ff_relax_eval(d, pot, relax=relax, tables=t)
    init = make_ff_init(d, evaluate,
                        make_state_energy_fn(d, pot, relax=relax))
    step = jax.jit(make_ff_canonical_step(d, evaluate))
    rng = np.random.default_rng(3)
    ss0 = (rng.random(spec.n_sites) < 0.5).astype(np.int32)
    state = init(jax.random.PRNGKey(3), jnp.asarray(ss0))
    comp0 = np.sort(np.asarray(state.site_state))
    for _ in range(4):
        state, info = step(state, jnp.asarray(0.5, jnp.float32))
    np.testing.assert_array_equal(np.sort(np.asarray(state.site_state)), comp0)
    assert np.isfinite(float(state.energy))
