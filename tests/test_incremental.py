"""Delta-energy locality (core/incremental.py): exact parity of the
cached-feature MC path against full evaluation on random move sequences
— the correctness gate for the supercell fast path (the reference
recomputes the whole slab per move, mcmc/mcmc.py:233; here a move only
recomputes its hop balls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import make_spec
from surface_sampling_tpu.core.incremental import (
    build_inc_tables,
    make_incremental_canonical_step,
    make_incremental_painn,
    make_incremental_run,
    make_incremental_semigrand_step,
)
from surface_sampling_tpu.core.state import device_spec
from surface_sampling_tpu.core.static_neighbors import build_static_neighbor_table
from surface_sampling_tpu.models.painn import PaiNNConfig, init_painn
from surface_sampling_tpu.models.train import init_ensemble
from surface_sampling_tpu.ops.banding import (
    build_routing_band,
    spec_slot_centers,
)
from surface_sampling_tpu.ops.pallas_painn import choose_message_block
from surface_sampling_tpu.structure import Structure


@pytest.fixture(scope="module")
def toy_system():
    """Elongated toy spec whose candidate windows genuinely band
    (cell 42 A along x, cutoff 4 A) with a mix of pristine + site slots."""
    rng = np.random.default_rng(5)
    xs = np.arange(21) * 2.0 + 0.3
    pos = np.stack([xs, np.full(21, 2.0), np.full(21, 5.0)], axis=1)
    pos[:, 1] += rng.uniform(-0.3, 0.3, 21)
    slab = Structure.from_symbols(["Ti"] * 21, pos, np.diag([42.0, 4.2, 16.0]))
    sites = pos + np.array([0.7, 0.0, 1.9])
    cfg = PaiNNConfig(feat_dim=16, n_rbf=6, cutoff=4.0, n_layers=2,
                      readout_hidden=8, max_neighbors=10, excl_vol=True,
                      sigma=1.2, power=8.0)
    spec = make_spec(slab, sites, ["O", "Sr"], potential_numbers=[22, 8, 38],
                     cutoff=cfg.cutoff, surface_name="toy_band")
    static_nbr = build_static_neighbor_table(spec, cfg.cutoff, relax_slack=0.1)
    N = spec.n_pristine + spec.n_sites * spec.group_size
    n_pad = ((N + 15) // 16) * 16
    band = build_routing_band(
        spec_slot_centers(spec), static_nbr.slot_j, static_nbr.valid,
        choose_message_block(n_pad), n_pad)
    assert band is not None, "toy geometry must band"
    return spec, cfg, static_nbr, band


def _full_reference(spec, d, params, cfg, static_nbr, ensemble):
    """Full-evaluation surface energy via the standard potential path."""
    from surface_sampling_tpu.models.nn_calculator import make_painn_potential
    from surface_sampling_tpu.core.energy import make_state_energy_fn

    pot = make_painn_potential(params, cfg, [22, 8, 38], units="kcal/mol",
                               ensemble=ensemble, static_nbr=static_nbr)
    return make_state_energy_fn(d, pot)


@pytest.mark.parametrize("n_models", [1, 2])
def test_incremental_matches_full_on_random_moves(toy_system, n_models):
    spec, cfg, static_nbr, band = toy_system
    d = device_spec(spec)
    key = jax.random.PRNGKey(0)
    params = (init_painn(key, cfg) if n_models == 1
              else init_ensemble(key, cfg, n_models))
    eng = make_incremental_painn(
        spec, d, params, cfg, static_nbr, band, [22, 8, 38],
        units="kcal/mol")
    full = _full_reference(spec, d, params, cfg, static_nbr, n_models > 1)

    rng = np.random.default_rng(1)
    S = spec.n_sites
    ss = jnp.asarray(rng.integers(0, spec.n_codes, S), jnp.int32)
    se0, caches, _ = eng.energy_full(ss)
    np.testing.assert_allclose(
        float(se0), float(full(ss).surface_energy), rtol=1e-5, atol=1e-4)

    # random accepted move sequence: single-site changes + exchanges,
    # checking the CACHED state's energy against a fresh full evaluation
    # after every move (caches must stay exact through accept chains)
    for step in range(12):
        if step % 3 == 2:
            s1, s2 = rng.integers(0, S, 2)
            trial = ss.at[s1].set(ss[s2]).at[s2].set(ss[s1])
            sites2 = jnp.asarray([s1, s2], jnp.int32)
        else:
            s1 = rng.integers(0, S)
            code = rng.integers(0, spec.n_codes)
            trial = ss.at[s1].set(code)
            sites2 = jnp.asarray([s1, s1], jnp.int32)
        se, caches, _oob = eng.delta(caches, trial, sites2)
        ss = trial
        se_ref = float(full(ss).surface_energy)
        np.testing.assert_allclose(float(se), se_ref, rtol=1e-5, atol=1e-4,
                                   err_msg=f"move {step}")
    # terminal cache re-check against a fresh init
    se_fin, _, _ = eng.energy_full(ss)
    np.testing.assert_allclose(float(se), float(se_fin), rtol=1e-5, atol=1e-4)


def test_incremental_mc_chain_matches_full_chain(toy_system):
    """The incremental semigrand step must reproduce the full-evaluation
    step chain DECISION-FOR-DECISION (same keys, same proposals, same
    accept/reject) with matching energies along the way."""
    from surface_sampling_tpu.core.energy import make_state_energy_fn
    from surface_sampling_tpu.core.events import make_semigrand_step
    from surface_sampling_tpu.core.state import MCState, initial_state

    spec, cfg, static_nbr, band = toy_system
    d = device_spec(spec)
    params = init_painn(jax.random.PRNGKey(3), cfg)
    eng = make_incremental_painn(
        spec, d, params, cfg, static_nbr, band, [22, 8, 38],
        units="kcal/mol")
    full = _full_reference(spec, d, params, cfg, static_nbr, False)
    step_full = make_semigrand_step(d, full)
    step_inc = make_incremental_semigrand_step(eng)

    key = jax.random.PRNGKey(9)
    S = spec.n_sites
    ss0 = jnp.zeros(S, jnp.int32).at[2].set(1).at[7].set(2)
    st_full = initial_state(d, key, site_state=ss0)
    st_full = st_full._replace(energy=full(ss0).surface_energy)
    st_inc = eng.init_state(key, ss0)
    np.testing.assert_allclose(float(st_inc.energy), float(st_full.energy),
                               rtol=1e-5, atol=1e-4)

    temp = jnp.asarray(0.8, jnp.float32)
    for i in range(10):
        st_full, info_f = step_full(st_full, temp)
        st_inc, info_i = step_inc(st_inc, temp)
        assert bool(info_f.accepted) == bool(info_i.accepted), f"step {i}"
        np.testing.assert_array_equal(np.asarray(st_full.site_state),
                                      np.asarray(st_inc.site_state))
        np.testing.assert_allclose(float(st_inc.energy),
                                   float(st_full.energy),
                                   rtol=1e-5, atol=1e-4, err_msg=f"step {i}")


def test_incremental_run_scan(toy_system):
    """The scan runner executes sweeps end-to-end (vmappable) and keeps
    finite energies and sane acceptance bookkeeping."""
    spec, cfg, static_nbr, band = toy_system
    d = device_spec(spec)
    params = init_painn(jax.random.PRNGKey(4), cfg)
    eng = make_incremental_painn(
        spec, d, params, cfg, static_nbr, band, [22, 8, 38],
        units="kcal/mol")
    step = make_incremental_semigrand_step(eng)
    run = jax.jit(make_incremental_run(step, sweep_size=4))
    st = eng.init_state(jax.random.PRNGKey(11),
                        jnp.zeros(spec.n_sites, jnp.int32))
    temps = jnp.asarray([1.0, 0.8, 0.6], jnp.float32)
    out, rec = run(st, temps)
    assert rec.energy.shape == (3,)
    assert np.all(np.isfinite(np.asarray(rec.energy)))
    assert np.all((np.asarray(rec.accept_rate) >= 0)
                  & (np.asarray(rec.accept_rate) <= 1))
    # final recorded energy equals a fresh full evaluation of the final state
    se_fin, _, _ = eng.energy_full(out.site_state)
    np.testing.assert_allclose(float(out.energy), float(se_fin),
                               rtol=1e-5, atol=1e-4)


def test_incremental_metropolis_distance_matches_full(toy_system):
    """criterion='metropolis_distance': the incremental step applies the
    same hard-wall candidate-pair filter as the full-evaluation step
    (events.make_distance_accept) — chains must agree decision-for-
    decision, and some trial must actually be rejected by the wall (the
    toy sites are ~2 A apart, inside the 2.2 A filter)."""
    from surface_sampling_tpu.core.events import make_semigrand_step
    from surface_sampling_tpu.core.state import initial_state

    spec, cfg, static_nbr, band = toy_system
    d = device_spec(spec)
    params = init_painn(jax.random.PRNGKey(3), cfg)
    eng = make_incremental_painn(
        spec, d, params, cfg, static_nbr, band, [22, 8, 38],
        units="kcal/mol")
    full = _full_reference(spec, d, params, cfg, static_nbr, False)
    fd = 2.2
    step_full = make_semigrand_step(d, full, criterion="metropolis_distance",
                                    filter_distance=fd)
    step_inc = make_incremental_semigrand_step(
        eng, d=d, criterion="metropolis_distance", filter_distance=fd)

    key = jax.random.PRNGKey(2)
    ss0 = jnp.zeros(spec.n_sites, jnp.int32).at[4].set(1)
    st_full = initial_state(d, key, site_state=ss0)
    st_full = st_full._replace(energy=full(ss0).surface_energy)
    st_inc = eng.init_state(key, ss0)

    temp = jnp.asarray(5.0, jnp.float32)  # hot: Metropolis mostly accepts
    n_acc = 0
    for i in range(16):
        st_full, info_f = step_full(st_full, temp)
        st_inc, info_i = step_inc(st_inc, temp)
        assert bool(info_f.accepted) == bool(info_i.accepted), f"step {i}"
        np.testing.assert_array_equal(np.asarray(st_full.site_state),
                                      np.asarray(st_inc.site_state))
        np.testing.assert_allclose(float(st_inc.energy),
                                   float(st_full.energy),
                                   rtol=1e-5, atol=1e-4, err_msg=f"step {i}")
        n_acc += int(info_i.accepted)
    # the wall must bite: at T=5 nearly everything passes Metropolis, so
    # rejections indicate the distance filter engaged on neighbor sites
    assert 0 < n_acc < 16
    # no occupied neighbor pair ever ends closer than the wall
    occ = np.nonzero(np.asarray(st_inc.site_state) > 0)[0]
    coords = np.asarray(spec.site_coords)[occ]
    if len(occ) >= 2:
        dmin = min(np.linalg.norm(coords[a] - coords[b])
                   for a in range(len(occ)) for b in range(a + 1, len(occ)))
        assert dmin > fd


def test_incremental_canonical_distance_guardrails(toy_system):
    """Unknown criteria raise; metropolis_distance without d raises."""
    spec, cfg, static_nbr, band = toy_system
    d = device_spec(spec)
    params = init_painn(jax.random.PRNGKey(3), cfg)
    eng = make_incremental_painn(
        spec, d, params, cfg, static_nbr, band, [22, 8, 38],
        units="kcal/mol")
    with pytest.raises(ValueError, match="metropolis"):
        make_incremental_canonical_step(eng, d=d, criterion="distance")
    with pytest.raises(ValueError, match="DeviceSpec"):
        make_incremental_semigrand_step(eng, criterion="metropolis_distance")
