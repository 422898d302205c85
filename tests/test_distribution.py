"""Exactness of the MC engine: sampled state frequencies vs the exact
Boltzmann distribution over a fully enumerable state space.

This is the strongest correctness evidence a Metropolis sampler admits:
on 4 sites x {empty, Cu} there are 16 states whose surface energies can
be enumerated exactly, so the empirical visit distribution of the
semigrand chain must converge to p(s) = exp(-E(s)/T)/Z. (The reference
has no analogous test; its engine is validated only by move mechanics.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import EngineConfig, MCMCRun, make_run_fn, make_spec
from surface_sampling_tpu.parallel import chain_states, make_chain_run
from surface_sampling_tpu.potentials import make_lennard_jones
from surface_sampling_tpu.structure.slabs import fcc100
from surface_sampling_tpu.structure.sites import find_adsorption_sites


@pytest.fixture(scope="module")
def enumerable_system():
    pot = make_lennard_jones(epsilon=0.4, sigma=2.3, cutoff=5.0)
    slab = fcc100("Cu", size=(2, 2, 1), a=3.6147, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=2.0)["ontop"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=5.0)
    run = MCMCRun(spec, pot)
    S = spec.n_sites
    assert S == 4
    states = np.array([[int(b) for b in np.binary_repr(i, S)] for i in range(2**S)],
                      np.int32)
    E = np.array([float(run.state_energy_fn(jnp.asarray(s)).surface_energy)
                  for s in states])
    return run, S, E


def _sample_distribution(run, S, temp, n_chains=512, sweeps=60, burn=20):
    cfg = EngineConfig(sweep_size=4, record_positions=False)
    crun = make_chain_run(make_run_fn(run.d, run.state_energy_fn, cfg))
    cs = chain_states(run.d, jax.random.PRNGKey(0), n_chains)
    e0 = jax.jit(jax.vmap(lambda s: run.state_energy_fn(s).surface_energy))(
        cs.site_state)
    cs = cs._replace(energy=e0)
    _, recs = crun(cs, jnp.full(sweeps, temp))
    ss = np.asarray(recs.site_state)[:, burn:, :].reshape(-1, S)
    idx = ss.dot(1 << np.arange(S)[::-1])
    counts = np.bincount(idx, minlength=2**S)
    return counts / counts.sum()


def _exact(E, temp):
    logw = -(E - E.min()) / temp
    w = np.exp(logw)
    return w / w.sum()


def test_semigrand_chain_samples_exact_boltzmann(enumerable_system):
    run, S, E = enumerable_system
    temp = 1.5
    p_emp = _sample_distribution(run, S, temp)
    l1 = np.abs(p_emp - _exact(E, temp)).sum()
    assert l1 < 0.05, f"L1(empirical, Boltzmann) = {l1:.4f}"
    # power check: the same samples must NOT match the wrong temperature
    l1_wrong = np.abs(p_emp - _exact(E, 0.6)).sum()
    assert l1_wrong > 0.15, f"test has no discriminating power ({l1_wrong:.4f})"


def test_canonical_chain_samples_exact_boltzmann_in_sector(enumerable_system):
    """The unweighted canonical (switch) step has symmetric proposals — a
    swap preserves type counts, so forward and reverse draws have identical
    probability — and must therefore sample the Boltzmann distribution
    restricted to its particle-number sector (here: 2 Cu on 4 sites)."""
    from surface_sampling_tpu.core.events import make_canonical_step

    run, S, E = enumerable_system
    temp = 1.5
    states = np.array([[int(b) for b in np.binary_repr(i, S)] for i in range(2**S)],
                      np.int32)
    sector = np.where(states.sum(axis=1) == 2)[0]          # 6 states
    p_exact_sector = _exact(E[sector], temp)

    step = make_canonical_step(run.d, run.state_energy_fn)
    n_chains, steps, burn = 256, 200, 80

    def chain(key):
        from surface_sampling_tpu.core.state import MCState

        ss0 = jnp.asarray([1, 1, 0, 0], jnp.int32)
        se0 = run.state_energy_fn(ss0)
        st = MCState(site_state=ss0, energy=se0.surface_energy,
                     relaxed_positions=se0.positions, key=key)

        def body(s, _):
            s, info = step(s, jnp.asarray(temp))
            return s, s.site_state

        _, hist = jax.lax.scan(body, st, None, length=steps)
        return hist                                          # (steps, S)

    keys = jax.random.split(jax.random.PRNGKey(42), n_chains)
    hist = jax.jit(jax.vmap(chain))(keys)
    samp = np.asarray(hist)[:, burn:, :].reshape(-1, S)
    assert set(samp.sum(axis=1)) == {2}, "canonical step changed the count"
    idx = samp.dot(1 << np.arange(S)[::-1])
    counts = np.bincount(idx, minlength=2**S)[sector]
    p_emp = counts / counts.sum()
    l1 = np.abs(p_emp - p_exact_sector).sum()
    assert l1 < 0.05, f"L1 = {l1:.4f}"


def test_mtm_chain_samples_exact_boltzmann(enumerable_system):
    """Multiple-try Metropolis (EngineConfig.mtm_trials) must sample the
    same exact Boltzmann distribution — MTM's select/reference construction
    satisfies detailed balance for symmetric proposals, and any bias in
    the weight or acceptance formula would show up immediately on a fully
    enumerable state space."""
    run, S, E = enumerable_system
    temp = 1.5
    cfg = EngineConfig(sweep_size=4, record_positions=False, mtm_trials=4)
    crun = make_chain_run(make_run_fn(run.d, run.state_energy_fn, cfg))
    n_chains, sweeps, burn = 512, 60, 20
    cs = chain_states(run.d, jax.random.PRNGKey(7), n_chains)
    e0 = jax.jit(jax.vmap(lambda s: run.state_energy_fn(s).surface_energy))(
        cs.site_state)
    cs = cs._replace(energy=e0)
    _, recs = crun(cs, jnp.full(sweeps, temp))
    ss = np.asarray(recs.site_state)[:, burn:, :].reshape(-1, S)
    idx = ss.dot(1 << np.arange(S)[::-1])
    counts = np.bincount(idx, minlength=2**S)
    p_emp = counts / counts.sum()
    l1 = np.abs(p_emp - _exact(E, temp)).sum()
    assert l1 < 0.05, f"L1(MTM empirical, Boltzmann) = {l1:.4f}"
    # discriminating power: must not match a wrong temperature
    assert np.abs(p_emp - _exact(E, 0.6)).sum() > 0.15

    # MTM must also mix at least as fast as single-try per step: acceptance
    # of a 4-trial chain at this temperature should be substantial
    cfg1 = EngineConfig(sweep_size=4, record_positions=False)
    crun1 = make_chain_run(make_run_fn(run.d, run.state_energy_fn, cfg1))
    _, recs1 = crun1(cs, jnp.full(sweeps, temp))
    acc_mtm = float(np.mean(np.asarray(recs.accept_rate)))
    acc_std = float(np.mean(np.asarray(recs1.accept_rate)))
    assert acc_mtm > acc_std, (acc_mtm, acc_std)


def test_canonical_mtm_samples_exact_boltzmann_in_sector(enumerable_system):
    """MTM over the exchange family: swaps preserve the species multiset
    and the unweighted switch proposal is symmetric, so the MTM chain must
    sample the Boltzmann distribution restricted to its sector."""
    from surface_sampling_tpu.core.events import make_canonical_step_mtm
    from surface_sampling_tpu.core.state import MCState

    run, S, E = enumerable_system
    temp = 1.5
    states = np.array([[int(b) for b in np.binary_repr(i, S)] for i in range(2**S)],
                      np.int32)
    sector = np.where(states.sum(axis=1) == 2)[0]
    p_exact_sector = _exact(E[sector], temp)

    step = make_canonical_step_mtm(run.d, run.state_energy_fn, k_trials=3)
    n_chains, steps, burn = 256, 120, 40

    def chain(key):
        ss0 = jnp.asarray([1, 1, 0, 0], jnp.int32)
        se0 = run.state_energy_fn(ss0)
        st = MCState(site_state=ss0, energy=se0.surface_energy,
                     relaxed_positions=se0.positions, key=key)

        def body(s, _):
            s, info = step(s, jnp.asarray(temp))
            return s, s.site_state

        _, hist = jax.lax.scan(body, st, None, length=steps)
        return hist

    keys = jax.random.split(jax.random.PRNGKey(13), n_chains)
    hist = jax.jit(jax.vmap(chain))(keys)
    samp = np.asarray(hist)[:, burn:, :].reshape(-1, S)
    assert set(samp.sum(axis=1)) == {2}, "MTM exchange changed the count"
    idx = samp.dot(1 << np.arange(S)[::-1])
    counts = np.bincount(idx, minlength=2**S)[sector]
    p_emp = counts / counts.sum()
    l1 = np.abs(p_emp - p_exact_sector).sum()
    assert l1 < 0.05, f"L1 = {l1:.4f}"


def test_population_annealing_boltzmann_and_free_energy(enumerable_system):
    """Population annealing must (a) land the population on the exact
    Boltzmann distribution at the final temperature and (b) estimate
    log[Z(T_final)/Z(T_0)] to a few percent — the PA free-energy
    estimator has no counterpart in the reference or in tempering."""
    from surface_sampling_tpu.core.engine import make_sweep_fn
    from surface_sampling_tpu.core.events import make_semigrand_step
    from surface_sampling_tpu.parallel import (
        chain_states,
        make_population_annealing_run,
    )

    run, S, E = enumerable_system
    t_hi, t_lo, R, C = 4.0, 0.6, 40, 4096
    temps = jnp.asarray(np.geomspace(t_hi, t_lo, R), jnp.float32)

    step_fn = make_semigrand_step(run.d, run.state_energy_fn)
    sweep_fn = make_sweep_fn(step_fn, sweep_size=4)
    parun = make_population_annealing_run(sweep_fn)

    cs = chain_states(run.d, jax.random.PRNGKey(3), C)
    e0 = jax.jit(jax.vmap(lambda s: run.state_energy_fn(s).surface_energy))(
        cs.site_state)
    cs = cs._replace(energy=e0)
    # burn in at t_hi so the population starts equilibrated there
    burn = make_chain_run(make_run_fn(
        run.d, run.state_energy_fn, EngineConfig(sweep_size=4,
                                                 record_positions=False)))
    cs, _ = burn(cs, jnp.full(10, t_hi))

    out, rec = parun(cs, temps, jax.random.PRNGKey(4))

    # (a) final-temperature Boltzmann parity
    ss = np.asarray(out.site_state)
    idx = ss.dot(1 << np.arange(S)[::-1])
    emp = np.bincount(idx, minlength=2 ** S) / C
    p = np.exp(-(E - E.min()) / t_lo)
    p /= p.sum()
    l1 = np.abs(emp - p).sum()
    assert l1 < 0.08, f"L1(PA population, Boltzmann) = {l1:.4f}"

    # (b) free-energy estimator vs the exact partition-function ratio
    logz_est = float(np.sum(np.asarray(rec.dlogz)))
    from scipy.special import logsumexp

    logz_exact = (logsumexp(-E / t_lo) - logsumexp(-E / t_hi))
    assert abs(logz_est - logz_exact) < 0.15, (
        f"PA logZ {logz_est:.3f} vs exact {logz_exact:.3f}")
    # populations stayed healthy
    assert float(np.min(np.asarray(rec.ess))) > 0.2 * C


def test_metropolis_distance_samples_constrained_boltzmann(enumerable_system):
    """The combined criterion (beyond-reference: Metropolis under a
    hard-wall minimum-separation prior, core/events.py) must sample the
    Boltzmann distribution restricted to the allowed (non-overlapping)
    subspace: p(s) propto exp(-E(s)/T) * 1[min pair distance > fd].
    Detailed balance survives the indicator because excluded trial states
    are rejected symmetrically."""
    from surface_sampling_tpu.core.events import make_distance_accept

    run, S, E = enumerable_system
    temp = 1.5
    # pick a filter that excludes some multi-adsorbate states but not all:
    # ontop sites on the 2x2 fcc cell are ~2.56 A apart
    fd = 2.8
    dist_ok = np.array([
        bool(make_distance_accept(run.d, fd)(
            jnp.asarray([int(b) for b in np.binary_repr(i, S)], jnp.int32)))
        for i in range(2**S)
    ])
    assert dist_ok.any() and not dist_ok.all()

    cfg = EngineConfig(sweep_size=4, record_positions=False,
                       criterion="metropolis_distance", filter_distance=fd)
    crun = make_chain_run(make_run_fn(run.d, run.state_energy_fn, cfg))
    cs = chain_states(run.d, jax.random.PRNGKey(2), 512)
    e0 = jax.jit(jax.vmap(lambda s: run.state_energy_fn(s).surface_energy))(
        cs.site_state)
    cs = cs._replace(energy=e0)
    _, recs = crun(cs, jnp.full(60, temp))
    ss = np.asarray(recs.site_state)[:, 20:, :].reshape(-1, S)
    idx = ss.dot(1 << np.arange(S)[::-1])
    p_emp = np.bincount(idx, minlength=2**S).astype(float)
    p_emp /= p_emp.sum()

    # chains start from the empty state (allowed) and can never enter an
    # excluded state
    assert p_emp[~dist_ok].sum() == 0.0

    w = np.exp(-(E - E.min()) / temp) * dist_ok
    p_exact = w / w.sum()
    l1 = np.abs(p_emp - p_exact).sum()
    assert l1 < 0.05, f"L1(empirical, constrained Boltzmann) = {l1:.4f}"
    # power check: the unconstrained Boltzmann distribution puts real
    # mass on the excluded states; the constrained sampler puts exactly
    # none there (asserted above), so the indicator is load-bearing
    assert _exact(E, temp)[~dist_ok].sum() > 0.02
