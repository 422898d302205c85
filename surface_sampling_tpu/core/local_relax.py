"""Warm-started ball-local relaxation MC — delta locality for relax-mode.

The reference relaxes the CURRENT slab in place before every acceptance
test (mcmc/dynamics.py:83,140-141 via mcmc/mcmc.py:233): its relaxations
are warm-started from the previous move's relaxed geometry, and a
rejected move restores the pre-move positions (mcmc/mcmc.py:246-252).
The framework's default relax path (core/energy.py make_state_energy_fn)
instead re-relaxes from the ideal lattice on every evaluation so the
energy stays a pure function of site_state — correct, but every move
pays the full FIRE budget on every free atom of the slab.

This engine restores the reference's warm-start semantics and adds ball
locality, making the relaxed geometry explicit MC state
(MCState.relaxed_positions already carries it for checkpoints). A move

  * resets ONLY the moved site's slots to their lattice coordinates
    (the trial adsorbate starts at the ideal site geometry, exactly like
    the reference's add/change event, mcmc/slab.py:309),
  * FIRE-relaxes ONLY the slots within ``hops`` candidate-adjacency hops
    of the moved site(s) against the frozen, already-relaxed far field —
    a local move's relaxation response is local (the same receptive-field
    argument as core/incremental.py; one hop ~ the potential cutoff),
  * early-exits on the ball's force convergence (fmax over free rows
    only), which the warm start reaches in a fraction of the fixed
    budget the from-ideal path always exhausts.

Acceptance energies remain FULL evaluations of the relaxed geometry — no
feature caches, no accumulation drift — and chunking / checkpoint /
--resume stay bitwise because the positions ARE checkpoint state.

Parity: with ``hops`` large enough that the ball covers every free slot,
a move evaluated from a fresh (lattice-positioned) state runs the exact
FIRE trajectory of the full path (pinned in tests/test_local_relax.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.energy import RelaxConfig, StateEnergy
from surface_sampling_tpu.core.relax import (
    FireConfig,
    energy_threshold,
    fire_relax,
    lbfgs_relax,
)
from surface_sampling_tpu.core.state import (
    DeviceSpec,
    change_site,
    element_counts,
    exchange_sites,
    num_occupied_sites,
    realize_alive,
    realize_free_mask,
    realize_positions,
    realize_type_idx,
)


def build_ball_masks(spec, static_nbr, hops: int = 1) -> np.ndarray:
    """(S, N) bool — slot-level ``hops``-hop balls of every site's slots
    over the static candidate adjacency (core/static_neighbors.py; a
    geometric superset of every in-cutoff interaction, so the ball always
    contains the full relaxation-response neighborhood of one hop per
    cutoff radius)."""
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    slot_j = np.asarray(static_nbr.slot_j)
    valid = np.asarray(static_nbr.valid)
    adj = np.zeros((N, N), bool)
    rows = np.repeat(np.arange(N), slot_j.shape[1])
    cols = slot_j.reshape(-1)
    ok = valid.reshape(-1)
    adj[rows[ok], cols[ok]] = True
    adj |= adj.T
    adj |= np.eye(N, dtype=bool)
    masks = np.zeros((S, N), bool)
    for s in range(S):
        masks[s, P + s * G: P + (s + 1) * G] = True
    for _ in range(hops):
        masks = (masks.astype(np.uint8) @ adj.astype(np.uint8)) > 0
    return masks


def make_local_relax_eval(
    d: DeviceSpec,
    potential,
    surface_energy_fn: Callable | None = None,
    relax: RelaxConfig = RelaxConfig(),
    ball_masks: np.ndarray | None = None,
    relax_potential=None,
) -> Callable:
    """Build ``evaluate(trial_ss, pos_prev, sites2) -> StateEnergy`` — the
    warm-started ball-local counterpart of core/energy.py's relaxed
    state_energy (same OOB semantics, same relax_potential mechanism,
    same fixed-topology policy). ``sites2`` is a (2,)-int array of the
    moved site indices (repeat one site for a single-site move);
    ``pos_prev`` is the chain's current relaxed geometry."""
    if ball_masks is None:
        raise ValueError("ball_masks required (build_ball_masks)")
    fire_cfg = FireConfig(steps=relax.steps, fmax=relax.fmax,
                          max_step=relax.max_step)
    balls = jnp.asarray(np.asarray(ball_masks, bool))
    P = d.pristine_positions.shape[0]
    G = d.code_offsets.shape[1]
    sfn = surface_energy_fn or (lambda e, counts: e)

    def evaluate(trial_ss, pos_prev, sites2) -> StateEnergy:
        lat = realize_positions(d, trial_ss)
        type_idx = realize_type_idx(d, trial_ss)
        alive = realize_alive(d, trial_ss)
        counts = element_counts(d, trial_ss, dtype=lat.dtype)
        # the moved sites' slots start at the trial code's ideal geometry
        # (reference add_atom/change semantics); everything else keeps the
        # chain's relaxed coordinates
        pos0 = pos_prev.astype(lat.dtype)
        for i in range(2):
            start = P + sites2[i] * G
            pos0 = jax.lax.dynamic_update_slice(
                pos0, jax.lax.dynamic_slice(lat, (start, 0), (G, 3)),
                (start, 0))
        ball = balls[sites2[0]] | balls[sites2[1]]
        free = realize_free_mask(d, trial_ss) & ball
        e_bound = jnp.asarray(energy_threshold(lat.shape[0]), lat.dtype)

        def make_e_of(pot):
            def e_of(p):
                return pot.energy(p, type_idx, alive, d.shifts)

            return e_of

        e_of = make_e_of(potential)
        relax_pot = potential if relax_potential is None else relax_potential
        hooks = getattr(relax_pot, "__dict__", {})
        fixed_topo = (relax.refresh_edges == "once"
                      and "edge_topology" in hooks)
        if fixed_topo:
            # reference neighbor semantics (dynamics.py:129): edge topology
            # selected once at the start geometry, distances refreshed per
            # force call (core/energy.py does the same)
            topo = hooks["edge_topology"](pos0, alive)

            def relax_e_of(p):
                return hooks["energy_with_edges"](
                    p, type_idx, alive, d.shifts,
                    edges=hooks["edges_of"](p, topo))

        else:
            relax_e_of = (e_of if relax_potential is None
                          else make_e_of(relax_potential))
        relaxer = fire_relax if relax.method == "fire" else lbfgs_relax
        res = relaxer(relax_e_of, pos0, free, fire_cfg)
        pos, oob = res.positions, res.oob
        if relax_potential is None and not fixed_topo:
            e_pot = res.energy
        else:
            # fresh-edge acceptance energy under the scoring potential
            e_pot = e_of(pos)
            oob = oob | (jnp.abs(e_pot) > e_bound) | jnp.isnan(e_pot)
            e_pot = jnp.where(oob, e_bound, e_pot)
        se = sfn(e_pot, counts)
        se = jnp.where(oob, e_bound, se)
        return StateEnergy(surface_energy=se, potential_energy=e_pot,
                           positions=pos, oob=oob)

    return evaluate


def make_local_relax_semigrand_step(
    d: DeviceSpec, evaluate: Callable, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Metropolis semigrand Change step over MCState with warm-started
    ball-local relaxation (proposal semantics identical to
    core/events.py::make_semigrand_step's symmetric proposal)."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.incremental import _make_dist_accept
    from surface_sampling_tpu.core.state import MCState

    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: MCState, temp):
        key, k_site, k_code, k_acc = jax.random.split(state.key, 4)
        site = jax.random.randint(k_site, (), 0, n_sites)
        cur = state.site_state[site]
        u = jax.random.randint(k_code, (), 0, n_codes - 1)
        end = u + (u >= cur).astype(u.dtype)
        trial_ss = change_site(state.site_state, site, end)
        e = evaluate(trial_ss, state.relaxed_positions,
                     jnp.stack([site, site]).astype(jnp.int32))
        accept = metropolis_accept(k_acc, state.energy, e.surface_energy,
                                   temp)
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = MCState(
            site_state=jnp.where(accept, trial_ss, state.site_state),
            energy=jnp.where(accept, e.surface_energy, state.energy),
            relaxed_positions=jnp.where(accept, e.positions,
                                        state.relaxed_positions),
            key=key,
        )
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=e.oob)
        return new_state, info

    return step


def make_local_relax_canonical_step(
    d: DeviceSpec, evaluate: Callable, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Metropolis canonical Exchange step with warm-started ball-local
    relaxation (symmetric unweighted proposal, as
    core/events.py::make_canonical_step's default)."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.incremental import _make_dist_accept
    from surface_sampling_tpu.core.state import MCState

    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: MCState, temp):
        key, k_types, k_s1, k_s2, k_acc = jax.random.split(state.key, 5)
        ss = state.site_state
        onehot = jax.nn.one_hot(ss, n_codes, dtype=jnp.float32)
        present = jnp.sum(onehot, axis=0) > 0
        valid = jnp.sum(present.astype(jnp.int32)) >= 2
        g = jax.random.gumbel(k_types, (n_codes,))
        _, top2 = jax.lax.top_k(jnp.where(present, g, -jnp.inf), 2)
        type1, type2 = top2[0], top2[1]
        w1 = (ss == type1).astype(jnp.float32)
        site1 = jnp.argmax(jnp.log(w1 + 1e-38)
                           + jax.random.gumbel(k_s1, (n_sites,)))
        w2 = (ss == type2).astype(jnp.float32)
        site2 = jnp.argmax(jnp.log(w2 + 1e-38)
                           + jax.random.gumbel(k_s2, (n_sites,)))
        trial_ss = exchange_sites(ss, site1, site2)
        sites2 = jnp.stack([site1, site2]).astype(jnp.int32)
        e = evaluate(trial_ss, state.relaxed_positions, sites2)
        accept = metropolis_accept(k_acc, state.energy, e.surface_energy,
                                   temp) & valid
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = MCState(
            site_state=jnp.where(accept, trial_ss, ss),
            energy=jnp.where(accept, e.surface_energy, state.energy),
            relaxed_positions=jnp.where(accept, e.positions,
                                        state.relaxed_positions),
            key=key,
        )
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=e.oob)
        return new_state, info

    return step


def make_local_relax_run(step_fn: Callable, sweep_size: int,
                         record_positions: bool = True) -> Callable:
    """``run(state, temps) -> (state, SweepRecord)`` — the scan-of-scans
    runner over local-relax steps (record schema identical to
    core.engine.make_run_fn, so the CLI chain/chunk/checkpoint machinery
    applies unchanged)."""
    from surface_sampling_tpu.core.engine import SweepRecord, make_sweep_fn

    sweep_fn = make_sweep_fn(step_fn, sweep_size)

    def run(state, temps):
        def body(s, temp):
            s, infos = sweep_fn(s, temp)
            rec = SweepRecord(
                site_state=s.site_state,
                energy=s.energy,
                accept_rate=jnp.mean(infos.accepted.astype(jnp.float32)),
                n_ads=num_occupied_sites(s.site_state),
                positions=s.relaxed_positions
                if record_positions
                else jnp.zeros((0, 3), s.relaxed_positions.dtype),
                oob_rate=jnp.mean(infos.oob.astype(jnp.float32)),
            )
            return s, rec

        return jax.lax.scan(body, state, temps)

    return run
