"""MC proposals, acceptance criteria and step functions (pure, scan-safe).

Reference counterparts:
  * ChangeProposal / SwitchProposal        mcmc/events/proposal.py:50-187
  * Change / Exchange events + rollback    mcmc/events/event.py:71-155
  * Metropolis/Testing/Distance criteria   mcmc/events/criterion.py:48-168
  * complementary-site sampling with Boltzmann / distance-decay weights
                                           mcmc/slab.py:35-232

The reference's object-per-step strategy pattern becomes two step-function
factories returning pure ``step(state, temp) -> (state, info)`` closures.
Dynamic-support choices ("pick one of the species currently present",
"pick a site occupied by that species") are masked Gumbel draws so every
shape stays static. Rejection restores nothing — the accepted state is a
``jnp.where`` select between the old and trial pytrees.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from surface_sampling_tpu.core.state import (
    DeviceSpec,
    MCState,
    change_site,
    exchange_sites,
    num_adsorbate_atoms,
    num_occupied_sites,
    realize_alive,
    realize_positions,
    realize_type_idx,
)
from surface_sampling_tpu.ops.neighbors import image_distances


class StepInfo(NamedTuple):
    accepted: jnp.ndarray       # bool
    energy: jnp.ndarray         # surface energy after the step
    n_ads: jnp.ndarray          # occupied sites after the step
    oob: jnp.ndarray            # trial relaxation went out of bounds


# ----------------------------------------------------------------------
# Acceptance criteria
# ----------------------------------------------------------------------
def metropolis_accept(key, e_old, e_new, temp):
    """rand() < exp(-dE/T) with overflow guard (criterion.py:144-168)."""
    de = e_new - e_old
    logp = jnp.minimum(-de / jnp.maximum(temp, 1e-12), 0.0)
    return jnp.log(jax.random.uniform(key, dtype=e_new.dtype) + 1e-38) < logp


def _propose_change(key, ss, n_sites: int, n_codes: int):
    """The reference's ChangeProposal draw (proposal.py:74-107): a uniform
    site, then a uniform new code != the current one. Shared by the
    single-try and MTM semigrand steps so the two stay the same family."""
    k_site, k_code = jax.random.split(key)
    site = jax.random.randint(k_site, (), 0, n_sites)
    cur = ss[site]
    u = jax.random.randint(k_code, (), 0, n_codes - 1)
    end = u + (u >= cur).astype(u.dtype)       # uniform over codes != cur
    return change_site(ss, site, end)


def make_distance_accept(d: DeviceSpec, filter_distance: float):
    """Geometric filter: accept iff no two adsorbate atoms are closer than
    ``filter_distance`` (criterion.py:74-116 + utils/misc.py:118-135).
    Adsorbate atoms are the alive site-slot atoms (index >= P).

    Site coordinates are static under MC moves, so the candidate pairs
    are precomputed on the host: only (site, site, image-shift) triples
    whose site separation can possibly fall below the cutoff — after
    allowing for the largest group-member offset radius — are checked at
    trial time. Cost per trial is O(C * G^2) with C ~ O(S * local
    neighbors), replacing the O(Kimg * N^2) full image-distance matrix;
    this is what makes the criterion usable on 500+-slot systems."""
    import numpy as np

    site = np.asarray(d.site_coords, np.float64)          # (S, 3)
    offs = np.asarray(d.code_offsets, np.float64)         # (K+1, G, 3)
    shifts = np.asarray(d.shifts, np.float64)             # (Kimg, 3)
    S, G = site.shape[0], offs.shape[1]
    r_off = float(np.linalg.norm(offs, axis=-1).max()) if offs.size else 0.0
    bound = filter_distance + 2.0 * r_off

    ci, cj, csh, cself = [], [], [], []
    # cross-site candidates (ordered pairs i<j over every image shift)
    diff = site[:, None, None, :] - site[None, :, None, :] + shifts[None, None, :, :]
    dist = np.linalg.norm(diff, axis=-1)                  # (S, S, Kimg)
    ii, jj, kk = np.nonzero(dist < bound)
    for i, j, k in zip(ii, jj, kk):
        if i < j or (i == j and not np.allclose(shifts[k], 0.0)):
            # i==j with a nonzero shift = a site against its own periodic
            # image (possible in very small cells); i==j shift 0 is the
            # intra-group case handled below
            ci.append(i); cj.append(j); csh.append(-shifts[k]); cself.append(False)
    # intra-site group-member pairs (reference filter_distances checks ALL
    # adsorbate atom pairs, including atoms of one OH/H2O group)
    if G > 1:
        for i in range(S):
            ci.append(i); cj.append(i); csh.append(np.zeros(3)); cself.append(True)

    if not ci:
        return lambda site_state: jnp.asarray(True)

    ci_j = jnp.asarray(np.asarray(ci), jnp.int32)
    cj_j = jnp.asarray(np.asarray(cj), jnp.int32)
    csh_j = jnp.asarray(np.asarray(csh), d.site_coords.dtype)   # (C, 3)
    g = np.arange(G)
    tri = g[:, None] < g[None, :]                         # strict upper
    pair_mask = np.where(np.asarray(cself)[:, None, None], tri[None], True)
    pm_j = jnp.asarray(pair_mask)                         # (C, G, G)
    fd2 = filter_distance * filter_distance

    def accept(site_state):
        code_i = site_state[ci_j]
        code_j = site_state[cj_j]
        occ = (code_i > 0) & (code_j > 0)
        pi = d.site_coords[ci_j][:, None, :] + d.code_offsets[code_i]   # (C, G, 3)
        pj = d.site_coords[cj_j][:, None, :] + d.code_offsets[code_j] + csh_j[:, None, :]
        d2 = jnp.sum((pi[:, :, None, :] - pj[:, None, :, :]) ** 2, axis=-1)
        m_i = jnp.arange(G)[None, :] < d.code_natoms[code_i][:, None]
        m_j = jnp.arange(G)[None, :] < d.code_natoms[code_j][:, None]
        mask = occ[:, None, None] & m_i[:, :, None] & m_j[:, None, :] & pm_j
        dmin2 = jnp.min(jnp.where(mask, d2, jnp.inf))
        return dmin2 > fd2

    return accept


# ----------------------------------------------------------------------
# Semigrand step (ChangeProposal + Change event + criterion)
# ----------------------------------------------------------------------
def make_semigrand_step(
    d: DeviceSpec,
    state_energy_fn: Callable,
    criterion: str = "metropolis",
    filter_distance: float = 1.5,
    always_accept: bool = True,
) -> Callable:
    """Build ``step(state, temp, site_idx=None) -> (state, StepInfo)``.

    Proposal semantics mirror ChangeProposal.get_action (proposal.py:74-107):
    a uniform site, then a uniform new code != the current one (the current
    adsorbate/"None" is removed from the choice list).
    """
    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = (
        make_distance_accept(d, filter_distance)
        if criterion in ("distance", "metropolis_distance")
        else None
    )

    def step(state: MCState, temp, site_idx=None):
        key, k_site, k_code, k_acc = jax.random.split(state.key, 4)
        site = (
            jax.random.randint(k_site, (), 0, n_sites)
            if site_idx is None
            else jnp.asarray(site_idx, jnp.int32)
        )
        cur = state.site_state[site]
        u = jax.random.randint(k_code, (), 0, n_codes - 1)
        end = u + (u >= cur).astype(u.dtype)   # uniform over codes != cur
        trial_ss = change_site(state.site_state, site, end)

        trial = state_energy_fn(trial_ss)

        if criterion == "metropolis":
            accept = metropolis_accept(k_acc, state.energy, trial.surface_energy, temp)
        elif criterion == "testing":
            accept = jnp.asarray(always_accept)
        elif criterion == "distance":
            accept = dist_accept(trial_ss)
        elif criterion == "metropolis_distance":
            # beyond-reference: Boltzmann sampling restricted to the
            # non-overlapping configuration subspace (hard-wall prior on
            # min adsorbate separation). The reference offers distance
            # and Metropolis only as alternatives (mcmc.py:253-261); for
            # unrelaxed NN sampling the hard wall keeps the chain out of
            # sub-angstrom overlaps where the model extrapolates garbage
            # below any sane OOB bound. Detailed balance holds: the
            # constraint multiplies the target by an occupancy-state
            # indicator, and moves into excluded states are rejected.
            accept = metropolis_accept(
                k_acc, state.energy, trial.surface_energy, temp
            ) & dist_accept(trial_ss)
        else:
            raise ValueError(f"unknown criterion {criterion!r}")

        new_state = MCState(
            site_state=jnp.where(accept, trial_ss, state.site_state),
            energy=jnp.where(accept, trial.surface_energy, state.energy),
            relaxed_positions=jnp.where(accept, trial.positions, state.relaxed_positions),
            key=key,
        )
        info = StepInfo(
            accepted=accept,
            energy=new_state.energy,
            n_ads=num_occupied_sites(new_state.site_state),
            oob=trial.oob,
        )
        return new_state, info

    return step


# ----------------------------------------------------------------------
# Multiple-try Metropolis semigrand step (TPU-native extension)
# ----------------------------------------------------------------------
def make_semigrand_step_mtm(
    d: DeviceSpec,
    state_energy_fn: Callable,
    k_trials: int = 8,
) -> Callable:
    """Multiple-try Metropolis (Liu, Liang & Wong, JASA 2000) over the
    semigrand move family — a capability the batch hardware makes natural:
    every step evaluates 2K-1 candidate states in ONE vmapped forward
    (trials and reference points batch through the same MXU pass), which
    multiplies per-step mixing at nearly the per-eval price when the
    device is not yet batch-saturated.

    The single-site change proposal is symmetric (any site/code change is
    reversible with the same draw probability), so the MTM weight is the
    Boltzmann factor: w(y) = exp(-E(y)/T).

      1. draw K i.i.d. trials y_1..y_K from x; select y = y_J with
         probability proportional to w(y_j);
      2. draw K-1 reference points x*_1..x*_{K-1} from y; set x*_K = x;
      3. accept y with probability min(1, sum_j w(y_j) / sum_j w(x*_j)).

    Satisfies detailed balance for the Boltzmann target (validated against
    exact enumeration in tests/test_distribution.py). Not a reference
    feature — the reference's serial loop (mcmc.py:233) cannot amortize
    trial batches; cite mcmc/events/proposal.py:74 for the shared proposal
    semantics.

    When to use: MTM multiplies acceptance (~K x at low temperature) at
    2K-1 evals per step, so it wins wall-clock mixing when the chain batch
    alone does not saturate the chip — few chains, relax-mode evaluations,
    or small site spaces. At batch-saturating chain counts plain
    single-try at K x the chains mixes equally fast; measured numbers in
    docs/BENCHMARKS.md.
    """
    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes

    def propose(key, ss):
        return _propose_change(key, ss, n_sites, n_codes)

    return _make_mtm_step(propose, state_energy_fn, k_trials)


def _make_mtm_step(
    propose: Callable,
    state_energy_fn: Callable,
    k_trials: int,
    valid_fn: Callable | None = None,
):
    """Shared MTM machinery for any symmetric proposal ``propose(key, ss)``.

    ``valid_fn(ss) -> bool`` gates acceptance for states where the proposal
    family is degenerate (canonical exchange with < 2 species present) —
    mirroring make_canonical_step's ``valid`` mask so accept_rate does not
    read ~1.0 on no-op swaps.
    """
    v_energy = jax.vmap(state_energy_fn)

    def step(state: MCState, temp):
        key, k_trials_key, k_sel, k_ref, k_acc = jax.random.split(state.key, 5)
        beta = 1.0 / jnp.maximum(temp, 1e-12)

        trial_keys = jax.random.split(k_trials_key, k_trials)
        trial_ss = jax.vmap(propose, in_axes=(0, None))(trial_keys, state.site_state)
        trials = v_energy(trial_ss)                              # (K,) energies
        logw_y = -beta * trials.surface_energy
        sel = jnp.argmax(logw_y + jax.random.gumbel(k_sel, (k_trials,)))
        y_ss = trial_ss[sel]

        ref_keys = jax.random.split(k_ref, k_trials - 1)
        ref_ss = jax.vmap(propose, in_axes=(0, None))(ref_keys, y_ss)
        refs = v_energy(ref_ss)
        logw_x = jnp.concatenate(
            [-beta * refs.surface_energy, (-beta * state.energy)[None]]
        )
        log_ratio = jax.scipy.special.logsumexp(logw_y) - jax.scipy.special.logsumexp(
            logw_x
        )
        accept = (
            jnp.log(jax.random.uniform(key=k_acc, dtype=logw_y.dtype) + 1e-38)
            < log_ratio
        )
        if valid_fn is not None:
            accept = accept & valid_fn(state.site_state)

        new_state = MCState(
            site_state=jnp.where(accept, y_ss, state.site_state),
            energy=jnp.where(accept, trials.surface_energy[sel], state.energy),
            relaxed_positions=jnp.where(
                accept, trials.positions[sel], state.relaxed_positions
            ),
            key=key,
        )
        info = StepInfo(
            accepted=accept,
            energy=new_state.energy,
            n_ads=num_occupied_sites(new_state.site_state),
            # oob over EVERY evaluation this step paid for (2K-1 of them) —
            # the clamp makes OOB trials ~unselectable, so reporting only
            # the selected trial would hide the clamping the oob_rate
            # diagnostic exists to surface
            oob=jnp.any(trials.oob) | jnp.any(refs.oob),
        )
        return new_state, info

    return step


def make_canonical_step_mtm(
    d: DeviceSpec,
    state_energy_fn: Callable,
    k_trials: int = 8,
) -> Callable:
    """Multiple-try Metropolis over the canonical exchange family.

    The unweighted switch proposal is symmetric: an exchange preserves the
    multiset of species present, so the reverse draw (same two types, the
    swapped sites) has identical probability — the MTM weights are again
    plain Boltzmann factors. Exactness validated in the canonical sector
    (tests/test_distribution.py). Weighted variants (per-atom-energy or
    distance-decay site selection) are NOT symmetric and stay single-try.
    """
    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes

    def propose(key, ss):
        """One symmetric exchange of ``ss`` (Gumbel type pair + site per type)."""
        k_types, k_s1, k_s2 = jax.random.split(key, 3)
        onehot = jax.nn.one_hot(ss, n_codes, dtype=jnp.float32)
        present = jnp.sum(onehot, axis=0) > 0
        g = jax.random.gumbel(k_types, (n_codes,))
        _, top2 = jax.lax.top_k(jnp.where(present, g, -jnp.inf), 2)
        type1, type2 = top2[0], top2[1]
        w1 = (ss == type1).astype(jnp.float32)
        site1 = jnp.argmax(jnp.log(w1 + 1e-38) + jax.random.gumbel(k_s1, (n_sites,)))
        w2 = (ss == type2).astype(jnp.float32)
        site2 = jnp.argmax(jnp.log(w2 + 1e-38) + jax.random.gumbel(k_s2, (n_sites,)))
        return exchange_sites(ss, site1, site2)

    def valid_fn(ss):
        onehot = jax.nn.one_hot(ss, n_codes, dtype=jnp.float32)
        return jnp.sum((jnp.sum(onehot, axis=0) > 0).astype(jnp.int32)) >= 2

    return _make_mtm_step(propose, state_energy_fn, k_trials, valid_fn=valid_fn)


# ----------------------------------------------------------------------
# Canonical step (SwitchProposal + Exchange event + criterion)
# ----------------------------------------------------------------------
def make_canonical_step(
    d: DeviceSpec,
    state_energy_fn: Callable,
    criterion: str = "metropolis",
    filter_distance: float = 1.5,
    always_accept: bool = True,
    require_per_atom_energies: bool = False,
    require_distance_decay: bool = False,
    potential=None,
    distance_weight_matrix=None,
) -> Callable:
    """Build the exchange step: pick two *distinct* adsorbate types present
    on the surface (the empty type counts, slab.py:52-56), one site of each,
    and swap them (event.py:138-155).

    Optional weights mirror the reference:
      * ``require_per_atom_energies``: site weights softmax(E_atom / T)
        (slab.py:74-112) — needs ``potential`` for per-atom energies.
      * ``require_distance_decay``: site2 weights multiplied by the
        precomputed (S, S) row of ``distance_weight_matrix``
        (slab.py:115-165, utils/misc.py:170-190).
    """
    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = (
        make_distance_accept(d, filter_distance)
        if criterion in ("distance", "metropolis_distance")
        else None
    )
    if require_per_atom_energies and potential is None:
        raise ValueError("require_per_atom_energies needs the potential")
    if require_distance_decay and distance_weight_matrix is None:
        raise ValueError("require_distance_decay needs a distance_weight_matrix")
    dwm = (
        jnp.asarray(distance_weight_matrix)
        if distance_weight_matrix is not None
        else None
    )
    n_pristine = d.pristine_numbers.shape[0]
    group = d.code_offsets.shape[1]
    slot0 = n_pristine + jnp.arange(n_sites) * group   # primary slot per site

    def site_weights(state: MCState, temp):
        """Per-site selection weight, used for occupied-site draws."""
        if not require_per_atom_energies:
            return jnp.ones(n_sites, state.energy.dtype)
        pos = state.relaxed_positions
        ti = realize_type_idx(d, state.site_state)
        alive = realize_alive(d, state.site_state)
        pa = potential.per_atom_energy(pos, ti, alive, d.shifts)
        w = jax.nn.softmax(jnp.where(alive, pa / temp, -jnp.inf))
        return w[slot0]

    def step(state: MCState, temp, site_idx=None):
        key, k_types, k_s1, k_s2, k_acc = jax.random.split(state.key, 5)
        ss = state.site_state
        # which codes are present (code 0 present iff any empty site)
        onehot = jax.nn.one_hot(ss, n_codes, dtype=jnp.float32)   # (S, K+1)
        code_count = jnp.sum(onehot, axis=0)
        present = code_count > 0
        valid = jnp.sum(present.astype(jnp.int32)) >= 2
        # ordered pair of distinct present types: Gumbel top-2
        g = jax.random.gumbel(k_types, (n_codes,))
        masked = jnp.where(present, g, -jnp.inf)
        _, top2 = jax.lax.top_k(masked, 2)
        type1, type2 = top2[0], top2[1]

        w_site = site_weights(state, temp)
        occupied_w1 = jnp.where(ss == type1, jnp.where(type1 == 0, 1.0, w_site), 0.0)
        site1 = jnp.argmax(jnp.log(occupied_w1 + 1e-38) + jax.random.gumbel(k_s1, (n_sites,)))
        w2 = jnp.where(ss == type2, jnp.where(type2 == 0, 1.0, w_site), 0.0)
        if require_distance_decay:
            w2 = w2 * dwm[site1]
        site2 = jnp.argmax(jnp.log(w2 + 1e-38) + jax.random.gumbel(k_s2, (n_sites,)))

        trial_ss = exchange_sites(ss, site1, site2)
        trial = state_energy_fn(trial_ss)

        if criterion == "metropolis":
            accept = metropolis_accept(k_acc, state.energy, trial.surface_energy, temp)
        elif criterion == "testing":
            accept = jnp.asarray(always_accept)
        elif criterion == "distance":
            accept = dist_accept(trial_ss)
        elif criterion == "metropolis_distance":
            # see make_semigrand_step: Metropolis under a hard-wall
            # minimum-separation prior
            accept = metropolis_accept(
                k_acc, state.energy, trial.surface_energy, temp
            ) & dist_accept(trial_ss)
        else:
            raise ValueError(f"unknown criterion {criterion!r}")
        accept = accept & valid

        new_state = MCState(
            site_state=jnp.where(accept, trial_ss, ss),
            energy=jnp.where(accept, trial.surface_energy, state.energy),
            relaxed_positions=jnp.where(accept, trial.positions, state.relaxed_positions),
            key=key,
        )
        info = StepInfo(
            accepted=accept,
            energy=new_state.energy,
            n_ads=num_occupied_sites(new_state.site_state),
            oob=trial.oob,
        )
        return new_state, info

    return step
