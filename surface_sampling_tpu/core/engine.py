"""The MC engine: sweeps and runs as nested ``lax.scan``s under one jit.

Reference counterpart: the Python loops of MCMC.run/sweep/step
(mcmc/mcmc.py:268-390). One reference MC step costs (1 + relax_steps)
serial force-field calls plus two full-structure deep copies; here a step
is a fused XLA program and a sweep/run is a scan, so thousands of chains
batch through ``vmap`` (see parallel/chains.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.energy import make_state_energy_fn
from surface_sampling_tpu.core.events import make_canonical_step, make_semigrand_step
from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.core.state import (
    DeviceSpec,
    MCState,
    device_spec,
    initial_state,
    num_occupied_sites,
)


class SweepRecord(NamedTuple):
    """Per-sweep observables (leading axis = sweeps), mirroring the
    reference's results dict (mcmc.py:293-299, 384-388) minus the deep
    copies: occupancy snapshots replace SurfaceSystem copies."""

    site_state: jnp.ndarray        # (sweeps, S)
    energy: jnp.ndarray            # (sweeps,)
    accept_rate: jnp.ndarray       # (sweeps,)
    n_ads: jnp.ndarray             # (sweeps,)
    positions: jnp.ndarray         # (sweeps, N, 3) relaxed geometry snapshots
    oob_rate: jnp.ndarray          # (sweeps,) fraction of trial moves OOB-clamped


@dataclass(frozen=True)
class EngineConfig:
    """Static engine configuration (mirrors sampling_settings, SURVEY §5.6)."""

    sweep_size: int = 20
    canonical: bool = False
    num_ads_atoms: int = 0
    criterion: str = "metropolis"        # metropolis | testing | distance
    filter_distance: float = 1.5
    always_accept: bool = True           # for the testing criterion
    require_per_atom_energies: bool = False
    require_distance_decay: bool = False
    record_positions: bool = True
    prep_max_steps: int | None = None    # bound canonical prep (None = reference-faithful)
    prep_force_fill: bool = False        # deterministic fill if the bound is hit
    mtm_trials: int = 0                  # >1: multiple-try Metropolis (semigrand + canonical)


def make_sweep_fn(step_fn: Callable, sweep_size: int) -> Callable:
    """One sweep = ``sweep_size`` steps at a fixed temperature (scan)."""

    def sweep(state: MCState, temp):
        def body(s, _):
            s, info = step_fn(s, temp)
            return s, info

        state, infos = jax.lax.scan(body, state, None, length=sweep_size)
        return state, infos

    return sweep


def make_run_fn(
    d: DeviceSpec,
    state_energy_fn: Callable,
    cfg: EngineConfig,
    potential=None,
    distance_weight_matrix=None,
) -> Callable:
    """Build ``run(state, temps) -> (state, SweepRecord)``, jittable.

    ``temps`` has one entry per sweep (the annealing schedule,
    utils/sampling.py analog). vmap over a leading chain axis of ``state``
    (and optionally of ``temps`` for per-chain schedules / tempering).
    """
    if cfg.canonical and cfg.mtm_trials > 1:
        from surface_sampling_tpu.core.events import make_canonical_step_mtm

        if cfg.criterion != "metropolis":
            raise ValueError("mtm_trials requires the metropolis criterion")
        if cfg.require_per_atom_energies or cfg.require_distance_decay:
            raise ValueError(
                "mtm_trials needs the symmetric (unweighted) switch proposal"
            )
        step_fn = make_canonical_step_mtm(d, state_energy_fn, k_trials=cfg.mtm_trials)
    elif cfg.canonical:
        step_fn = make_canonical_step(
            d,
            state_energy_fn,
            criterion=cfg.criterion,
            filter_distance=cfg.filter_distance,
            always_accept=cfg.always_accept,
            require_per_atom_energies=cfg.require_per_atom_energies,
            require_distance_decay=cfg.require_distance_decay,
            potential=potential,
            distance_weight_matrix=distance_weight_matrix,
        )
    elif cfg.mtm_trials > 1:
        from surface_sampling_tpu.core.events import make_semigrand_step_mtm

        if cfg.criterion != "metropolis":
            raise ValueError("mtm_trials requires the metropolis criterion")
        step_fn = make_semigrand_step_mtm(d, state_energy_fn, k_trials=cfg.mtm_trials)
    else:
        step_fn = make_semigrand_step(
            d,
            state_energy_fn,
            criterion=cfg.criterion,
            filter_distance=cfg.filter_distance,
            always_accept=cfg.always_accept,
        )
    sweep_fn = make_sweep_fn(step_fn, cfg.sweep_size)

    def run(state: MCState, temps):
        def body(s, temp):
            s, infos = sweep_fn(s, temp)
            rec = SweepRecord(
                site_state=s.site_state,
                energy=s.energy,
                accept_rate=jnp.mean(infos.accepted.astype(jnp.float32)),
                n_ads=num_occupied_sites(s.site_state),
                positions=s.relaxed_positions
                if cfg.record_positions
                else jnp.zeros((0, 3), s.relaxed_positions.dtype),
                oob_rate=jnp.mean(infos.oob.astype(jnp.float32)),
            )
            return s, rec

        return jax.lax.scan(body, state, temps)

    return run


def prepare_canonical_fn(
    d: DeviceSpec,
    state_energy_fn: Callable,
    num_ads_atoms: int,
    cfg: EngineConfig,
    max_steps: int | None = None,
    force_fill: bool = False,
) -> Callable:
    """Semigrand-adsorb until ``num_ads_atoms`` sites are occupied
    (reference MCMC.prepare_canonical, mcmc.py:148-188): jittable
    while_loop, vmap-safe.

    The reference's loop (and the default here) is unbounded — if every
    adsorption is strongly uphill at the prep temperature the Metropolis
    acceptance can be ~exp(-dE/T) ~ 0 and the loop effectively never
    terminates. ``max_steps`` bounds it; with ``force_fill`` the remaining
    occupancy is then filled deterministically (lowest-index empty sites,
    uniform random codes) so the canonical run always starts feasible.
    NOTE: canonical exchange moves conserve the code multiset, so in a
    multi-species vocabulary a force-filled start FIXES the (random)
    composition for the whole canonical run — the subsequent chain samples
    only within that composition sector. Single-species systems are
    unaffected; multi-species users who need a specific composition should
    pass an explicit start state (or leave force_fill off so prep's
    semigrand acceptances choose the composition at the prep temperature).
    """
    step_fn = make_semigrand_step(
        d,
        state_energy_fn,
        criterion=cfg.criterion,
        filter_distance=cfg.filter_distance,
        always_accept=cfg.always_accept,
    )
    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes

    def prepare(state: MCState, temp):
        if max_steps is None:

            def cond(s):
                return num_occupied_sites(s.site_state) < num_ads_atoms

            def body(s):
                s, _ = step_fn(s, temp)
                return s

            return jax.lax.while_loop(cond, body, state)

        def cond(carry):
            s, it = carry
            return (num_occupied_sites(s.site_state) < num_ads_atoms) & (it < max_steps)

        def body(carry):
            s, it = carry
            s, _ = step_fn(s, temp)
            return s, it + 1

        state, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0, jnp.int32)))
        if not force_fill:
            return state

        key, k_codes = jax.random.split(state.key)
        ss = state.site_state
        missing = num_ads_atoms - num_occupied_sites(ss)
        # rank empty sites first (stable by index), occupy the first `missing`
        empty = ss == 0
        order = jnp.argsort(jnp.where(empty, jnp.arange(n_sites), n_sites + jnp.arange(n_sites)))
        take = jnp.arange(n_sites) < missing
        codes = jax.random.randint(k_codes, (n_sites,), 1, n_codes)
        ss = ss.at[order].set(jnp.where(take, codes, ss[order]))
        return state._replace(site_state=ss, key=key)

    return prepare


def even_site_prefill(spec, num_ads_atoms: int, rng=None, code: int | None = None) -> np.ndarray:
    """Evenly spread initial adsorption over the site lattice.

    Reference MCMC.prepare_canonical(even_adsorption_sites=True)
    (mcmc.py:163-179): Ward-cluster the xy site coordinates into
    ``num_ads_atoms`` groups and occupy the member closest to each center.
    Returns an initial site_state (codes random over the vocabulary unless
    ``code`` is given).
    """
    from surface_sampling_tpu.analysis.clustering import (
        find_closest_points_indices,
        get_cluster_centers,
    )

    rng = rng or np.random.default_rng()
    centers, labels = get_cluster_centers(spec.site_coords[:, :2], num_ads_atoms)
    sites_idx = list(find_closest_points_indices(spec.site_coords[:, :2], centers, labels))
    # ward/fcluster can merge ties and return fewer clusters; top up randomly
    remaining = [s for s in range(spec.n_sites) if s not in sites_idx]
    while len(sites_idx) < num_ads_atoms and remaining:
        pick = int(rng.choice(len(remaining)))
        sites_idx.append(remaining.pop(pick))
    ss = np.zeros(spec.n_sites, dtype=np.int32)
    for s in sites_idx[:num_ads_atoms]:
        ss[s] = code if code is not None else rng.integers(1, spec.n_codes)
    return ss


def count_adsorption_sites(site_state, connectivity) -> dict:
    """Histogram of occupied sites by connectivity class
    (mcmc/slab.py:425-436 analog)."""
    from collections import Counter

    ss = np.asarray(site_state)
    conn = np.asarray(connectivity)
    return dict(Counter(conn[ss > 0].tolist()))


def geometric_schedule(start_temp: float, total_sweeps: int, alpha: float = 0.99) -> np.ndarray:
    """T_i = start * alpha^i — the reference's default annealing schedule
    (utils/sampling.py:43-49)."""
    return start_temp * alpha ** np.arange(total_sweeps, dtype=np.float64)


@dataclass
class MCMCRun:
    """Convenience bundle: build everything from a spec + potential and run.

    This is the single-chain entry point; multi-chain runs go through
    parallel/chains.py which vmaps/shards the same run function.
    """

    spec: SurfaceSpec
    potential: object
    surface_energy_fn: Callable | None = None
    relax: object | None = None
    symmetric: object | None = None
    dtype: object = jnp.float32
    relax_potential: object | None = None   # relax under a different model
    # (reference Si(111) 5x5: minimize with SRS, accept on SW85 energies)

    def __post_init__(self):
        self.d = device_spec(self.spec, dtype=self.dtype)
        from surface_sampling_tpu.core.energy import identity_surface_energy

        se_fn = self.surface_energy_fn or identity_surface_energy
        self.state_energy_fn = make_state_energy_fn(
            self.d, self.potential, se_fn, relax=self.relax, symmetric=self.symmetric,
            relax_potential=self.relax_potential,
        )

    def init_state(self, key, site_state=None) -> MCState:
        state = initial_state(self.d, key, site_state=site_state)
        e = self.state_energy_fn(state.site_state)
        return state._replace(energy=e.surface_energy, relaxed_positions=e.positions)

    def run(
        self,
        key,
        temps,
        site_state=None,
        cfg: EngineConfig = EngineConfig(),
        distance_weight_matrix=None,
    ):
        state = self.init_state(key, site_state)
        if cfg.canonical and cfg.num_ads_atoms > 0:
            prep = jax.jit(
                prepare_canonical_fn(
                    self.d,
                    self.state_energy_fn,
                    cfg.num_ads_atoms,
                    cfg,
                    max_steps=cfg.prep_max_steps,
                    force_fill=cfg.prep_force_fill,
                )
            )
            state = prep(state, jnp.asarray(float(temps[0])))
            e = self.state_energy_fn(state.site_state)
            state = state._replace(energy=e.surface_energy, relaxed_positions=e.positions)
        run_fn = jax.jit(
            make_run_fn(
                self.d,
                self.state_energy_fn,
                cfg,
                potential=self.potential,
                distance_weight_matrix=distance_weight_matrix,
            )
        )
        return run_fn(state, jnp.asarray(temps, self.dtype))
