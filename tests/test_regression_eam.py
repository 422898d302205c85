"""Numeric regression tests against the reference's golden LAMMPS energies.

The reference pins full stochastic MC trajectories (tests/test_Cu.py:19,
tests/test_Au.py:19); RNG streams differ across frameworks, so here the
physics is pinned instead:

  * Au(110) canonical: 6 adsorbates over the 8 reference sites span only
    C(8,6)=28 configurations. The minimum EAM energy over all of them must
    reproduce the reference's regression value -79.03490823689619 eV
    (tests/test_Au.py:19) — our x64 EAM matches LAMMPS to ~3e-6 eV, with
    the residual from LAMMPS' file-pipeline coordinate truncation.
  * The canonical MC engine must actually find that ground state.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.core import EngineConfig, geometric_schedule
from surface_sampling_tpu.systems import au110_eam, cu100_eam

AU_REFERENCE_MIN = -79.03490823689619  # tests/test_Au.py:19


def test_au110_ground_state_matches_lammps_reference():
    with jax.enable_x64(True):
        sys = au110_eam(dtype=jnp.float64)
        f = jax.jit(lambda ss: sys.run.state_energy_fn(ss).surface_energy)
        energies = []
        for combo in itertools.combinations(range(8), 6):
            ss = jnp.zeros(8, jnp.int32)
            for s in combo:
                ss = ss.at[s].set(1)
            energies.append(float(f(ss)))
        assert abs(min(energies) - AU_REFERENCE_MIN) < 1e-4


def test_au110_canonical_mc_finds_ground_state():
    sys = au110_eam()  # f32 engine
    temps = geometric_schedule(1.0, 20, alpha=0.8)
    cfg = EngineConfig(sweep_size=8, canonical=True, num_ads_atoms=6)
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, cfg=cfg)
    assert np.all(np.asarray(rec.n_ads) == 6)
    best = float(np.min(np.asarray(rec.energy)))
    # f32 engine: match the exact ground state to f32 tolerance
    assert abs(best - AU_REFERENCE_MIN) < 5e-3


def test_cu100_semigrand_anneal_improves_energy():
    """Mirror of the Cu(100) toy run (tests/test_Cu.py:54-91): annealed
    semigrand MC with mu=0 must adsorb Cu and lower the raw EAM energy
    below the pristine slab energy."""
    sys = cu100_eam()
    e_pristine = float(sys.run.state_energy_fn(jnp.zeros(len(sys.spec.site_coords), jnp.int32)).surface_energy)
    temps = geometric_schedule(1.0, 10, alpha=0.99)
    state, rec = sys.run.run(jax.random.PRNGKey(0), temps, cfg=EngineConfig(sweep_size=5))
    best = float(np.min(np.asarray(rec.energy)))
    assert best < e_pristine - 1.0  # at least one strongly bound adsorbate
    assert int(rec.n_ads[-1]) > 0


def test_cu100_pristine_energy_pinned():
    """Regression pin of our own Cu(100) 2x2x2 pristine slab energy (x64).

    8 Cu atoms, 2 layers -> every atom is a surface atom; the value is a
    stable property of the Cu_u3 table + geometry.
    """
    with jax.enable_x64(True):
        sys = cu100_eam(dtype=jnp.float64)
        e = float(sys.run.state_energy_fn(jnp.zeros(len(sys.spec.site_coords), jnp.int32)).surface_energy)
        # pinned at first computation; guards the whole geometry+EAM stack
        assert abs(e - PRISTINE_CU100_E) < 1e-6


PRISTINE_CU100_E = -24.058476294465656


def test_au110_rigid_fast_path_matches_exact():
    """au110_eam(fast=True) — the rigid quadratic-form EAM — must agree
    with the exact spline-gather path on EVERY canonical configuration
    (all C(8,6)=28 six-adsorbate states plus empty/full), and must still
    hit the LAMMPS reference ground state."""
    import itertools

    exact = au110_eam()
    fast = au110_eam(fast=True)
    f_e = jax.jit(lambda ss: exact.run.state_energy_fn(ss).surface_energy)
    f_f = jax.jit(lambda ss: fast.run.state_energy_fn(ss).surface_energy)
    states = [jnp.zeros(8, jnp.int32), jnp.ones(8, jnp.int32)]
    for combo in itertools.combinations(range(8), 6):
        ss = jnp.zeros(8, jnp.int32)
        for s in combo:
            ss = ss.at[s].set(1)
        states.append(ss)
    best = np.inf
    for ss in states:
        e, f = float(f_e(ss)), float(f_f(ss))
        assert abs(e - f) < 2e-3, (np.asarray(ss), e, f)
        if int(jnp.sum(ss > 0)) == 6:
            best = min(best, f)
    assert abs(best - AU_REFERENCE_MIN) < 5e-3
