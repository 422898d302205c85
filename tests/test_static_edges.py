"""Static rigid-lattice edge geometry (ops/static_edges.py).

Pins: (a) the static per-eval edge build produces the SAME edge set
(mask/neighbor-ranks/overflow, bit-exact) and the same geometry values
(to the bf16x2 payload-split tolerance) as the dynamic
neighbor_list_from_table + prepare_message_geometry path it replaces on
the MC hot loop; (b) the rigid_energy potential hook agrees with the
dynamic full evaluation end to end; (c) the hook only exists where it is
valid (code-independent geometry, non-relax).

Reference counterpart: the reference rebuilds its ASE/nff neighbor list
every MC move (nff AtomsBatch.update_nbr_list, mcmc/dynamics.py:129) even
though its lattice moves never change the geometry — this module is the
TPU-native exploitation of that invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu import systems
from surface_sampling_tpu.core.energy import make_state_energy_fn
from surface_sampling_tpu.core.state import realize_alive, realize_positions
from surface_sampling_tpu.models.painn import prepare_message_geometry
from surface_sampling_tpu.ops.neighbors import make_table_edge_fn
from surface_sampling_tpu.ops.pallas_painn import stage_band
from surface_sampling_tpu.ops.static_edges import (
    build_static_edge_pack,
    code_independent_geometry,
    static_edge_geometry,
)


@pytest.fixture(scope="module")
def super22():
    return systems.srtio3_001_painn(supercell=(2, 2))


def test_static_edge_geometry_matches_dynamic(super22):
    """Edge-set identity + geometry-value parity on random occupancies
    (incl. an over-dense overflow state) for the banded supercell."""
    ia = super22.potential.__dict__["inc_args"]
    spec, cfg = ia["spec"], ia["cfg"]
    static_nbr, band = ia["static_nbr"], ia["band"]
    d = super22.run.d
    pack = build_static_edge_pack(spec, static_nbr, cfg, band=band)
    assert pack is not None
    edge_fn = make_table_edge_fn(static_nbr, cfg.cutoff, cfg.max_neighbors)
    dband = stage_band(band)

    rng = np.random.default_rng(0)
    S, C = spec.n_sites, spec.n_codes
    for empty_frac in (0.75, 0.55):  # sparse (physical) and dense (overflow)
        ss = rng.integers(0, C, S)
        ss = jnp.asarray(np.where(rng.random(S) < empty_frac, 0, ss), jnp.int32)
        pos = realize_positions(d, ss)
        alive = realize_alive(d, ss)
        e_dyn = edge_fn(pos, alive)
        mg_dyn = prepare_message_geometry(cfg, pos, e_dyn, band=dband)
        mg_sta, e_sta = static_edge_geometry(pack, alive)

        # same edge set: natural-order mask + overflow bit-exact
        assert bool(jnp.all(e_dyn[3] == e_sta[3]))
        assert bool(e_dyn[4]) == bool(e_sta[4])
        # same neighbor ranks on selected edges
        sel = mg_dyn[1] > 0
        assert int(jnp.sum((mg_dyn[2] != mg_sta[2]) & sel)) == 0
        # geometry values to the bf16x2 payload tolerance
        np.testing.assert_allclose(mg_sta[0], mg_dyn[0], atol=5e-5)  # rbf
        np.testing.assert_allclose(mg_sta[1], mg_dyn[1], atol=5e-5)  # envm
        np.testing.assert_allclose(mg_sta[3], mg_dyn[3], atol=5e-5)  # unit
        r_err = jnp.max(jnp.abs(jnp.where(e_dyn[3], e_dyn[1] - e_sta[1], 0.0)))
        assert float(r_err) < 1e-4


def test_rigid_hook_energy_parity():
    """state_energy_fn via the rigid hook vs the dynamic path on the 1x1
    flagship: pristine anchor (-467.52 eV potential / SE ~12.49) and a
    random state, within the bf16x2 payload tolerance."""
    sys_ = systems.srtio3_001_painn()
    pot, run = sys_.potential, sys_.run
    assert "rigid_energy" in pot.__dict__
    S, C = sys_.spec.n_sites, sys_.spec.n_codes

    e0 = run.state_energy_fn(jnp.zeros(S, jnp.int32))
    assert abs(float(e0.surface_energy) - 12.49) < 0.02  # CLAUDE.md anchor

    rng = np.random.default_rng(1)
    ss = rng.integers(0, C, S)
    ss = jnp.asarray(np.where(rng.random(S) < 0.75, 0, ss), jnp.int32)
    e_hook = run.state_energy_fn(ss)
    rigid = pot.__dict__.pop("rigid_energy")
    try:
        fn_dyn = make_state_energy_fn(run.d, pot, run.surface_energy_fn)
        e_dyn = fn_dyn(ss)
    finally:
        pot.__dict__["rigid_energy"] = rigid
    assert abs(float(e_hook.surface_energy) - float(e_dyn.surface_energy)) < 5e-3


def test_hook_gating():
    """No pack on code-dependent geometry; no hook on relax systems."""

    class FakeD:
        code_offsets = np.array([[[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.2]]])

    assert not code_independent_geometry(FakeD())
    assert build_static_edge_pack(FakeD(), None, None, None) is None

    from surface_sampling_tpu.core import RelaxConfig

    relax_sys = systems.srtio3_001_painn(relax=RelaxConfig(steps=2, fmax=0.5))
    assert "rigid_energy" not in relax_sys.potential.__dict__


def test_l1_fast_kernel_parity():
    """The fused layer-1 kernel (ops/pallas_painn._msg_kernel_l1) is an
    EXACT restructuring at layer 1 (v == 0 kills the vcat route; s is the
    alive-masked embedding so phi is a per-species table): the full
    ensemble energy with l1_types set must match the general-kernel path
    on random occupancies."""
    from surface_sampling_tpu.core.state import realize_type_idx
    from surface_sampling_tpu.models.ensemble import ensemble_apply

    from pathlib import Path

    from surface_sampling_tpu import models as _models_pkg
    from surface_sampling_tpu.models.convert_nff import load_params_npz
    from surface_sampling_tpu.models.ensemble import stack_params

    sys_ = systems.srtio3_001_painn()
    pot, run, spec = sys_.potential, sys_.run, sys_.spec
    pack = pot.__dict__["static_edge_pack"]
    model_dir = Path(_models_pkg.__file__).parent / "data"
    plist, cfg = [], None
    for i in range(1, 4):
        p, cfg = load_params_npz(model_dir / f"srtio3_painn_{i:02d}.npz")
        plist.append(p)
    params = stack_params(plist)
    import dataclasses as _dc

    cfg = _dc.replace(cfg, max_neighbors=64)

    from surface_sampling_tpu.ops.static_edges import (
        _static_positions,
        static_edge_geometry,
    )

    cfg_rigid = _dc.replace(cfg, message_mode="pallas")
    static_pos = jnp.asarray(_static_positions(spec), jnp.float32)
    znums = jnp.asarray([38, 22, 8], jnp.int32)
    S, C = spec.n_sites, spec.n_codes
    rng = np.random.default_rng(7)
    for _ in range(3):
        ss = jnp.asarray(rng.integers(0, C, S), jnp.int32)
        alive = realize_alive(run.d, ss)
        tidx = realize_type_idx(run.d, ss)
        numbers = znums[tidx] * alive.astype(jnp.int32)
        msg_geom, edges = static_edge_geometry(pack, alive)
        e_l1 = ensemble_apply(params, cfg_rigid, static_pos, numbers, alive,
                              None, edges=edges, msg_geom=msg_geom,
                              l1_types=(38, 22, 8))["energy"]
        e_gen = ensemble_apply(params, cfg_rigid, static_pos, numbers, alive,
                               None, edges=edges, msg_geom=msg_geom)["energy"]
        np.testing.assert_allclose(float(e_l1), float(e_gen), rtol=0, atol=2e-4)


def test_l1_banded_kernel_parity():
    """Banded layer-1 fast kernel (2x2 supercell): compared in f32
    routing, where the test isolates the BANDING/species-table math from
    routing payload precision — measured EXACTLY 0.0 eV on both CPU
    (interpret) and TPU v5e over random occupancies (round 5; the
    previous ~10 meV slack was entirely bf16x2 payload rounding, which
    the unbanded twin test already bounds at 2e-4)."""
    import surface_sampling_tpu.models.painn as mpainn
    from surface_sampling_tpu.core.state import realize_type_idx

    sys_ = systems.srtio3_001_painn(supercell=(2, 2), pallas_routing="f32")
    pot, run = sys_.potential, sys_.run
    assert pot.__dict__["static_edge_pack"].dband is not None
    d = run.d
    S, C = sys_.spec.n_sites, sys_.spec.n_codes
    rng = np.random.default_rng(3)
    ss = jnp.asarray(
        rng.integers(0, C, S) * (rng.random(S) < 0.25), jnp.int32)
    alive = realize_alive(d, ss)
    tidx = realize_type_idx(d, ss)
    e_l1 = float(pot.__dict__["rigid_energy"](tidx, alive))

    orig = mpainn.painn_features

    def no_l1(*a, **k):
        k["l1_types"] = None
        return orig(*a, **k)

    mpainn.painn_features = no_l1
    try:
        e_gen = float(pot.__dict__["rigid_energy"](tidx, alive))
    finally:
        mpainn.painn_features = orig
    assert abs(e_l1 - e_gen) < 2e-4
