"""PaiNN model tests: invariances, ensemble semantics, reference parity.

The parity test pins the reference tutorial's printed pristine-slab
energy for SrTiO3(001) 2x2 with the converted 3-model ensemble
(tutorials/SrTiO3_001.ipynb BFGS step-0 prints -467.52 eV).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surface_sampling_tpu.models import (
    PaiNNConfig,
    ensemble_apply,
    ensemble_forces_std,
    init_painn,
    painn_apply,
    stack_params,
)
from surface_sampling_tpu.systems import srtio3_001_painn


@pytest.fixture(scope="module")
def tiny_model():
    cfg = PaiNNConfig(feat_dim=16, n_rbf=8, cutoff=4.0, n_layers=2, readout_hidden=8,
                      max_neighbors=12)
    params = init_painn(jax.random.PRNGKey(0), cfg)
    return params, cfg


def _random_cluster(key, n=6):
    pos = jax.random.uniform(key, (n, 3)) * 4.0
    numbers = jnp.asarray([8, 8, 22, 38, 8, 22][:n], jnp.int32)
    alive = jnp.ones(n, bool)
    shifts = jnp.zeros((1, 3))
    return pos, numbers, alive, shifts


def test_painn_translation_invariance(tiny_model):
    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(1))
    e1 = painn_apply(params, cfg, pos, numbers, alive, shifts)["energy"]
    e2 = painn_apply(params, cfg, pos + 3.7, numbers, alive, shifts)["energy"]
    assert np.isclose(float(e1), float(e2), atol=1e-4)


def test_painn_rotation_invariance(tiny_model):
    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(2))
    theta = 0.7
    rot = jnp.asarray(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1.0]]
    )
    e1 = painn_apply(params, cfg, pos, numbers, alive, shifts)["energy"]
    e2 = painn_apply(params, cfg, pos @ rot.T, numbers, alive, shifts)["energy"]
    assert np.isclose(float(e1), float(e2), atol=1e-3)


def test_painn_permutation_invariance(tiny_model):
    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(3))
    perm = jnp.asarray([3, 1, 0, 5, 4, 2])
    e1 = painn_apply(params, cfg, pos, numbers, alive, shifts)["energy"]
    e2 = painn_apply(params, cfg, pos[perm], numbers[perm], alive, shifts)["energy"]
    assert np.isclose(float(e1), float(e2), atol=1e-4)


def test_painn_dead_slots_ignored(tiny_model):
    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(4))
    e1 = painn_apply(params, cfg, pos, numbers, alive, shifts)["energy"]
    pos2 = jnp.concatenate([pos, pos[:2] + 0.05])
    numbers2 = jnp.concatenate([numbers, numbers[:2]])
    alive2 = jnp.concatenate([alive, jnp.zeros(2, bool)])
    e2 = painn_apply(params, cfg, pos2, numbers2, alive2, shifts)["energy"]
    assert np.isclose(float(e1), float(e2), atol=1e-4)


def test_ensemble_stats(tiny_model):
    params, cfg = tiny_model
    p2 = init_painn(jax.random.PRNGKey(9), cfg)
    stacked = stack_params([params, p2])
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(5))
    out = ensemble_apply(stacked, cfg, pos, numbers, alive, shifts)
    assert out["member_energy"].shape == (2,)
    assert float(out["energy_std"]) > 0
    assert np.isclose(
        float(out["energy"]), float(np.mean(np.asarray(out["member_energy"]))), rtol=1e-6
    )
    fs = ensemble_forces_std(stacked, cfg, pos, numbers, alive, shifts)
    assert fs.shape == pos.shape
    assert float(fs.max()) > 0


def test_srtio3_pristine_energy_matches_reference_tutorial():
    sys = srtio3_001_painn()
    out = sys.run.state_energy_fn(jnp.zeros(len(sys.spec.site_coords), jnp.int32))
    # tutorials/SrTiO3_001.ipynb BFGS step 0: -467.521881 eV (unrelaxed)
    assert abs(float(out.potential_energy) - (-467.52)) < 0.05
    # printed "Surface energy 12.471 eV" (after a short relax); unrelaxed ~12.5
    assert abs(float(out.surface_energy) - 12.5) < 0.2


def test_srtio3_adsorption_step_smoke():
    sys = srtio3_001_painn()
    import jax as _jax

    from surface_sampling_tpu.core.events import make_semigrand_step

    step = _jax.jit(
        lambda s: make_semigrand_step(sys.run.d, sys.run.state_energy_fn)(
            s, jnp.asarray(1.0)
        )
    )
    state = sys.run.init_state(_jax.random.PRNGKey(0))
    for _ in range(2):
        state, info = step(state)
    assert np.isfinite(float(state.energy))


def test_srtio3_relaxed_surface_energy_matches_tutorial():
    """Full-stack parity: FIRE-relaxed pristine surface energy through the
    CLI assembly path matches the tutorial's printed 'Surface energy
    12.471 eV' (BFGS-relaxed) to a couple of meV."""
    import json

    from surface_sampling_tpu.cli.common import assemble_system, load_settings
    from surface_sampling_tpu.structure import Structure

    s = load_settings("examples/configs/srtio3_painn.json")
    d = np.load("surface_sampling_tpu/systems_data/SrTiO3_001_2x2.npz")
    slab = Structure(d["numbers"], d["positions"], d["cell"])
    asys = assemble_system(s, slab)
    se = float(
        asys.run.state_energy_fn(
            jnp.zeros(asys.spec.n_sites, jnp.int32)
        ).surface_energy
    )
    assert abs(se - 12.471) < 0.02


def test_static_table_edges_match_full_search():
    """neighbor_list_from_table must reproduce the all-image neighbor_list
    energies exactly on slot-realized geometries whenever no center
    truncates (the MC hot path uses the static-candidate table; on
    non-overflow states the edge SETS are identical). Overflow states may
    truncate to different edge subsets (top_k tie-breaking vs table
    order), but both paths must reject them: overflow flagged, energy
    pushed far positive."""
    from surface_sampling_tpu.core.state import realize_alive, realize_positions
    from surface_sampling_tpu.systems import srtio3_001_painn

    sys_ = srtio3_001_painn()        # builds with static_nbr
    d = sys_.run.d
    spec = sys_.spec
    # a PHYSICAL occupied state: greedy min-3.5A site packing (random
    # dense states live in the excl_vol blow-up regime where the net
    # amplifies f32 summation-order noise to eV scale — meaningless for
    # a parity check)
    sc = np.asarray(spec.site_coords)
    cell = np.asarray(spec.cell)
    inv = np.linalg.inv(cell)

    def _mic_d(a, b):
        f = (a - b) @ inv
        return float(np.linalg.norm((f - np.round(f)) @ cell))

    chosen = []
    for i in range(len(sc)):
        if all(_mic_d(sc[i], sc[j]) >= 3.5 for j in chosen):
            chosen.append(i)
    assert len(chosen) >= 3
    ss_np = np.zeros(spec.n_sites, np.int32)
    for k, i in enumerate(chosen):
        ss_np[i] = 1 + k % 3
    ss = jnp.asarray(ss_np)
    pos = realize_positions(d, ss)
    alive = realize_alive(d, ss)

    import dataclasses as _dc
    from pathlib import Path

    from surface_sampling_tpu.core.state import realize_type_idx
    from surface_sampling_tpu.models.convert_nff import load_params_npz
    from surface_sampling_tpu.models.nn_calculator import make_painn_potential

    import json as _json

    mdir = Path("surface_sampling_tpu/models/data")
    plist, cfg = [], None
    for i in (1, 2, 3):
        p, cfg = load_params_npz(mdir / f"srtio3_painn_{i:02d}.npz")
        plist.append(p)
    cfg = _dc.replace(cfg, max_neighbors=64)
    params = stack_params(plist)
    stoidict = _json.loads(
        Path("surface_sampling_tpu/systems_data/srtio3_offset_data.json").read_text()
    )["stoidict"]
    pot_full = make_painn_potential(
        params, cfg, [38, 22, 8], ensemble=True, stoidict=stoidict
    )
    ti = realize_type_idx(d, ss)
    from surface_sampling_tpu.ops.neighbors import neighbor_list

    *_, of = neighbor_list(pos, d.shifts, alive, cfg.cutoff, cfg.max_neighbors)
    assert not bool(of), "intended non-overflow state overflows; lower occupancy"
    e_full = float(pot_full.energy(pos, ti, alive, d.shifts))
    e_static = float(sys_.potential.energy(pos, ti, alive, d.shifts))
    # neighbor ORDER differs between the two builders (nearest-first vs
    # table order); the summations are mathematically identical, so only
    # f32 rounding separates them on physical states
    assert np.isclose(e_full, e_static, rtol=0, atol=5e-3), (e_full, e_static)

    # every-slot-alive state: both paths truncate (108 in-range > 64) and
    # must reject — energies pushed far positive on both
    ss_all = jnp.full((sys_.spec.n_sites,), 1, jnp.int32)
    pos_a = realize_positions(d, ss_all)
    alive_a = realize_alive(d, ss_all)
    ti_a = realize_type_idx(d, ss_all)
    e_full_a = float(pot_full.energy(pos_a, ti_a, alive_a, d.shifts))
    e_static_a = float(sys_.potential.energy(pos_a, ti_a, alive_a, d.shifts))
    # 1e6 kcal/mol override -> ~4.3e4 eV after unit conversion + offsets
    assert e_full_a > 1e4 and e_static_a > 1e4, (e_full_a, e_static_a)


def test_dense_message_mode_matches_gather(tiny_model):
    """message_mode="dense" (one-hot MXU matmuls, the TPU hot path) must
    reproduce the per-edge gather formulation bit-closely, including
    forces, on the same backend."""
    import dataclasses as dc

    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(42))
    cfg_g = dc.replace(cfg, message_mode="gather")
    cfg_d = dc.replace(cfg, message_mode="dense")
    out_g = painn_apply(params, cfg_g, pos, numbers, alive, shifts)
    out_d = painn_apply(params, cfg_d, pos, numbers, alive, shifts)
    np.testing.assert_allclose(
        float(out_g["energy"]), float(out_d["energy"]), rtol=1e-6, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_g["per_atom_energy"]), np.asarray(out_d["per_atom_energy"]),
        rtol=1e-5, atol=1e-5,
    )
    f_g = jax.grad(lambda p: painn_apply(params, cfg_g, p, numbers, alive, shifts)["energy"])(pos)
    f_d = jax.grad(lambda p: painn_apply(params, cfg_d, p, numbers, alive, shifts)["energy"])(pos)
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_d), rtol=1e-4, atol=1e-5)

    # dead-slot masking: dense mode must also zero dead-atom contributions
    alive2 = alive.at[2].set(False)
    e_g = float(painn_apply(params, cfg_g, pos, numbers, alive2, shifts)["energy"])
    e_d = float(painn_apply(params, cfg_d, pos, numbers, alive2, shifts)["energy"])
    np.testing.assert_allclose(e_g, e_d, rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("routing", ["f32", "bf16x2"])
def test_pallas_message_mode_matches_gather(tiny_model, routing):
    _check_pallas_matches_gather(tiny_model, routing, rtol=1e-6, atol=1e-5)


def _elongated_system(key, n=48, box=(40.0, 6.0, 6.0), cutoff=4.0):
    """Synthetic periodic system whose candidate windows are much
    narrower than the cell (neighbors span < ~1/4 of the x-sorted index
    range) — the banded-routing regime."""
    from surface_sampling_tpu.ops.neighbors import pair_shifts

    k1, _ = jax.random.split(key)
    pos = jax.random.uniform(k1, (n, 3)) * jnp.asarray(box)
    numbers = jnp.asarray(([8, 22, 38, 8] * ((n + 3) // 4))[:n], jnp.int32)
    alive = jnp.ones(n, bool)
    cell = np.diag(box)
    shifts = jnp.asarray(pair_shifts(cell, cutoff), jnp.float32)
    return pos, numbers, alive, shifts


@pytest.mark.parametrize("routing", ["f32", "bf16x2"])
def test_banded_routing_matches_gather(tiny_model, routing):
    """Block-banded routing (ops/banding.py + painn_message_fused_banded)
    must reproduce the gather formulation — energies, per-atom energies,
    forces through the banded custom VJP, and dead-slot masking — on a
    system with genuine periodic wrap in the windows."""
    import dataclasses as dc

    from surface_sampling_tpu.models.painn import painn_edges
    from surface_sampling_tpu.ops.banding import build_routing_band
    from surface_sampling_tpu.ops.pallas_painn import choose_message_block

    params, cfg = tiny_model
    pos, numbers, alive, shifts = _elongated_system(jax.random.PRNGKey(11))
    N = pos.shape[0]
    n_pad = ((N + 15) // 16) * 16
    n_blk = choose_message_block(n_pad)
    # candidate table := the full in-range edge set at these positions
    # (a superset of every runtime-selected neighbor, like the spec's
    # static table is for slot-realized geometries)
    _, _, nbr_j, nbr_mask, _ = painn_edges(cfg, positions=pos, alive=alive,
                                           shifts=shifts)
    band = build_routing_band(np.asarray(pos), np.asarray(nbr_j),
                              np.asarray(nbr_mask), n_blk, n_pad)
    assert band is not None and band.window < n_pad, (
        "test geometry must produce a genuine band")
    assert band.halo > 0, "test geometry must exercise the wrap halo"

    cfg_g = dc.replace(cfg, message_mode="gather")
    cfg_b = dc.replace(cfg, message_mode="pallas", pallas_routing=routing)
    out_g = painn_apply(params, cfg_g, pos, numbers, alive, shifts)
    out_b = painn_apply(params, cfg_b, pos, numbers, alive, shifts, band=band)
    rtol, atol = (1e-6, 1e-5) if routing == "f32" else (1e-4, 1e-3)
    np.testing.assert_allclose(
        float(out_g["energy"]), float(out_b["energy"]), rtol=rtol, atol=atol)
    np.testing.assert_allclose(
        np.asarray(out_g["per_atom_energy"]),
        np.asarray(out_b["per_atom_energy"]), rtol=1e-4, atol=atol)

    f_g = jax.grad(lambda p: painn_apply(params, cfg_g, p, numbers, alive,
                                         shifts)["energy"])(pos)
    f_b = jax.grad(lambda p: painn_apply(params, cfg_b, p, numbers, alive,
                                         shifts, band=band)["energy"])(pos)
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_b),
                               rtol=1e-3, atol=5e-4 if routing != "f32" else 1e-5)

    # weight gradients ride the banded backward too
    gw_g = jax.grad(lambda pr: painn_apply(pr, cfg_g, pos, numbers, alive,
                                           shifts)["energy"])(params)
    gw_b = jax.grad(lambda pr: painn_apply(pr, cfg_b, pos, numbers, alive,
                                           shifts, band=band)["energy"])(params)
    for a, b in zip(jax.tree.leaves(gw_g), jax.tree.leaves(gw_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)

    # dead slots stay dead through the banded path
    alive2 = alive.at[5].set(False)
    e_g = float(painn_apply(params, cfg_g, pos, numbers, alive2, shifts)["energy"])
    e_b = float(painn_apply(params, cfg_b, pos, numbers, alive2, shifts,
                            band=band)["energy"])
    np.testing.assert_allclose(e_g, e_b, rtol=rtol, atol=atol)


def test_pallas_bf16_routing_optin(tiny_model):
    """routing="bf16" (single-pass pure-bf16 dots, ops/pallas_routing.py)
    is a speed opt-in: it must still track the gather formulation, just
    at bf16 feature precision (loose tolerances)."""
    _check_pallas_matches_gather(tiny_model, "bf16", rtol=0.05, atol=0.05)


def _check_pallas_matches_gather(tiny_model, routing, rtol, atol):
    """message_mode="pallas" (ops/pallas_painn.py fused VMEM kernel — the
    TPU MC hot path; routing="f32" is bit-identical to dense on-chip:
    measured max |dE|=0 on the SrTiO3 ensemble batch, while the default
    "bf16x2" hi+lo split adds only a few-meV constant offset there) must
    match the gather formulation on CPU via the interpreter, including
    forces through the custom VJP and dead-slot masking."""
    import dataclasses as dc

    params, cfg = tiny_model
    pos, numbers, alive, shifts = _random_cluster(jax.random.PRNGKey(43))
    cfg_g = dc.replace(cfg, message_mode="gather")
    cfg_p = dc.replace(cfg, message_mode="pallas", pallas_routing=routing)
    out_g = painn_apply(params, cfg_g, pos, numbers, alive, shifts)
    out_p = painn_apply(params, cfg_p, pos, numbers, alive, shifts)
    np.testing.assert_allclose(
        float(out_g["energy"]), float(out_p["energy"]), rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(out_g["per_atom_energy"]), np.asarray(out_p["per_atom_energy"]),
        rtol=max(rtol, 1e-5), atol=atol,
    )
    # forces flow through the custom VJP (backward = JAX reference impl)
    f_g = jax.grad(lambda p: painn_apply(params, cfg_g, p, numbers, alive, shifts)["energy"])(pos)
    f_p = jax.grad(lambda p: painn_apply(params, cfg_p, p, numbers, alive, shifts)["energy"])(pos)
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_p),
                               rtol=max(rtol, 1e-4), atol=atol)
    # weight gradients too (fine-tuning path)
    g_g = jax.grad(lambda w: painn_apply(w, cfg_g, pos, numbers, alive, shifts)["energy"])(params)
    g_p = jax.grad(lambda w: painn_apply(w, cfg_p, pos, numbers, alive, shifts)["energy"])(params)
    for a, b in zip(jax.tree.leaves(g_g), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=max(rtol, 1e-4), atol=atol)

    alive2 = alive.at[2].set(False)
    e_g = float(painn_apply(params, cfg_g, pos, numbers, alive2, shifts)["energy"])
    e_p = float(painn_apply(params, cfg_p, pos, numbers, alive2, shifts)["energy"])
    np.testing.assert_allclose(e_g, e_p, rtol=rtol, atol=atol)


def test_srtio3_supercell_extensive():
    """srtio3_001_painn(supercell=) tiles the slab for production-scale
    sampling. The NN energy must be exactly extensive (the stoidict
    offset adds a per-structure linear-fit intercept that cancels in
    every MC energy difference — see the systems.py docstring)."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core.state import (
        realize_alive,
        realize_positions,
        realize_type_idx,
    )
    from surface_sampling_tpu.systems import srtio3_001_painn

    s1 = srtio3_001_painn(n_models=1)
    s2 = srtio3_001_painn(n_models=1, supercell=(2, 1))
    assert s2.spec.n_pristine == 2 * s1.spec.n_pristine
    assert s2.spec.n_sites == 2 * s1.spec.n_sites

    def nn_sum(s):
        d = s.run.d
        ss = jnp.zeros(s.spec.n_sites, jnp.int32)
        pa = s.potential.per_atom_energy(
            realize_positions(d, ss), realize_type_idx(d, ss),
            realize_alive(d, ss), d.shifts)
        return float(jnp.sum(pa))

    e1, e2 = nn_sum(s1), nn_sum(s2)
    np.testing.assert_allclose(e2, 2 * e1, rtol=1e-5)


def test_fused_vjp_dense_formulation_matches_gather(monkeypatch):
    """The custom-VJP backward reference switches to one-hot matmuls on
    TPU (scatter-add-free); its outputs and VJP must match the CPU
    gather formulation exactly."""
    from surface_sampling_tpu.ops import pallas_painn as pp

    key = jax.random.PRNGKey(5)
    N_pad, F, M, R = 16, 8, 8, 8
    E = N_pad * M
    ks = jax.random.split(key, 8)
    phi = jax.random.normal(ks[0], (N_pad, 3 * F))
    vcat = jax.random.normal(ks[1], (N_pad, 3 * F))
    rbf = jax.random.normal(ks[2], (E, R))
    envm = jnp.abs(jax.random.normal(ks[3], (E, 1)))
    nbr = jax.random.randint(ks[4], (E, 1), 0, N_pad)
    unit3 = jax.random.normal(ks[5], (3, N_pad, M))
    dw = jax.random.normal(ks[6], (R, 3 * F))
    db = jax.random.normal(ks[7], (1, 3 * F))
    args = (phi, vcat, rbf, envm, nbr, unit3, dw, db)

    def loss(ref_fn, *a):
        ds, dv = ref_fn(*a)
        return jnp.sum(ds * ds) + jnp.sum(dv * jnp.cos(dv))

    out_g = pp._message_ref(*args)
    grads_g = jax.grad(lambda p, v: loss(pp._message_ref, p, v, *args[2:]),
                       argnums=(0, 1))(phi, vcat)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    out_d = pp._message_ref(*args)
    grads_d = jax.grad(lambda p, v: loss(pp._message_ref, p, v, *args[2:]),
                       argnums=(0, 1))(phi, vcat)
    for a, b in zip(out_g, out_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-5)
    for a, b in zip(grads_g, grads_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("routing", ["f32", "bf16x2"])
def test_pallas_message_backward_kernel(routing):
    """The fused backward kernel (_message_bwd_pallas — used as the
    custom-VJP bwd of painn_message_fused) must reproduce the reference
    implementation's VJP for every input cotangent."""
    from surface_sampling_tpu.ops import pallas_painn as pp

    key = jax.random.PRNGKey(11)
    n_pad, F, M, R = 32, 16, 8, 8
    E = n_pad * M
    ks = jax.random.split(key, 10)
    phi = jax.random.normal(ks[0], (n_pad, 3 * F))
    vcat = jax.random.normal(ks[1], (n_pad, 3 * F))
    rbf = jax.random.normal(ks[2], (E, R))
    envm = jnp.abs(jax.random.normal(ks[3], (E, 1)))
    nbr = jax.random.randint(ks[4], (E, 1), 0, n_pad)
    unit3 = jax.random.normal(ks[5], (3, n_pad, M))
    dw = jax.random.normal(ks[6], (R, 3 * F))
    db = jax.random.normal(ks[7], (1, 3 * F))
    gds = jax.random.normal(ks[8], (n_pad, F))
    gdv = jax.random.normal(ks[9], (3, n_pad, F))

    _, vjp = jax.vjp(lambda *a: pp._message_ref(*a[:4], nbr, *a[4:]),
                     phi, vcat, rbf, envm, unit3, dw, db)
    ref = vjp((gds, gdv))
    got = pp._message_bwd_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                                 gds, gdv, n_blk=8, routing=routing)
    tol = 1e-4 if routing == "f32" else 2e-3
    for name, a, b in zip(
        ["g_phi", "g_vcat", "g_rbf", "g_envm", "g_unit3", "g_dw", "g_db"],
        ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol, err_msg=name)


@pytest.mark.parametrize("routing", ["f32", "bf16x2"])
def test_pallas_message_second_order(routing):
    """grad-of-grad through the fused op (force-loss structure: an outer
    reverse pass over the inner VJP) must match the pure-JAX reference's
    second order — this pins the _message_bwd_op custom VJP / bwd2
    kernel that keeps fine-tuning on the fused kernels."""
    from surface_sampling_tpu.ops import pallas_painn as pp

    key = jax.random.PRNGKey(17)
    n_pad, F, M, R = 32, 16, 8, 8
    E = n_pad * M
    ks = jax.random.split(key, 13)
    phi = jax.random.normal(ks[0], (n_pad, 3 * F))
    vcat = jax.random.normal(ks[1], (n_pad, 3 * F))
    rbf = jax.random.normal(ks[2], (E, R))
    envm = jnp.abs(jax.random.normal(ks[3], (E, 1)))
    nbr = jax.random.randint(ks[4], (E, 1), 0, n_pad)
    unit3 = jax.random.normal(ks[5], (3, n_pad, M))
    dw = jax.random.normal(ks[6], (R, 3 * F))
    db = jax.random.normal(ks[7], (1, 3 * F))
    wds = jax.random.normal(ks[8], (n_pad, F))
    wdv = jax.random.normal(ks[9], (3, n_pad, F))
    # probe cotangents for the 7 differentiable first-order grads
    cg = [jax.random.normal(k, a.shape) for k, a in zip(
        jax.random.split(ks[10], 7),
        (phi, vcat, rbf, envm, unit3, dw, db))]
    args = (phi, vcat, rbf, envm, unit3, dw, db)

    def make_outer(f):
        def inner(*a):
            ds, dv = f(a[0], a[1], a[2], a[3], nbr, a[4], a[5], a[6])
            return jnp.sum(ds * wds) + jnp.sum(dv * wdv)

        def outer(*a):
            g = jax.grad(inner, argnums=tuple(range(7)))(*a)
            return sum(jnp.sum(gi * ci) for gi, ci in zip(g, cg))

        return outer

    fused = lambda p, v, r, e, n, u, w_, b_: pp.painn_message_fused(
        p, v, r, e, n, u, w_, b_, 8, routing)
    ref_outer = make_outer(pp._message_ref)
    fus_outer = make_outer(fused)
    np.testing.assert_allclose(float(ref_outer(*args)),
                               float(fus_outer(*args)),
                               rtol=1e-3 if routing != "f32" else 1e-5)
    g_ref = jax.grad(ref_outer, argnums=tuple(range(7)))(*args)
    g_fus = jax.grad(fus_outer, argnums=tuple(range(7)))(*args)
    tol = 1e-4 if routing == "f32" else 5e-3
    for name, a, b in zip(
        ["phi", "vcat", "rbf", "envm", "unit3", "dw", "db"], g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol, err_msg=name)


def test_training_loss_grad_on_fused_kernels(tiny_model):
    """End-to-end force-loss gradient (value_and_grad over params of a
    loss containing grad-over-positions) with message_mode="pallas" must
    match the gather formulation — training now stays on the fused
    kernels (VJP + bwd2) instead of falling back to pure XLA."""
    import dataclasses as dc

    from surface_sampling_tpu.models.train import TrainConfig, make_loss_fn
    from surface_sampling_tpu.models.train import PaddedBatch

    params, cfg = tiny_model
    key = jax.random.PRNGKey(23)
    pos, numbers, alive, shifts = _elongated_system(key, n=12,
                                                    box=(12.0, 8.0, 8.0))
    B = 2
    batch = PaddedBatch(
        positions=np.tile(np.asarray(pos)[None], (B, 1, 1)),
        numbers=np.tile(np.asarray(numbers)[None], (B, 1)),
        shifts=np.tile(np.asarray(shifts)[None], (B, 1, 1)),
        energy=np.asarray([1.0, 2.0]),
        forces=np.asarray(jax.random.normal(key, (B, 12, 3))),
        magmoms=None,
        magmom_mask=None,
    )
    tcfg = TrainConfig(energy_weight=0.3, force_weight=0.7)
    loss_g = make_loss_fn(dc.replace(cfg, message_mode="gather"), tcfg)
    loss_p = make_loss_fn(
        dc.replace(cfg, message_mode="pallas", pallas_routing="f32"), tcfg)
    lg, gg = jax.value_and_grad(loss_g)(params, batch)
    lp, gp = jax.value_and_grad(loss_p)(params, batch)
    np.testing.assert_allclose(float(lg), float(lp), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_edge_topology_roundtrip_matches_table_list():
    """select_edge_topology + edges_from_topology evaluated at the
    SELECTION geometry must reproduce neighbor_list_from_table exactly
    (same rank-select); and at displaced positions the fixed topology
    must track the geometry (disp/r recomputed, nbr_j/mask frozen)."""
    from surface_sampling_tpu.core.static_neighbors import (
        build_static_neighbor_table,
    )
    from surface_sampling_tpu.ops.neighbors import (
        edges_from_topology,
        neighbor_list_from_table,
        select_edge_topology,
    )
    from surface_sampling_tpu.structure.slabs import fcc100
    from surface_sampling_tpu.structure.sites import find_adsorption_sites
    from surface_sampling_tpu.core import make_spec
    from surface_sampling_tpu.core.state import (
        device_spec,
        realize_alive,
        realize_positions,
    )

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=10.0)
    sites = find_adsorption_sites(slab, planar_distance=1.8)["all"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29],
                     cutoff=5.0, surface_name="cu")
    tbl = build_static_neighbor_table(spec, 5.0, relax_slack=0.6)
    d = device_spec(spec)
    rng = np.random.default_rng(1)
    ss = jnp.asarray(rng.integers(0, 2, spec.n_sites), jnp.int32)
    pos = realize_positions(d, ss)
    alive = realize_alive(d, ss)
    args = (jnp.asarray(tbl.slot_j, jnp.int32),
            jnp.asarray(tbl.shift, jnp.float32), jnp.asarray(tbl.valid))

    ref = neighbor_list_from_table(pos, alive, *args, 5.0, 24)
    topo = select_edge_topology(pos, alive, *args, 5.0, 24)
    got = edges_from_topology(pos, topo, 5.0)
    for name, a, b in zip(["disp", "r", "nbr_j", "nbr_mask"], ref, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=name)

    # displaced: topology frozen, geometry exact
    delta = jnp.asarray(rng.normal(0, 0.05, pos.shape), pos.dtype)
    pos2 = pos + delta
    disp2, r2, nbr_j2, mask2, _ = edges_from_topology(pos2, topo, 5.0)
    assert np.array_equal(np.asarray(nbr_j2), np.asarray(got[2]))
    assert np.array_equal(np.asarray(mask2), np.asarray(got[3]))
    i, m = 3, 0
    if bool(mask2[i, m]):
        j = int(nbr_j2[i, m])
        shift = np.asarray(topo[1])[i, m]
        expect = np.asarray(pos2)[i] - (np.asarray(pos2)[j] + shift)
        np.testing.assert_allclose(np.asarray(disp2[i, m]), expect, atol=1e-6)


def test_relax_fixed_topology_matches_refreshed():
    """RelaxConfig.refresh_edges="once" (reference dynamics.py:129
    semantics — one neighbor build per relaxation) must land on the same
    relaxed energies as the every-step re-ranking path on the flagship
    system, and take the hooked code path (static-table PaiNN)."""
    import dataclasses

    from surface_sampling_tpu.core import RelaxConfig
    from surface_sampling_tpu.systems import srtio3_001_painn

    relax_once = RelaxConfig(steps=8, fmax=0.01, refresh_edges="once")
    relax_every = dataclasses.replace(relax_once, refresh_edges="every_step")
    sys_once = srtio3_001_painn(relax=relax_once, n_models=1)
    sys_every = srtio3_001_painn(relax=relax_every, n_models=1)
    assert "edge_topology" in sys_once.potential.__dict__

    ss = jnp.zeros(sys_once.spec.n_sites, jnp.int32).at[0].set(1)
    r1 = sys_once.run.state_energy_fn(ss)
    r2 = sys_every.run.state_energy_fn(ss)
    assert not bool(r1.oob) and not bool(r2.oob)
    # same minimum, tiny path differences allowed (meV scale)
    np.testing.assert_allclose(float(r1.potential_energy),
                               float(r2.potential_energy), atol=5e-3)


def test_choose_message_block_respects_mosaic_floor():
    """Mosaic requires the second-minor block dim (unit3's center axis)
    to be a multiple of 8; a block of 4 never lowers on real TPU (CPU
    interpret mode doesn't enforce it, so only this pin can catch a
    regression). Blocks must also tile the padded atom count produced by
    prepare_fused_geometry (multiples of 16)."""
    from surface_sampling_tpu.ops.pallas_painn import choose_message_block

    from surface_sampling_tpu.ops.pallas_painn import _bwd_block

    for n_pad in (16, 128, 256, 496 + 16, 1120, 4096):
        n_blk = choose_message_block(n_pad)
        assert n_blk >= 8, (n_pad, n_blk)
        assert n_blk % 8 == 0
        padded = ((n_pad + 15) // 16) * 16
        assert padded % n_blk == 0
        bwd = _bwd_block(padded, n_blk)
        assert bwd >= 8 and bwd % 8 == 0 and padded % bwd == 0, (n_pad, bwd)
