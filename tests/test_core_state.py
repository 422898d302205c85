"""Unit tests for the fixed-shape occupancy state machine.

These mirror the reference's move-mechanics contract
(tests/test_slab.py:41-87, tests/test_slab_groups.py) translated to the
slot representation: a move must realize exactly the same atom multiset
the reference's append/delete/reindex bookkeeping produces.
"""

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.constants import Z_FROM_SYMBOL
from surface_sampling_tpu.core import (
    change_site,
    device_spec,
    element_counts,
    exchange_sites,
    make_spec,
    realize_alive,
    realize_numbers,
    realize_positions,
)
from surface_sampling_tpu.core.state import num_adsorbate_atoms, num_occupied_sites
from surface_sampling_tpu.structure import Structure


def tiny_spec(adsorbates=("Ga", "As"), group=False):
    """2-atom GaAs 'slab' with 3 virtual sites (tests/test_slab.py:20-32)."""
    slab = Structure.from_symbols(
        ["Ga", "As"], [[0, 0, 0], [1, 1, 1]], np.eye(3) * 20.0
    )
    sites = np.array([[0, 0, 3.0], [1, 1, 4.0], [2, 2, 5.0]])
    ads = list(adsorbates) + (["HO"] if group else [])
    return make_spec(
        slab, sites, ads, potential_numbers=[31, 33], cutoff=5.0, surface_name="tiny"
    )


def test_spec_shapes():
    spec = tiny_spec()
    assert spec.n_pristine == 2
    assert spec.n_sites == 3
    assert spec.n_codes == 3  # empty + Ga + As
    assert spec.group_size == 1
    assert spec.n_slots == 2 + 3


def test_change_site_add_remove_swap():
    spec = tiny_spec()
    d = device_spec(spec)
    ss = jnp.zeros(3, jnp.int32)
    # adsorb Ga (code 1) at site 0
    ss1 = change_site(ss, 0, 1)
    nums = np.asarray(realize_numbers(d, ss1))
    assert nums.tolist() == [31, 33, 31, 0, 0]
    assert int(num_occupied_sites(ss1)) == 1
    # change identity to As (code 2) — reference: remove + add
    ss2 = change_site(ss1, 0, 2)
    assert np.asarray(realize_numbers(d, ss2)).tolist() == [31, 33, 33, 0, 0]
    # desorb
    ss3 = change_site(ss2, 0, 0)
    assert np.asarray(realize_numbers(d, ss3)).tolist() == [31, 33, 0, 0, 0]
    assert int(num_occupied_sites(ss3)) == 0


def test_positions_follow_sites():
    spec = tiny_spec()
    d = device_spec(spec)
    ss = jnp.array([1, 2, 0], jnp.int32)
    pos = np.asarray(realize_positions(d, ss))
    assert np.allclose(pos[2], [0, 0, 3.0])   # site 0 slot
    assert np.allclose(pos[3], [1, 1, 4.0])   # site 1 slot
    alive = np.asarray(realize_alive(d, ss))
    assert alive.tolist() == [True, True, True, True, False]


def test_exchange_swaps_codes():
    spec = tiny_spec()
    ss = jnp.array([1, 2, 0], jnp.int32)
    out = np.asarray(exchange_sites(ss, 0, 2))
    assert out.tolist() == [0, 2, 1]


def test_group_adsorbates():
    spec = tiny_spec(group=True)
    d = device_spec(spec)
    assert spec.group_size == 2
    assert spec.n_slots == 2 + 3 * 2
    code_oh = 3  # empty, Ga, As, HO
    ss = jnp.zeros(3, jnp.int32).at[1].set(code_oh)
    nums = np.asarray(realize_numbers(d, ss))
    # site 1 owns slots [2+2, 2+4): O then H
    assert nums.tolist() == [31, 33, 0, 0, 8, 1, 0, 0]
    pos = np.asarray(realize_positions(d, ss))
    assert np.allclose(pos[4], [1, 1, 4.0])          # O at the site
    assert np.allclose(pos[5], [2.0, 1, 4.0])        # H offset +x by 1.0
    assert int(num_adsorbate_atoms(d, ss)) == 2
    # desorbing the group clears both atoms
    ss2 = change_site(ss, 1, 0)
    assert np.asarray(realize_numbers(d, ss2)).sum() == 31 + 33


def test_element_counts():
    spec = tiny_spec()
    d = device_spec(spec)
    ss = jnp.array([1, 1, 2], jnp.int32)   # 2 extra Ga + 1 extra As
    counts = np.asarray(element_counts(d, ss))
    # element_zs sorted: [31, 33]
    assert spec.element_zs.tolist() == [31, 33]
    assert counts.tolist() == [3.0, 2.0]


def test_moves_are_jit_and_vmap_safe():
    spec = tiny_spec()
    d = device_spec(spec)
    batch = jnp.stack([jnp.array([0, 1, 2]), jnp.array([2, 0, 1])]).astype(jnp.int32)
    f = jax.jit(jax.vmap(lambda s: element_counts(d, s)))
    counts = np.asarray(f(batch))
    assert counts.shape == (2, 2)
    assert np.allclose(counts[0], counts[1])  # same composition, permuted


# ----------------------------------------------------------------------
# Property-based tests (hypothesis): the slot state machine vs a plain
# Python model of the reference's occupancy bookkeeping. Any sequence of
# change/exchange moves must keep the realized atom multiset, element
# counts, aliveness and occupancy in exact agreement.
# ----------------------------------------------------------------------
from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st


_move = st.one_of(
    st.tuples(st.just("change"), st.integers(0, 2), st.integers(0, 3)),
    st.tuples(st.just("exchange"), st.integers(0, 2), st.integers(0, 2)),
)


@hyp_settings(max_examples=60, deadline=None)
@given(st.lists(_move, min_size=0, max_size=12))
def test_state_machine_matches_python_model(moves):
    spec = tiny_spec(group=True)          # vocab: Ga, As, HO (2-atom group)
    d = device_spec(spec)
    code_natoms = np.asarray(spec.code_natoms)
    code_numbers = np.asarray(spec.code_numbers)

    ss = jnp.zeros(3, jnp.int32)
    model = [0, 0, 0]                     # plain Python occupancy codes
    for mv in moves:
        if mv[0] == "change":
            _, site, code = mv
            ss = change_site(ss, site, code)
            model[site] = code
        else:
            _, s1, s2 = mv
            ss = exchange_sites(ss, s1, s2)
            model[s1], model[s2] = model[s2], model[s1]

    assert np.asarray(ss).tolist() == model

    # realized atom multiset == slab atoms + per-code atoms of the model
    numbers = np.asarray(realize_numbers(d, ss))
    alive = np.asarray(realize_alive(d, ss))
    want = sorted(spec.pristine_numbers.tolist() + [
        int(z) for c in model for z in code_numbers[c][: code_natoms[c]] if c > 0
    ])
    assert sorted(numbers[alive].tolist()) == want

    # aliveness bookkeeping
    assert int(num_occupied_sites(ss)) == sum(1 for c in model if c > 0)
    assert int(num_adsorbate_atoms(d, ss)) == sum(
        int(code_natoms[c]) for c in model if c > 0)

    # element counts == multiset counts
    counts = np.asarray(element_counts(d, ss))
    for i, z in enumerate(spec.element_zs):
        assert counts[i] == want.count(int(z)), (z, counts, want)


@hyp_settings(max_examples=40, deadline=None)
@given(st.integers(0, 2), st.integers(0, 3), st.integers(0, 2), st.integers(0, 2))
def test_change_revert_and_exchange_involution(site, code, s1, s2):
    """change-then-revert is the identity; exchange is an involution —
    the algebra behind select-rollback rejection (no copies needed)."""
    spec = tiny_spec(group=True)
    rng = np.random.default_rng(7)
    ss0 = jnp.asarray(rng.integers(0, 4, 3).astype(np.int32))
    old = int(ss0[site])
    assert np.array_equal(np.asarray(change_site(change_site(ss0, site, code),
                                                 site, old)), np.asarray(ss0))
    assert np.array_equal(np.asarray(exchange_sites(exchange_sites(ss0, s1, s2),
                                                    s1, s2)), np.asarray(ss0))
