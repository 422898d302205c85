"""Mirrors of tests/test_system.py (constraint derivation) and
tests/test_filter_distance.py (geometric predicate incl. periodic images)."""

import numpy as np

from surface_sampling_tpu.core import make_spec
from surface_sampling_tpu.structure import Structure
from surface_sampling_tpu.structure.slabs import fcc100
from surface_sampling_tpu.utils.misc import filter_distances


def test_surface_depth_freezes_bulk_layers():
    """surface_depth=k frees the top k z-layers, freezes the rest
    (mcmc/system.py:268-294 semantics, tests/test_system.py:101-147)."""
    slab = fcc100("Cu", size=(2, 2, 4), a=3.6, vacuum=10.0)  # 4 layers
    sites = np.array([[0, 0, slab.positions[:, 2].max() + 1.5]])
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=4.0,
                     surface_depth=2)
    z = slab.positions[:, 2]
    layers = np.unique(np.round(z, 5))[::-1]  # top first
    top_two = np.isin(np.round(z, 5), layers[:2])
    assert np.array_equal(spec.frozen_pristine, ~top_two)
    # no surface_depth -> nothing frozen
    spec2 = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=4.0)
    assert not spec2.frozen_pristine.any()
    # explicit mask override wins
    mask = np.zeros(len(slab), bool)
    mask[:3] = True
    spec3 = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=4.0,
                      frozen_mask=mask)
    assert spec3.frozen_pristine.sum() == 3


def test_filter_distances_basic():
    """Adsorbates farther apart than the cutoff pass; closer ones fail
    (mcmc/utils/misc.py:118-135, tests/test_filter_distance.py:40-70)."""
    st = Structure.from_symbols(
        ["Sr", "Ti", "O", "O"],
        [[0, 0, 0], [2, 0, 0], [0, 0, 3.0], [0, 2.5, 3.0]],
        np.eye(3) * 10.0,
    )
    assert filter_distances(st, ads=("O",), cutoff_distance=1.5)
    assert not filter_distances(st, ads=("O",), cutoff_distance=2.6)
    # non-adsorbate atoms are ignored even if close
    assert filter_distances(st, ads=("O",), cutoff_distance=1.9)


def test_filter_distances_periodic_image():
    """Two adsorbates far apart in direct coordinates but close through the
    periodic boundary must be caught (the reference's failure-case CIF,
    tests/test_filter_distance.py:71-97)."""
    st = Structure.from_symbols(
        ["Cu", "O", "O"],
        [[5, 5, 5], [0.3, 5, 8.0], [9.5, 5, 8.0]],   # 0.8 A apart through PBC
        np.eye(3) * 10.0,
    )
    assert not filter_distances(st, ads=("O",), cutoff_distance=1.5)
    # without PBC wrap they'd be 9.2 A apart — MIC must be in effect
    d = st.all_distances(mic=True)
    assert abs(d[1, 2] - 0.8) < 1e-8


def test_filter_distances_single_adsorbate_passes():
    st = Structure.from_symbols(["Cu", "O"], [[0, 0, 0], [0, 0, 2]], np.eye(3) * 10)
    assert filter_distances(st, ads=("O",), cutoff_distance=5.0)


def _brute_force_accept(d, site_state, filter_distance):
    """The O(Kimg * N^2) full image-distance formulation the candidate-pair
    table replaces — kept here as the test oracle."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core.state import realize_alive, realize_positions
    from surface_sampling_tpu.ops.neighbors import image_distances

    pos = realize_positions(d, site_state)
    alive = realize_alive(d, site_state)
    ads = jnp.arange(pos.shape[0]) >= d.pristine_numbers.shape[0]
    sel = alive & ads
    r, _ = image_distances(pos, d.shifts)
    rmin = jnp.min(r, axis=0)
    n = pos.shape[0]
    pair = sel[:, None] & sel[None, :] & ~jnp.eye(n, dtype=bool)
    dmin = jnp.min(jnp.where(pair, rmin, jnp.inf))
    return bool(dmin > filter_distance)


def test_distance_accept_matches_brute_force():
    """The static candidate-pair distance criterion must agree with the
    full image-distance matrix on random occupancies — including OH-group
    states whose intra-group O-H pair (0.97 A) must reject tight cutoffs."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core.events import make_distance_accept
    from surface_sampling_tpu.core.state import device_spec
    from surface_sampling_tpu.structure import find_adsorption_sites

    slab = fcc100("Cu", size=(2, 2, 2), a=3.6147, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5, near_reduce=0.01)["all"]
    spec = make_spec(slab, sites, ["O", "OH"], potential_numbers=[29], cutoff=5.0)
    d = device_spec(spec)
    rng = np.random.default_rng(0)
    for fd in (0.9, 1.5, 2.2):
        acc = make_distance_accept(d, fd)
        for _ in range(12):
            ss = jnp.asarray(
                rng.integers(0, d.n_codes, spec.n_sites).astype(np.int32)
                * rng.integers(0, 2, spec.n_sites).astype(np.int32)
            )
            got, want = bool(acc(ss)), _brute_force_accept(d, ss, fd)
            assert got == want, (fd, np.asarray(ss), got, want)
    # any OH state must fail a cutoff above the O-H bond length
    acc = make_distance_accept(d, 1.2)
    ss = jnp.zeros(spec.n_sites, jnp.int32).at[0].set(2)   # one OH
    assert not bool(acc(ss))
    assert not _brute_force_accept(d, ss, 1.2)


def test_distance_accept_scales_past_300_slots():
    """Correctness (vs brute force) and static candidate-table size on a
    >300-slot system — the regime where the old full-matrix formulation
    was O(Kimg * N^2) per trial."""
    import jax.numpy as jnp

    from surface_sampling_tpu.core.events import make_distance_accept
    from surface_sampling_tpu.core.state import device_spec
    from surface_sampling_tpu.structure import find_adsorption_sites

    slab = fcc100("Cu", size=(8, 8, 2), a=3.6147, vacuum=15.0)
    sites = find_adsorption_sites(slab, planar_distance=1.5, near_reduce=0.01)["all"]
    spec = make_spec(slab, sites, ["Cu"], potential_numbers=[29], cutoff=5.0)
    assert spec.n_sites > 300, spec.n_sites
    d = device_spec(spec)
    acc = make_distance_accept(d, 2.0)
    rng = np.random.default_rng(1)
    for density in (0.02, 0.1, 0.5):
        ss = jnp.asarray(
            (rng.random(spec.n_sites) < density).astype(np.int32))
        got, want = bool(acc(ss)), _brute_force_accept(d, ss, 2.0)
        assert got == want, (density, got, want)
