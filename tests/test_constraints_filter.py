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
