"""Native surfkit runtime tests (validated against the dense JAX path)."""

import numpy as np
import pytest

from surface_sampling_tpu.runtime import (
    cell_list_neighbors,
    load_library,
    min_selected_distance,
    write_xyz_frames,
)
from surface_sampling_tpu.structure import bulk


def test_native_library_builds():
    assert load_library() is not None, "g++ toolchain expected in this environment"


def test_cell_list_matches_dense_counts():
    a = 3.6147
    st = bulk("Cu", "fcc", a=a).repeat(3)
    cutoff = a * 0.8  # first shell only -> 12 neighbors
    idx, disp, count, max_count = cell_list_neighbors(st.positions, st.cell, cutoff, 32)
    assert max_count == 12
    assert np.all(count == 12)
    # displacement lengths all within cutoff and > 0
    r = np.linalg.norm(disp[np.arange(len(st))[:, None], :12], axis=-1)
    assert np.all((r > 1e-6) & (r < cutoff))
    np.testing.assert_allclose(r, a / np.sqrt(2), rtol=1e-10)


def test_cell_list_capacity_report():
    st = bulk("Cu", "fcc", 3.6147).repeat(3)
    idx, disp, count, max_count = cell_list_neighbors(st.positions, st.cell, 3.7, 4)
    assert max_count > 4          # reports true requirement
    assert np.all(count <= 4)     # but respects the buffer


def test_min_selected_distance_matches_numpy():
    st = bulk("Au", "fcc", 4.08).repeat(2)
    rng = np.random.default_rng(0)
    sel = rng.choice(len(st), 10, replace=False)
    fast = min_selected_distance(st.positions, st.cell, sel)
    d = st.all_distances(mic=True)[np.ix_(sel, sel)]
    iu = np.triu_indices(len(sel), k=1)
    assert np.isclose(fast, d[iu].min(), atol=1e-10)


def test_write_xyz_frames(tmp_path):
    st = bulk("Cu", "fcc", 3.6).repeat(1)
    frames = np.stack([st.positions, st.positions + 0.1])
    path = tmp_path / "traj.xyz"
    write_xyz_frames(path, st.numbers, frames, st.cell)
    text = path.read_text().splitlines()
    assert text[0] == "4"
    assert len([l for l in text if l.startswith("Cu")]) == 8
