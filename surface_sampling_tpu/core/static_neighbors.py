"""Static candidate-pair neighbor tables.

A VSSR-MC system's geometry is template-bound: every slot's position is
one of a handful of known candidates (site coordinate + per-code offsets),
displaced at most ``relax_slack`` by relaxation. So the set of slot pairs
that can EVER interact is known when the spec is built — no runtime
neighbor search at all. The table is a padded (N, M) slot/image matrix the
potentials reduce over densely; compared to the (K, N, N) all-images
formulation this cuts the hot-loop pair count ~an order of magnitude and
removes every runtime mask construction except alive/cutoff.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from surface_sampling_tpu.core.spec import SurfaceSpec
from surface_sampling_tpu.ops.neighbors import pair_shifts


class StaticNeighborTable(NamedTuple):
    """Host-side (numpy) padded candidate table; staged to device by the
    potential factories."""

    slot_j: np.ndarray      # (N, M) int32 — candidate neighbor slot
    shift: np.ndarray       # (N, M, 3) float — periodic image shift of j
    valid: np.ndarray       # (N, M) bool — padding mask
    max_candidates: int


def build_static_neighbor_table(
    spec: SurfaceSpec, cutoff: float, relax_slack: float = 0.5
) -> StaticNeighborTable:
    """Enumerate all slot pairs whose minimum possible distance is below
    cutoff + 2*relax_slack, over all periodic images.

    A slot's "reach" is the largest distance between any two of its
    candidate positions' midpoint and extremes: pristine slots have reach 0;
    site slots reach = max over codes |offset| (their base position is the
    site coordinate).
    """
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    centers = np.zeros((N, 3))
    reach = np.zeros(N)
    centers[:P] = spec.pristine_positions
    for s in range(S):
        for g in range(G):
            slot = P + s * G + g
            centers[slot] = spec.site_coords[s]
            # candidate offsets of this (g) across codes
            offs = spec.code_offsets[:, g, :]
            reach[slot] = np.linalg.norm(offs, axis=1).max()
    margin = cutoff + 2.0 * relax_slack
    shifts = pair_shifts(
        spec.cell,
        margin + reach.max() * 2,
        frac_span=None,
    )
    cand: list[list[tuple[int, np.ndarray]]] = [[] for _ in range(N)]
    for shift in shifts:
        d = np.linalg.norm(
            centers[:, None, :] - (centers[None, :, :] + shift[None, None, :]), axis=-1
        )
        dmin = d - reach[:, None] - reach[None, :]
        is_zero_shift = np.allclose(shift, 0.0)
        for i in range(N):
            for j in np.where(dmin[i] < margin)[0]:
                if is_zero_shift and i == j:
                    continue
                cand[i].append((j, shift))
    # Sort candidates nearest-template-first: rank-select edge compaction
    # (ops.neighbors.neighbor_list_from_table) keeps the FIRST
    # max_neighbors in-range candidates, so table order decides which
    # neighbors survive if a state ever truncates — template-nearest
    # matches the top_k semantics this replaced (exactly so for rigid
    # slot geometries, where template distance IS the runtime distance).
    for i, lst in enumerate(cand):
        lst.sort(key=lambda js: float(np.linalg.norm(centers[i] - (centers[js[0]] + js[1]))))
    M = max(len(c) for c in cand)
    # pad M to the fp32 lane tile for clean TPU layouts
    M = int(np.ceil(M / 8.0) * 8)
    slot_j = np.zeros((N, M), dtype=np.int32)
    shift_arr = np.zeros((N, M, 3))
    valid = np.zeros((N, M), dtype=bool)
    for i, lst in enumerate(cand):
        for m, (j, sh) in enumerate(lst):
            slot_j[i, m] = j
            shift_arr[i, m] = sh
            valid[i, m] = True
    return StaticNeighborTable(slot_j, shift_arr, valid, M)
