"""Block-banded neighbor routing for the fused Pallas NN kernels.

The fused PaiNN message kernel routes neighbor features with one-hot MXU
dots of width n_pad — O(N) FLOPs per edge, the dominant cost at
supercell sizes (496+ slots; docs/BENCHMARKS.md roofline). But a VSSR-MC
system's interactions are local: every slot's possible neighbors come
from the static candidate table (core/static_neighbors.py), which only
reaches ``cutoff + 2*relax_slack``. Sorting slots along the cell's
longest lateral axis makes each center block's candidate set fall in a
narrow CONTIGUOUS index window (periodic wrap handled by a halo copy of
the first rows), so the routing dot shrinks to width W — measured
windows: 360/496 for the SrTiO3 2x2 supercell, 536/1116 for 3x3,
~O(sqrt(N)) growth for 2-D tiled cells.

Host-side (numpy, build time): :func:`build_routing_band` computes the
sort permutation and the per-block 8-aligned window starts from the
static candidate table — coverage is exact by construction, since the
runtime rank-select can only ever pick candidates from that table.

Reference being re-designed: this replaces what LAMMPS achieves with
spatial binning in its neighbor lists (the reference's engines rebuild
per move; SURVEY §5.7 names system size as THE scaling axis).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class RoutingBand(NamedTuple):
    """Host-side banding data (numpy; staged by the model wrappers).

    perm: (n_pad,) slot order (sorted spatial order; pad rows at end) —
        ``x_sorted = x[perm]``.
    inv_perm: (n_pad,) inverse — ``x = x_sorted[inv_perm]``.
    rank: (n_pad,) position of each original slot in sorted order.
    win_start: (n_blocks,) int32 8-aligned window start (sorted coords,
        modulo n_pad circular space) per center block of n_blk.
    window: int W — window width (multiple of 8); every candidate
        neighbor j of block b satisfies (rank[j] - win_start[b]) mod
        n_pad < W.
    halo: int H — wrap overhang: rows [0, H) of the sorted array are
        appended after row n_pad-1, so wrapped windows are contiguous.
    n_blk: the center-block size the windows were built for.
    """

    perm: np.ndarray
    inv_perm: np.ndarray
    rank: np.ndarray
    win_start: np.ndarray
    window: int
    halo: int
    n_blk: int


def _circular_window(ranks: np.ndarray, n: int) -> tuple[int, int]:
    """Minimal circular window [s, s+W) mod n covering ``ranks``."""
    rs = np.unique(ranks)
    if len(rs) >= n:
        return 0, n
    gaps = np.diff(np.concatenate([rs, [rs[0] + n]]))
    k = int(np.argmax(gaps))
    start = int(rs[(k + 1) % len(rs)])
    width = int(n - gaps[k] + 1)
    return start, width


def spec_slot_centers(spec) -> np.ndarray:
    """(N, 3) representative position per slot: pristine positions, then
    each site-group slot at its site coordinate (same construction as
    core.static_neighbors.build_static_neighbor_table)."""
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    centers = np.zeros((P + S * G, 3))
    centers[:P] = spec.pristine_positions
    for s in range(S):
        for g in range(G):
            centers[P + s * G + g] = spec.site_coords[s]
    return centers


def build_routing_band(
    centers: np.ndarray,
    slot_j: np.ndarray,
    valid: np.ndarray,
    n_blk: int,
    n_pad: int,
    min_saving: float = 0.85,
) -> RoutingBand | None:
    """Build banding data, or None when banding can't pay.

    Args:
        centers: (N, 3) slot positions (host).
        slot_j/valid: the static candidate table ((N, Mc) each) — the
            superset of every neighbor the runtime rank-select can pick.
        n_blk: center-block size of the fused kernel
            (ops.pallas_painn.choose_message_block(n_pad)).
        n_pad: padded slot count (multiple of n_blk).
        min_saving: keep the band only if W <= min_saving * n_pad —
            below that the dynamic-slice bookkeeping just adds overhead
            (the 124-slot flagship cell is fully connected laterally).
    """
    centers = np.asarray(centers, np.float64)
    N = centers.shape[0]
    if N < 2 * n_blk or n_pad % n_blk:
        return None
    # sort along the lateral axis with the largest occupied extent (z is
    # the slab normal — its extent is thickness, not periodic size)
    extents = centers.max(axis=0) - centers.min(axis=0)
    axis = int(np.argmax(extents[:2])) if extents[:2].max() > 0 else 0
    keys = [centers[:, 2], centers[:, (axis + 1) % 2], centers[:, axis]]
    order = np.lexsort(tuple(k for k in keys))
    perm = np.concatenate([order, np.arange(N, n_pad)]).astype(np.int32)
    rank = np.empty(n_pad, np.int64)
    rank[perm] = np.arange(n_pad)

    n_blocks = n_pad // n_blk
    starts = np.zeros(n_blocks, np.int64)
    width = 0
    for b in range(n_blocks):
        rows = perm[b * n_blk : (b + 1) * n_blk]
        rows = rows[rows < N]
        if len(rows) == 0:
            starts[b] = 0
            continue
        cand = np.concatenate([slot_j[r][valid[r]] for r in rows])
        if len(cand) == 0:
            starts[b] = 0
            continue
        s, w = _circular_window(rank[cand], n_pad)
        s8 = (s // 8) * 8
        starts[b] = s8
        width = max(width, w + (s - s8))
    W = int(np.ceil(width / 8.0) * 8)
    if W >= min_saving * n_pad:
        return None
    halo = int(max(0, (starts + W - n_pad).max()))
    halo = int(np.ceil(halo / 8.0) * 8)
    # verify coverage exactly (cheap, catches any construction bug):
    # every candidate of every block must satisfy (rank - s) mod n_pad < W
    for b in range(n_blocks):
        rows = perm[b * n_blk : (b + 1) * n_blk]
        rows = rows[rows < N]
        if len(rows) == 0:
            continue
        cand = np.concatenate([slot_j[r][valid[r]] for r in rows])
        if len(cand) == 0:
            continue
        off = (rank[cand] - starts[b]) % n_pad
        if off.max() >= W:
            raise AssertionError(
                f"banding coverage bug: block {b} candidate offset "
                f"{int(off.max())} >= W={W}")
    return RoutingBand(
        perm=perm.astype(np.int32),
        inv_perm=np.argsort(perm).astype(np.int32),
        rank=rank.astype(np.int32),
        win_start=starts.astype(np.int32),
        window=W,
        halo=halo,
        n_blk=int(n_blk),
    )


def build_routing_band_for_spec(spec, static_nbr, max_neighbors: int = 0):
    """Convenience: band for a SurfaceSpec + its static candidate table,
    using the fused kernel's block size for the spec's padded size."""
    from surface_sampling_tpu.ops.pallas_painn import choose_message_block

    centers = spec_slot_centers(spec)
    N = centers.shape[0]
    n_blk = choose_message_block(((N + 15) // 16) * 16)
    n_pad = ((N + n_blk - 1) // n_blk) * n_blk
    # prepare_fused_geometry pads to multiples of 16; keep in lockstep
    n_pad = ((N + 15) // 16) * 16
    return build_routing_band(
        centers, static_nbr.slot_j, static_nbr.valid, n_blk, n_pad
    )
