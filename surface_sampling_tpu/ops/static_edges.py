"""Static edge geometry for rigid-lattice NN potentials (MC hot path).

On a rigid lattice every slot position is a compile-time constant, so the
entire per-edge geometry of the candidate table — distances, RBF
expansion, cosine envelope, unit vectors, even the banded-routing ranks —
is state-INDEPENDENT. The only thing an MC move changes is which slots
are alive. The per-evaluation edge build therefore reduces to:

    mask  = static_in_range & alive_i & alive_j          (VPU, tiny)
    rank  = mask @ lower_triangular_ones                 (one exact bf16 MXU dot)
    sel   = onehot(rank) & mask                          (E-shaped compare)
    edges = sel @ static_payload                         (two bf16 MXU dots)

replacing ops/neighbors.neighbor_list_from_table's dynamic geometry
gathers + HIGHEST-precision f32 compaction einsum, which profiled at
26.6 ms of an 80 ms 16-chain supercell evaluation (33%) on v5e — the
single largest term. The payload is precomputed on the host in f64 and
shipped as an exact hi+lo bf16 split (the one-hot selector is exact in
bf16, so the compaction reconstructs the payload to ~f32 accuracy; the
integer neighbor-rank column is split base-128 so it is bit-exact at any
system size).

The compacted edge set is IDENTICAL to the dynamic path's (same mask,
same rank-select order, same overflow semantics); the geometry values
differ only by host-f64-vs-device-f32 rounding, i.e. the static path is
slightly MORE accurate. Parity is pinned in tests/test_static_edges.py.

Rows are born in the routing band's sorted order (when a band exists),
so the fused kernel inputs need no per-eval permutation either; only the
two small (N, M) arrays the exclusion-volume term needs are unsorted.

Reference counterpart being re-designed: the reference rebuilds ASE/nff
neighbor lists from scratch every MC move (nff AtomsBatch.update_nbr_list,
mcmc/dynamics.py:129) — O(N^2) work per move on geometry that its own
fixed-lattice moves never change.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StaticEdgePack(NamedTuple):
    """Host-precomputed static edge tables (device constants after jit).

    Rows are in SORTED (band) order when ``dband`` is set, else natural
    slot order; both padded to n_pad. Payload columns (P = r_pad + 8):
    [rbf(r_pad) | env | flag | rank_hi | rank_lo | r | unit_x,y,z] where
    rank = 128*rank_hi + rank_lo is the neighbor's sorted rank (band) or
    slot id (no band).
    """

    pay_hi: jnp.ndarray      # (n_pad, Mc, P) bf16
    pay_lo: jnp.ndarray      # (n_pad, Mc, P) bf16
    inr: jnp.ndarray         # (n_pad, Mc) bool — static in-range mask
    slot_j: jnp.ndarray      # (n_pad, Mc) int32 ORIGINAL neighbor slot ids
    row_slot: jnp.ndarray    # (n_pad,) int32 original slot of each row (pads: N)
    lt: jnp.ndarray          # (Mc, Mc) bf16 upper-tri ones: (mask @ lt) = inclusive cumsum
    n_pad: int
    N: int
    M: int
    r_pad: int
    cutoff: float
    dband: object            # ops.pallas_painn.DeviceBand or None
    inv_perm: jnp.ndarray | None  # (n_pad,) sorted -> natural (None if no band)
    # alive-routing one-hots (bf16, exact on 0/1 operands): ai/aj masks
    # as MXU matvecs instead of jnp.take gathers. The per-edge alive
    # gather was measured at 22.6 of the 24.6 ms 128-chain edge build on
    # v5e (TPU gathers serialize on the scalar core — the same lesson as
    # core/incremental.py's v1-vs-v2); one (chains, N) @ (N, n_pad*Mc)
    # bf16 dot replaces it at ~0.5 GFLOP. None when the table would
    # exceed the memory gate (large supercells keep the gather path).
    ai_onehot: jnp.ndarray | None = None  # (N, n_pad) bf16
    aj_onehot: jnp.ndarray | None = None  # (N, n_pad*Mc) bf16 (inr folded in)


def code_independent_geometry(d) -> bool:
    """True when realized slot positions do not depend on the occupancy
    code (core/state.realize_positions: offsets equal across codes), the
    precondition for static edge geometry."""
    co = np.asarray(d.code_offsets)
    return co.size == 0 or float(np.ptp(co, axis=0).max()) == 0.0


def _static_positions(d) -> np.ndarray:
    """(N, 3) f64 slot positions (code-independent — caller must have
    checked :func:`code_independent_geometry`)."""
    pristine = np.asarray(d.pristine_positions, np.float64)
    site = np.asarray(d.site_coords, np.float64)        # (S, 3)
    offs = np.asarray(d.code_offsets, np.float64)       # (C, G, 3)
    ads = site[:, None, :] + offs[0][None, :, :]        # (S, G, 3)
    return np.concatenate([pristine, ads.reshape(-1, 3)])


def build_static_edge_pack(d, static_nbr, cfg, band=None) -> StaticEdgePack | None:
    """Precompute the static edge payload for a rigid PaiNN system.

    Returns None when the geometry is code-dependent (mixed-offset
    adsorbate groups) — callers then keep the dynamic edge path.

    ``cfg``: PaiNNConfig (cutoff, n_rbf, max_neighbors). ``band``: host
    ops.banding.RoutingBand or None.
    """
    if not code_independent_geometry(d):
        return None
    from surface_sampling_tpu.ops.pallas_painn import (
        choose_message_block,
        stage_band,
    )

    pos = _static_positions(d)                           # (N, 3) f64
    slot_j = np.asarray(static_nbr.slot_j)               # (N, Mc)
    shift = np.asarray(static_nbr.shift, np.float64)     # (N, Mc, 3)
    valid = np.asarray(static_nbr.valid)                 # (N, Mc)
    N, Mc = slot_j.shape
    cutoff = float(cfg.cutoff)
    M = int(min(cfg.max_neighbors, Mc))
    n_rbf = int(cfg.n_rbf)
    r_pad = ((n_rbf + 7) // 8) * 8

    disp = pos[:, None, :] - (pos[slot_j] + shift)       # (N, Mc, 3)
    r = np.sqrt(np.maximum((disp**2).sum(-1), 1e-24))
    inr = valid & (r < cutoff)

    # geometry factors, f64 (models/painn.py _rbf / _cosine_envelope)
    dsafe = np.maximum(r, 1e-8)
    n = np.arange(1, n_rbf + 1, dtype=np.float64)
    rbf = np.sin(n * np.pi * dsafe[..., None] / cutoff) / dsafe[..., None]
    env = np.where(r < cutoff, 0.5 * (np.cos(np.pi * r / cutoff) + 1.0), 0.0)
    unit = disp / dsafe[..., None]

    n_blk = choose_message_block(
        band.rank.shape[0] if band is not None else ((N + 15) // 16) * 16
    )
    if band is not None:
        n_pad = int(band.rank.shape[0])
        perm = np.asarray(band.perm)
        rank_of = np.asarray(band.rank)
        nbr_rank = rank_of[slot_j]                       # (N, Mc)
        inv_perm = np.asarray(band.inv_perm)
    else:
        n_pad = ((N + n_blk - 1) // n_blk) * n_blk
        perm = np.arange(n_pad)
        nbr_rank = slot_j
        inv_perm = None

    P = r_pad + 8
    pay = np.zeros((N, Mc, P), np.float64)
    pay[..., :n_rbf] = rbf
    pay[..., r_pad] = env
    pay[..., r_pad + 1] = 1.0                            # selected flag
    pay[..., r_pad + 2] = nbr_rank // 128                # base-128 split:
    pay[..., r_pad + 3] = nbr_rank % 128                 # both cols < 128,
    pay[..., r_pad + 4] = r                              # exact in bf16
    pay[..., r_pad + 5:] = unit
    pay[~inr] = 0.0                                      # never-selectable rows

    # pad + sort rows
    def pad_rows(a, fill=0):
        widths = [(0, n_pad - N)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, constant_values=fill)

    pay_p = pad_rows(pay)
    inr_p = pad_rows(inr)
    slot_j_p = pad_rows(slot_j)
    row_slot = np.concatenate([np.arange(N), np.full(n_pad - N, N)])
    if band is not None:
        take = perm.copy()
        pay_p = pay_p[take]
        inr_p = inr_p[take]
        slot_j_p = slot_j_p[take]
        row_slot = row_slot[take]

    hi = np.asarray(jnp.asarray(pay_p, jnp.bfloat16), np.float64)
    lo = pay_p - hi

    # alive-routing one-hots (see StaticEdgePack docstring). Gate on the
    # table size: (N, n_pad*Mc) bf16 stays under ~128 MB up to ~2x2
    # supercells; past that the gather path is kept (banded systems
    # spend their time in the banded kernel anyway).
    ai_onehot = aj_onehot = None
    if N * n_pad * (Mc + 1) * 2 <= 128 * 1024 * 1024:
        ai_np = np.zeros((N, n_pad), np.float32)
        rows = np.arange(n_pad)
        real = row_slot < N
        ai_np[row_slot[real], rows[real]] = 1.0
        aj_np = np.zeros((N, n_pad, Mc), np.float32)
        rr, cc = np.nonzero(inr_p)
        aj_np[slot_j_p[rr, cc], rr, cc] = 1.0
        ai_onehot = jnp.asarray(ai_np, jnp.bfloat16)
        aj_onehot = jnp.asarray(aj_np.reshape(N, n_pad * Mc), jnp.bfloat16)

    return StaticEdgePack(
        pay_hi=jnp.asarray(pay_p, jnp.bfloat16),
        pay_lo=jnp.asarray(lo, jnp.bfloat16),
        inr=jnp.asarray(inr_p),
        slot_j=jnp.asarray(slot_j_p, jnp.int32),
        row_slot=jnp.asarray(row_slot, jnp.int32),
        lt=jnp.asarray(np.triu(np.ones((Mc, Mc))), jnp.bfloat16),
        n_pad=n_pad,
        N=N,
        M=M,
        r_pad=r_pad,
        cutoff=cutoff,
        dband=stage_band(band),
        inv_perm=None if inv_perm is None else jnp.asarray(inv_perm, jnp.int32),
        ai_onehot=ai_onehot,
        aj_onehot=aj_onehot,
    )


def static_edge_geometry(pack: StaticEdgePack, alive):
    """Per-evaluation edge build from the alive mask alone.

    Returns ``(msg_geom, edges)`` where ``msg_geom`` is the
    prepare_message_geometry tuple (rbf_p, envm_p, nbr_p, unit_p, n_pad,
    dband) feeding the fused Pallas kernel directly (already in sorted
    order — no per-eval permutation), and ``edges`` is the standard
    (disp, r, nbr_j, nbr_mask, overflow) tuple in NATURAL order for the
    exclusion-volume term (disp/nbr_j are zeros: unused on the fused
    path, which takes unit vectors from msg_geom).
    """
    N, M, Mc = pack.N, pack.M, pack.inr.shape[1]
    n_pad, r_pad = pack.n_pad, pack.r_pad
    f32 = jnp.float32

    if pack.aj_onehot is not None:
        # one-hot MXU route: alive (N,) -> per-row / per-edge alive as
        # two exact bf16 dots (gathers serialize on the TPU scalar core
        # — measured 22.6 of the 24.6 ms 128-chain edge build)
        ab = alive.astype(jnp.bfloat16)
        ai = jax.lax.dot_general(
            ab, pack.ai_onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=f32) > 0.5            # (n_pad,)
        ajm = jax.lax.dot_general(
            ab, pack.aj_onehot, (((0,), (0,)), ((), ())),
            preferred_element_type=f32).reshape(n_pad, Mc) > 0.5
        mask = ai[:, None] & ajm                         # inr folded in aj
    else:
        a = jnp.pad(alive.astype(f32), (0, 1))           # row N = pad alive=0
        ai = a[pack.row_slot] > 0.5                      # (n_pad,)
        aj = jnp.take(a[:-1], pack.slot_j.reshape(-1)).reshape(n_pad, Mc) > 0.5
        mask = pack.inr & ai[:, None] & aj               # (n_pad, Mc)

    mb = mask.astype(jnp.bfloat16)
    # inclusive masked rank via one exact bf16 MXU dot (counts <= Mc < 256)
    rank = jax.lax.dot_general(
        mb, pack.lt, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) - 1.0                                              # (n_pad, Mc)
    count = rank[:, -1] + 1.0
    overflow = jnp.any(count > M)
    keep = mask & (rank < M)
    sel = (
        (rank[..., None] == jnp.arange(M, dtype=f32)) & keep[..., None]
    ).astype(jnp.bfloat16)                               # (n_pad, Mc, M)

    dn = (((1,), (1,)), ((0,), (0,)))                    # contract Mc, batch n
    out = jax.lax.dot_general(sel, pack.pay_hi, dn, preferred_element_type=f32)
    out = out + jax.lax.dot_general(sel, pack.pay_lo, dn,
                                    preferred_element_type=f32)
    # dot_general output layout: (batch n_pad, lhs-free M, rhs-free P)

    rbf_p = out[..., :r_pad].reshape(n_pad * M, r_pad)
    envm_p = out[..., r_pad].reshape(n_pad * M, 1)
    flag = out[..., r_pad + 1] > 0.5                     # (n_pad, M)
    nbr_p = (
        jnp.round(out[..., r_pad + 2]) * 128 + jnp.round(out[..., r_pad + 3])
    ).astype(jnp.int32).reshape(n_pad * M, 1)
    r_s = jnp.where(flag, out[..., r_pad + 4], pack.cutoff)
    unit_p = jnp.moveaxis(out[..., r_pad + 5:], 2, 0)    # (3, n_pad, M)

    if pack.inv_perm is not None:
        r_nat = r_s[pack.inv_perm][:N]
        mask_nat = flag[pack.inv_perm][:N]
    else:
        r_nat = r_s[:N]
        mask_nat = flag[:N]

    msg_geom = (rbf_p, envm_p, nbr_p, unit_p, n_pad, pack.dband)
    zeros3 = jnp.zeros((N, M, 3), r_nat.dtype)
    zj = jnp.zeros((N, M), jnp.int32)
    edges = (zeros3, r_nat, zj, mask_nat, overflow)
    return msg_geom, edges
