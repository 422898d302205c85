"""Delta-energy locality for supercell NN Monte Carlo (PaiNN).

A VSSR-MC move changes ONE site's occupancy (or exchanges two sites).
An L-layer message-passing energy is local: layer-l features change only
for slots within l hops of the changed site, and per-atom energies only
within L hops. The full-evaluation MC step therefore does O(N) redundant
work per move at supercell sizes — the reference's engines (LAMMPS /
torch nff) recompute everything every move too, which is why system size
is THE scaling axis (SURVEY §5.7).

This module makes the MC step cost O(ball) instead of O(N):

  * the chain state carries per-layer feature caches
    s_l (L, N, F), v_l (L, N, F, 3) (inputs of each message block),
    per-atom energies, and per-atom in-range neighbor counts;
  * a move recomputes, layer by layer, only the slots inside the
    changed site's l-hop ball — at block granularity of the fused
    banded kernel's spatial sort, so the work IS a subset-grid
    invocation of the same Pallas kernel (ops/pallas_painn.py's
    banded message op over selected blocks);
  * the recomputed rows are scattered back into the caches; rejection
    keeps the old cache pytree (functional select, like every other
    rollback in core/events.py);
  * the acceptance energy is re-summed from the per-atom cache in fixed
    order every move, so there is no floating-point drift: an
    incremental chain's energies match full evaluations bit-for-bit
    whenever the per-row recomputation is bitwise (same kernel, same
    block contents) and to f32 tolerance otherwise (pinned in
    tests/test_incremental.py on random move sequences).

The hop balls come from the static candidate table
(core/static_neighbors.py) — a superset of every geometric interaction,
so locality is exact by construction, never a truncation.

Scope: rigid (non-relax) PaiNN single/ensemble systems with single-site
Change and two-site Exchange moves (the flagship supercell workloads).
Tempering composes (the swap phase gathers the caches with the
configurations, parallel/tempering.py); relax-mode locality lives in
core/local_relax.py (warm-started ball-local FIRE); MTM and population
annealing keep the full-evaluation path.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.state import (
    DeviceSpec,
    element_counts,
    realize_alive,
    realize_positions,
    realize_type_idx,
)


class IncTables(NamedTuple):
    """Host-built static recompute tables (numpy).

    blocks[l]: (n_sites, NB_l) int32 — sorted-block ids (of the routing
        band's spatial order) covering the (l+1)-hop ball of each site's
        slots, padded by repeating the first id (duplicate blocks only
        recompute the same rows twice — harmless for gathers; scatters
        dedupe via ``dupmask``).
    dupmask[l]: (n_sites, NB_l) f32 — 1.0 on the first occurrence of each
        block id within a row, 0.0 on padding repeats (the scatter-set
        one-hot is masked by this so repeated blocks write once).
    """

    blocks: tuple
    dupmask: tuple
    nb: tuple


def build_inc_tables(spec, static_nbr, band, n_layers: int) -> IncTables:
    """Hop balls per site over the candidate adjacency, converted to
    sorted-block ids of ``band`` (ops.banding.RoutingBand)."""
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    slot_j, valid = np.asarray(static_nbr.slot_j), np.asarray(static_nbr.valid)
    # undirected adjacency sets (candidate table is symmetric by
    # construction — both directions enumerated — but don't rely on it)
    adj = [set() for _ in range(N)]
    for i in range(N):
        for j in slot_j[i][valid[i]]:
            adj[i].add(int(j))
            adj[int(j)].add(i)
    rank = np.asarray(band.rank)
    n_blk = int(band.n_blk)

    blocks_per_layer = []
    dup_per_layer = []
    nb_per_layer = []
    ball_sets = []
    for s in range(S):
        ball_sets.append({P + s * G + g for g in range(G)})
    for _l in range(n_layers):
        new_sets = []
        blocks_l = []
        for s in range(S):
            ball = set(ball_sets[s])
            for i in ball_sets[s]:
                ball |= adj[i]
            new_sets.append(ball)
            blocks_l.append(np.unique(rank[sorted(ball)] // n_blk))
        ball_sets = new_sets
        nb = max(len(b) for b in blocks_l)
        arr = np.zeros((S, nb), np.int32)
        dup = np.zeros((S, nb), np.float32)
        for s, b in enumerate(blocks_l):
            arr[s, : len(b)] = b
            arr[s, len(b):] = b[0]          # pad by repeating (harmless)
            dup[s, : len(b)] = 1.0          # np.unique rows: all distinct
        blocks_per_layer.append(arr)
        dup_per_layer.append(dup)
        nb_per_layer.append(nb)
    return IncTables(blocks=tuple(blocks_per_layer),
                     dupmask=tuple(dup_per_layer),
                     nb=tuple(nb_per_layer))


class IncCaches(NamedTuple):
    """Per-member feature caches carried in the chain state.

    All row axes are n_pad (the fused kernel's padded slot count), NOT N:
    pad rows may hold arbitrary finite values — no edge ever routes FROM
    a pad slot (rank-select only emits real candidates) and pad-row
    per-atom energies are zeroed by the padded alive mask — so the
    delta updates can scatter whole kernel blocks without validity
    masking (a masked scatter with clamped duplicate indices would be
    nondeterministic)."""

    s: jnp.ndarray        # (L, n_pad, F) scalar inputs of each message block
                          # (NATURAL slot order on the dynamic path; SORTED
                          # band order in static-geometry mode, where every
                          # cache row is addressed at block granularity)
    v: jnp.ndarray        # (L, n_pad, F, 3) vector inputs (dynamic path
                          # only; (L, 0, F, 3) empty in static mode — vcat
                          # is the same data in kernel layout)
    e_atom: jnp.ndarray   # (n_pad,) raw per-atom energies (training units,
                          # incl. the excl_vol term; 0 on pad rows; sorted
                          # order in static mode)
    # static-geometry fast mode only ((L, 0, ...) empties otherwise):
    # the kernel-input projections of s/v in SORTED (band) order, so a
    # delta step recomputes the F->3F denses only on its ball rows
    # instead of all n_pad rows (the dominant delta-FLOP term otherwise)
    phi: jnp.ndarray      # (L, n_pad, 3F) sorted
    vcat: jnp.ndarray     # (L, n_pad, 3F) sorted


class IncState(NamedTuple):
    """MC chain state of the incremental engine (caches replace the
    relaxed_positions of core.state.MCState — this path is rigid-only)."""

    site_state: jnp.ndarray
    energy: jnp.ndarray            # surface (acceptance) energy
    key: jax.Array
    caches: IncCaches              # member-stacked when ensemble


class IncEngine(NamedTuple):
    init_state: Callable           # (key, site_state) -> IncState
    energy_full: Callable          # site_state -> (surface_energy, caches)
    delta: Callable                # (caches, ss_trial, sites2) ->
                                   #   (surface_energy, new_caches, oob)
    delta1: Callable               # (caches, ss_trial, site) -> same, for
                                   # single-site moves (half the ball work
                                   # of delta's two-site table in static
                                   # mode; wraps delta on the dynamic path)
    n_sites: int
    n_codes: int


def _update_block(up, s, v):
    """PaiNN update block (models/painn.py:304-315), row-local."""
    uv = jnp.einsum("nfx,fg->ngx", v, up["u_mat"]["w"])
    vv = jnp.einsum("nfx,fg->ngx", v, up["v_mat"]["w"])
    vv_norm = jnp.sqrt(jnp.sum(vv * vv, axis=-1) + 1e-16)
    stack = jnp.concatenate([s, vv_norm], axis=-1)
    from surface_sampling_tpu.models.painn import _dense

    a = _dense(up["s_dense1"], jax.nn.silu(_dense(up["s_dense0"], stack)))
    a_vv, a_sv, a_ss = jnp.split(a, 3, axis=-1)
    inner = jnp.sum(uv * vv, axis=-1)
    s = s + a_sv * inner + a_ss
    v = v + a_vv[..., None] * uv
    return s, v


def make_incremental_painn(
    spec,
    d: DeviceSpec,
    params,
    cfg,
    static_nbr,
    band,
    type_numbers,
    units: str = "kcal/mol",
    stoidict: dict | None = None,
    surface_energy_fn: Callable | None = None,
    inc_tables: IncTables | None = None,
    static_geometry: str = "auto",
) -> IncEngine:
    """Build the delta-evaluation engine for a (possibly ensemble) PaiNN
    system on a rigid lattice.

    ``params``: single param pytree or member-stacked (ensemble).
    ``band``: ops.banding.RoutingBand (required — on cells too small to
    band, delta locality cannot pay either; use the full path).
    Reference baseline being beaten: the reference recomputes the whole
    slab's nff energy every MC move (mcmc/mcmc.py:233 serial loop).
    """
    import numpy as np

    from surface_sampling_tpu.constants import SYMBOL_FROM_Z
    from surface_sampling_tpu.core.relax import energy_threshold
    from surface_sampling_tpu.models.nn_calculator import UNIT_FACTORS
    from surface_sampling_tpu.models.painn import (
        _cosine_envelope,
        _dense,
        _rbf,
        painn_features,
        prepare_message_geometry,
    )
    from surface_sampling_tpu.ops.neighbors import (
        _candidate_geometry,
        neighbor_list_from_table,
    )
    from surface_sampling_tpu.ops.pallas_painn import (
        choose_message_block,
        painn_message_subset,
        stage_band,
    )

    if band is None:
        raise ValueError(
            "incremental evaluation needs a routing band (ops/banding.py); "
            "cells too small to band are too small for delta locality too"
        )
    ensemble = np.asarray(params["atom_embed"]).ndim == 3
    # CLI-loaded checkpoints arrive as numpy (convert_nff.load_params_npz);
    # the delta path indexes atom_embed with traced ints, which numpy
    # arrays reject — stage everything on device once here
    params = jax.tree.map(jnp.asarray, params)
    L = cfg.n_layers
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    n_pad = ((N + 15) // 16) * 16
    n_blk = choose_message_block(n_pad)
    M = min(cfg.max_neighbors, static_nbr.max_candidates)
    dband = stage_band(band)
    if dband.n_blk != n_blk:
        raise ValueError("band n_blk mismatch")
    if inc_tables is None:
        inc_tables = build_inc_tables(spec, static_nbr, band, L)
    blocks_tbl = [jnp.asarray(b, jnp.int32) for b in inc_tables.blocks]
    dup_tbl = [jnp.asarray(m, jnp.float32) for m in inc_tables.dupmask]
    n_blocks = n_pad // n_blk

    # static-geometry fast mode (ops/static_edges.py): on code-independent
    # rigid lattices the per-edge payload is a device constant, so a delta
    # step builds geometry for its ball rows only — O(ball*Mc) bf16 dots —
    # instead of the full dynamic edge build + geometry prep (which is
    # O(N*Mc) per step and dominates delta cost at supercell sizes)
    from surface_sampling_tpu.ops.static_edges import (
        build_static_edge_pack,
        static_edge_geometry,
    )

    pack = None
    if static_geometry not in ("auto", "off"):
        raise ValueError("static_geometry must be 'auto' or 'off'")
    if static_geometry == "auto":
        pack = build_static_edge_pack(spec, static_nbr, cfg, band=band)
        if pack is not None and pack.n_pad != n_pad:
            raise ValueError("static edge pack n_pad mismatch")
    # the static msg_geom only feeds the fused kernel — pin the mode so
    # CPU's "auto"->"gather" resolution can't fall back onto the (dummy)
    # disp/nbr_j fields of the static edges tuple (nn_calculator.py:141
    # does the same for the rigid full-eval fast path)
    cfg_fwd = cfg
    if pack is not None:
        import dataclasses as _dc

        cfg_fwd = _dc.replace(cfg, message_mode="pallas")

    tbl_j = jnp.asarray(static_nbr.slot_j, jnp.int32)
    tbl_shift = jnp.asarray(static_nbr.shift, jnp.float32)
    tbl_valid = jnp.asarray(static_nbr.valid)
    factor = UNIT_FACTORS[units]
    znums = jnp.asarray(np.asarray(type_numbers), jnp.int32)
    if stoidict is not None:
        from surface_sampling_tpu.constants import HARTREE_TO_EV

        per_type = np.array(
            [stoidict.get(SYMBOL_FROM_Z[int(z)], 0.0)
             for z in np.asarray(type_numbers)]
        ) * HARTREE_TO_EV
        const_off = float(stoidict.get("offset", 0.0)) * HARTREE_TO_EV
        per_type_j = jnp.asarray(per_type, jnp.float32)
    else:
        per_type_j, const_off = None, 0.0
    sfn = surface_energy_fn or (lambda e, counts: e)
    e_bound = float(energy_threshold(N))

    def comp_offset(type_idx, alive, dtype):
        if per_type_j is None:
            return jnp.asarray(const_off, dtype)
        off = per_type_j.astype(dtype)[type_idx] * alive.astype(dtype)
        return jnp.sum(off) + jnp.asarray(const_off, dtype)

    def edge_fn(positions, alive):
        return neighbor_list_from_table(
            positions, alive, tbl_j, tbl_shift, tbl_valid, cfg.cutoff, M)

    def _excl_rows(nbr_r_rows, nbr_mask_rows, dtype):
        if not cfg.excl_vol:
            return jnp.zeros(nbr_r_rows.shape[0], dtype)
        r_pow = (cfg.sigma / jnp.maximum(nbr_r_rows, 1e-3)) ** cfg.power
        return jnp.sum(jnp.where(nbr_mask_rows, r_pow, 0.0), axis=1)

    def _member_full(p, positions, numbers, alive, edges, msg_geom):
        """One member's full forward with layer caches (matches
        painn_apply's per-atom energies incl. excl_vol). Cache rows are
        padded to n_pad (see IncCaches)."""
        with jax.default_matmul_precision("float32"):
            s, (dd, nbr_mask), (s_l, v_l) = painn_features(
                p, cfg_fwd, positions, numbers, alive, None, edges=edges,
                msg_geom=msg_geom, collect_layers=True)
            h = jax.nn.silu(_dense(p["readout"]["dense0"], s))
            e_atom = _dense(p["readout"]["dense1"], h)[..., 0]
        e_atom = jnp.where(alive, e_atom, 0.0)
        e_atom = e_atom + _excl_rows(dd, nbr_mask, e_atom.dtype) * alive.astype(
            e_atom.dtype)
        pad_n = n_pad - N
        s_pad = jnp.pad(s_l, ((0, 0), (0, pad_n), (0, 0)))
        v_pad = jnp.pad(v_l, ((0, 0), (0, pad_n), (0, 0), (0, 0)))
        e_pad = jnp.pad(e_atom, (0, pad_n))
        if pack is not None:
            # static mode: EVERY cache lives in sorted (band) order so a
            # delta addresses rows at block granularity via exact one-hot
            # MXU dots (no serializing gathers/scatters on the hot path);
            # the raw v cache is redundant (vcat is the same data in
            # kernel layout) — store it empty to halve the accept-select
            # HBM traffic
            phis, vcats = [], []
            for l in range(L):
                mp = p["message"][l]
                with jax.default_matmul_precision("float32"):
                    phi = _dense(mp["inv_dense1"],
                                 jax.nn.silu(_dense(mp["inv_dense0"],
                                                    s_pad[l])))
                vc = jnp.concatenate(
                    [v_pad[l][..., 0], v_pad[l][..., 1], v_pad[l][..., 2]],
                    axis=1)
                phis.append(phi[dband.perm])
                vcats.append(vc[dband.perm])
            phi_c, vcat_c = jnp.stack(phis), jnp.stack(vcats)
            s_pad = s_pad[:, dband.perm]
            e_pad = e_pad[dband.perm]
            v_pad = jnp.zeros((L, 0) + v_pad.shape[2:], v_pad.dtype)
        else:
            phi_c = jnp.zeros((L, 0, 3 * s_pad.shape[-1]), s_pad.dtype)
            vcat_c = jnp.zeros((L, 0, 3 * s_pad.shape[-1]), s_pad.dtype)
        return IncCaches(
            s=s_pad,
            v=v_pad,
            e_atom=e_pad,
            phi=phi_c,
            vcat=vcat_c,
        )

    def energy_full(site_state):
        positions = realize_positions(d, site_state)
        type_idx = realize_type_idx(d, site_state)
        alive = realize_alive(d, site_state)
        numbers = znums[type_idx] * alive.astype(jnp.int32)
        counts = element_counts(d, site_state, dtype=positions.dtype)
        if pack is not None:
            # same host-f64 payload the delta steps select from, so the
            # caches a delta refreshes are consistent with init rows
            msg_geom, edges = static_edge_geometry(pack, alive)
        else:
            edges = edge_fn(positions, alive)
            msg_geom = prepare_message_geometry(cfg, positions, edges,
                                                band=dband)
        overflow = edges[4]
        if ensemble:
            caches = jax.vmap(
                lambda p: _member_full(p, positions, numbers, alive, edges,
                                       msg_geom))(params)
            e_raw = jnp.sum(caches.e_atom, axis=1)          # (n_models,)
        else:
            caches = _member_full(params, positions, numbers, alive, edges,
                                  msg_geom)
            e_raw = jnp.sum(caches.e_atom)[None]
        e_raw = jnp.where(overflow, 1e6, e_raw)
        se, oob = _finish(e_raw, type_idx, alive, counts)
        return se, caches, oob

    def _finish(e_raw_members, type_idx, alive, counts):
        e_pot = jnp.mean(e_raw_members) * factor + comp_offset(
            type_idx, alive, counts.dtype)
        nan = jnp.isnan(e_pot)
        oob = (jnp.abs(e_pot) > e_bound) | nan
        e_pot = jnp.where(oob, e_bound, e_pot)
        se = sfn(e_pot, counts)
        se = jnp.where(oob, jnp.asarray(e_bound, se.dtype), se)
        return se, oob

    def _member_delta(p, caches, ws_l, geom_l, slots_l, s0_full,
                      excl_rows_last, alive_pad):
        """Recompute one member's caches over the per-layer selected
        blocks. ws_l/geom_l/slots_l are per-layer lists (python, static
        length L); slots map kernel rows back to slot ids — pad slots
        included and written freely (see IncCaches: no edge ever routes
        from them and their energies are zeroed by alive_pad, so no
        validity masking is needed — a masked scatter with duplicate
        indices would be nondeterministic)."""
        new_s = caches.s.at[0].set(s0_full)
        new_v = caches.v                        # v_0 stays zero
        e_atom = caches.e_atom
        for l in range(L):
            mp = p["message"][l]
            up = p["update"][l]
            s_in = new_s[l]                     # (n_pad, F)
            v_in = new_v[l]
            with jax.default_matmul_precision("float32"):
                phi = _dense(mp["inv_dense1"],
                             jax.nn.silu(_dense(mp["inv_dense0"], s_in)))
                vcat = jnp.concatenate(
                    [v_in[..., 0], v_in[..., 1], v_in[..., 2]], axis=1)
                phi_s = phi[dband.perm]
                vcat_s = vcat[dband.perm]
                if dband.halo:
                    phi_s = jnp.concatenate([phi_s, phi_s[:dband.halo]])
                    vcat_s = jnp.concatenate([vcat_s, vcat_s[:dband.halo]])
                rbf_sel, envm_sel, nbr_sel, unit_sel, r_pad = geom_l[l]
                dw = jnp.pad(mp["dist_embed"]["w"],
                             ((0, r_pad - cfg.n_rbf), (0, 0)))
                db = mp["dist_embed"]["b"][None, :]
                ds_c, dv_c = painn_message_subset(
                    phi_s, vcat_s, rbf_sel, envm_sel, nbr_sel, unit_sel,
                    dw, db, ws_l[l], n_blk=n_blk, window=dband.window,
                    n_pad=n_pad, routing=cfg.pallas_routing)
                slots = slots_l[l]
                s_mid = s_in[slots] + ds_c
                v_mid = v_in[slots] + jnp.stack(
                    [dv_c[0], dv_c[1], dv_c[2]], axis=-1)
                s_out, v_out = _update_block(up, s_mid, v_mid)
            arows = alive_pad[slots]
            s_out = jnp.where(arows[:, None], s_out, 0.0)
            v_out = jnp.where(arows[:, None, None], v_out, 0.0)
            if l + 1 < L:
                new_s = new_s.at[l + 1, slots].set(s_out)
                new_v = new_v.at[l + 1, slots].set(v_out)
            else:
                with jax.default_matmul_precision("float32"):
                    h = jax.nn.silu(_dense(p["readout"]["dense0"], s_out))
                    e_rows = _dense(p["readout"]["dense1"], h)[..., 0]
                e_rows = jnp.where(arows, e_rows, 0.0)
                e_rows = e_rows + excl_rows_last * arows.astype(e_rows.dtype)
                e_atom = e_atom.at[slots].set(e_rows)
        return IncCaches(s=new_s, v=new_v, e_atom=e_atom,
                         phi=caches.phi, vcat=caches.vcat)

    # ---- static-geometry delta: block addressing via exact one-hot MXU
    # dots. TPU gathers/scatters with traced indices serialize on the
    # scalar core (and become while-loops under the chain vmap) — the
    # measured v1 of this path was SLOWER than full evaluation because
    # of exactly that. v2 keeps every cache in sorted order and selects /
    # writes block rows with small matmuls, so the whole step is MXU/VPU
    # work (the repo-wide "rigid" design idiom, e.g. potentials/eam.py).
    hp = jax.lax.Precision.HIGHEST

    def _sel_rows(oh, x):
        """Gather block rows of a sorted (n_pad, K) array as one exact
        one-hot dot: (NBsel, n_blocks) @ (n_blocks, n_blk*K). Duplicate
        selected blocks read correct (repeated) values."""
        k_dim = x.shape[-1]
        r = jnp.dot(oh, x.reshape(n_blocks, n_blk * k_dim), precision=hp)
        return r.reshape(-1, k_dim)

    def _scatter_set(sc_t, rowmask, x, new):
        """Exact masked scatter-SET of compact block rows into a sorted
        (n_pad, K) array: selected rows become exactly ``new`` (duplicate
        selections carry identical values and average exactly via the
        1/count normalization baked into sc_t), unselected rows keep
        their bits (multiplied by exactly 1.0)."""
        k_dim = x.shape[-1]
        up = jnp.dot(sc_t, new.reshape(-1, n_blk * k_dim), precision=hp)
        return x * (1.0 - rowmask) + up.reshape(n_pad, k_dim)

    def _layer_select(l, sites):
        """Selection operators for layer ``l``'s ball blocks of ``sites``
        (python list of traced site scalars): gather one-hot ``oh``,
        normalized scatter transpose ``sc_t``, per-row write mask, and the
        kernel window starts."""
        blocks = jnp.concatenate([blocks_tbl[l][s] for s in sites])
        dupm = jnp.concatenate([dup_tbl[l][s] for s in sites])
        oh = jax.nn.one_hot(blocks, n_blocks, dtype=jnp.float32)
        ohm = oh * dupm[:, None]
        cs = jnp.sum(ohm, axis=0)                        # (n_blocks,) 0/1/2
        sc_t = (ohm / jnp.maximum(cs, 1.0)[None, :]).T   # (n_blocks, NBsel)
        rowmask = jnp.repeat(jnp.minimum(cs, 1.0), n_blk)[:, None]
        return oh, sc_t, rowmask, dband.win_start[blocks]

    def _geom_select(oh, msg_geom):
        """Select the kernel-ready geometry of ``oh``'s blocks from the
        full sorted grids (built per step by static_edge_geometry — cheap
        bf16 payload dots)."""
        rbf_p, envm_p, nbr_p, unit_p, _npd, _db2 = msg_geom
        r_pad = rbf_p.shape[1]
        nb_sel = oh.shape[0]
        rbf_sel = jnp.dot(oh, rbf_p.reshape(n_blocks, -1), precision=hp
                          ).reshape(nb_sel * n_blk * M, r_pad)
        envm_sel = jnp.dot(oh, envm_p.reshape(n_blocks, -1), precision=hp
                           ).reshape(nb_sel * n_blk * M, 1)
        # ranks < n_pad + halo << 2^24: exact through the f32 dot
        nbr_sel = jnp.round(
            jnp.dot(oh, nbr_p.astype(jnp.float32).reshape(n_blocks, -1),
                    precision=hp)
        ).astype(jnp.int32).reshape(nb_sel * n_blk * M, 1)
        u = jnp.moveaxis(unit_p, 0, 2).reshape(n_blocks, -1)
        unit_sel = jnp.moveaxis(
            jnp.dot(oh, u, precision=hp).reshape(nb_sel * n_blk, M, 3),
            2, 0)
        return rbf_sel, envm_sel, nbr_sel, unit_sel, r_pad

    def _member_delta_static(p, caches, sel_l, geom_l, alive_rows_l,
                             numbers_rows0, excl_rows_last):
        """One member's delta over the selected blocks: per-move cost is
        O(ball) denses + the subset-grid kernel; caches update via exact
        one-hot scatter-sets. Layer-l's selection is a superset of the
        rows layer l-1 wrote (hop balls grow monotonically), so cache
        rows outside the ball stay valid by construction."""
        F = caches.s.shape[-1]
        s_ls = [caches.s[l] for l in range(L)]
        phi_ls = [caches.phi[l] for l in range(L)]
        vcat_ls = [caches.vcat[l] for l in range(L)]
        e_atom = caches.e_atom
        for l in range(L):
            oh, sc_t, rowmask, ws = sel_l[l]
            mp = p["message"][l]
            up = p["update"][l]
            arows = alive_rows_l[l] > 0.5                 # (n_sel,)
            if l == 0:
                # s_0 = embedding(numbers): rebuild the selected rows from
                # the trial occupancy (one-hot over the species axis)
                emb_oh = jax.nn.one_hot(
                    jnp.clip(numbers_rows0, 0, cfg.max_z - 1), cfg.max_z,
                    dtype=jnp.float32)
                s_rows = jnp.dot(emb_oh, p["atom_embed"], precision=hp)
                s_rows = jnp.where(arows[:, None], s_rows, 0.0)
                s_ls[0] = _scatter_set(sc_t, rowmask, s_ls[0], s_rows)
            else:
                s_rows = _sel_rows(oh, s_ls[l])           # (n_sel, F)
            with jax.default_matmul_precision("float32"):
                phi_rows = _dense(mp["inv_dense1"],
                                  jax.nn.silu(_dense(mp["inv_dense0"],
                                                     s_rows)))
            phi_ls[l] = _scatter_set(sc_t, rowmask, phi_ls[l], phi_rows)
            vc_rows = _sel_rows(oh, vcat_ls[l])           # (n_sel, 3F)
            v_rows = jnp.stack(
                [vc_rows[:, :F], vc_rows[:, F:2 * F], vc_rows[:, 2 * F:]],
                axis=-1)                                  # (n_sel, F, 3)
            phi_s, vcat_s = phi_ls[l], vcat_ls[l]
            if dband.halo:
                phi_s = jnp.concatenate([phi_s, phi_s[:dband.halo]])
                vcat_s = jnp.concatenate([vcat_s, vcat_s[:dband.halo]])
            rbf_sel, envm_sel, nbr_sel, unit_sel, r_pad = geom_l[l]
            with jax.default_matmul_precision("float32"):
                dw = jnp.pad(mp["dist_embed"]["w"],
                             ((0, r_pad - cfg.n_rbf), (0, 0)))
                db = mp["dist_embed"]["b"][None, :]
                ds_c, dv_c = painn_message_subset(
                    phi_s, vcat_s, rbf_sel, envm_sel, nbr_sel, unit_sel,
                    dw, db, ws, n_blk=n_blk, window=dband.window,
                    n_pad=n_pad, routing=cfg.pallas_routing)
                s_mid = s_rows + ds_c
                v_mid = v_rows + jnp.stack(
                    [dv_c[0], dv_c[1], dv_c[2]], axis=-1)
                s_out, v_out = _update_block(up, s_mid, v_mid)
            s_out = jnp.where(arows[:, None], s_out, 0.0)
            v_out = jnp.where(arows[:, None, None], v_out, 0.0)
            if l + 1 < L:
                s_ls[l + 1] = _scatter_set(sc_t, rowmask, s_ls[l + 1],
                                           s_out)
                vcat_out = jnp.concatenate(
                    [v_out[..., 0], v_out[..., 1], v_out[..., 2]], axis=1)
                vcat_ls[l + 1] = _scatter_set(sc_t, rowmask,
                                              vcat_ls[l + 1], vcat_out)
            else:
                with jax.default_matmul_precision("float32"):
                    h = jax.nn.silu(_dense(p["readout"]["dense0"], s_out))
                    e_rows = _dense(p["readout"]["dense1"], h)[..., 0]
                e_rows = jnp.where(arows, e_rows, 0.0)
                e_rows = e_rows + excl_rows_last * arows.astype(e_rows.dtype)
                e_atom = _scatter_set(sc_t, rowmask, e_atom[:, None],
                                      e_rows[:, None])[:, 0]
        return IncCaches(s=jnp.stack(s_ls), v=caches.v, e_atom=e_atom,
                         phi=jnp.stack(phi_ls), vcat=jnp.stack(vcat_ls))

    def _make_delta_static(k):
        """Build the static delta for ``k`` moved sites (1 = Change,
        2 = Exchange; k is static so the selection shapes are too)."""

        def delta_static(caches, ss_trial, sites):
            type_idx = realize_type_idx(d, ss_trial)
            alive = realize_alive(d, ss_trial)
            numbers = znums[type_idx] * alive.astype(jnp.int32)
            counts = element_counts(d, ss_trial, dtype=jnp.float32)
            # full-grid edge geometry from the rigid payload: pure bf16
            # MXU dots + tiny VPU masks — O(N) FLOPs so small it is noise
            # next to one ball's message pass (and bitwise-identical to
            # what init_state cached, same payload)
            msg_geom, edges = static_edge_geometry(pack, alive)
            overflow = edges[4]
            pad_n = n_pad - N
            alive_s = jnp.pad(alive, (0, pad_n)
                              )[dband.perm].astype(jnp.float32)
            numbers_s = jnp.pad(numbers, (0, pad_n))[dband.perm]
            excl_s = jnp.pad(_excl_rows(edges[1], edges[3], jnp.float32),
                             (0, pad_n))[dband.perm]

            site_list = [sites[i] for i in range(k)]
            sel_l, geom_l, alive_rows_l = [], [], []
            for l in range(L):
                sel = _layer_select(l, site_list)
                sel_l.append(sel)
                geom_l.append(_geom_select(sel[0], msg_geom))
                alive_rows_l.append(
                    jnp.dot(sel[0], alive_s.reshape(n_blocks, n_blk),
                            precision=hp).reshape(-1))
            numbers_rows0 = jnp.round(
                jnp.dot(sel_l[0][0],
                        numbers_s.astype(jnp.float32).reshape(n_blocks,
                                                              n_blk),
                        precision=hp)).reshape(-1).astype(jnp.int32)
            excl_rows_last = jnp.dot(
                sel_l[-1][0], excl_s.reshape(n_blocks, n_blk),
                precision=hp).reshape(-1)

            def one(p, c):
                return _member_delta_static(p, c, sel_l, geom_l,
                                            alive_rows_l, numbers_rows0,
                                            excl_rows_last)

            if ensemble:
                new_caches = jax.vmap(one)(params, caches)
                e_raw = jnp.sum(new_caches.e_atom, axis=1)
            else:
                new_caches = one(params, caches)
                e_raw = jnp.sum(new_caches.e_atom)[None]
            e_raw = jnp.where(overflow, 1e6, e_raw)
            se, oob = _finish(e_raw, type_idx, alive, counts)
            return se, new_caches, oob

        return delta_static

    def delta(caches, ss_trial, sites2):
        """Trial evaluation: recompute the hop balls of ``sites2`` (a
        (2,)-array of site indices; pass the same site twice for a
        single-site move) under occupancy ``ss_trial``."""
        positions = realize_positions(d, ss_trial)
        type_idx = realize_type_idx(d, ss_trial)
        alive = realize_alive(d, ss_trial)
        numbers = znums[type_idx] * alive.astype(jnp.int32)
        counts = element_counts(d, ss_trial, dtype=positions.dtype)
        edges = edge_fn(positions, alive)
        overflow = edges[4]
        msg_geom = prepare_message_geometry(cfg, positions, edges, band=dband)
        rbf_p, envm_p, nbr_p, unit_p, _n_pad, _db = msg_geom
        n_blocks_all = n_pad // n_blk
        e_blk = n_blk * M
        r_pad = rbf_p.shape[1]
        rbf_b = rbf_p.reshape(n_blocks_all, e_blk, r_pad)
        envm_b = envm_p.reshape(n_blocks_all, e_blk, 1)
        nbr_b = nbr_p.reshape(n_blocks_all, e_blk, 1)
        unit_b = unit_p.reshape(3, n_blocks_all, n_blk, M)

        pad_n = n_pad - N
        alive_pad = jnp.pad(alive, (0, pad_n))
        numbers_pad = jnp.pad(numbers, (0, pad_n))
        # (n_pad, M) edge distances/masks for the excl_vol row recompute
        _disp, nbr_r, _j, nbr_mask, _ov = edges
        nbr_r_pad = jnp.pad(nbr_r, ((0, pad_n), (0, 0)),
                            constant_values=cfg.cutoff)
        nbr_mask_pad = jnp.pad(nbr_mask, ((0, pad_n), (0, 0)))

        geom_l, ws_l, slots_l = [], [], []
        for l in range(L):
            blocks = jnp.concatenate(
                [blocks_tbl[l][sites2[0]], blocks_tbl[l][sites2[1]]])
            ws = dband.win_start[blocks]
            rbf_sel = rbf_b[blocks].reshape(-1, r_pad)
            envm_sel = envm_b[blocks].reshape(-1, 1)
            nbr_sel = nbr_b[blocks].reshape(-1, 1)
            unit_sel = unit_b[:, blocks].reshape(3, -1, M)
            rows = (blocks[:, None] * n_blk
                    + jnp.arange(n_blk, dtype=blocks.dtype)).reshape(-1)
            slots = dband.perm[rows]            # < n_pad (pads writable)
            geom_l.append((rbf_sel, envm_sel, nbr_sel, unit_sel, r_pad))
            ws_l.append(ws)
            slots_l.append(slots)

        # excl_vol rows for the last layer's slots (geometry-only term)
        excl_rows_last = _excl_rows(nbr_r_pad[slots_l[-1]],
                                    nbr_mask_pad[slots_l[-1]],
                                    positions.dtype)

        def one(p, c):
            emb = p["atom_embed"][jnp.clip(numbers_pad, 0, cfg.max_z - 1)]
            s0 = jnp.where(alive_pad[:, None], jnp.asarray(emb), 0.0)
            return _member_delta(p, c, ws_l, geom_l, slots_l, s0,
                                 excl_rows_last, alive_pad)

        if ensemble:
            new_caches = jax.vmap(one)(params, caches)
            e_raw = jnp.sum(new_caches.e_atom, axis=1)
        else:
            new_caches = one(params, caches)
            e_raw = jnp.sum(new_caches.e_atom)[None]
        e_raw = jnp.where(overflow, 1e6, e_raw)
        se, oob = _finish(e_raw, type_idx, alive, counts)
        return se, new_caches, oob

    def init_state(key, site_state):
        se, caches, _oob = energy_full(jnp.asarray(site_state, jnp.int32))
        return IncState(site_state=jnp.asarray(site_state, jnp.int32),
                        energy=se, key=key, caches=caches)

    if pack is not None:
        delta_out = _make_delta_static(2)
        delta1_out = _make_delta_static(1)
    else:
        delta_out = delta
        delta1_out = lambda c, ss, sites1: delta(    # noqa: E731
            c, ss, jnp.concatenate([sites1, sites1]))
    return IncEngine(init_state=init_state, energy_full=energy_full,
                     delta=delta_out, delta1=delta1_out,
                     n_sites=S, n_codes=spec.n_codes)


def make_incremental_painn_from_system(system, d=None) -> IncEngine:
    """Build the delta engine from a systems.py ExampleSystem whose
    potential carries the ``inc_args`` hook (srtio3_001_painn supercells:
    rigid + banded)."""
    args = getattr(system.potential, "__dict__", {}).get("inc_args")
    if args is None:
        raise ValueError(
            "system potential has no inc_args hook — incremental "
            "evaluation needs a rigid banded PaiNN system "
            "(e.g. systems.srtio3_001_painn(supercell=(2, 2)))"
        )
    return make_incremental_painn(d=d or system.run.d, **args)


# ----------------------------------------------------------------------
# MC steps over the incremental engine (single-try semigrand / canonical;
# proposal semantics identical to core/events.py — same reference
# counterparts — with the full evaluation swapped for engine.delta)
# ----------------------------------------------------------------------
def _make_dist_accept(d, criterion, filter_distance):
    """Optional hard-wall factor for the incremental steps. The full-state
    candidate-pair check (events.make_distance_accept) is O(C*G^2) gathers
    + one min — noise next to even a delta NN evaluation — so the
    incremental path reuses it unchanged rather than localizing it."""
    if criterion == "metropolis":
        return None
    if criterion != "metropolis_distance":
        raise ValueError(
            "incremental steps support criterion='metropolis' or "
            f"'metropolis_distance' (got {criterion!r})"
        )
    if d is None:
        raise ValueError("criterion='metropolis_distance' needs the "
                         "DeviceSpec (d=) for the candidate-pair table")
    from surface_sampling_tpu.core.events import make_distance_accept

    return make_distance_accept(d, filter_distance)


def make_incremental_semigrand_step(
    engine: IncEngine, d=None, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Metropolis semigrand Change step over cached features
    (events.make_semigrand_step with state_energy_fn -> engine.delta);
    ``criterion="metropolis_distance"`` adds the hard-wall minimum-
    separation prior exactly as the full-evaluation step does."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.state import (
        change_site,
        num_occupied_sites,
    )

    n_sites, n_codes = engine.n_sites, engine.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: IncState, temp):
        key, k_site, k_code, k_acc = jax.random.split(state.key, 4)
        site = jax.random.randint(k_site, (), 0, n_sites)
        cur = state.site_state[site]
        u = jax.random.randint(k_code, (), 0, n_codes - 1)
        end = u + (u >= cur).astype(u.dtype)
        trial_ss = change_site(state.site_state, site, end)
        # single-site Change: delta1 evaluates ONE ball table (engine.delta
        # would concatenate the same site's blocks twice)
        se, new_caches, oob = engine.delta1(
            state.caches, trial_ss, jnp.stack([site]))
        accept = metropolis_accept(k_acc, state.energy, se, temp)
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = IncState(
            site_state=jnp.where(accept, trial_ss, state.site_state),
            energy=jnp.where(accept, se, state.energy),
            key=key,
            caches=jax.tree.map(
                lambda n, o: jnp.where(accept, n, o), new_caches,
                state.caches),
        )
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=oob)
        return new_state, info

    return step


def make_incremental_canonical_step(
    engine: IncEngine, d=None, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Metropolis canonical Exchange step over cached features
    (events.make_canonical_step's unweighted symmetric proposal);
    ``criterion="metropolis_distance"`` adds the hard-wall prior."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.state import (
        exchange_sites,
        num_occupied_sites,
    )

    n_sites, n_codes = engine.n_sites, engine.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: IncState, temp):
        key, k_types, k_s1, k_s2, k_acc = jax.random.split(state.key, 5)
        ss = state.site_state
        onehot = jax.nn.one_hot(ss, n_codes, dtype=jnp.float32)
        present = jnp.sum(onehot, axis=0) > 0
        valid = jnp.sum(present.astype(jnp.int32)) >= 2
        g = jax.random.gumbel(k_types, (n_codes,))
        _, top2 = jax.lax.top_k(jnp.where(present, g, -jnp.inf), 2)
        type1, type2 = top2[0], top2[1]
        w1 = (ss == type1).astype(jnp.float32)
        site1 = jnp.argmax(jnp.log(w1 + 1e-38)
                           + jax.random.gumbel(k_s1, (n_sites,)))
        w2 = (ss == type2).astype(jnp.float32)
        site2 = jnp.argmax(jnp.log(w2 + 1e-38)
                           + jax.random.gumbel(k_s2, (n_sites,)))
        trial_ss = exchange_sites(ss, site1, site2)
        sites2 = jnp.stack([site1, site2]).astype(jnp.int32)
        se, new_caches, oob = engine.delta(state.caches, trial_ss, sites2)
        accept = metropolis_accept(k_acc, state.energy, se, temp) & valid
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = IncState(
            site_state=jnp.where(accept, trial_ss, ss),
            energy=jnp.where(accept, se, state.energy),
            key=key,
            caches=jax.tree.map(
                lambda n, o: jnp.where(accept, n, o), new_caches,
                state.caches),
        )
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=oob)
        return new_state, info

    return step


class IncSweepRecord(NamedTuple):
    energy: jnp.ndarray        # (R,) end-of-sweep surface energies
    accept_rate: jnp.ndarray   # (R,)
    n_ads: jnp.ndarray         # (R,)
    site_state: jnp.ndarray    # (R, S)
    oob_rate: jnp.ndarray      # (R,) fraction of trial moves OOB-clamped


def make_incremental_run(step_fn: Callable, sweep_size: int) -> Callable:
    """``run(state, temps) -> (state, IncSweepRecord)`` — the scan-of-
    scans runner over incremental steps (mirrors core.engine.make_run_fn
    for the cached-state path; vmap over chains with
    parallel.chains.make_chain_run)."""

    def sweep(state, temp):
        def body(st, _):
            st, info = step_fn(st, temp)
            return st, info

        state, infos = jax.lax.scan(body, state, None, length=sweep_size)
        return state, infos

    def run(state, temps):
        def body(st, temp):
            st, infos = sweep(st, temp)
            rec = IncSweepRecord(
                energy=st.energy,
                accept_rate=jnp.mean(infos.accepted.astype(jnp.float32)),
                n_ads=infos.n_ads[-1].astype(jnp.float32),
                site_state=st.site_state,
                oob_rate=jnp.mean(infos.oob.astype(jnp.float32)),
            )
            return st, rec

        return jax.lax.scan(body, state, temps)

    return run
