"""Frozen-far-field approximate-descent ball relaxation MC.

The reference's DEFAULT per-move policy relaxes the slab before every
acceptance test (mcmc/dynamics.py:83,140-141 via mcmc/mcmc.py:233). The
exact warm-started ball engine (core/local_relax.py) restores the
reference's warm-start semantics but measures no gain below ~6x6 cells:
every FIRE step still evaluates forces on the WHOLE cell, because exact
forces on a ball need features of the (relax-hop + L message-hop) ball,
which covers 100% of every cell up to 4x4 (measured cap analysis,
docs/BENCHMARKS.md). This engine is the named successor design: it
changes the RELAXATION POLICY (not the acceptance energy) so the descent
itself is local.

Per move:

  * the moved site's slots reset to their lattice template (reference
    add_atom/change semantics, mcmc/slab.py:309); slots within ``hops``
    candidate-adjacency hops form the RELAX BALL;
  * FIRE descends a LOCAL objective: the sum of the ball rows' per-atom
    energies, computed by running the L message layers for ball rows only
    while every other row's layer-input features stay FROZEN at the
    values cached from the last accepted full evaluation (and frozen
    ring positions). The subproblem is compact — ball + 1-hop ring rows
    extracted into small dense arrays with a host-precomputed local edge
    table — so a descent force evaluation is a handful of small bf16
    one-hot MXU matmuls + lane-wide elementwise reduces instead of a
    full-cell forward+VJP (the measured optimization ladder and its
    profile evidence: docs/BENCHMARKS.md);
  * the ACCEPTANCE energy is a full-cell evaluation of the relaxed
    geometry through the standard edge path — identical evaluator to the
    full relax engine, so there is no energy drift and OOB semantics are
    unchanged; the same forward (collect_layers=True) refreshes the
    feature caches for the next move when the move is accepted.

The approximation lives ONLY in which minimum the descent lands in: far
rows neither move nor update their features during a move's descent, so
the relaxed geometry can differ from the exact policy's. That is a
sampling-policy perturbation (like the reference's choice of optimizer
or relax budget), not an energy error — it is measured, not hidden:
tools/bench_all.py's ffrelax family reports accepted-move overlap and
energy-trajectory divergence vs the exact warm-started path on identical
proposal streams.

Scope: PaiNN single/ensemble potentials (the flagship relax-mode
workload). Reference policy being accelerated:
/root/reference/mcmc/dynamics.py:83,140-141.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.core.energy import RelaxConfig, StateEnergy
from surface_sampling_tpu.core.relax import (
    FireConfig,
    energy_threshold,
    fire_relax,
)
from surface_sampling_tpu.core.state import (
    DeviceSpec,
    change_site,
    element_counts,
    exchange_sites,
    num_occupied_sites,
    realize_alive,
    realize_free_mask,
    realize_positions,
    realize_type_idx,
)


class FFTables(NamedTuple):
    """Host-built subproblem tables (numpy), staged to device by the
    eval factory.

    The per-site data is only the ROW LISTS; the edge structure lives in
    the SHARED slot-level candidate table and is re-localized at move
    time with one scatter (a ball row's candidate list is the same no
    matter whose ball it sits in — storing per-site localized copies
    baked ~270 MB of HLO constants into 6x6 programs and tripped the
    remote compiler's request cap).

    rows: (S, NSub) int32 — global slot ids of each site's subproblem,
        RELAX BALL first (``n_ball`` rows), frozen ring after; padded by
        repeating the first entry.
    row_valid: (S, NSub) bool — False on padding repeats.
    slot_j: (N, M) int32 — shared candidate table (static_nbr's).
    slot_shift_idx: (N, M) int32 — index into ``shifts_u``.
    slot_valid: (N, M) bool.
    shifts_u: (Ku, 3) float32 — unique periodic-image shift vectors.
    n_ball / n_sub: padded static widths.
    ball_frac: mean |ball| / N (diagnostic — the descent's cost fraction).
    """

    rows: np.ndarray
    row_valid: np.ndarray
    slot_j: np.ndarray
    slot_shift_idx: np.ndarray
    slot_valid: np.ndarray
    shifts_u: np.ndarray
    n_ball: int
    n_sub: int
    ball_frac: float


def build_ff_tables(spec, static_nbr, hops: int = 1) -> FFTables:
    """Relax balls (``hops`` hops of the candidate adjacency around each
    site's slots) and their 1-hop frozen rings. The candidate table is a
    geometric superset of every possible interaction
    (core/static_neighbors.py), so the ring always contains every row a
    ball row can ever touch."""
    P, S, G = spec.n_pristine, spec.n_sites, spec.group_size
    N = P + S * G
    slot_j = np.asarray(static_nbr.slot_j)
    valid = np.asarray(static_nbr.valid)
    M = slot_j.shape[1]
    # undirected adjacency as boolean matrix (N ~ thousands: fine)
    adj = np.zeros((N, N), bool)
    rr = np.repeat(np.arange(N), M)
    cc = slot_j.reshape(-1)
    ok = valid.reshape(-1)
    adj[rr[ok], cc[ok]] = True
    adj |= adj.T

    # unique shift table
    sh_flat = np.asarray(static_nbr.shift, np.float32).reshape(-1, 3)
    shifts_u, sh_inv = np.unique(sh_flat.round(6), axis=0, return_inverse=True)
    sh_idx_full = sh_inv.reshape(N, M).astype(np.int32)

    balls, rings = [], []
    for s in range(S):
        mask = np.zeros(N, bool)
        mask[P + s * G: P + (s + 1) * G] = True
        for _ in range(hops):
            mask = mask | adj[mask].any(axis=0)
        ring = adj[mask].any(axis=0) & ~mask
        balls.append(np.where(mask)[0])
        rings.append(np.where(ring)[0])
    # pad both segments to the fp32 sublane tile (ball first, ring after)
    NB = int(np.ceil(max(len(b) for b in balls) / 8.0) * 8)
    NR = int(np.ceil(max(len(r) for r in rings) / 8.0) * 8)
    NSub = NB + NR

    rows = np.zeros((S, NSub), np.int32)
    row_valid = np.zeros((S, NSub), bool)
    for s in range(S):
        b, r = balls[s], rings[s]
        rows[s, : len(b)] = b
        rows[s, NB: NB + len(r)] = r
        rows[s, len(b):NB] = b[0]
        rows[s, NB + len(r):] = b[0]
        row_valid[s, : len(b)] = True
        row_valid[s, NB: NB + len(r)] = True
    ball_frac = float(np.mean([len(b) for b in balls]) / N)
    return FFTables(rows=rows, row_valid=row_valid,
                    slot_j=slot_j.astype(np.int32),
                    slot_shift_idx=sh_idx_full,
                    slot_valid=np.asarray(valid, bool),
                    shifts_u=shifts_u, n_ball=NB, n_sub=NSub,
                    ball_frac=ball_frac)


def _stack_single(tree):
    return jax.tree.map(lambda x: jnp.asarray(x)[None], tree)


def make_ff_relax_eval(
    d: DeviceSpec,
    potential,
    surface_energy_fn: Callable | None = None,
    relax: RelaxConfig = RelaxConfig(),
    tables: FFTables | None = None,
    routing_precision: str = "default",
    use_remat: bool = False,
    use_split_router: bool = True,
    seat_tables: FFTables | None = None,
    descent_dtype: str = "auto",
) -> Callable:
    """Build ``evaluate(trial_ss, pos_prev, caches, sites2) ->
    (StateEnergy, new_caches)`` — the frozen-far-field counterpart of
    core/local_relax.py's warm-started evaluate. ``caches`` is the
    (member, L, N, F) / (member, L, N, F, 3) layer-input pytree from the
    last accepted full evaluation; ``sites2`` a (2,)-int array of moved
    sites (repeat one site for single-site moves — the second ball then
    re-descends the same, already-relaxed ball, a cheap no-op wasted only
    on Exchange-free workloads, so single-site callers should use the
    ``evaluate1`` companion returned alongside)."""
    if tables is None:
        raise ValueError("tables required (build_ff_tables)")
    hooks = getattr(potential, "__dict__", {})
    pack = hooks.get("ff_pack")
    if pack is None or "outputs" not in hooks:
        raise ValueError("ff_relax needs a PaiNN-family potential "
                         "(models/nn_calculator.make_painn_potential)")
    from surface_sampling_tpu.models.painn import (
        _cosine_envelope,
        _dense,
        _painn_update,
        _rbf,
    )

    cfg = pack["cfg"]
    znums = pack["znums"]
    factor = pack["factor"]
    outputs = hooks["outputs"]
    params = pack["params"] if pack["ensemble"] else _stack_single(pack["params"])
    params = jax.tree.map(jnp.asarray, params)
    sfn = surface_energy_fn or (lambda e, counts: e)
    fire_cfg = FireConfig(steps=relax.steps, fmax=relax.fmax,
                          max_step=relax.max_step)
    P = d.pristine_positions.shape[0]
    G = d.code_offsets.shape[1]
    F, L = cfg.feat_dim, cfg.n_layers
    shifts_u = jnp.asarray(tables.shifts_u, jnp.float32)
    # shared slot-level candidate tables (site-independent; localized at
    # move time with one scatter — keeps the per-site data to row lists)
    slot_jt = jnp.asarray(tables.slot_j)
    slot_shidxt = jnp.asarray(tables.slot_shift_idx)
    slot_validt = jnp.asarray(tables.slot_valid)
    Nfull = int(tables.slot_j.shape[0])

    def stage(tbl: FFTables) -> dict:
        return dict(
            NB=tbl.n_ball, NSub=tbl.n_sub,
            rows_t=jnp.asarray(tbl.rows),
            rvalid_t=jnp.asarray(tbl.row_valid),
            is_ball=jnp.arange(tbl.n_sub) < tbl.n_ball,
        )

    T_main = stage(tables)
    # the seat phase (optional): a hops=0 table — ball = just the moved
    # site's slots, ring = their immediate neighborhood. Seating the
    # fresh trial adsorbate on this ~G-row subproblem costs a tiny
    # fraction of a main-ball FIRE step, and the main ball then starts
    # from a near-seated geometry, so its force-converged early exit
    # fires sooner (the fresh adsorbate otherwise consumes most of the
    # relax budget — the round-4 cap analysis's measured reason warm
    # starts alone paid nothing).
    T_seat = stage(seat_tables) if seat_tables is not None else None
    # "default" = backend default (1-pass bf16 MXU on TPU) for the two
    # big routing dots of the descent objective; "highest" keeps them
    # true-f32 (parity tests use it through the float32 context anyway —
    # on CPU both resolve to the same full-precision dot)
    rp = (jax.lax.Precision.DEFAULT if routing_precision == "default"
          else jax.lax.Precision.HIGHEST)
    # the (NB, M, 3F) per-edge intermediates are the descent's measured
    # wall (HBM traffic + backward residals — 123 ms/FIRE-iteration at
    # 16 chains on the 2x2, v5e): storing them in bf16 halves both.
    # Reductions stay f32 (sum dtype / preferred_element_type). "auto":
    # bf16 on TPU, f32 on CPU (keeps the CPU parity oracles exact).
    if descent_dtype == "auto":
        descent_dtype = "bf16" if jax.default_backend() == "tpu" else "f32"
    edt = jnp.bfloat16 if descent_dtype == "bf16" else jnp.float32

    def relax_ball(pos0, trial_ss, caches, site, T=None):
        """FIRE-descend one site's ball (table set ``T``, default the
        main 1-hop ball); returns the full positions with the relaxed
        ball scattered back."""
        T = T_main if T is None else T
        NB, NSub = T["NB"], T["NSub"]
        rows_t, rvalid_t = T["rows_t"], T["rvalid_t"]
        is_ball = T["is_ball"]
        cache_s, cache_v = caches
        alive_full = realize_alive(d, trial_ss)
        type_idx = realize_type_idx(d, trial_ss)
        numbers_full = znums[type_idx] * alive_full.astype(jnp.int32)
        free_full = realize_free_mask(d, trial_ss)

        rows = rows_t[site]                       # (NSub,)
        rvalid = rvalid_t[site]
        # localize the shared candidate table: one scatter builds the
        # global->local row map (padding rows write to the dropped
        # overflow slot; valid rows are unique, so the scatter is
        # deterministic), then the ball rows' candidates gather through it
        loc = jnp.full((Nfull + 1,), -1, jnp.int32).at[
            jnp.where(rvalid, rows, Nfull)
        ].set(jnp.arange(NSub, dtype=jnp.int32))[:Nfull]
        gball = rows[:NB]
        nbr_g = slot_jt[gball]                    # (NB, M) global ids
        nbr = loc[nbr_g]                          # (NB, M) local ids
        nvalid = slot_validt[gball] & (nbr >= 0)
        nbr = jnp.where(nvalid, nbr, 0)
        nshift = shifts_u[slot_shidxt[gball]]     # (NB, M, 3)
        pos_sub0 = pos0[rows]
        alive_sub = alive_full[rows] & rvalid
        numbers_sub = jnp.where(alive_sub, numbers_full[rows], 0)
        free_ball = free_full[rows] & rvalid & is_ball
        alive_ball = alive_sub[:NB]
        emask = nvalid & alive_sub[nbr] & alive_ball[:, None]
        # topology-once rank-select (reference dynamics.py:129 semantics,
        # the same policy RelaxConfig.refresh_edges="once" applies on the
        # full path): keep the max_neighbors nearest candidates at the
        # start geometry — the candidate table's full M (built with the
        # relax slack) is ~3x wider, and every descent force evaluation
        # would otherwise pay routing work proportional to it
        m_sel = min(int(cfg.max_neighbors), nbr.shape[1])
        if m_sel < nbr.shape[1]:
            disp0 = pos_sub0[nbr] + nshift - pos_sub0[:NB, None, :]
            d0 = jnp.sqrt(jnp.maximum(jnp.sum(disp0 * disp0, -1), 1e-12))
            score = jnp.where(emask, -d0, -jnp.inf)
            _, sel = jax.lax.top_k(score, m_sel)            # (NB, m_sel)
            nbr = jnp.take_along_axis(nbr, sel, axis=1)
            nshift = jnp.take_along_axis(
                nshift, sel[..., None], axis=1)
            emask = jnp.take_along_axis(emask, sel, axis=1)
        # routing one-hot (position-independent; built once per move)
        onehot = (jax.nn.one_hot(nbr, NSub, dtype=pos0.dtype)
                  * emask[..., None].astype(pos0.dtype))
        fmask_e = emask[..., None].astype(edt)

        def make_router(oh, idx):
            """Neighbor-feature routing as bf16 one-hot MXU matmuls in
            BOTH directions. Profiled alternatives on v5e: a gather
            forward runs at ~8 GB/s effective (row-gather rate-limited —
            48.7 ms per 2x2 ball call and there are four of them), while
            the dense one-hot contraction at single-pass bf16 is MXU
            work that takes ~3 ms for the same routing. The backward
            contracts only the BALL columns: the ring argument is frozen
            by design (far-field features never receive descent
            gradients), so the dominant bwd matmul shrinks by NSub/NB."""
            oh_e = oh.astype(edt)
            oh_ball = oh_e[..., :NB]

            @jax.custom_vjp
            def route(x_ball, x_ring):
                xf = jnp.concatenate([x_ball, x_ring], axis=0).astype(edt)
                return jnp.einsum("nmj,jf->nmf", oh_e, xf, precision=rp)

            def fwd(x_ball, x_ring):
                return route(x_ball, x_ring), x_ring

            def bwd(x_ring, dy):
                dball = jnp.einsum("nmj,nmf->jf", oh_ball,
                                   dy.astype(edt), precision=rp,
                                   preferred_element_type=jnp.float32)
                return (dball, jnp.zeros_like(x_ring))

            route.defvjp(fwd, bwd)
            return route

        if use_split_router:
            route = make_router(onehot, nbr)
        else:
            def route(x_ball, x_ring):
                xf = jnp.concatenate([x_ball, jax.lax.stop_gradient(x_ring)],
                                     axis=0)
                return jnp.einsum("nmj,jf->nmf", onehot, xf,
                                  precision=rp).astype(edt)
        # frozen layer-input features of the subproblem rows; vector
        # caches converted to the kernels' x-major vcat layout (NSub, 3F)
        # so every descent op is either an (., F) matmul or a lane-wide
        # elementwise reduce — no x=3-thin MXU shapes anywhere
        cs = cache_s[:, :, rows]                  # (Mm, L, NSub, F)
        cv = jnp.swapaxes(cache_v[:, :, rows], -1, -2).reshape(
            cache_v.shape[0], L, rows.shape[0], 3 * F)  # (Mm, L, NSub, 3F)
        s0_all = jax.vmap(
            lambda p: jnp.where(
                alive_sub[:, None],
                p["atom_embed"][jnp.clip(numbers_sub, 0, cfg.max_z - 1)],
                0.0).astype(pos0.dtype)
        )(params)                                 # (Mm, NSub, F)
        # layer-0 message inputs are position-INDEPENDENT (embeddings),
        # so the routed phi_j of layer 0 is a per-move constant — hoist
        # it out of the descent loop (and v == 0 kills the vj route at
        # layer 0 entirely): one third of the per-iteration routing work
        # and its backward disappear. Same observation as the fused
        # layer-1 species-table kernel (ops/pallas_painn._msg_kernel_l1).
        with jax.default_matmul_precision("float32"):
            def l0_phij(p, s0):
                mp0 = p["message"][0]
                phi0 = _dense(mp0["inv_dense1"],
                              jax.nn.silu(_dense(mp0["inv_dense0"], s0)))
                return jax.lax.stop_gradient(
                    (phi0[nbr] * fmask_e).astype(edt))
            phij0_all = jax.vmap(l0_phij)(params, s0_all)  # (Mm, NB, M, 3F)

            # ring rows' phi at layers >= 1 is ALSO a per-move constant
            # (their layer inputs are the frozen caches): hoist it so the
            # in-loop phi dense runs on ball rows only and the router's
            # backward contracts ball columns only
            def ring_phis(p, cs_m):
                outs = []
                for li, mp in enumerate(p["message"]):
                    outs.append(_dense(
                        mp["inv_dense1"],
                        jax.nn.silu(_dense(mp["inv_dense0"],
                                           cs_m[li, NB:]))))
                return jax.lax.stop_gradient(jnp.stack(outs))  # (L, NR, 3F)

            phi_ring_all = jax.vmap(
                lambda p, c: ring_phis(p, c))(params, cs)

        def local_energy(pos_sub):
            disp = pos_sub[nbr] + nshift - pos_sub[:NB, None, :]
            d2 = jnp.sum(disp * disp, axis=-1)
            dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
            dist = jnp.where(emask, dist, cfg.cutoff)
            disp = jnp.where(emask[..., None], disp, 0.0)
            unit = disp / jnp.maximum(dist, 1e-8)[..., None]
            rbf = _rbf(dist, cfg.n_rbf, cfg.cutoff)
            env = _cosine_envelope(dist, cfg.cutoff)[..., None]
            env = env * emask[..., None].astype(env.dtype)

            # the c_unit * r_hat term with a controlled backward: the
            # naive repeat(unit, F) formulation's VJP materializes the
            # (chains, NB, M, 3, 3F) cotangent in f32 (profiled ~90 ms
            # per 2x2 ball call); these contractions keep every
            # intermediate small
            @jax.custom_vjp
            def unit_term(c_unit, unit_):
                out = jnp.einsum("nmf,nmx->nxf", c_unit,
                                 unit_.astype(edt),
                                 preferred_element_type=jnp.float32)
                return out.reshape(unit_.shape[0], 3 * F)

            def _ut_fwd(c_unit, unit_):
                return unit_term(c_unit, unit_), (c_unit, unit_)

            def _ut_bwd(res, dy):
                c_unit, unit_ = res
                dy3 = dy.reshape(dy.shape[0], 3, F).astype(edt)
                dc = jnp.einsum("nxf,nmx->nmf", dy3, unit_.astype(edt),
                                preferred_element_type=jnp.float32)
                du = jnp.einsum("nxf,nmf->nmx", dy3, c_unit,
                                preferred_element_type=jnp.float32)
                return dc.astype(edt), du

            unit_term.defvjp(_ut_fwd, _ut_bwd)

            def one_member(p, cs_m, cv_m, s0, phij0, phi_ring_m):
                s_ball = s0[:NB]                          # (NB, F)
                vcat_ball = jnp.zeros((NB, 3 * F), pos0.dtype)
                rbf_e = rbf.astype(edt)
                env_e = env.astype(edt)
                for li, (mp, up) in enumerate(
                        zip(p["message"], p["update"])):
                    # radial filter in edt end-to-end: an f32 w behind an
                    # .astype(edt) forces the backward to materialize the
                    # full (chains, members, NB, M, 3F) cotangent in f32
                    # (profiled ~150 ms per 2x2 ball call)
                    dwe = {"w": mp["dist_embed"]["w"].astype(edt),
                           "b": mp["dist_embed"]["b"].astype(edt)}
                    w = _dense(dwe, rbf_e) * env_e           # (NB, M, 3F)
                    # routing: bf16 one-hot MXU dense in both directions
                    # (make_router; the bwd contracts ball columns only).
                    # The one-hot operand is exact in bf16 and the payload
                    # rounding only perturbs DESCENT forces — the
                    # acceptance energy is a separate full-cell f32
                    # evaluation, and the resulting policy perturbation
                    # is measured by the ffdiv protocol
                    # (tools/bench_all.py).
                    if li == 0:
                        phij = phij0
                    else:
                        phi_ball = _dense(
                            mp["inv_dense1"],
                            jax.nn.silu(_dense(mp["inv_dense0"], s_ball)))
                        phij = route(phi_ball, phi_ring_m[li])
                    inv = phij * w                   # (NB, M, 3F) in edt
                    c_vv, c_s, c_unit = jnp.split(inv, 3, axis=-1)
                    ds = jnp.sum(c_s, axis=1, dtype=jnp.float32)
                    # vector messages, x-major: dv = c_vv * v_j + c_unit *
                    # r_hat per x block (v == 0 at layer 0; the r_hat term
                    # runs through unit_term's controlled VJP)
                    ut = unit_term(c_unit, unit)                 # (NB, 3F)
                    if li == 0:
                        dvcat = ut
                    else:
                        vj = route(vcat_ball, cv_m[li, NB:])     # (NB, M, 3F)
                        cvv3 = jnp.concatenate([c_vv, c_vv, c_vv], axis=-1)
                        dvcat = ut + jnp.sum(cvv3 * vj, axis=1,
                                             dtype=jnp.float32)  # (NB, 3F)
                    s_ball = s_ball + ds
                    vcat_ball = vcat_ball + dvcat
                    # update block in vcat layout: f-mixing matmuls act per
                    # x block — one (3NB, F) @ (F, F) shaped matmul each
                    v3 = vcat_ball.reshape(NB, 3, F)
                    uv = jnp.einsum("nxf,fg->nxg", v3, up["u_mat"]["w"])
                    vv = jnp.einsum("nxf,fg->nxg", v3, up["v_mat"]["w"])
                    vv_norm = jnp.sqrt(jnp.sum(vv * vv, axis=1) + 1e-16)
                    stack = jnp.concatenate([s_ball, vv_norm], axis=-1)
                    a = _dense(up["s_dense1"],
                               jax.nn.silu(_dense(up["s_dense0"], stack)))
                    a_vv, a_sv, a_ss = jnp.split(a, 3, axis=-1)
                    inner = jnp.sum(uv * vv, axis=1)             # (NB, F)
                    s_ball = s_ball + a_sv * inner + a_ss
                    v3 = v3 + a_vv[:, None, :] * uv
                    s_ball = jnp.where(alive_ball[:, None], s_ball, 0.0)
                    v3 = jnp.where(alive_ball[:, None, None], v3, 0.0)
                    vcat_ball = v3.reshape(NB, 3 * F)
                h = jax.nn.silu(_dense(p["readout"]["dense0"], s_ball))
                e_atom = _dense(p["readout"]["dense1"], h)[..., 0]
                e_atom = jnp.where(alive_ball, e_atom, 0.0)
                return jnp.sum(e_atom)

            with jax.default_matmul_precision("float32"):
                # remat: the descent runs inside value_and_grad inside a
                # vmapped while_loop — storing each layer's (NB, M, 3F)
                # message residuals per member per chain for the backward
                # OOMs past ~16 chains at 2x2 (measured 27 GB at 32).
                # Recomputing the member forward on the backward pass
                # trades ~1/3 more FLOPs for O(layer-inputs) residency.
                member = (jax.checkpoint(one_member) if use_remat
                          else one_member)
                e_m = jax.vmap(member)(params, cs, cv, s0_all, phij0_all,
                                       phi_ring_all)
            e = jnp.mean(e_m)
            if cfg.excl_vol:
                xmask = emask & (dist < cfg.cutoff)
                r_pow = (cfg.sigma / jnp.maximum(dist, 1e-3)) ** cfg.power
                e = e + jnp.sum(jnp.where(xmask, r_pow, 0.0))
            return e * factor

        res = fire_relax(local_energy, pos_sub0, free_ball, fire_cfg)
        delta = jnp.where(free_ball[:, None], res.positions - pos_sub0, 0.0)
        return pos0.at[rows].add(delta)

    def finish(pos, trial_ss):
        """Full-cell acceptance evaluation + fresh caches (standard edge
        path — the identical evaluator the full relax engine scores
        with, so acceptance energies carry no locality error)."""
        alive = realize_alive(d, trial_ss)
        type_idx = realize_type_idx(d, trial_ss)
        counts = element_counts(d, trial_ss, dtype=pos.dtype)
        e_bound = jnp.asarray(energy_threshold(pos.shape[0]), pos.dtype)
        outs = outputs(pos, type_idx, alive, d.shifts, collect_layers=True)
        e_pot = outs["energy"] * factor + _comp_offset(type_idx, alive, pos.dtype)
        oob = (jnp.abs(e_pot) > e_bound) | jnp.isnan(e_pot)
        e_pot = jnp.where(oob, e_bound, e_pot)
        se = sfn(e_pot, counts)
        se = jnp.where(oob, e_bound, se)
        ls, lv = outs["layer_s"], outs["layer_v"]
        if not pack["ensemble"]:
            ls, lv = ls[None], lv[None]
        st = StateEnergy(surface_energy=se, potential_energy=e_pot,
                         positions=pos, oob=oob)
        return st, (ls, lv)

    _comp_offset_fn = hooks.get("ff_comp_offset")

    def _comp_offset(type_idx, alive, dtype):
        if _comp_offset_fn is None:
            return jnp.asarray(0.0, dtype)
        return _comp_offset_fn(type_idx, alive, dtype)

    def start_positions(trial_ss, pos_prev, sites2):
        """pos_prev with the moved sites' slots reset to the trial code's
        lattice template (reference add/change semantics)."""
        lat = realize_positions(d, trial_ss)
        pos0 = pos_prev.astype(lat.dtype)
        for i in range(2):
            start = P + sites2[i] * G
            pos0 = jax.lax.dynamic_update_slice(
                pos0, jax.lax.dynamic_slice(lat, (start, 0), (G, 3)),
                (start, 0))
        return pos0

    def evaluate1(trial_ss, pos_prev, caches, site):
        sites2 = jnp.stack([site, site]).astype(jnp.int32)
        pos0 = start_positions(trial_ss, pos_prev, sites2)
        if T_seat is not None:
            pos0 = relax_ball(pos0, trial_ss, caches, site, T=T_seat)
        pos = relax_ball(pos0, trial_ss, caches, site)
        return finish(pos, trial_ss)

    def evaluate(trial_ss, pos_prev, caches, sites2):
        pos0 = start_positions(trial_ss, pos_prev, sites2)
        if T_seat is not None:
            pos0 = relax_ball(pos0, trial_ss, caches, sites2[0], T=T_seat)
            pos0 = relax_ball(pos0, trial_ss, caches, sites2[1], T=T_seat)
        pos = relax_ball(pos0, trial_ss, caches, sites2[0])
        pos = relax_ball(pos, trial_ss, caches, sites2[1])
        return finish(pos, trial_ss)

    evaluate.evaluate1 = evaluate1
    evaluate.relax_ball = relax_ball
    evaluate.finish = finish
    return evaluate


class FFState(NamedTuple):
    """Chain state: MCState + the frozen-far-field feature caches."""

    site_state: jnp.ndarray
    energy: jnp.ndarray
    relaxed_positions: jnp.ndarray
    key: jax.Array
    cache_s: jnp.ndarray      # (Mm, L, N, F)
    cache_v: jnp.ndarray      # (Mm, L, N, F, 3)


def make_ff_init(d: DeviceSpec, evaluate: Callable,
                 full_state_energy: Callable) -> Callable:
    """``init(key, site_state) -> FFState``: one full relaxed evaluation
    (the exact from-ideal path) seeds positions/energy, then the finish
    pass collects the caches at that geometry."""

    def init(key, site_state):
        e0 = full_state_energy(site_state)
        st, caches = evaluate.finish(e0.positions, site_state)
        return FFState(site_state=site_state, energy=st.surface_energy,
                       relaxed_positions=st.positions, key=key,
                       cache_s=caches[0], cache_v=caches[1])

    return init


def _select_state(accept, trial_ss, st, caches, state: FFState, key):
    return FFState(
        site_state=jnp.where(accept, trial_ss, state.site_state),
        energy=jnp.where(accept, st.surface_energy, state.energy),
        relaxed_positions=jnp.where(accept, st.positions,
                                    state.relaxed_positions),
        key=key,
        cache_s=jnp.where(accept, caches[0], state.cache_s),
        cache_v=jnp.where(accept, caches[1], state.cache_v),
    )


def make_ff_semigrand_step(
    d: DeviceSpec, evaluate: Callable, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Metropolis semigrand Change step with frozen-far-field ball
    descent (proposal semantics and key-split structure identical to
    core/local_relax.py's step, so the two engines can be driven by the
    same proposal stream for divergence measurement)."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.incremental import _make_dist_accept

    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: FFState, temp):
        key, k_site, k_code, k_acc = jax.random.split(state.key, 4)
        site = jax.random.randint(k_site, (), 0, n_sites)
        cur = state.site_state[site]
        u = jax.random.randint(k_code, (), 0, n_codes - 1)
        end = u + (u >= cur).astype(u.dtype)
        trial_ss = change_site(state.site_state, site, end)
        st, caches = evaluate.evaluate1(
            trial_ss, state.relaxed_positions,
            (state.cache_s, state.cache_v), site)
        accept = metropolis_accept(k_acc, state.energy, st.surface_energy,
                                   temp)
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = _select_state(accept, trial_ss, st, caches, state, key)
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=st.oob)
        return new_state, info

    return step


def make_ff_canonical_step(
    d: DeviceSpec, evaluate: Callable, criterion: str = "metropolis",
    filter_distance: float = 1.5,
) -> Callable:
    """Canonical Exchange step (two sequential ball descents — the second
    ball sees the first's relaxed geometry, frozen features throughout;
    symmetric unweighted proposal as core/events.py's default)."""
    from surface_sampling_tpu.core.events import StepInfo, metropolis_accept
    from surface_sampling_tpu.core.incremental import _make_dist_accept

    n_sites = d.site_coords.shape[0]
    n_codes = d.n_codes
    dist_accept = _make_dist_accept(d, criterion, filter_distance)

    def step(state: FFState, temp):
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
        st, caches = evaluate(trial_ss, state.relaxed_positions,
                              (state.cache_s, state.cache_v), sites2)
        accept = metropolis_accept(k_acc, state.energy, st.surface_energy,
                                   temp) & valid
        if dist_accept is not None:
            accept = accept & dist_accept(trial_ss)
        new_state = _select_state(accept, trial_ss, st, caches, state, key)
        info = StepInfo(accepted=accept, energy=new_state.energy,
                        n_ads=num_occupied_sites(new_state.site_state),
                        oob=st.oob)
        return new_state, info

    return step


def make_ff_run_mcstate(evaluate: Callable, step_fn: Callable,
                        sweep_size: int,
                        record_positions: bool = True) -> Callable:
    """MCState-boundary runner for the CLI chunk/checkpoint machinery:
    checkpoints stay (site_state, energy, relaxed_positions, key) — the
    caches are rebuilt deterministically from the carried geometry at
    every chunk start (one finish pass per chain), so chunking and
    bitwise ``--resume`` semantics are identical to the exact
    local-relax engine's."""
    from surface_sampling_tpu.core.state import MCState

    inner = make_ff_run(step_fn, sweep_size, record_positions)

    def run(state: MCState, temps):
        _, caches = evaluate.finish(state.relaxed_positions,
                                    state.site_state)
        ff = FFState(site_state=state.site_state, energy=state.energy,
                     relaxed_positions=state.relaxed_positions,
                     key=state.key, cache_s=caches[0], cache_v=caches[1])
        out, rec = inner(ff, temps)
        return MCState(site_state=out.site_state, energy=out.energy,
                       relaxed_positions=out.relaxed_positions,
                       key=out.key), rec

    return run


def make_ff_run(step_fn: Callable, sweep_size: int,
                record_positions: bool = True) -> Callable:
    """``run(state, temps) -> (state, SweepRecord)`` — record schema
    identical to core.engine.make_run_fn (the CLI chain/chunk/checkpoint
    machinery applies unchanged; caches ride the state pytree)."""
    from surface_sampling_tpu.core.engine import SweepRecord, make_sweep_fn

    sweep_fn = make_sweep_fn(step_fn, sweep_size)

    def run(state, temps):
        def body(s, temp):
            s, infos = sweep_fn(s, temp)
            rec = SweepRecord(
                site_state=s.site_state,
                energy=s.energy,
                accept_rate=jnp.mean(infos.accepted.astype(jnp.float32)),
                n_ads=num_occupied_sites(s.site_state),
                positions=s.relaxed_positions
                if record_positions
                else jnp.zeros((0, 3), s.relaxed_positions.dtype),
                oob_rate=jnp.mean(infos.oob.astype(jnp.float32)),
            )
            return s, rec

        return jax.lax.scan(body, state, temps)

    return run
