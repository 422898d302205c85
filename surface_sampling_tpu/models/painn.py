"""PaiNN equivariant message-passing network in pure JAX.

The reference's flagship neural force field (PaiNN via the external `nff`
torch package: pyproject.toml:17, scripts/sample_surface.py:166-175). This
is a from-scratch JAX implementation of the published architecture
(Schuett, Unke & Gastegger, "Equivariant message passing for the prediction
of tensorial properties and molecular spectra", ICML 2021), dimensioned to
load the reference's trained checkpoints (feat 128, 20 Bessel RBFs, cosine
envelope, 3 message/update blocks, 2-layer readout; see
models/convert_nff.py for the weight port):

  * scalar features s: (N, F); vector features v: (N, F, 3), init 0.
  * message:  phi = Dense(silu(Dense(s_j)));  W = Dense(RBF(d)) * f_cut(d)
              [both (E, 3F)]; split into (dv_vj, ds, dv_unit) channels:
              ds_i   = sum_j  phi1 W1
              dv_i   = sum_j (phi0 W0) v_j + (phi2 W2) r_hat
  * update:   Uv, Vv (F-mixing, no bias); a = MLP([s, |Vv|]) -> 3 chunks
              dv = a0 * Uv;  ds = a1 * <Uv, Vv> + a2
  * readout:  per-atom MLP 128 -> 64 -> 1, sum-pooled.
  * optional excluded-volume repulsion sum_pairs (sigma/d)^power — the nff
    extension enabled in the reference's SrTiO3 models (excl_vol=True,
    power=12, sigma=1.5 in the checkpoint attrs).

Edges are a padded (N, M) neighbor list, so every block is a dense batched
matmul on the MXU. Energies are in the training units (kcal/mol for the
reference checkpoints); unit conversion happens in the calculator adapter
(models/nn_calculator.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.ops.neighbors import neighbor_list


@dataclass(frozen=True)
class PaiNNConfig:
    feat_dim: int = 128
    n_rbf: int = 20
    cutoff: float = 5.0
    n_layers: int = 3
    max_z: int = 100
    excl_vol: bool = False
    power: float = 12.0
    sigma: float = 1.5
    readout_hidden: int = 64
    max_neighbors: int = 64
    # neighbor-feature routing: "gather" indexes per-edge (best on CPU and
    # for large cells), "dense" reformulates the gathers as one-hot
    # matmuls on the MXU (f32-precision dot_generals; ~1.7x faster on TPU
    # v5e up to ~300 slots, then the O(N^2 M) term loses to the gather's
    # O(N M)), "pallas" fuses the whole message block into a VMEM-resident
    # kernel (ops/pallas_painn.py — fastest on TPU at every measured
    # size), "auto" picks per backend.
    message_mode: str = "auto"
    # routing precision inside the pallas kernel: "bf16x2" (hi+lo split
    # dots; ~1.2x faster end-to-end, error = a few-meV constant offset
    # with <=2e-4 eV state-to-state spread on the SrTiO3 ensemble) or
    # "f32" (bit-identical to the dense path).
    pallas_routing: str = "bf16x2"


# ----------------------------------------------------------------------
# Parameter init (for training / tests; converted checkpoints override)
# ----------------------------------------------------------------------
def _dense_init(key, n_in, n_out, bias=True):
    k1, _ = jax.random.split(key)
    scale = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(k1, (n_in, n_out), minval=-scale, maxval=scale)}
    if bias:
        p["b"] = jnp.zeros(n_out)
    return p


def init_painn(key, cfg: PaiNNConfig):
    F = cfg.feat_dim
    keys = jax.random.split(key, 4 + 6 * cfg.n_layers)
    params = {"atom_embed": jax.random.normal(keys[0], (cfg.max_z, F)) * 0.1}
    params["message"] = []
    params["update"] = []
    ki = 1
    for _ in range(cfg.n_layers):
        params["message"].append(
            {
                "inv_dense0": _dense_init(keys[ki], F, F),
                "inv_dense1": _dense_init(keys[ki + 1], F, 3 * F),
                "dist_embed": _dense_init(keys[ki + 2], cfg.n_rbf, 3 * F),
            }
        )
        params["update"].append(
            {
                "u_mat": _dense_init(keys[ki + 3], F, F, bias=False),
                "v_mat": _dense_init(keys[ki + 4], F, F, bias=False),
                "s_dense0": _dense_init(keys[ki + 5], 2 * F, F),
                "s_dense1": _dense_init(jax.random.fold_in(keys[ki + 5], 1), F, 3 * F),
            }
        )
        ki += 6
    params["readout"] = {
        "dense0": _dense_init(keys[ki], F, cfg.readout_hidden),
        "dense1": _dense_init(keys[ki + 1], cfg.readout_hidden, 1),
    }
    return params


def _dense(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _rbf(d, n_rbf, cutoff):
    """Bessel/sinc radial basis: sin(n pi d / rc) / d (DimeNet/PaiNN)."""
    n = jnp.arange(1, n_rbf + 1, dtype=d.dtype)
    dsafe = jnp.maximum(d, 1e-8)[..., None]
    return jnp.sin(n * jnp.pi * dsafe / cutoff) / dsafe


def _cosine_envelope(d, cutoff):
    return jnp.where(d < cutoff, 0.5 * (jnp.cos(jnp.pi * d / cutoff) + 1.0), 0.0)


def painn_edges(cfg: PaiNNConfig, positions, alive, shifts):
    """Precompute the padded edge set (shared across ensemble members —
    the geometry is member-independent, so the top_k neighbor search and
    RBF expansion run once per structure, not once per member).

    Returns (disp, d, nbr_j, nbr_mask, overflow); ``overflow`` is True when
    an atom had more in-range neighbors than ``cfg.max_neighbors`` — the
    energy is then clamped upward so the MC rejects the (over-crowded)
    state instead of silently using a truncated graph."""
    return neighbor_list(positions, shifts, alive, cfg.cutoff, cfg.max_neighbors)


def resolve_message_mode(cfg: PaiNNConfig) -> str:
    if cfg.message_mode != "auto":
        return cfg.message_mode
    return "gather" if jax.default_backend() == "cpu" else "pallas"


def prepare_message_geometry(cfg: PaiNNConfig, positions, edges, band=None):
    """Pad + flatten the edge geometry for the fused Pallas message kernel
    (ops/pallas_painn.prepare_fused_geometry) — layer- AND member-
    invariant, so ensemble callers build it once per structure instead of
    once per member (ensemble.ensemble_apply). Only meaningful when the
    resolved message mode is "pallas".

    ``band`` (ops.banding.RoutingBand or staged DeviceBand, optional)
    switches the fused kernel to block-banded routing — the supercell
    fast path (routing dots of width W instead of n_pad)."""
    from surface_sampling_tpu.ops.pallas_painn import prepare_fused_geometry

    disp, d, nbr_j, nbr_mask, _overflow = edges
    dsafe = jnp.maximum(d, 1e-8)
    unit = disp / dsafe[..., None]                               # (N, M, 3)
    rbf = _rbf(d, cfg.n_rbf, cfg.cutoff)                         # (N, M, R)
    env = _cosine_envelope(d, cfg.cutoff)[..., None]             # (N, M, 1)
    return prepare_fused_geometry(unit, rbf, env, nbr_j, nbr_mask, cfg.n_rbf,
                                  band=band)


def _painn_update(up, s, v, alive):
    """PaiNN update block (per-atom; shared by the message-layer paths)."""
    uv = jnp.einsum("nfx,fg->ngx", v, up["u_mat"]["w"])      # (N, F, 3)
    vv = jnp.einsum("nfx,fg->ngx", v, up["v_mat"]["w"])
    vv_norm = jnp.sqrt(jnp.sum(vv * vv, axis=-1) + 1e-16)    # (N, F)
    stack = jnp.concatenate([s, vv_norm], axis=-1)           # (N, 2F)
    a = _dense(up["s_dense1"], jax.nn.silu(_dense(up["s_dense0"], stack)))
    a_vv, a_sv, a_ss = jnp.split(a, 3, axis=-1)
    inner = jnp.sum(uv * vv, axis=-1)                        # (N, F)
    s = s + a_sv * inner + a_ss
    v = v + a_vv[..., None] * uv
    s = jnp.where(alive[:, None], s, 0.0)
    v = jnp.where(alive[:, None, None], v, 0.0)
    return s, v


def _painn_features_rigid(params, cfg: PaiNNConfig, numbers, alive, msg_geom,
                          l1_types, N):
    """Forward-only fast trunk for the rigid static-edge MC path: the
    whole layer stack runs in padded (and, when banded, SORTED) row
    layout with every block fused — layer 1 via the species-table kernel
    (_msg_kernel_l1), layers 2+ via the general fused message kernel,
    and every update block via the fused update kernel
    (painn_update_fused) — so no per-layer pad/permute/stack and no XLA
    HBM round-trips between blocks. Exactly the math of the general
    painn_features pallas path (parity pinned in tests/test_static_edges
    and tests/test_painn); gated out of "f32" bitwise-parity routing and
    of every differentiated path by the caller."""
    from surface_sampling_tpu.ops.pallas_painn import (
        choose_message_block,
        painn_message_fused,
        painn_message_fused_banded,
        painn_message_l1,
        painn_message_l1_banded,
        painn_update_fused,
    )

    rbf_p, envm_p, nbr_p, unit_p, n_pad, dband = msg_geom
    F = cfg.feat_dim
    pad_n, r_pad = n_pad - N, rbf_p.shape[1]
    n_blk = choose_message_block(n_pad)
    routing = cfg.pallas_routing
    dtype = rbf_p.dtype

    types_np = np.asarray(l1_types, np.int32)
    sp8 = (numbers[:, None] == jnp.asarray(types_np)[None, :]).astype(dtype)
    sp8 = jnp.pad(sp8, ((0, pad_n), (0, 8 - types_np.shape[0])))
    s = params["atom_embed"][jnp.clip(numbers, 0, cfg.max_z - 1)]
    s = jnp.where(alive[:, None], s, 0.0).astype(dtype)
    s = jnp.pad(s, ((0, pad_n), (0, 0)))
    alive_col = jnp.pad(alive.astype(dtype), (0, pad_n))[:, None]
    inv_perm = None
    halo = 0
    if dband is not None:
        sp8 = sp8[dband.perm]
        s = s[dband.perm]
        alive_col = alive_col[dband.perm]
        inv_perm = dband.inv_perm
        halo = dband.halo
    vcat = jnp.zeros((n_pad, 3 * F), dtype)

    mp0 = params["message"][0]
    s_rows = params["atom_embed"][np.clip(types_np, 0, cfg.max_z - 1)]
    phi_t = _dense(mp0["inv_dense1"],
                   jax.nn.silu(_dense(mp0["inv_dense0"], s_rows)))
    philt = jnp.pad(phi_t[:, F:], ((0, 8 - types_np.shape[0]), (0, 0)))
    dw2 = jnp.pad(mp0["dist_embed"]["w"][:, F:],
                  ((0, r_pad - cfg.n_rbf), (0, 0)))
    db2 = mp0["dist_embed"]["b"][None, F:]

    for li, (mp, up) in enumerate(zip(params["message"], params["update"])):
        if li == 0:
            if dband is None:
                ds_p, dv3 = painn_message_l1(
                    sp8, philt, rbf_p, envm_p, nbr_p, unit_p, dw2, db2,
                    n_blk, routing)
            else:
                sp8_h = jnp.concatenate([sp8, sp8[:halo]]) if halo else sp8
                ds_p, dv3 = painn_message_l1_banded(
                    sp8_h, philt, rbf_p, envm_p, nbr_p, unit_p, dw2, db2,
                    dband.win_start, n_blk, dband.window, n_pad, routing)
        else:
            phi = _dense(mp["inv_dense1"],
                         jax.nn.silu(_dense(mp["inv_dense0"], s)))
            dw = jnp.pad(mp["dist_embed"]["w"],
                         ((0, r_pad - cfg.n_rbf), (0, 0)))
            db = mp["dist_embed"]["b"][None, :]
            if dband is None:
                ds_p, dv3 = painn_message_fused(
                    phi, vcat, rbf_p, envm_p, nbr_p, unit_p, dw, db,
                    n_blk, routing)
            else:
                phi_h = jnp.concatenate([phi, phi[:halo]]) if halo else phi
                vc_h = jnp.concatenate([vcat, vcat[:halo]]) if halo else vcat
                ds_p, dv3 = painn_message_fused_banded(
                    phi_h, vc_h, rbf_p, envm_p, nbr_p, unit_p, dw, db,
                    dband.win_start, n_blk, dband.window, n_pad, routing)
        s = s + ds_p
        vcat = vcat + jnp.concatenate([dv3[0], dv3[1], dv3[2]], axis=1)
        s, vcat = painn_update_fused(s, vcat, up, alive_col, routing)

    if inv_perm is not None:
        s = s[inv_perm]
    return s[:N]


def painn_features(params, cfg: PaiNNConfig, positions, numbers, alive, shifts,
                   edges=None, msg_geom=None, band=None, collect_layers=False,
                   l1_types=None):
    """Run the trunk; returns per-atom scalar features s (N, F) and the
    edge data used (for diagnostics). ``msg_geom`` optionally supplies a
    precomputed :func:`prepare_message_geometry` result (pallas mode
    only; ensemble members share it); ``band`` switches the fused kernel
    to block-banded routing (ignored when msg_geom is given — the band
    is already baked into it).

    ``collect_layers`` additionally returns the INPUT features of every
    message block — stacked s_in (L, N, F) and v_in (L, N, F, 3) — the
    caches core/incremental.py's delta-evaluation MC path maintains.

    ``l1_types`` (static tuple of atomic numbers, pallas mode only):
    enables the fused layer-1 fast kernel (ops/pallas_painn.py
    _msg_kernel_l1) — exact at layer 1, where v == 0 kills the vcat
    route and the embedding-valued s makes phi a per-species table.
    Forward-only (the kernel carries no VJP); pass it only on
    non-differentiated paths (the rigid static-edge MC hot loop)."""
    params = jax.tree.map(jnp.asarray, params)  # host numpy -> device consts
    F = cfg.feat_dim
    N = positions.shape[0]
    if l1_types is not None and len(l1_types) > 8:
        # the layer-1 species-table kernel packs the one-hot into 8 lanes;
        # wider specs fall back to the general fused kernel instead of
        # tripping a negative pad width at trace time
        l1_types = None
    disp, d, nbr_j, nbr_mask, _overflow = (
        edges if edges is not None else painn_edges(cfg, positions, alive, shifts)
    )

    mode = cfg.message_mode
    if mode == "auto":
        # dense replaces O(N*M) gathers with O(N^2*M) one-hot matmuls —
        # a large win while the MXU has headroom, a loss once the N^2
        # term dominates. Measured on v5e (3-member SrTiO3 ensemble,
        # atom-evals/s dense vs gather): 124 slots 81k vs 48k, 248 slots
        # 58k vs 49k, 496 slots 33k vs 47k -> crossover ~300 slots.
        # "pallas" fuses the whole message block into a VMEM-resident
        # kernel (ops/pallas_painn.py) and beats both on TPU.
        on_cpu = jax.default_backend() == "cpu"
        mode = "gather" if on_cpu else "pallas"
    hp = jax.lax.Precision.HIGHEST   # keep the one-hot matmuls true-f32
    if mode != "pallas":
        fmask = nbr_mask.astype(positions.dtype)[..., None]      # (N, M, 1)
        dsafe = jnp.maximum(d, 1e-8)
        unit = disp / dsafe[..., None]                           # (N, M, 3)
        rbf = _rbf(d, cfg.n_rbf, cfg.cutoff)                     # (N, M, R)
        env = _cosine_envelope(d, cfg.cutoff)[..., None]         # (N, M, 1)
    onehot = (
        jax.nn.one_hot(nbr_j, N, dtype=positions.dtype) * fmask  # (N, M, N)
        if mode == "dense"
        else None
    )

    s = params["atom_embed"][jnp.clip(numbers, 0, cfg.max_z - 1)]  # (N, F)
    s = jnp.where(alive[:, None], s, 0.0)
    v = jnp.zeros((N, F, 3), positions.dtype)

    l1_pack = None
    if mode == "pallas":
        # fused VMEM-resident message block (ops/pallas_painn.py); the
        # padded edge geometry is layer- and member-invariant, so it is
        # built once per structure (and shared across ensemble members
        # when the caller passes msg_geom)
        from surface_sampling_tpu.ops.pallas_painn import (
            choose_message_block,
            painn_message_fused,
            painn_message_fused_banded,
            painn_message_l1,
            painn_message_l1_banded,
        )

        rbf_p, envm_p, nbr_p, unit_p, n_pad, dband = (
            msg_geom
            if msg_geom is not None
            else prepare_message_geometry(
                cfg, positions, (disp, d, nbr_j, nbr_mask, _overflow),
                band=band)
        )
        pad_n, r_pad = n_pad - N, rbf_p.shape[1]
        n_blk = choose_message_block(n_pad)
        if dband is not None and dband.n_blk != n_blk:
            raise ValueError(
                f"routing band was built for n_blk={dband.n_blk} but the "
                f"kernel uses n_blk={n_blk} at n_pad={n_pad}")
        if (l1_types is not None and not collect_layers
                and cfg.pallas_routing != "f32"):
            # whole-trunk fused fast path (fused update blocks, padded/
            # sorted layout end-to-end); "f32" keeps the bitwise-parity
            # XLA update blocks below
            s = _painn_features_rigid(params, cfg, numbers, alive,
                                      (rbf_p, envm_p, nbr_p, unit_p,
                                       n_pad, dband), l1_types, N)
            return s, (d, nbr_mask)
        if l1_types is not None:
            # layer-1 fast kernel inputs: species one-hot rows (dead
            # slots = numbers 0 match nothing -> all-zero row, killed by
            # envm exactly as the general kernel's masked edges) and the
            # per-species layer-1 phi table, sliced to the live 2F
            # (s, unit) channels — the vv third multiplies v == 0.
            types_arr = jnp.asarray(np.asarray(l1_types, np.int32))
            sp8 = (numbers[:, None] == types_arr[None, :]).astype(
                positions.dtype)                             # (N, T)
            sp8 = jnp.pad(sp8, ((0, pad_n), (0, 8 - types_arr.shape[0])))
            mp0 = params["message"][0]
            s_rows = params["atom_embed"][np.clip(np.asarray(l1_types), 0,
                                                  cfg.max_z - 1)]
            phi_t = _dense(mp0["inv_dense1"],
                           jax.nn.silu(_dense(mp0["inv_dense0"], s_rows)))
            philt = jnp.pad(phi_t[:, F:], ((0, 8 - types_arr.shape[0]), (0, 0)))
            dw2 = jnp.pad(mp0["dist_embed"]["w"][:, F:],
                          ((0, r_pad - cfg.n_rbf), (0, 0)))
            db2 = mp0["dist_embed"]["b"][None, F:]
            l1_pack = (sp8, philt, dw2, db2)

    s_layers, v_layers = [], []
    for li, (mp, up) in enumerate(zip(params["message"], params["update"])):
        if collect_layers:
            s_layers.append(s)
            v_layers.append(v)
        # ---- message block ------------------------------------------------
        if li == 0 and l1_pack is not None:
            # fused layer-1 fast kernel: per-atom phi never materializes
            # (the species table substitutes for it), v == 0 skips the
            # vcat route entirely
            sp8, philt, dw2, db2 = l1_pack
            if dband is None:
                ds_p, dv3 = painn_message_l1(
                    sp8, philt, rbf_p, envm_p, nbr_p, unit_p, dw2, db2,
                    n_blk, cfg.pallas_routing)
            else:
                sp8_s = sp8[dband.perm]
                if dband.halo:
                    sp8_s = jnp.concatenate([sp8_s, sp8_s[:dband.halo]])
                ds_s, dv3_s = painn_message_l1_banded(
                    sp8_s, philt, rbf_p, envm_p, nbr_p, unit_p, dw2, db2,
                    dband.win_start, n_blk, dband.window, n_pad,
                    cfg.pallas_routing)
                ds_p = ds_s[dband.inv_perm]
                dv3 = dv3_s[:, dband.inv_perm]
            ds = ds_p[:N]
            dv = jnp.stack([dv3[0, :N], dv3[1, :N], dv3[2, :N]], axis=-1)
            s = s + ds
            v = v + dv
            s, v = _painn_update(up, s, v, alive)
            continue
        phi = _dense(mp["inv_dense1"], jax.nn.silu(_dense(mp["inv_dense0"], s)))  # (N, 3F)
        if mode == "pallas":
            phi_p = jnp.pad(phi, ((0, pad_n), (0, 0)))
            vcat = jnp.concatenate([v[..., 0], v[..., 1], v[..., 2]], axis=1)
            vcat_p = jnp.pad(vcat, ((0, pad_n), (0, 0)))
            dw = jnp.pad(mp["dist_embed"]["w"], ((0, r_pad - cfg.n_rbf), (0, 0)))
            db = mp["dist_embed"]["b"][None, :]
            if dband is None:
                ds_p, dv3 = painn_message_fused(
                    phi_p, vcat_p, rbf_p, envm_p, nbr_p, unit_p, dw, db,
                    n_blk, cfg.pallas_routing
                )
            else:
                # block-banded supercell path: features in sorted order
                # with the wrap halo appended; outputs mapped back. The
                # surrounding permute/concat ops are plain jnp, so
                # autodiff folds the halo cotangents back automatically.
                phi_s = phi_p[dband.perm]
                vcat_s = vcat_p[dband.perm]
                if dband.halo:
                    phi_s = jnp.concatenate([phi_s, phi_s[:dband.halo]])
                    vcat_s = jnp.concatenate([vcat_s, vcat_s[:dband.halo]])
                ds_s, dv3_s = painn_message_fused_banded(
                    phi_s, vcat_s, rbf_p, envm_p, nbr_p, unit_p, dw, db,
                    dband.win_start, n_blk, dband.window, n_pad,
                    cfg.pallas_routing
                )
                ds_p = ds_s[dband.inv_perm]
                dv3 = dv3_s[:, dband.inv_perm]
            ds = ds_p[:N]                                        # (N, F)
            dv = jnp.stack([dv3[0, :N], dv3[1, :N], dv3[2, :N]], axis=-1)
        else:
            w = _dense(mp["dist_embed"], rbf) * env              # (N, M, 3F)
            if mode == "dense":
                # neighbor features via one-hot matmuls: every per-edge
                # gather becomes a dot_general on the MXU (TPU gathers
                # serialize on the scalar units; these three matmuls cut
                # the SrTiO3 ensemble evaluation from 161 to 102 ms / 64
                # chains on v5e)
                phij = jnp.einsum("nmj,jf->nmf", onehot, phi, precision=hp)
                inv = phij * w                                   # (N, M, 3F)
            else:
                inv = phi[nbr_j] * w * fmask                     # (N, M, 3F)
            c_vv, c_s, c_unit = jnp.split(inv, 3, axis=-1)       # (N, M, F) each
            ds = jnp.sum(c_s, axis=1)                            # (N, F)
            # vector messages as contractions over the neighbor axis — the
            # r_hat term is a batched (F, M) @ (M, 3) matmul on the MXU and
            # neither term materializes a broadcast (N, M, F, 3) product
            # (the naive form was the largest intermediate of the whole
            # net: it capped the chain batch at 64 on a 16 GB chip)
            dv = jnp.einsum("nmf,nmx->nfx", c_unit, unit)        # (N, F, 3)
            if mode == "dense":
                adj = jnp.einsum("nmj,nmf->njf", onehot, c_vv, precision=hp)
                dv = dv + jnp.einsum("njf,jfx->nfx", adj, v, precision=hp)
            else:
                dv = dv + jnp.einsum("nmf,nmfx->nfx", c_vv, v[nbr_j])
        s = s + ds
        v = v + dv
        s, v = _painn_update(up, s, v, alive)

    if collect_layers:
        return s, (d, nbr_mask), (jnp.stack(s_layers), jnp.stack(v_layers))
    return s, (d, nbr_mask)


def painn_apply(params, cfg: PaiNNConfig, positions, numbers, alive, shifts,
                edges=None, msg_geom=None, band=None, l1_types=None,
                collect_layers=False):
    """Full forward: returns dict with per-atom energies (training units),
    total energy, and per-atom embeddings (final scalar features).
    ``collect_layers`` additionally returns the INPUT features of every
    message block (``layer_s`` (L, N, F), ``layer_v`` (L, N, F, 3)) — the
    frozen-far-field caches core/ff_relax.py carries between moves.

    Matmuls run at true f32 precision regardless of the backend default —
    relaxed passes were measured and rejected on the flagship ensemble:
    TPU's single-pass bf16 default shifts random-occupancy surface
    energies by up to 0.69 eV (71 meV state-to-state spread), and
    "tensorfloat32" lowered to the same single-pass error on v5e for a
    ~0.6% speed difference — the wrong trade for energetics either way.
    """
    if edges is None:
        edges = painn_edges(cfg, positions, alive, shifts)
    overflow = edges[4]
    with jax.default_matmul_precision("float32"):
        feats = painn_features(
            params, cfg, positions, numbers, alive, shifts, edges=edges,
            msg_geom=msg_geom, band=band, l1_types=l1_types,
            collect_layers=collect_layers,
        )
        if collect_layers:
            s, (d, nbr_mask), (layer_s, layer_v) = feats
        else:
            s, (d, nbr_mask) = feats
        h = jax.nn.silu(_dense(params["readout"]["dense0"], s))
        e_atom = _dense(params["readout"]["dense1"], h)[..., 0]  # (N,)
    e_atom = jnp.where(alive, e_atom, 0.0)
    if cfg.excl_vol:
        # nff extension: pairwise (sigma/d)^power over directed pairs
        r_pow = (cfg.sigma / jnp.maximum(d, 1e-3)) ** cfg.power
        e_excl = jnp.sum(jnp.where(nbr_mask, r_pow, 0.0), axis=1)
        e_atom = e_atom + e_excl
    # truncated neighbor graphs make energies unreliable: OVERRIDE the
    # total (don't add — the net can emit arbitrarily negative garbage on
    # such inputs, e.g. -1e33 on an every-slot-alive SrTiO3 state, which
    # would swamp an additive penalty and get accepted) so the
    # Metropolis/OOB machinery rejects such states
    e_tot = jnp.where(overflow, jnp.asarray(1e6, e_atom.dtype), jnp.sum(e_atom))
    out = {
        "per_atom_energy": e_atom,
        "energy": e_tot,
        "embedding": s,
        "overflow": overflow,
    }
    if collect_layers:
        out["layer_s"] = layer_s
        out["layer_v"] = layer_v
    return out
