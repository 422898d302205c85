"""MACE-style equivariant model in JAX (third NN family, trainable).

The reference lists MACE among its NN backends (SURVEY §2.2:
"NffScaleMACE") but ships no MACE weights, so there is nothing to port or
bit-validate; this module provides a from-paper MACE-style architecture
(Batatia et al., "MACE: Higher order equivariant message passing neural
networks", NeurIPS 2022) with L_max <= 2 and correlation order nu <= 3,
implemented with the framework's padded-edge formulation so it trains with
models/train.py and serves as a drop-in Potential.

Per layer t, with per-channel atomic bases (k = channel):
    A^0_i,k = sum_j R^0_k(r_ij) (W0 h_j)_k                    (scalars)
    A^1_i,k = sum_j R^1_k(r_ij) rhat_ij (W1 h_j)_k            (l=1, 3 comps)
    A^2_i,k = sum_j R^2_k(r_ij) Y2(rhat_ij) (W2 h_j)_k        (l=2, as a
              3x3 symmetric traceless matrix T per channel)
    B_i     = invariant contractions up to nu = 3:
                A0, A0^2, A0^3,
                |A1|^2, A0 |A1|^2,
                tr(T^2), A0 tr(T^2),
                A1 . T . A1  (CG path (1x1->2).2 -> 0),
                tr(T^3)      (l=2 cubed -> 0)
    h_i    += MLP_t(B_i)                                      (residual)
    E_i^t   = readout_t(h_i)
Energy = sum_t sum_i E_i^t (+ per-element reference energies).

All contractions are exact rotation invariants (verified by the
equivariance tests).

``l_max=3`` adds a rank-3 symmetric-traceless atomic basis
A^3 = sum_j R^3 Y3(rhat) (W3 h_j) with the exact parity-even invariants
|A3|^2, A0 |A3|^2, A3:A1:T (3 x 1 x 2 -> 0) and A3:A3:T; the l=3
features are layer-local (equivariant inter-layer carrying covers
l <= 2).

With ``equivariant_messages=True`` the model carries equivariant node
features across layers the way full MACE does: each node keeps vector
features V (N, F, 3) and (for l_max=2) symmetric-traceless tensor
features T (N, F, 3, 3), and the one-particle basis of layer t+1 includes
every parity-even Clebsch-Gordan path from the neighbors' (h, V, T):

    A0 += sum_j R0v (W0v V_j) . rhat                 (1 x 1 -> 0)
    A1 += sum_j R1v (W1v V_j)                        (1 x 0 -> 1)
        + sum_j R1t (W1t T_j) rhat                   (2 x 1 -> 1)
    A2 += sum_j R2v ST((W2v V_j) o rhat)             (1 x 1 -> 2)
        + sum_j R2t (W2t T_j)                        (2 x 0 -> 2)

with node updates (residual, scalar-gated — gating by invariants keeps
exact equivariance):

    V' = W_vu A1 + g_v(h') V
    T' = W_tu A2 + W_tp ST(A1 o A1) + g_t(h') T      (1 x 1 -> 2 product)

All paths are proper-tensor (parity-even), so the energy stays exactly
O(3)-invariant — the rotation AND mirror invariance tests cover both
modes. The flag defaults to False (layer-local invariant model), which
keeps previously saved npz checkpoints loading bit-identically.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.models.chgnet import polynomial_envelope
from surface_sampling_tpu.ops.neighbors import neighbor_list


@dataclass(frozen=True)
class MACEConfig:
    feat_dim: int = 64
    n_rbf: int = 8
    cutoff: float = 5.0
    n_layers: int = 2
    max_z: int = 94
    max_neighbors: int = 64
    readout_hidden: int = 16
    envelope_p: int = 6
    l_max: int = 2               # 1 or 2
    equivariant_messages: bool = False   # carry V/T node features across layers
    # neighbor-feature routing: "gather" indexes node features per edge
    # (best on CPU), "dense" routes ALL of a layer's neighbor features
    # with ONE one-hot MXU matmul (best on TPU, where (N, M) gathers
    # serialize on the scalar core), "auto" picks per backend.
    message_mode: str = "auto"


def _lin(key, n_in, n_out, bias=True):
    s = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(key, (n_in, n_out), minval=-s, maxval=s)}
    if bias:
        p["b"] = jnp.zeros(n_out)
    return p


def _n_invariants(l_max: int) -> int:
    return {1: 5, 2: 9, 3: 13}[l_max]


def init_mace(key, cfg: MACEConfig):
    """Random-init MACE parameters.

    NOTE on seeded-init reproducibility: the key split is 2 + 26*n_layers
    subkeys (grown from 2 + 9*n_layers when the higher-order product basis
    was added), so a fixed seed yields different weights than pre-l_max>1
    revisions even for default configs. npz checkpoints are unaffected.
    """
    if cfg.l_max not in (1, 2, 3):
        raise ValueError(f"l_max must be 1, 2 or 3, got {cfg.l_max}")
    F, R = cfg.feat_dim, cfg.n_rbf
    keys = jax.random.split(key, 2 + 26 * cfg.n_layers)
    ki = iter(range(len(keys)))
    params = {
        "atom_embed": jax.random.normal(keys[next(ki)], (cfg.max_z, F)) * 0.2,
        "atom_ref": jnp.zeros(cfg.max_z),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        layer = {
            "w0": _lin(keys[next(ki)], F, F, bias=False),
            "w1": _lin(keys[next(ki)], F, F, bias=False),
            "rad0": _lin(keys[next(ki)], R, F),
            "rad1": _lin(keys[next(ki)], R, F),
            "update0": _lin(keys[next(ki)], _n_invariants(cfg.l_max) * F, F),
            "update1": _lin(keys[next(ki)], F, F),
            "readout": _lin(keys[next(ki)], F, 1),
        }
        if cfg.l_max >= 2:
            layer["w2"] = _lin(keys[next(ki)], F, F, bias=False)
            layer["rad2"] = _lin(keys[next(ki)], R, F)
        if cfg.l_max >= 3:
            layer["w3"] = _lin(keys[next(ki)], F, F, bias=False)
            layer["rad3"] = _lin(keys[next(ki)], R, F)
        if cfg.equivariant_messages:
            layer["w0v"] = _lin(keys[next(ki)], F, F, bias=False)
            layer["rad0v"] = _lin(keys[next(ki)], R, F)
            layer["w1v"] = _lin(keys[next(ki)], F, F, bias=False)
            layer["rad1v"] = _lin(keys[next(ki)], R, F)
            layer["v_upd"] = _lin(keys[next(ki)], F, F, bias=False)
            layer["v_gate"] = _lin(keys[next(ki)], F, F)
            if cfg.l_max >= 2:
                layer["w1t"] = _lin(keys[next(ki)], F, F, bias=False)
                layer["rad1t"] = _lin(keys[next(ki)], R, F)
                layer["w2v"] = _lin(keys[next(ki)], F, F, bias=False)
                layer["rad2v"] = _lin(keys[next(ki)], R, F)
                layer["w2t"] = _lin(keys[next(ki)], F, F, bias=False)
                layer["rad2t"] = _lin(keys[next(ki)], R, F)
                layer["t_upd"] = _lin(keys[next(ki)], F, F, bias=False)
                layer["t_prod"] = _lin(keys[next(ki)], F, F, bias=False)
                layer["t_gate"] = _lin(keys[next(ki)], F, F)
        params["layers"].append(layer)
    return params


def _apply(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _bessel(r, n_rbf, cutoff, p_env):
    n = jnp.arange(1, n_rbf + 1, dtype=r.dtype)
    rs = jnp.maximum(r, 1e-8)[..., None]
    basis = jnp.sqrt(2.0 / cutoff) * jnp.sin(n * jnp.pi * rs / cutoff) / rs
    return basis * polynomial_envelope(r, cutoff, p_env)[..., None]


def _y2_matrix(unit):
    """Rank-2 spherical tensor of a unit vector as the symmetric traceless
    matrix u u^T - I/3 (transforms as l=2; its invariants are exact)."""
    eye = jnp.eye(3, dtype=unit.dtype) / 3.0
    return unit[..., :, None] * unit[..., None, :] - eye


def _y3_tensor(unit):
    """Rank-3 spherical tensor of a unit vector: the symmetric traceless
    part of u o u o u, i.e. u_a u_b u_c - (d_ab u_c + d_ac u_b + d_bc u_a)/5
    (transforms as l=3; traceless on every index pair since |u| = 1)."""
    u = unit
    eye = jnp.eye(3, dtype=u.dtype)
    uuu = u[..., :, None, None] * u[..., None, :, None] * u[..., None, None, :]
    tr = (
        eye[:, :, None] * u[..., None, None, :]
        + eye[:, None, :] * u[..., None, :, None]
        + eye[None, :, :] * u[..., :, None, None]
    ) / 5.0
    return uuu - tr


def _make_router(nbr_j, n_atoms: int, mode: str, dtype):
    """Neighbor-feature routing: dict of (N, ...) node tensors -> dict of
    (N, M, ...) per-edge tensors. "gather" indexes per edge; "dense"
    flattens every tensor's trailing dims, concatenates, and routes the
    whole layer with ONE one-hot matmul on the MXU (x[nbr_j] ==
    onehot @ x exactly, since one-hot rows select)."""
    if mode == "gather":
        return lambda xs: {k: x[nbr_j] for k, x in xs.items()}

    N, M = nbr_j.shape
    onehot = (nbr_j[..., None] == jnp.arange(n_atoms)).astype(dtype)

    def route(xs):
        flats = {k: x.reshape(n_atoms, -1) for k, x in xs.items()}
        cat = jnp.concatenate(list(flats.values()), axis=1)
        routed = jax.lax.dot_general(
            onehot.reshape(N * M, n_atoms), cat, (((1,), (0,)), ((), ()))
        ).reshape(N, M, -1)
        out, o = {}, 0
        for k, x in xs.items():
            d = flats[k].shape[1]
            out[k] = routed[:, :, o : o + d].reshape((N, M) + x.shape[1:])
            o += d
        return out

    return route


def mace_apply(params, cfg: MACEConfig, positions, numbers, alive, shifts,
               edges=None):
    """Forward; returns per-atom energies, total energy, embeddings.
    Matmuls run at true f32 precision (see painn_apply's rationale).
    ``edges``: optional precomputed (disp, r, nbr_j, nbr_mask, overflow)
    from a static candidate-pair table (ops.neighbors.make_table_edge_fn)
    — the MC hot path."""
    with jax.default_matmul_precision("float32"):
        return _mace_apply_impl(params, cfg, positions, numbers, alive, shifts,
                                edges)


def _mace_apply_impl(params, cfg: MACEConfig, positions, numbers, alive, shifts,
                     edges=None):
    params = jax.tree.map(jnp.asarray, params)
    dtype = positions.dtype
    disp, r, nbr_j, nbr_mask, overflow = (
        edges if edges is not None
        else neighbor_list(positions, shifts, alive, cfg.cutoff,
                           cfg.max_neighbors)
    )
    fmask = nbr_mask.astype(dtype)[..., None]
    unit = disp / jnp.maximum(r, 1e-8)[..., None]
    rbf = _bessel(r, cfg.n_rbf, cfg.cutoff, cfg.envelope_p)          # (N, M, R)

    z_idx = jnp.clip(numbers - 1, 0, cfg.max_z - 1)
    h = params["atom_embed"][z_idx] * alive[:, None].astype(dtype)

    e_atom = params["atom_ref"][z_idx] * alive.astype(dtype)
    y2 = _y2_matrix(unit) if cfg.l_max >= 2 else None                # (N, M, 3, 3)
    y3 = _y3_tensor(unit) if cfg.l_max >= 3 else None                # (N, M, 3, 3, 3)
    eq = cfg.equivariant_messages
    N, F = h.shape
    eye3 = jnp.eye(3, dtype=dtype)
    v_feat = jnp.zeros((N, F, 3), dtype) if eq else None
    t_feat = jnp.zeros((N, F, 3, 3), dtype) if (eq and cfg.l_max >= 2) else None
    mode = cfg.message_mode
    if mode == "auto":
        mode = "gather" if jax.default_backend() == "cpu" else "dense"
    route = _make_router(nbr_j, N, mode, dtype)
    for lp in params["layers"]:
        # project every neighbor-sourced feature at the node, then route
        # the whole set through the edge table in one pass (one MXU
        # matmul in dense mode; avoids (N, M, F, F) intermediates either
        # way by mixing channels before routing)
        proj = {"h0": _apply(lp["w0"], h), "h1": _apply(lp["w1"], h)}
        if cfg.l_max >= 2:
            proj["h2"] = _apply(lp["w2"], h)
        if cfg.l_max >= 3:
            proj["h3"] = _apply(lp["w3"], h)
        if eq:
            proj["v0"] = jnp.einsum("nfx,fg->ngx", v_feat, lp["w0v"]["w"])
            proj["v1"] = jnp.einsum("nfx,fg->ngx", v_feat, lp["w1v"]["w"])
            if t_feat is not None:
                proj["t1"] = jnp.einsum("nfab,fg->ngab", t_feat, lp["w1t"]["w"])
                proj["v2"] = jnp.einsum("nfx,fg->ngx", v_feat, lp["w2v"]["w"])
                proj["t2n"] = jnp.einsum("nfab,fg->ngab", t_feat, lp["w2t"]["w"])
        rj = route(proj)

        r0 = _apply(lp["rad0"], rbf)                                  # (N, M, F)
        r1 = _apply(lp["rad1"], rbf)
        a0 = jnp.sum(r0 * rj["h0"] * fmask, axis=1)                   # (N, F)
        a1 = jnp.sum((r1 * rj["h1"] * fmask)[..., None] * unit[:, :, None, :], axis=1)
        if eq:
            r0v = _apply(lp["rad0v"], rbf) * fmask                    # (N, M, F)
            r1v = (_apply(lp["rad1v"], rbf) * fmask)[..., None]
            a0 = a0 + jnp.sum(r0v * jnp.sum(rj["v0"] * unit[:, :, None, :], -1), axis=1)
            a1 = a1 + jnp.sum(r1v * rj["v1"], axis=1)
            if t_feat is not None:
                r1t = (_apply(lp["rad1t"], rbf) * fmask)[..., None]
                a1 = a1 + jnp.sum(
                    r1t * jnp.einsum("nmfab,nmb->nmfa", rj["t1"], unit), axis=1)
        a1n2 = jnp.sum(a1 * a1, axis=-1)                              # (N, F) |A1|^2
        feats = [a0, a0 * a0, a0**3, a1n2, a0 * a1n2]
        t2 = None
        if cfg.l_max >= 2:
            r2 = _apply(lp["rad2"], rbf)
            w2 = (r2 * rj["h2"] * fmask)[..., None, None]             # (N, M, F, 1, 1)
            t2 = jnp.sum(w2 * y2[:, :, None, :, :], axis=1)           # (N, F, 3, 3)
            if eq:
                # 1 x 1 -> 2: symmetric-traceless (V_j o rhat)
                v2 = rj["v2"]
                r2v = (_apply(lp["rad2v"], rbf) * fmask)[..., None, None]
                outer = 0.5 * (
                    v2[..., :, None] * unit[:, :, None, None, :]
                    + v2[..., None, :] * unit[:, :, None, :, None]
                )
                trce = jnp.sum(v2 * unit[:, :, None, :], -1)          # (N, M, F)
                outer = outer - (trce[..., None, None] / 3.0) * eye3
                t2 = t2 + jnp.sum(r2v * outer, axis=1)
                # 2 x 0 -> 2: neighbor tensor features carried through
                r2t = (_apply(lp["rad2t"], rbf) * fmask)[..., None, None]
                t2 = t2 + jnp.sum(r2t * rj["t2n"], axis=1)
            # nu=2: tr(T^2); nu=3: A0 tr(T^2), A1.T.A1, tr(T^3)
            t2n2 = jnp.sum(t2 * t2, axis=(-2, -1))                    # (N, F)
            v_t_v = jnp.einsum("nfa,nfab,nfb->nf", a1, t2, a1)
            t3 = jnp.einsum("nfab,nfbc,nfca->nf", t2, t2, t2)         # tr(T^3)
            feats += [t2n2, a0 * t2n2, v_t_v, t3]
        if cfg.l_max >= 3:
            # l=3 atomic basis (layer-local; equivariant carrying stops
            # at l=2) and its exact invariants up to nu=3:
            #   |A3|^2, A0 |A3|^2, A3:A1:T (3x1x2 -> 0), A3:A3:T
            r3 = _apply(lp["rad3"], rbf)
            w3 = (r3 * rj["h3"] * fmask)[..., None, None, None]       # (N,M,F,1,1,1)
            a3 = jnp.sum(w3 * y3[:, :, None, :, :, :], axis=1)        # (N,F,3,3,3)
            a3n2 = jnp.sum(a3 * a3, axis=(-3, -2, -1))                # (N, F)
            feats += [a3n2, a0 * a3n2]
            a3_a1_t = jnp.einsum("nfabc,nfa,nfbc->nf", a3, a1, t2)
            a3_a3_t = jnp.einsum("nfabc,nfabd,nfcd->nf", a3, a3, t2)
            feats += [a3_a1_t, a3_a3_t]
        b = jnp.concatenate(feats, axis=-1)
        h = h + _apply(lp["update1"], jax.nn.silu(_apply(lp["update0"], b)))
        h = jnp.where(alive[:, None], h, 0.0)
        if eq:
            # residual equivariant node updates, gated by (invariant) h
            gate_v = jax.nn.sigmoid(_apply(lp["v_gate"], h))
            v_feat = (
                jnp.einsum("nfx,fg->ngx", a1, lp["v_upd"]["w"])
                + gate_v[..., None] * v_feat
            )
            v_feat = jnp.where(alive[:, None, None], v_feat, 0.0)
            if t_feat is not None:
                gate_t = jax.nn.sigmoid(_apply(lp["t_gate"], h))
                prod = a1[..., :, None] * a1[..., None, :]
                prod = prod - (a1n2[..., None, None] / 3.0) * eye3
                t_feat = (
                    jnp.einsum("nfab,fg->ngab", t2, lp["t_upd"]["w"])
                    + jnp.einsum("nfab,fg->ngab", prod, lp["t_prod"]["w"])
                    + gate_t[..., None, None] * t_feat
                )
                t_feat = jnp.where(alive[:, None, None, None], t_feat, 0.0)
        e_atom = e_atom + jnp.where(alive, _apply(lp["readout"], jax.nn.silu(h))[..., 0], 0.0)

    total = jnp.sum(e_atom) + jnp.where(overflow, 1e6, 0.0).astype(dtype)
    return {"per_atom_energy": e_atom, "energy": total, "embedding": h}


def make_mace_potential(params, cfg: MACEConfig, type_numbers, units: str = "eV",
                        static_nbr=None):
    """Wrap MACE-style model as a framework Potential. ``static_nbr``
    ranks the spec's candidate pairs instead of searching all image
    pairs (MC hot paths; see make_painn_potential)."""
    from surface_sampling_tpu.models.nn_calculator import UNIT_FACTORS
    from surface_sampling_tpu.potentials.base import Potential

    factor = UNIT_FACTORS[units]
    znums = jnp.asarray(np.asarray(type_numbers), jnp.int32)
    if static_nbr is not None:
        from surface_sampling_tpu.ops.neighbors import (
            make_table_edge_fn,
            make_table_topology_fns,
        )

        edge_fn = make_table_edge_fn(static_nbr, cfg.cutoff, cfg.max_neighbors)
        topo_fn, geom_fn = make_table_topology_fns(
            static_nbr, cfg.cutoff, cfg.max_neighbors
        )
    else:
        edge_fn = topo_fn = geom_fn = None

    def outputs(positions, type_idx, alive, shifts, edges=None):
        nums = znums[type_idx] * alive.astype(jnp.int32)
        if edges is None:
            edges = edge_fn(positions, alive) if edge_fn is not None else None
        return mace_apply(params, cfg, positions, nums, alive, shifts,
                          edges=edges)

    def energy(positions, type_idx, alive, shifts, edges=None):
        return outputs(positions, type_idx, alive, shifts,
                       edges=edges)["energy"] * factor

    def per_atom(positions, type_idx, alive, shifts):
        return outputs(positions, type_idx, alive, shifts)["per_atom_energy"] * factor

    pot = Potential(energy=energy, per_atom_energy=per_atom, cutoff=cfg.cutoff,
                    name="mace")
    pot.__dict__["outputs"] = outputs
    if topo_fn is not None:
        pot.__dict__["edge_topology"] = topo_fn
        pot.__dict__["edges_of"] = geom_fn
        pot.__dict__["energy_with_edges"] = energy
    if static_nbr is None:
        # rebuild hook: cli.common.assemble_system re-invokes with the
        # spec's static candidate table once the spec exists (same
        # mechanism as painn_args / chgnet_args)
        pot.__dict__["mace_args"] = dict(
            params=params, cfg=cfg, type_numbers=type_numbers, units=units
        )
    return pot


def save_mace_npz(path, params, cfg: MACEConfig) -> None:
    """Serialize trained MACE params + config to one npz (same flat scheme
    as models/convert_nff.py)."""
    from surface_sampling_tpu.models.convert_nff import _flatten

    flat = _flatten(jax.tree.map(np.asarray, params))
    meta = {f"__cfg__{k}": np.asarray(v) for k, v in cfg.__dict__.items()}
    np.savez_compressed(path, **flat, **meta)


def load_mace_npz(path):
    """Load (params, MACEConfig) written by :func:`save_mace_npz`."""
    from surface_sampling_tpu.models.convert_nff import _unflatten

    d = np.load(path)
    flat = {k: d[k] for k in d.files if not k.startswith("__cfg__")}
    kw = {}
    for k in d.files:
        if k.startswith("__cfg__"):
            kw[k[len("__cfg__"):]] = d[k].item()
    for int_key in ("feat_dim", "n_rbf", "n_layers", "max_z", "max_neighbors",
                    "readout_hidden", "envelope_p", "l_max"):
        if int_key in kw:
            kw[int_key] = int(kw[int_key])
    return _unflatten(flat), MACEConfig(**kw)
