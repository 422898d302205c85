"""CHGNet-family graph network in JAX (second NN potential family).

The reference optionally drives CHGNet through nff (SURVEY §2.2:
"CHGNetNFF"; fine-tuned checkpoint at tutorials/data/LaMnO3_001/nff/
finetuned/best_model, a chgnet v0.3.0 state dict). This is a from-scratch
JAX implementation of the published architecture (Deng et al., "CHGNet:
pretrained universal neural network potential for charge-informed atomistic
modelling", Nat. Mach. Intell. 2023):

  * atom graph (directed edges, cutoff 6 A) with learnable radial-Bessel
    bond bases under a smooth polynomial cutoff (p = 8);
  * bond graph (bonds under 3 A) with Fourier angle bases (order 15);
  * interleaved gated-MLP convolutions updating atom, bond and angle
    features (4 atom convs, 3 bond convs, 3 angle updates; LayerNorm);
  * site-wise magmom head + layer-normed average readout MLP producing an
    intensive energy per atom, plus a per-element composition model.

Shapes are padded/masked ((N, M) atom edges; (N, Mb, Mb) angle tensors) so
the model jits, vmaps over chains/structures, and trains with
models/train.py.

NOTE on parity: the chgnet package is not installable in this environment,
so the trained checkpoint (loadable via models/convert_chgnet.py) runs
through a best-effort reconstruction of v0.3.0 layer semantics; energies
are physically sensible on the reference's LaMnO3 system but have not been
bit-compared against torch. Fine-tuning in-framework (models/train.py)
does not depend on that parity.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.ops.neighbors import neighbor_list


@dataclass(frozen=True)
class CHGNetConfig:
    atom_fea_dim: int = 64
    bond_fea_dim: int = 64
    angle_fea_dim: int = 64
    num_radial: int = 31
    num_angular: int = 31        # 2*order + 1
    n_conv: int = 4
    atom_graph_cutoff: float = 6.0
    bond_graph_cutoff: float = 3.0
    cutoff_coeff: int = 8        # polynomial envelope exponent p
    max_z: int = 94
    max_neighbors: int = 96      # atom-graph padding (oxides need ~85 at 6 A)
    max_bond_neighbors: int = 12 # bond-graph padding (bonds per atom < 3 A)
    mlp_hidden_dims: tuple = (64, 64, 64)
    is_intensive: bool = True
    # atom-conv execution: "gather" (per-edge indexing, best on CPU),
    # "pallas" (fused VMEM kernel ops/pallas_chgnet.py — the TPU hot
    # path), "auto" picks per backend.
    conv_mode: str = "auto"
    # routing precision inside the pallas conv (see PaiNNConfig).
    pallas_routing: str = "bf16x2"


# ----------------------------------------------------------------------
# bases
# ----------------------------------------------------------------------
def polynomial_envelope(r, cutoff, p: int):
    """Smooth cutoff: 1 - (p+1)(p+2)/2 x^p + p(p+2) x^(p+1) - p(p+1)/2 x^(p+2)."""
    x = jnp.clip(r / cutoff, 0.0, 1.0)
    return (
        1.0
        - 0.5 * (p + 1) * (p + 2) * x**p
        + p * (p + 2) * x ** (p + 1)
        - 0.5 * p * (p + 1) * x ** (p + 2)
    )


def radial_bessel(r, frequencies, cutoff, p: int):
    """sqrt(2/rc) sin(f_n r / rc) / r with smooth polynomial envelope
    (learnable f_n, init n*pi)."""
    rs = jnp.maximum(r, 1e-8)[..., None]
    basis = jnp.sqrt(2.0 / cutoff) * jnp.sin(frequencies * rs / cutoff) / rs
    return basis * polynomial_envelope(r, cutoff, p)[..., None]


def fourier_angles(theta, frequencies):
    """[1/sqrt(2), sin(n t), cos(n t)] / sqrt(pi) (order = len(frequencies))."""
    t = theta[..., None] * frequencies
    const = jnp.full(theta.shape + (1,), 1.0 / jnp.sqrt(2.0), theta.dtype)
    out = jnp.concatenate([const, jnp.sin(t), jnp.cos(t)], axis=-1)
    return out / jnp.sqrt(jnp.pi)


# ----------------------------------------------------------------------
# params
# ----------------------------------------------------------------------
def _linear(key, n_in, n_out, bias=True):
    s = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(key, (n_in, n_out), minval=-s, maxval=s)}
    if bias:
        p["b"] = jnp.zeros(n_out)
    return p


def _gated_mlp(key, n_in, dim):
    k = jax.random.split(key, 4)
    return {
        "core0": _linear(k[0], n_in, dim),
        "core1": _linear(k[1], dim, dim),
        "gate0": _linear(k[2], n_in, dim),
        "gate1": _linear(k[3], dim, dim),
        "ln_core": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "ln_gate": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
    }


def _gated_single(key, n_in, dim):
    """Single-linear gated MLP (angle layers: one Linear per branch)."""
    k = jax.random.split(key, 2)
    return {
        "core0": _linear(k[0], n_in, dim),
        "gate0": _linear(k[1], n_in, dim),
        "ln_core": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
        "ln_gate": {"g": jnp.ones(dim), "b": jnp.zeros(dim)},
    }


def init_chgnet(key, cfg: CHGNetConfig):
    F = cfg.atom_fea_dim
    R = cfg.num_radial
    order = (cfg.num_angular - 1) // 2
    keys = jax.random.split(key, 16 + 3 * cfg.n_conv)
    ki = iter(range(len(keys)))
    params = {
        "composition": jnp.zeros(cfg.max_z),
        "atom_embedding": jax.random.normal(keys[next(ki)], (cfg.max_z, F)) * 0.1,
        "rbf_freq_ag": jnp.arange(1, R + 1, dtype=jnp.float32) * jnp.pi,
        "rbf_freq_bg": jnp.arange(1, R + 1, dtype=jnp.float32) * jnp.pi,
        "angle_freq": jnp.arange(1, order + 1, dtype=jnp.float32),
        "bond_embedding": _linear(keys[next(ki)], R, F, bias=False),
        "bond_weights_ag": _linear(keys[next(ki)], R, F, bias=False),
        "bond_weights_bg": _linear(keys[next(ki)], R, F, bias=False),
        "angle_embedding": _linear(keys[next(ki)], cfg.num_angular, F, bias=False),
        "atom_convs": [],
        "bond_convs": [],
        "angle_layers": [],
        "site_wise": _linear(keys[next(ki)], F, 1),
        "readout_norm": {"g": jnp.ones(F), "b": jnp.zeros(F)},
        "mlp": [
            _linear(keys[next(ki)], F, cfg.mlp_hidden_dims[0]),
            _linear(keys[next(ki)], cfg.mlp_hidden_dims[0], cfg.mlp_hidden_dims[1]),
            _linear(keys[next(ki)], cfg.mlp_hidden_dims[1], cfg.mlp_hidden_dims[2]),
            _linear(keys[next(ki)], cfg.mlp_hidden_dims[2], 1),
        ],
    }
    for i in range(cfg.n_conv):
        params["atom_convs"].append(
            {
                "gmlp": _gated_mlp(keys[next(ki)], 3 * F, F),
                "out": _linear(jax.random.fold_in(keys[0], 100 + i), F, F, bias=False),
            }
        )
    for i in range(cfg.n_conv - 1):
        params["bond_convs"].append(
            {
                "gmlp": _gated_mlp(keys[next(ki)], 4 * F, F),
                "out": _linear(jax.random.fold_in(keys[0], 200 + i), F, F, bias=False),
            }
        )
        params["angle_layers"].append(_gated_single(keys[next(ki)], 4 * F, F))
    return params


def _apply_linear(p, x):
    y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _layernorm(p, x, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _apply_gated(p, x, single: bool = False):
    """Gated MLP: silu(LN(core(x))) * sigmoid(LN(gate(x)))."""
    if single:
        core = _apply_linear(p["core0"], x)
        gate = _apply_linear(p["gate0"], x)
    else:
        core = _apply_linear(p["core1"], jax.nn.silu(_apply_linear(p["core0"], x)))
        gate = _apply_linear(p["gate1"], jax.nn.silu(_apply_linear(p["gate0"], x)))
    core = jax.nn.silu(_layernorm(p["ln_core"], core))
    gate = jax.nn.sigmoid(_layernorm(p["ln_gate"], gate))
    return core * gate


# ----------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------
def chgnet_apply(params, cfg: CHGNetConfig, positions, numbers, alive, shifts,
                 edges=None, band=None):
    """Forward pass; returns per-atom energies (eV/atom scale), total
    energy, per-atom magmom-like site values, and embeddings. Matmuls run
    at true f32 precision (see painn_apply for the measured rationale).
    ``edges`` lets MC hot paths reuse a static-candidate edge set.
    ``band`` (a staged ops.pallas_painn.DeviceBand) switches the fused
    atom conv to block-banded routing — the supercell fast path
    (forward-only: rigid MC; see chgnet_conv_fused_banded)."""
    with jax.default_matmul_precision("float32"):
        return _chgnet_apply_impl(params, cfg, positions, numbers, alive, shifts,
                                  edges=edges, band=band)


def _chgnet_apply_impl(params, cfg: CHGNetConfig, positions, numbers, alive, shifts,
                       edges=None, band=None):
    params = jax.tree.map(jnp.asarray, params)  # host numpy -> device consts
    F = cfg.atom_fea_dim
    N = positions.shape[0]
    dtype = positions.dtype

    disp, r, nbr_j, nbr_mask, overflow = (
        edges
        if edges is not None
        else neighbor_list(
            positions, shifts, alive, cfg.atom_graph_cutoff, cfg.max_neighbors
        )
    )
    fmask = nbr_mask.astype(dtype)

    # bond bases
    rbf_ag = radial_bessel(r, params["rbf_freq_ag"], cfg.atom_graph_cutoff, cfg.cutoff_coeff)
    bond_w_ag = _apply_linear(params["bond_weights_ag"], rbf_ag)       # (N, M, F)
    bond_emb_ag = _apply_linear(params["bond_embedding"], rbf_ag)      # (N, M, F)

    # bond-graph subset: nearest max_bond_neighbors edges under 3 A
    Mb = cfg.max_bond_neighbors
    bg_scores = jnp.where(nbr_mask & (r < cfg.bond_graph_cutoff), -r, -jnp.inf)
    _, bsel = jax.lax.top_k(bg_scores, min(Mb, r.shape[1]))             # (N, Mb)
    rows = jnp.arange(N)[:, None]
    r_b = r[rows, bsel]
    mask_b = (nbr_mask & (r < cfg.bond_graph_cutoff))[rows, bsel]
    j_b = nbr_j[rows, bsel]
    disp_b = disp[rows, bsel]
    rbf_bg = radial_bessel(r_b, params["rbf_freq_bg"], cfg.bond_graph_cutoff, cfg.cutoff_coeff)
    bond_w_bg = _apply_linear(params["bond_weights_bg"], rbf_bg)        # (N, Mb, F)
    bond_feat = _apply_linear(params["bond_embedding"], rbf_bg)         # (N, Mb, F)

    # angles between bond pairs at each center
    unit_b = disp_b / jnp.maximum(r_b, 1e-8)[..., None]
    cos_t = jnp.clip(jnp.einsum("nmx,nkx->nmk", unit_b, unit_b), -1 + 1e-6, 1 - 1e-6)
    theta = jnp.arccos(cos_t)                                           # (N, Mb, Mb)
    angle_feat = _apply_linear(
        params["angle_embedding"], fourier_angles(theta, params["angle_freq"])
    )                                                                   # (N, Mb, Mb, F)
    pair_mask_b = (
        mask_b[:, :, None] & mask_b[:, None, :] & ~jnp.eye(mask_b.shape[1], dtype=bool)[None]
    )

    # atom features
    z_idx = jnp.clip(numbers - 1, 0, cfg.max_z - 1)
    atom = params["atom_embedding"][z_idx] * alive[:, None].astype(dtype)

    mode = cfg.conv_mode
    if mode == "auto":
        mode = "gather" if jax.default_backend() == "cpu" else "pallas"
    if mode == "pallas":
        # fused VMEM atom conv (ops/pallas_chgnet.py); pad the
        # layer-invariant edge tensors once. With ``band`` the rows go to
        # SORTED spatial order and nbr carries sorted ranks (the same
        # prepare_fused_geometry layout contract as PaiNN's banded path).
        from surface_sampling_tpu.ops.pallas_chgnet import (
            chgnet_conv_fused,
            chgnet_conv_fused_banded,
        )

        M = r.shape[1]
        if band is not None:
            n_blk = band.n_blk
            n_pad = band.perm.shape[0]
        else:
            n_blk = 16 if N <= 256 else 8
            n_pad = ((N + n_blk - 1) // n_blk) * n_blk
        pad_n = n_pad - N
        be_p = jnp.pad(bond_emb_ag, ((0, pad_n), (0, 0), (0, 0)))
        bw_p = jnp.pad(bond_w_ag, ((0, pad_n), (0, 0), (0, 0)))
        maskf_p = jnp.pad(fmask, ((0, pad_n), (0, 0)))
        nbr_p = jnp.pad(nbr_j, ((0, pad_n), (0, 0))).astype(jnp.int32)
        if band is not None:
            be_p = be_p[band.perm]
            bw_p = bw_p[band.perm]
            maskf_p = maskf_p[band.perm]
            nbr_p = band.rank[nbr_p[band.perm]]              # values -> ranks
        be_p = be_p.reshape(n_pad * M, F)
        bw_p = bw_p.reshape(n_pad * M, F)
        maskf_p = maskf_p.reshape(n_pad * M, 1)
        nbr_p = nbr_p.reshape(n_pad * M, 1)

    n_layers = cfg.n_conv
    for layer in range(n_layers):
        # ---- atom conv: messages over the atom graph -------------------
        ac = params["atom_convs"][layer]
        if mode == "pallas":
            g = ac["gmlp"]
            w0c, w0g = g["core0"]["w"], g["gate0"]["w"]      # (3F, F)
            # per-atom pre-activations for the a_i / a_j rows of the
            # [a_i | a_j | bond_emb] concat (biases folded into ai2)
            ai2 = jnp.concatenate(
                [atom @ w0c[:F] + g["core0"]["b"],
                 atom @ w0g[:F] + g["gate0"]["b"]], axis=1)
            aj2 = jnp.concatenate([atom @ w0c[F:2 * F],
                                   atom @ w0g[F:2 * F]], axis=1)
            w2 = jnp.concatenate([w0c[2 * F:], w0g[2 * F:]], axis=1)
            zero = jnp.zeros((F, F), dtype)
            wc1 = jnp.concatenate([g["core1"]["w"], zero], axis=0)
            wg1 = jnp.concatenate([zero, g["gate1"]["w"]], axis=0)
            ai2_p = jnp.pad(ai2, ((0, pad_n), (0, 0)))
            aj2_p = jnp.pad(aj2, ((0, pad_n), (0, 0)))
            conv_args = (
                be_p, bw_p, maskf_p, nbr_p, w2, wc1, wg1,
                g["core1"]["b"][None], g["gate1"]["b"][None],
                jnp.stack([g["ln_core"]["g"], g["ln_core"]["b"]]),
                jnp.stack([g["ln_gate"]["g"], g["ln_gate"]["b"]]),
            )
            if band is None:
                agg = chgnet_conv_fused(
                    ai2_p, aj2_p, *conv_args, n_blk, cfg.pallas_routing
                )[:N]
            else:
                ai2_s = ai2_p[band.perm]
                aj2_s = aj2_p[band.perm]
                if band.halo:
                    aj2_s = jnp.concatenate([aj2_s, aj2_s[:band.halo]])
                agg_s = chgnet_conv_fused_banded(
                    ai2_s, aj2_s, *conv_args, band.win_start,
                    n_blk=n_blk, window=band.window, n_pad=n_pad,
                    routing=cfg.pallas_routing,
                )
                agg = agg_s[band.inv_perm][:N]
        else:
            a_i = jnp.broadcast_to(atom[:, None, :], (N, r.shape[1], F))
            a_j = atom[nbr_j]
            msg_in = jnp.concatenate([a_i, a_j, bond_emb_ag], axis=-1)
            msg = _apply_gated(ac["gmlp"], msg_in) * bond_w_ag * fmask[..., None]
            agg = jnp.sum(msg, axis=1)
        atom = atom + _apply_linear(ac["out"], agg)
        atom = jnp.where(alive[:, None], atom, 0.0)

        if layer < n_layers - 1 and params["bond_convs"]:
            # ---- bond conv: update bond features via angles -------------
            bc = params["bond_convs"][layer]
            b1 = jnp.broadcast_to(bond_feat[:, :, None, :], theta.shape + (F,))
            b2 = jnp.broadcast_to(bond_feat[:, None, :, :], theta.shape + (F,))
            a_c = jnp.broadcast_to(atom[:, None, None, :], theta.shape + (F,))
            bin_ = jnp.concatenate([a_c, b1, b2, angle_feat], axis=-1)
            bmsg = _apply_gated(bc["gmlp"], bin_) * bond_w_bg[:, None, :, :]
            bmsg = bmsg * pair_mask_b[..., None].astype(dtype)
            bond_feat = bond_feat + _apply_linear(bc["out"], jnp.sum(bmsg, axis=2))
            # ---- angle update -------------------------------------------
            al = params["angle_layers"][layer]
            ain = jnp.concatenate([a_c, b1, b2, angle_feat], axis=-1)
            angle_feat = angle_feat + _apply_gated(al, ain, single=True) * (
                pair_mask_b[..., None].astype(dtype)
            )

    site_val = _apply_linear(params["site_wise"], atom)[..., 0]          # magmom head
    h = _layernorm(params["readout_norm"], atom)
    for lin in params["mlp"][:-1]:
        h = jax.nn.silu(_apply_linear(lin, h))
    e_atom_nn = _apply_linear(params["mlp"][-1], h)[..., 0]
    comp = params["composition"][z_idx]
    e_atom = (e_atom_nn + comp) * alive.astype(dtype)
    n_alive = jnp.maximum(jnp.sum(alive.astype(dtype)), 1.0)
    # reject states whose neighbor graph was truncated — override, don't
    # add: the net can emit huge negative garbage on truncated graphs
    # that would swamp an additive penalty (see painn_apply)
    total = jnp.where(overflow, jnp.asarray(1e6, dtype), jnp.sum(e_atom))
    return {
        "per_atom_energy": e_atom,
        "energy": total,
        "energy_per_atom": total / n_alive,
        "magmom": jnp.where(alive, site_val, 0.0),
        "embedding": atom,
    }
