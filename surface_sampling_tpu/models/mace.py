"""MACE-style equivariant model in JAX (third NN family, trainable).

The reference lists MACE among its NN backends (SURVEY §2.2:
"NffScaleMACE") but ships no MACE weights, so there is nothing to port or
bit-validate; this module provides a from-paper MACE-style architecture
(Batatia et al., "MACE: Higher order equivariant message passing neural
networks", NeurIPS 2022) restricted to L_max = 1 and correlation order
nu <= 3 — the regime that captures most of MACE's accuracy on energies —
implemented with the framework's padded-edge formulation so it trains with
models/train.py and serves as a drop-in Potential.

Per layer t:
    A^0_i,k   = sum_j R^0_k(r_ij) (W0 h_j)_k                 (scalars)
    A^1_i,k   = sum_j R^1_k(r_ij) rhat_ij (W1 h_j)_k          (l=1 vectors)
    B_i       = [A0, A0^2, A0^3, |A1|^2, A0*|A1|^2]           (invariants)
    h_i      += MLP_t(B_i)                                    (residual)
    E_i^t     = readout_t(h_i)
Energy = sum_t sum_i E_i^t  (+ per-element reference energies).
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


def _lin(key, n_in, n_out, bias=True):
    s = 1.0 / np.sqrt(n_in)
    p = {"w": jax.random.uniform(key, (n_in, n_out), minval=-s, maxval=s)}
    if bias:
        p["b"] = jnp.zeros(n_out)
    return p


def init_mace(key, cfg: MACEConfig):
    F, R = cfg.feat_dim, cfg.n_rbf
    keys = jax.random.split(key, 2 + 7 * cfg.n_layers)
    ki = iter(range(len(keys)))
    params = {
        "atom_embed": jax.random.normal(keys[next(ki)], (cfg.max_z, F)) * 0.2,
        "atom_ref": jnp.zeros(cfg.max_z),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append(
            {
                "w0": _lin(keys[next(ki)], F, F, bias=False),
                "w1": _lin(keys[next(ki)], F, F, bias=False),
                "rad0": _lin(keys[next(ki)], R, F),
                "rad1": _lin(keys[next(ki)], R, F),
                "update0": _lin(keys[next(ki)], 5 * F, F),
                "update1": _lin(keys[next(ki)], F, F),
                "readout": _lin(keys[next(ki)], F, 1),
            }
        )
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


def mace_apply(params, cfg: MACEConfig, positions, numbers, alive, shifts):
    """Forward; returns per-atom energies, total energy, embeddings."""
    params = jax.tree.map(jnp.asarray, params)
    dtype = positions.dtype
    disp, r, nbr_j, nbr_mask, overflow = neighbor_list(
        positions, shifts, alive, cfg.cutoff, cfg.max_neighbors
    )
    fmask = nbr_mask.astype(dtype)[..., None]
    unit = disp / jnp.maximum(r, 1e-8)[..., None]
    rbf = _bessel(r, cfg.n_rbf, cfg.cutoff, cfg.envelope_p)          # (N, M, R)

    z_idx = jnp.clip(numbers - 1, 0, cfg.max_z - 1)
    h = params["atom_embed"][z_idx] * alive[:, None].astype(dtype)

    e_atom = params["atom_ref"][z_idx] * alive.astype(dtype)
    for lp in params["layers"]:
        r0 = _apply(lp["rad0"], rbf)                                  # (N, M, F)
        r1 = _apply(lp["rad1"], rbf)
        hj0 = _apply(lp["w0"], h)[nbr_j]                              # (N, M, F)
        hj1 = _apply(lp["w1"], h)[nbr_j]
        a0 = jnp.sum(r0 * hj0 * fmask, axis=1)                        # (N, F)
        a1 = jnp.sum((r1 * hj1 * fmask)[..., None] * unit[:, :, None, :], axis=1)
        a1n2 = jnp.sum(a1 * a1, axis=-1)                              # (N, F) |A1|^2
        b = jnp.concatenate([a0, a0 * a0, a0**3, a1n2, a0 * a1n2], axis=-1)
        h = h + _apply(lp["update1"], jax.nn.silu(_apply(lp["update0"], b)))
        h = jnp.where(alive[:, None], h, 0.0)
        e_atom = e_atom + jnp.where(alive, _apply(lp["readout"], jax.nn.silu(h))[..., 0], 0.0)

    total = jnp.sum(e_atom) + jnp.where(overflow, 1e6, 0.0).astype(dtype)
    return {"per_atom_energy": e_atom, "energy": total, "embedding": h}


def make_mace_potential(params, cfg: MACEConfig, type_numbers, units: str = "eV"):
    """Wrap MACE-style model as a framework Potential."""
    from surface_sampling_tpu.models.nn_calculator import UNIT_FACTORS
    from surface_sampling_tpu.potentials.base import Potential

    factor = UNIT_FACTORS[units]
    znums = jnp.asarray(np.asarray(type_numbers), jnp.int32)

    def outputs(positions, type_idx, alive, shifts):
        nums = znums[type_idx] * alive.astype(jnp.int32)
        return mace_apply(params, cfg, positions, nums, alive, shifts)

    def energy(positions, type_idx, alive, shifts):
        return outputs(positions, type_idx, alive, shifts)["energy"] * factor

    def per_atom(positions, type_idx, alive, shifts):
        return outputs(positions, type_idx, alive, shifts)["per_atom_energy"] * factor

    pot = Potential(energy=energy, per_atom_energy=per_atom, cutoff=cfg.cutoff,
                    name="mace")
    pot.__dict__["outputs"] = outputs
    return pot
