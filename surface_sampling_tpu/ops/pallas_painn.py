"""Fused Pallas TPU kernel for the PaiNN message block.

The message block is ~97% of a PaiNN surface-energy evaluation (measured
on the SrTiO3 flagship: 157 of 165 ms/128-chain batch) and its XLA
formulation materializes four (N, M, 3F) tensors per layer/member in HBM
(~12 MB each per chain on the flagship). This kernel fuses the whole
block — radial filter W = Dense(RBF)*env, neighbor routing, the
filter*message product, and all three neighbor-axis reductions — into one
VMEM-resident pass per block of centers, so the (N, M, 3F) intermediates
never touch HBM and the routing matmuls run as native-f32 MXU dots
instead of 6-pass HIGHEST-precision einsums.

Replaces (when ``PaiNNConfig.message_mode="pallas"``) the dense/gather
message paths of models/painn.py:171-198 — the math is identical:

    W     = rbf @ dw + db, times (envelope * edge mask)     # (E, 3F)
    inv   = phi[j] * W                                      # (E, 3F)
    c_vv, c_s, c_unit = split(inv, 3, axis=-1)
    ds_i  = sum_m c_s
    dv_i  = sum_m c_unit * r_hat  +  sum_m c_vv * v_j

Reference being re-designed: the nff PaiNN message layer the reference
drives through torch (see models/painn.py module docstring; reference
scripts/sample_surface.py:166-175 loads those checkpoints).

Gradients: the op carries a custom VJP whose backward is itself a fused
Pallas kernel (_msg_bwd_kernel): forward recomputed in VMEM, all input
cotangents emitted in one pass, weight grads accumulated across grid
steps into pinned output blocks. Forces/relaxation/fine-tuning ride the
kernel path end to end; every cotangent is pinned against the pure-JAX
reference VJP in tests (bf16x2 tolerance ~2e-3 on O(1) inputs,
routing="f32" for near-exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_sampling_tpu.ops.pallas_routing import onehot_router


def _msg_kernel(phi_ref, vcat_ref, rbf_ref, envm_ref, nbr_ref, unit_ref,
                dw_ref, db_ref, ds_ref, dv_ref, *, routing="bf16x2"):
    """One block of N_blk centers; E = N_blk * M edges live in VMEM."""
    E, _ = rbf_ref.shape
    n_pad, f3 = phi_ref.shape
    F = f3 // 3
    n_blk = ds_ref.shape[0]
    M = E // n_blk

    # radial filter, built in VMEM (never written to HBM). Precision is
    # pinned: Mosaic only lowers DEFAULT/HIGHEST dots, so an ambient
    # default_matmul_precision("tensorfloat32") context (models/painn.py
    # dense blocks) must not leak into the kernel trace.
    w = jnp.dot(rbf_ref[:], dw_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    w = (w + db_ref[:]) * envm_ref[:]                        # (E, 3F)

    # neighbor routing as one-hot MXU dots (TPU has no fast gather);
    # masked edges are killed by envm=0, so the one-hot needs no mask.
    # bf16x2 = hi+lo split dots (see ops/pallas_routing.py for the trick
    # and the Mosaic precision constraint it depends on)
    _route, _ = onehot_router(
        nbr_ref[:], n_pad, routing, f32_precision=jax.lax.Precision.HIGHEST
    )

    phij = _route(phi_ref[:])
    inv = phij * w                                           # (E, 3F)
    c_vv = inv[:, :F].reshape(n_blk, M, F)
    c_s = inv[:, F:2 * F].reshape(n_blk, M, F)
    c_unit = inv[:, 2 * F:].reshape(n_blk, M, F)
    ds_ref[:] = jnp.sum(c_s, axis=1)

    vj = _route(vcat_ref[:])
    for x in range(3):
        ux = unit_ref[x]                                     # (n_blk, M)
        vjx = vj[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        dv_ref[x] = jnp.sum(c_unit * ux[..., None] + c_vv * vjx, axis=1)


def _message_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db, *, n_blk,
                    routing="bf16x2"):
    n_pad, f3 = phi.shape
    F = f3 // 3
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_msg_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), phi.dtype),
            jax.ShapeDtypeStruct((3, n_pad, F), phi.dtype),
        ],
        interpret=interpret,
    )(phi, vcat, rbf, envm, nbr, unit3, dw, db)


def _msg_bwd_kernel(phi_ref, vcat_ref, rbf_ref, envm_ref, nbr_ref, unit_ref,
                    dw_ref, db_ref, gds_ref, gdv_ref,
                    gphi_ref, gvcat_ref, grbf_ref, genvm_ref, gunit_ref,
                    gdw_ref, gdb_ref, *, routing="bf16x2"):
    """Fused backward for the message block: recomputes the forward in
    VMEM (cheaper than streaming residuals from HBM) and emits all input
    cotangents. g_phi/g_vcat/g_dw/g_db accumulate across grid steps into
    pinned output blocks."""
    E, _ = rbf_ref.shape
    n_pad, f3 = phi_ref.shape
    F = f3 // 3
    n_blk = gds_ref.shape[0]
    M = E // n_blk

    _route, _scatter = onehot_router(
        nbr_ref[:], n_pad, routing, f32_precision=jax.lax.Precision.HIGHEST
    )

    # ---- forward recompute (VMEM-resident) ----
    hi_p = jax.lax.Precision.HIGHEST  # pinned: Mosaic rejects HIGH dots
    wpre = jnp.dot(rbf_ref[:], dw_ref[:], precision=hi_p,
                   preferred_element_type=jnp.float32) + db_ref[:]
    w = wpre * envm_ref[:]                                   # (E, 3F)
    phij = _route(phi_ref[:])
    vj = _route(vcat_ref[:])                                 # (E, 3F) x-major
    inv = phij * w
    c_vv = inv[:, :F].reshape(n_blk, M, F)
    c_unit = inv[:, 2 * F:].reshape(n_blk, M, F)

    # ---- cotangents of the three channels ----
    gds_e = jnp.broadcast_to(gds_ref[:][:, None, :], (n_blk, M, F))
    g_c_unit = jnp.zeros((n_blk, M, F), jnp.float32)
    g_c_vv = jnp.zeros((n_blk, M, F), jnp.float32)
    gvj_parts = []
    for x in range(3):
        gdvx = gdv_ref[x][:, None, :]                        # (n_blk, 1, F)
        ux = unit_ref[x][..., None]                          # (n_blk, M, 1)
        vjx = vj[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        g_c_unit = g_c_unit + gdvx * ux
        g_c_vv = g_c_vv + gdvx * vjx
        gunit_ref[x] = jnp.sum(gdvx * c_unit, axis=2)        # (n_blk, M)
        gvj_parts.append((gdvx * c_vv).reshape(E, F))
    g_inv = jnp.concatenate(
        [g_c_vv.reshape(E, F), gds_e.reshape(E, F), g_c_unit.reshape(E, F)],
        axis=1)                                              # (E, 3F)

    g_phij = g_inv * w
    g_w = g_inv * phij
    gwe = g_w * envm_ref[:]
    genvm_ref[:] = jnp.sum(g_w * wpre, axis=1, keepdims=True)
    grbf_ref[:] = jax.lax.dot_general(
        gwe, dw_ref[:], (((1,), (1,)), ((), ())), precision=hi_p,
        preferred_element_type=jnp.float32)                  # (E, R_pad)

    g_phi_blk = _scatter(g_phij)                             # (N_pad, 3F)
    g_vcat_blk = _scatter(jnp.concatenate(gvj_parts, axis=1))
    g_dw_blk = jax.lax.dot_general(
        rbf_ref[:], gwe, (((0,), (0,)), ((), ())), precision=hi_p,
        preferred_element_type=jnp.float32)                  # (R_pad, 3F)
    g_db_blk = jnp.sum(gwe, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gphi_ref[:] = jnp.zeros_like(gphi_ref)
        gvcat_ref[:] = jnp.zeros_like(gvcat_ref)
        gdw_ref[:] = jnp.zeros_like(gdw_ref)
        gdb_ref[:] = jnp.zeros_like(gdb_ref)

    gphi_ref[:] += g_phi_blk
    gvcat_ref[:] += g_vcat_blk
    gdw_ref[:] += g_dw_blk
    gdb_ref[:] += g_db_blk


def _message_bwd_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
                        *, n_blk, routing):
    n_pad, f3 = phi.shape
    F = f3 // 3
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_msg_bwd_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((n_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((n_pad * M, r_pad), phi.dtype),
            jax.ShapeDtypeStruct((n_pad * M, 1), phi.dtype),
            jax.ShapeDtypeStruct((3, n_pad, M), phi.dtype),
            jax.ShapeDtypeStruct((r_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((1, f3), phi.dtype),
        ],
        interpret=interpret,
    )(phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv)


def _message_ref(phi, vcat, rbf, envm, nbr, unit3, dw, db):
    """Pure-JAX reference of the fused op (same padded inputs/outputs);
    used for parity tests (and as the VJP oracle the fused backward
    kernel is tested against). On non-CPU
    backends the neighbor access is written as one-hot matmuls so the
    VJP lowers to MXU dots (transposed one-hots) instead of
    scatter-adds, which serialize on TPU."""
    n_pad, f3 = phi.shape
    F = f3 // 3
    M = unit3.shape[2]
    w = (rbf @ dw + db) * envm                               # (E, 3F)
    j = nbr[:, 0]
    if jax.default_backend() == "cpu":
        take = lambda x: x[j]
    else:
        onehot = jax.nn.one_hot(j, n_pad, dtype=phi.dtype)   # (E, N_pad)
        hp = jax.lax.Precision.HIGHEST                       # exact: 0/1 lhs
        take = lambda x: jax.lax.dot_general(
            onehot, x, (((1,), (0,)), ((), ())), precision=hp)
    inv = take(phi) * w
    c_vv = inv[:, :F].reshape(n_pad, M, F)
    c_s = inv[:, F:2 * F].reshape(n_pad, M, F)
    c_unit = inv[:, 2 * F:].reshape(n_pad, M, F)
    ds = jnp.sum(c_s, axis=1)
    vj = take(vcat)
    dvs = []
    for x in range(3):
        vjx = vj[:, x * F:(x + 1) * F].reshape(n_pad, M, F)
        dvs.append(jnp.sum(c_unit * unit3[x][..., None] + c_vv * vjx, axis=1))
    return ds, jnp.stack(dvs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def painn_message_fused(phi, vcat, rbf, envm, nbr, unit3, dw, db, n_blk=16,
                        routing="bf16x2"):
    """Fused PaiNN message block: (phi, v, edge geometry) -> (ds, dv).

    Args (all padded: N_pad % n_blk == 0, E = N_pad*M rows):
        phi:   (N_pad, 3F) per-atom filter-side features Dense(silu(Dense(s))).
        vcat:  (N_pad, 3F) vector features, x-major concat [v_x | v_y | v_z].
        rbf:   (E, R_pad) radial basis per edge (zero-padded R columns).
        envm:  (E, 1) cosine envelope * edge mask (0 on masked edges —
            this is what kills dead/padded edges; the one-hot is unmasked).
        nbr:   (E, 1) int32 neighbor slot (< N, any value on masked edges).
        unit3: (3, N_pad, M) unit displacement components.
        dw/db: (R_pad, 3F) / (1, 3F) dist_embed weights.
        routing: "bf16x2" (default — hi+lo bf16 split dots, near-f32
            accuracy at single-pass MXU speed) or "f32" (exact multi-pass
            f32 dots; use for bitwise parity against the dense path).
    Returns:
        ds (N_pad, F), dv (3, N_pad, F).
    """
    return _message_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                           n_blk=n_blk, routing=routing)


def _fused_fwd(phi, vcat, rbf, envm, nbr, unit3, dw, db, n_blk, routing):
    out = _message_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                          n_blk=n_blk, routing=routing)
    return out, (phi, vcat, rbf, envm, nbr, unit3, dw, db)


def _bwd_block(n_pad: int, n_blk: int) -> int:
    """Largest multiple-of-8 divisor of n_pad that is <= max(n_blk//2, 8)
    — the backward wants roughly half the forward block (it keeps ~2x
    the live per-edge tensors in VMEM) but the grid must still tile
    n_pad exactly (an uneven tiling would silently skip the tail
    centers' gradients), and Mosaic requires >= 8 on the center axis
    (blocks of 4 never lower on real TPU; prepare_fused_geometry pads
    n_pad to multiples of 16, so 8 always divides)."""
    target = max(n_blk // 2, 8)
    for cand in range(target, 7, -8):
        if n_pad % cand == 0:
            return cand
    return 8


def _fused_bwd(n_blk, routing, res, ct):
    phi, vcat, rbf, envm, nbr, unit3, dw, db = res
    gds, gdv = ct
    g_phi, g_vcat, g_rbf, g_envm, g_unit3, g_dw, g_db = _message_bwd_pallas(
        phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
        n_blk=_bwd_block(phi.shape[0], n_blk), routing=routing,
    )
    g_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return g_phi, g_vcat, g_rbf, g_envm, g_nbr, g_unit3, g_dw, g_db


painn_message_fused.defvjp(_fused_fwd, _fused_bwd)


def choose_message_block(n_pad: int) -> int:
    """Center-block size vs system size. The scoped-VMEM budget is 16 MB;
    the E_blk-proportional buffers (w/phij/vj/inv + one-hot) dominate.
    Empirical: n_blk=16 fits at N_pad=128 and ooms by 9% at N_pad=496
    (v5e, F=128, M=64), so halve the block as N grows. 8 is the floor:
    Mosaic requires the second-minor block dim (unit3's center axis) to
    be a multiple of 8, so n_blk=4 never lowers on real TPU — the
    one-hot VMEM term keeps growing with n_pad, but at n_blk=8 it stays
    under budget past 4k slots (the full-resident phi/vcat copies become
    the binding term first)."""
    return 16 if n_pad <= 256 else 8


def prepare_fused_geometry(unit, rbf, env, nbr_j, nbr_mask, n_rbf,
                           n_blk=16):
    """Pad + flatten per-structure edge geometry for the fused kernel.

    Inputs are the (N, M[, ...]) arrays painn_features already builds;
    returns (rbf_p (E, R_pad), envm_p (E, 1), nbr_p (E, 1), unit_p
    (3, N_pad, M), n_pad). Shared across layers AND ensemble members —
    build once per structure.
    """
    N, M = nbr_j.shape
    n_pad = ((N + n_blk - 1) // n_blk) * n_blk
    r_pad = ((n_rbf + 7) // 8) * 8
    pad_n = n_pad - N
    dtype = rbf.dtype
    envm = env[..., 0] * nbr_mask.astype(dtype)              # (N, M)
    rbf_p = jnp.pad(rbf, ((0, pad_n), (0, 0), (0, r_pad - n_rbf)))
    rbf_p = rbf_p.reshape(n_pad * M, r_pad)
    envm_p = jnp.pad(envm, ((0, pad_n), (0, 0))).reshape(n_pad * M, 1)
    nbr_p = jnp.pad(nbr_j, ((0, pad_n), (0, 0))).reshape(n_pad * M, 1)
    nbr_p = nbr_p.astype(jnp.int32)
    unit_p = jnp.pad(unit, ((0, pad_n), (0, 0), (0, 0)))     # (N_pad, M, 3)
    unit_p = jnp.moveaxis(unit_p, 2, 0)                      # (3, N_pad, M)
    return rbf_p, envm_p, nbr_p, unit_p, n_pad
