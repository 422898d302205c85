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
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_sampling_tpu.ops.pallas_routing import (
    exact01_dot,
    filter_dot,
    onehot_router,
)


def _msg_kernel(phi_ref, vcat_ref, rbf_ref, envm_ref, nbr_ref, unit_ref,
                dw_ref, db_ref, ds_ref, dv_ref, *, routing="bf16x2"):
    """One block of N_blk centers; E = N_blk * M edges live in VMEM."""
    E, _ = rbf_ref.shape
    n_pad, f3 = phi_ref.shape
    F = f3 // 3
    n_blk = ds_ref.shape[0]
    M = E // n_blk

    # radial filter, built in VMEM (never written to HBM). Precision is
    # pinned per-mode inside filter_dot: Mosaic only lowers
    # DEFAULT/HIGHEST dots, so an ambient default_matmul_precision
    # context (models/painn.py dense blocks) must not leak in.
    w = filter_dot(rbf_ref[:], dw_ref[:], routing)
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


def _msg_kernel_l1(sp8_ref, philt_ref, rbf_ref, envm_ref, nbr_ref, unit_ref,
                   dw_ref, db_ref, ds_ref, dv_ref, *, routing="bf16x2"):
    """First-message-layer kernel. Layer 1 has exact structure the
    general kernel can't use: (a) v == 0, so the vcat route (half the
    routing MXU passes) and the c_vv * v_j term vanish identically;
    (b) the input s is the alive-masked atom embedding, so phi takes at
    most n_types distinct rows — the (E, n_pad) @ (n_pad, 3F) feature
    route collapses to an exact (E, n_pad) @ (n_pad, 8) species route
    (0/1 @ 0/1, single bf16 pass) followed by an (E, 8) @ (8, 2F) table
    dot. Layer 1 drops from the full kernel's ~1.84 GFLOP/eval to the
    radial filter's ~0.15 (measured 14.5 -> 2.9 ms per 384-batch call).
    philt/dw/db arrive pre-sliced to the last 2F (s, unit) channels —
    the vv third is dead here.
    """
    E, _ = rbf_ref.shape
    n_pad, _ = sp8_ref.shape
    f2 = philt_ref.shape[1]
    F = f2 // 2
    n_blk = ds_ref.shape[0]
    M = E // n_blk

    w = filter_dot(rbf_ref[:], dw_ref[:], routing)
    w = (w + db_ref[:]) * envm_ref[:]                        # (E, 2F)

    # species route: both operands 0/1 -> single-pass bf16 is EXACT
    _route, _ = onehot_router(nbr_ref[:], n_pad, "bf16")
    sp_j = _route(sp8_ref[:])                                # (E, 8)
    phij = exact01_dot(sp_j, philt_ref[:], routing,
                       f32_precision=jax.lax.Precision.HIGHEST)
    inv = phij * w                                           # (E, 2F)
    c_s = inv[:, :F].reshape(n_blk, M, F)
    c_unit = inv[:, F:].reshape(n_blk, M, F)
    ds_ref[:] = jnp.sum(c_s, axis=1)
    for x in range(3):
        dv_ref[x] = jnp.sum(c_unit * unit_ref[x][..., None], axis=1)


def painn_message_l1(sp8, philt, rbf, envm, nbr, unit3, dw2, db2, n_blk=16,
                     routing="bf16x2"):
    """Fused layer-1 PaiNN message (see _msg_kernel_l1). Forward-only:
    used on the rigid static-edge MC path (core/energy.py), which never
    differentiates. ``sp8``: (N_pad, 8) species one-hot (dead slots all
    zero); ``philt``: (8, 2F) per-species layer-1 phi rows, s|unit
    channels; ``dw2``/``db2``: dist_embed weights sliced to the same 2F
    channels. Other args as painn_message_fused. Returns ds (N_pad, F),
    dv (3, N_pad, F)."""
    n_pad, n_sp = sp8.shape
    f2 = philt.shape[1]
    F = f2 // 2
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_msg_kernel_l1, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, n_sp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sp, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), philt.dtype),
            jax.ShapeDtypeStruct((3, n_pad, F), philt.dtype),
        ],
        interpret=interpret,
    )(sp8, philt, rbf, envm, nbr, unit3, dw2, db2)


def _msg_kernel_l1_banded(ws_ref, sp8_ref, philt_ref, rbf_ref, envm_ref,
                          nbr_ref, unit_ref, dw_ref, db_ref, ds_ref, dv_ref,
                          *, routing, n_pad, window):
    """Banded variant of _msg_kernel_l1 (see it for the layer-1 math):
    the species route runs over the block's W-wide window of the sorted
    species table instead of the full n_pad columns."""
    E, _ = rbf_ref.shape
    f2 = philt_ref.shape[1]
    F = f2 // 2
    n_blk = ds_ref.shape[0]
    M = E // n_blk

    s = ws_ref[0, pl.program_id(0)] * 8          # see _msg_kernel_banded
    sp_win = sp8_ref[pl.ds(s, window), :]                    # (W, 8)

    w = filter_dot(rbf_ref[:], dw_ref[:], routing)
    w = (w + db_ref[:]) * envm_ref[:]                        # (E, 2F)

    col = nbr_ref[:] - s
    col = jnp.where(col < 0, col + n_pad, col)               # (E, 1)
    _route, _ = onehot_router(col, window, "bf16")           # 0/1: exact
    sp_j = _route(sp_win)                                    # (E, 8)
    phij = exact01_dot(sp_j, philt_ref[:], routing,
                       f32_precision=jax.lax.Precision.HIGHEST)
    inv = phij * w
    c_s = inv[:, :F].reshape(n_blk, M, F)
    c_unit = inv[:, F:].reshape(n_blk, M, F)
    ds_ref[:] = jnp.sum(c_s, axis=1)
    for x in range(3):
        dv_ref[x] = jnp.sum(c_unit * unit_ref[x][..., None], axis=1)


def painn_message_l1_banded(sp8_ext, philt, rbf, envm, nbr, unit3, dw2, db2,
                            win_start, n_blk=8, window=None, n_pad=None,
                            routing="bf16x2"):
    """Banded fused layer-1 message (forward-only; see painn_message_l1
    and painn_message_fused_banded for argument semantics). ``sp8_ext``:
    (n_pad + halo, 8) species one-hot in SORTED order with the wrap halo
    appended; outputs in sorted order."""
    n_ext, n_sp = sp8_ext.shape
    f2 = philt.shape[1]
    F = f2 // 2
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_msg_kernel_l1_banded, routing=routing,
                          n_pad=n_pad, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ext, n_sp), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_sp, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f2), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), philt.dtype),
            jax.ShapeDtypeStruct((3, n_pad, F), philt.dtype),
        ],
        interpret=interpret,
    )((win_start // 8)[None, :], sp8_ext, philt, rbf, envm, nbr, unit3,
      dw2, db2)


def _upd_kernel(s_ref, vcat_ref, uw_ref, vw_ref, w0_ref, b0_ref, w1_ref,
                b1_ref, alive_ref, so_ref, vo_ref, *, routing="bf16x2"):
    """Fused PaiNN update block (models/painn.py _painn_update): all six
    per-atom dots and every intermediate stay in VMEM. Replaces ~10 XLA
    HBM round-trips of (chains, N, 3F)-sized tensors per layer (measured
    5.6 of the 46 ms 128-chain flagship batch) with one row-blocked
    pass. Dots run 3-pass two-sided bf16 splits (filter_dot bf16x2 —
    ~1e-7 relative); the "f32" bitwise-parity mode keeps the XLA path
    (models/painn.py gates on routing)."""
    B, F = so_ref.shape
    s = s_ref[:]
    am = alive_ref[:]                                        # (B, 1)

    uvs, vvs, vxs = [], [], []
    for x in range(3):
        vx = vcat_ref[:, x * F:(x + 1) * F]                  # (B, F)
        vxs.append(vx)
        uvs.append(filter_dot(vx, uw_ref[:], routing))
        vvs.append(filter_dot(vx, vw_ref[:], routing))
    vv_sq = uvs[0] * 0.0
    inner = uvs[0] * 0.0
    for x in range(3):
        vv_sq = vv_sq + vvs[x] * vvs[x]
        inner = inner + uvs[x] * vvs[x]
    vv_norm = jnp.sqrt(vv_sq + 1e-16)                        # (B, F)
    stack = jnp.concatenate([s, vv_norm], axis=1)            # (B, 2F)
    h = jax.nn.silu(filter_dot(stack, w0_ref[:], routing) + b0_ref[:])
    a = filter_dot(h, w1_ref[:], routing) + b1_ref[:]        # (B, 3F)
    a_vv = a[:, :F]
    a_sv = a[:, F:2 * F]
    a_ss = a[:, 2 * F:]
    so_ref[:] = (s + a_sv * inner + a_ss) * am
    for x in range(3):
        vo_ref[:, x * F:(x + 1) * F] = (vxs[x] + a_vv * uvs[x]) * am


def choose_update_block(n_pad: int) -> int:
    """Largest multiple-of-8 divisor of n_pad up to 512 (row block of the
    fused update kernel; per-row VMEM is ~10 KB so 512 rows stay well
    inside the scoped budget)."""
    for cand in range(min(n_pad, 512), 7, -8):
        if n_pad % cand == 0:
            return cand
    return 8


def painn_update_fused(s, vcat, up, alive_col, routing="bf16x2"):
    """Fused update block over padded rows (forward-only — used on the
    rigid static-edge MC path). ``s``: (n_pad, F); ``vcat``: (n_pad, 3F)
    x-major; ``up``: the layer's update params pytree; ``alive_col``:
    (n_pad, 1) float mask (kills padded and dead rows, preserving the
    XLA path's where-masking). Returns (s', vcat')."""
    n_pad, F = s.shape
    b0 = up["s_dense0"]["b"][None, :]
    b1 = up["s_dense1"]["b"][None, :]
    n_blk = choose_update_block(n_pad)
    if n_pad % n_blk:
        # choose_update_block's 8-row fallback assumes 8 | n_pad (every
        # caller pads to block multiples); fail loudly rather than leave
        # tail rows unwritten under a truncated grid
        raise ValueError(f"n_pad={n_pad} is not a multiple of n_blk={n_blk}")
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_upd_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, 3 * F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * F, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, 3 * F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, 1), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, 3 * F), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, F), s.dtype),
            jax.ShapeDtypeStruct((n_pad, 3 * F), s.dtype),
        ],
        interpret=interpret,
    )(s, vcat, up["u_mat"]["w"], up["v_mat"]["w"], up["s_dense0"]["w"], b0,
      up["s_dense1"]["w"], b1, alive_col)


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
    wpre = filter_dot(rbf_ref[:], dw_ref[:], routing) + db_ref[:]
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


# ----------------------------------------------------------------------
# Second-order fused backward (bwd-of-bwd) — fine-tuning's force loss.
#
# The force loss is grad-of-grad: value_and_grad over params of a loss
# containing F = -dE/dx, i.e. the outer reverse pass must differentiate
# the inner reverse pass. The message op is MULTILINEAR in its inputs
# (every output monomial is a product of routing-gathered features and
# edge geometry), so the VJP of its VJP closes over the same fused-
# kernel family: one more kernel with the same block structure computes
# all second-order cotangents in a single VMEM-resident pass. With it,
# models/train.py keeps message_mode="pallas" for training instead of
# falling back to the pure-XLA dense path (reference fine-tunes via
# torch autograd's create_graph=True, nff train loop; here the second
# order is an explicit fused kernel).
#
# Derivation sketch (per edge; ∘ = elementwise, R = routing matrix):
#   forward: wpre = rbf·dw + db, w = wpre∘envm, P = R·phi, V = R·vcat,
#            inv = P∘w = [c_vv | c_s | c_u],
#            ds = Σ_m c_s,  dv_x = Σ_m (c_u∘u_x + c_vv∘V_x)
#   bwd B(inputs, ct): standard cotangents (see _msg_bwd_kernel).
#   bwd2: given cotangents cg for B's outputs, the scalar
#   S = <cg, B(inputs, ct)> expands into Q = Cφ∘w + H∘P and
#   T = [Σ_x Cv_x∘gdv_x | 0 | Σ_x cu_x⊗gdv_x] with
#   G = crbf·dw + rbf·cdw + cdb, H = G∘envm + ce∘wpre,
#   Cφ = R·cphi, Cv = R·cvcat; all input/ct grads are elementwise
#   combinations of (Q, T, g_inv, P, V, wpre, envm) plus routing dots —
#   exactly the ops the forward/backward kernels already use.
# ----------------------------------------------------------------------
def _msg_bwd2_kernel(phi_ref, vcat_ref, cphi_ref, cvcat_ref, rbf_ref,
                     envm_ref, nbr_ref, unit_ref, dw_ref, db_ref, gds_ref,
                     gdv_ref, crbf_ref, cenvm_ref, cunit_ref, cdw_ref,
                     cdb_ref,
                     dphi_ref, dvcat_ref, drbf_ref, denvm_ref, dunit_ref,
                     ddw_ref, ddb_ref, dgds_ref, dgdv_ref, *,
                     routing="bf16x2"):
    E, _ = rbf_ref.shape
    n_pad, f3 = phi_ref.shape
    F = f3 // 3
    n_blk = gds_ref.shape[0]
    M = E // n_blk

    _route, _scatter = onehot_router(
        nbr_ref[:], n_pad, routing, f32_precision=jax.lax.Precision.HIGHEST
    )
    hi_p = jax.lax.Precision.HIGHEST

    # ---- forward recompute ----
    wpre = filter_dot(rbf_ref[:], dw_ref[:], routing) + db_ref[:]
    w = wpre * envm_ref[:]                                   # (E, 3F)
    P = _route(phi_ref[:])
    V = _route(vcat_ref[:])
    inv = P * w
    c_vv = inv[:, :F].reshape(n_blk, M, F)
    c_u = inv[:, 2 * F:].reshape(n_blk, M, F)

    # ---- first-order cotangent recompute: g_inv ----
    gds_e = jnp.broadcast_to(gds_ref[:][:, None, :], (n_blk, M, F))
    g_cvv = jnp.zeros((n_blk, M, F), jnp.float32)
    g_cu = jnp.zeros((n_blk, M, F), jnp.float32)
    for x in range(3):
        gdvx = gdv_ref[x][:, None, :]                        # (n_blk, 1, F)
        ux = unit_ref[x][..., None]                          # (n_blk, M, 1)
        vjx = V[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        g_cvv = g_cvv + gdvx * vjx
        g_cu = g_cu + gdvx * ux
    g_inv = jnp.concatenate(
        [g_cvv.reshape(E, F), gds_e.reshape(E, F), g_cu.reshape(E, F)],
        axis=1)                                              # (E, 3F)

    # ---- second-order coefficient tensors ----
    Cphi = _route(cphi_ref[:])
    Cv = _route(cvcat_ref[:])
    G = (jnp.dot(crbf_ref[:], dw_ref[:], precision=hi_p,
                 preferred_element_type=jnp.float32)
         + jnp.dot(rbf_ref[:], cdw_ref[:], precision=hi_p,
                   preferred_element_type=jnp.float32)
         + cdb_ref[:])                                       # (E, 3F)
    H = G * envm_ref[:] + cenvm_ref[:] * wpre
    Q = Cphi * w + H * P                                     # (E, 3F)
    Q_vv = Q[:, :F].reshape(n_blk, M, F)
    Q_s = Q[:, F:2 * F].reshape(n_blk, M, F)
    Q_u = Q[:, 2 * F:].reshape(n_blk, M, F)

    t_vv = jnp.zeros((n_blk, M, F), jnp.float32)
    t_u = jnp.zeros((n_blk, M, F), jnp.float32)
    dgdv_parts = []
    dvcat_parts = []
    for x in range(3):
        gdvx = gdv_ref[x][:, None, :]
        ux = unit_ref[x][..., None]
        cux = cunit_ref[x][..., None]                        # (n_blk, M, 1)
        vjx = V[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        cvx = Cv[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        t_vv = t_vv + cvx * gdvx
        t_u = t_u + cux * gdvx
        # grads wrt the first-order cotangents gdv (the JVP-of-forward
        # with tangents cg, by transpose of B's linearity in ct)
        dgdv_parts.append(jnp.sum(
            Q_vv * vjx + Q_u * ux + cvx * c_vv + cux * c_u, axis=1))
        # grads wrt unit and vcat
        dunit_ref[x] = jnp.sum(Q_u * gdvx, axis=2)           # (n_blk, M)
        dvcat_parts.append((Q_vv * gdvx).reshape(E, F))
    T = jnp.concatenate(
        [t_vv.reshape(E, F), jnp.zeros((E, F), jnp.float32),
         t_u.reshape(E, F)], axis=1)                         # (E, 3F)

    dgds_ref[:] = jnp.sum(Q_s, axis=1)
    for x in range(3):
        dgdv_ref[x] = dgdv_parts[x]

    # ---- grads wrt the forward inputs ----
    dphi_blk = _scatter(H * g_inv + T * w)                   # (n_pad, 3F)
    dvcat_blk = _scatter(jnp.concatenate(dvcat_parts, axis=1))
    TP = T * P
    Z = envm_ref[:] * P * g_inv                              # ∂S/∂G
    dwpre = Cphi * envm_ref[:] * g_inv + cenvm_ref[:] * P * g_inv + TP * envm_ref[:]
    denvm_ref[:] = jnp.sum(
        Cphi * wpre * g_inv + G * P * g_inv + TP * wpre,
        axis=1, keepdims=True)
    drbf_ref[:] = (
        jax.lax.dot_general(dwpre, dw_ref[:], (((1,), (1,)), ((), ())),
                            precision=hi_p,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(Z, cdw_ref[:], (((1,), (1,)), ((), ())),
                              precision=hi_p,
                              preferred_element_type=jnp.float32))
    ddw_blk = (
        jax.lax.dot_general(rbf_ref[:], dwpre, (((0,), (0,)), ((), ())),
                            precision=hi_p,
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(crbf_ref[:], Z, (((0,), (0,)), ((), ())),
                              precision=hi_p,
                              preferred_element_type=jnp.float32))
    ddb_blk = jnp.sum(dwpre, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dphi_ref[:] = jnp.zeros_like(dphi_ref)
        dvcat_ref[:] = jnp.zeros_like(dvcat_ref)
        ddw_ref[:] = jnp.zeros_like(ddw_ref)
        ddb_ref[:] = jnp.zeros_like(ddb_ref)

    dphi_ref[:] += dphi_blk
    dvcat_ref[:] += dvcat_blk
    ddw_ref[:] += ddw_blk
    ddb_ref[:] += ddb_blk


def _message_bwd2_pallas(phi, vcat, cphi, cvcat, rbf, envm, nbr, unit3, dw,
                         db, gds, gdv, crbf, cenvm, cunit3, cdw, cdb, *,
                         n_blk, routing):
    n_pad, f3 = phi.shape
    F = f3 // 3
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    blk3 = lambda i: (0, i, 0)
    return pl.pallas_call(
        functools.partial(_msg_bwd2_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), blk3, memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, F), blk3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((n_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((n_pad * M, r_pad), phi.dtype),
            jax.ShapeDtypeStruct((n_pad * M, 1), phi.dtype),
            jax.ShapeDtypeStruct((3, n_pad, M), phi.dtype),
            jax.ShapeDtypeStruct((r_pad, f3), phi.dtype),
            jax.ShapeDtypeStruct((1, f3), phi.dtype),
            jax.ShapeDtypeStruct((n_pad, F), phi.dtype),
            jax.ShapeDtypeStruct((3, n_pad, F), phi.dtype),
        ],
        interpret=interpret,
    )(phi, vcat, cphi, cvcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
      crbf, cenvm, cunit3, cdw, cdb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def _message_bwd_op(phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
                    n_blk, routing):
    """Differentiable wrapper of the fused backward kernel: the inner
    reverse pass of force losses appears in the outer training graph as
    this op, and its own custom VJP (the bwd2 kernel above) is what
    makes grad-of-grad ride the fused kernels end to end."""
    return _message_bwd_pallas(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                               gds, gdv, n_blk=n_blk, routing=routing)


def _bwd_op_fwd(phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
                n_blk, routing):
    # recursive decorated call — see _fused_fwd for why (third-order
    # traces would otherwise hit the raw pallas call with JVP tracers)
    out = _message_bwd_op(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                          gds, gdv, n_blk, routing)
    return out, (phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv)


def _bwd_op_bwd(n_blk, routing, res, cg):
    phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv = res
    cphi, cvcat, crbf, cenvm, cunit3, cdw, cdb = cg
    (dphi, dvcat, drbf, denvm, dunit3, ddw, ddb, dgds, dgdv) = (
        _message_bwd2_pallas(
            phi, vcat, cphi, cvcat, rbf, envm, nbr, unit3, dw, db, gds,
            gdv, crbf, cenvm, cunit3, cdw, cdb, n_blk=n_blk,
            routing=routing))
    g_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return (dphi, dvcat, drbf, denvm, g_nbr, dunit3, ddw, ddb, dgds, dgdv)


_message_bwd_op.defvjp(_bwd_op_fwd, _bwd_op_bwd)


# ----------------------------------------------------------------------
# Block-banded (windowed) routing variants — supercell sizes.
#
# Identical math to the kernels above, but the slots are spatially
# sorted (ops/banding.py) so each center block's neighbors live in a
# W-wide contiguous window of the feature tables: the routing dots
# shrink from (E_blk, n_pad) to (E_blk, W). phi/vcat arrive EXTENDED
# with a halo (rows [0, H) appended after n_pad-1) so periodic-wrap
# windows stay contiguous; nbr carries sorted RANKS and the in-kernel
# column index is (rank - win_start) mod n_pad, guaranteed < W for
# every candidate by the host-side band construction.
# ----------------------------------------------------------------------
def _msg_kernel_banded(ws_ref, phi_ref, vcat_ref, rbf_ref, envm_ref, nbr_ref,
                       unit_ref, dw_ref, db_ref, ds_ref, dv_ref, *,
                       routing, n_pad, window):
    E, _ = rbf_ref.shape
    f3 = phi_ref.shape[1]
    F = f3 // 3
    n_blk = ds_ref.shape[0]
    M = E // n_blk

    # win starts ship PRE-DIVIDED by 8 (ws8): Mosaic must statically
    # prove the dynamic-slice start is a sublane multiple, and
    # `ws8 * 8` is provable where a raw table value is not. They also
    # ship 2-D (1, NB): vmapping the call (incremental MC over chains)
    # batches SMEM operands too, and only a trailing (1, NB) block
    # keeps the last-two-dims rule satisfied under that batching.
    s = ws_ref[0, pl.program_id(0)] * 8
    phi_win = phi_ref[pl.ds(s, window), :]                   # (W, 3F)
    vcat_win = vcat_ref[pl.ds(s, window), :]

    w = filter_dot(rbf_ref[:], dw_ref[:], routing)
    w = (w + db_ref[:]) * envm_ref[:]                        # (E, 3F)

    col = nbr_ref[:] - s
    col = jnp.where(col < 0, col + n_pad, col)               # (E, 1)
    _route, _ = onehot_router(
        col, window, routing, f32_precision=jax.lax.Precision.HIGHEST
    )

    phij = _route(phi_win)
    inv = phij * w
    c_vv = inv[:, :F].reshape(n_blk, M, F)
    c_s = inv[:, F:2 * F].reshape(n_blk, M, F)
    c_unit = inv[:, 2 * F:].reshape(n_blk, M, F)
    ds_ref[:] = jnp.sum(c_s, axis=1)

    vj = _route(vcat_win)
    for x in range(3):
        ux = unit_ref[x]                                     # (n_blk, M)
        vjx = vj[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        dv_ref[x] = jnp.sum(c_unit * ux[..., None] + c_vv * vjx, axis=1)


def _message_pallas_banded(phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db,
                           win_start, *, n_blk, window, n_pad, routing):
    n_ext, f3 = phi_ext.shape
    F = f3 // 3
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_msg_kernel_banded, routing=routing, n_pad=n_pad,
                          window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ext, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ext, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((n_pad, F), phi_ext.dtype),
            jax.ShapeDtypeStruct((3, n_pad, F), phi_ext.dtype),
        ],
        interpret=interpret,
    )((win_start // 8)[None, :], phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db)


def painn_message_subset(phi_ext, vcat_ext, rbf_sel, envm_sel, nbr_sel,
                         unit_sel, dw, db, ws_sel, *, n_blk, window, n_pad,
                         routing="bf16x2"):
    """Subset-grid banded message pass — the delta-locality MC hot op
    (core/incremental.py): same kernel as painn_message_fused_banded but
    the grid runs over NB SELECTED center blocks (a move's hop ball at
    block granularity) instead of all of them.

    The per-block edge geometry (rbf/envm/nbr/unit) arrives PRE-GATHERED
    in compact block order — (NB*n_blk*M, ...) rows / (3, NB*n_blk, M) —
    and ``ws_sel`` is the (NB,) window start of each selected block
    (win_start[blocks]). phi_ext/vcat_ext stay full sorted+halo tables
    (windows overlap too much to pre-gather). Forward-only: rigid MC
    needs no gradients. Returns compact ds (NB*n_blk, F),
    dv (3, NB*n_blk, F).
    """
    NB = ws_sel.shape[0]
    n_ext, f3 = phi_ext.shape
    F = f3 // 3
    _, _, M = unit_sel.shape
    e_blk = n_blk * M
    r_pad = rbf_sel.shape[1]
    interpret = jax.default_backend() == "cpu"
    return pl.pallas_call(
        functools.partial(_msg_kernel_banded, routing=routing, n_pad=n_pad,
                          window=window),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ext, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ext, f3), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((NB * n_blk, F), phi_ext.dtype),
            jax.ShapeDtypeStruct((3, NB * n_blk, F), phi_ext.dtype),
        ],
        interpret=interpret,
    )((ws_sel // 8)[None, :], phi_ext, vcat_ext, rbf_sel, envm_sel, nbr_sel, unit_sel, dw, db)


def _msg_bwd_kernel_banded(ws_ref, phi_ref, vcat_ref, rbf_ref, envm_ref,
                           nbr_ref, unit_ref, dw_ref, db_ref, gds_ref, gdv_ref,
                           gphi_ref, gvcat_ref, grbf_ref, genvm_ref, gunit_ref,
                           gdw_ref, gdb_ref, *, routing, n_pad, window):
    """Banded fused backward: forward recomputed over the block's window;
    phi/vcat cotangents scatter-accumulate into the window slice of the
    pinned extended-length outputs (grid steps run sequentially on TPU,
    so overlapping windows accumulate correctly)."""
    E, _ = rbf_ref.shape
    f3 = phi_ref.shape[1]
    F = f3 // 3
    n_blk = gds_ref.shape[0]
    M = E // n_blk

    # win starts ship PRE-DIVIDED by 8 and 2-D (1, NB) — see
    # _msg_kernel_banded
    s = ws_ref[0, pl.program_id(0)] * 8
    phi_win = phi_ref[pl.ds(s, window), :]
    vcat_win = vcat_ref[pl.ds(s, window), :]
    col = nbr_ref[:] - s
    col = jnp.where(col < 0, col + n_pad, col)
    _route, _scatter = onehot_router(
        col, window, routing, f32_precision=jax.lax.Precision.HIGHEST
    )

    hi_p = jax.lax.Precision.HIGHEST
    wpre = filter_dot(rbf_ref[:], dw_ref[:], routing) + db_ref[:]
    w = wpre * envm_ref[:]
    phij = _route(phi_win)
    vj = _route(vcat_win)
    inv = phij * w
    c_vv = inv[:, :F].reshape(n_blk, M, F)
    c_unit = inv[:, 2 * F:].reshape(n_blk, M, F)

    gds_e = jnp.broadcast_to(gds_ref[:][:, None, :], (n_blk, M, F))
    g_c_unit = jnp.zeros((n_blk, M, F), jnp.float32)
    g_c_vv = jnp.zeros((n_blk, M, F), jnp.float32)
    gvj_parts = []
    for x in range(3):
        gdvx = gdv_ref[x][:, None, :]
        ux = unit_ref[x][..., None]
        vjx = vj[:, x * F:(x + 1) * F].reshape(n_blk, M, F)
        g_c_unit = g_c_unit + gdvx * ux
        g_c_vv = g_c_vv + gdvx * vjx
        gunit_ref[x] = jnp.sum(gdvx * c_unit, axis=2)
        gvj_parts.append((gdvx * c_vv).reshape(E, F))
    g_inv = jnp.concatenate(
        [g_c_vv.reshape(E, F), gds_e.reshape(E, F), g_c_unit.reshape(E, F)],
        axis=1)

    g_phij = g_inv * w
    g_w = g_inv * phij
    gwe = g_w * envm_ref[:]
    genvm_ref[:] = jnp.sum(g_w * wpre, axis=1, keepdims=True)
    grbf_ref[:] = jax.lax.dot_general(
        gwe, dw_ref[:], (((1,), (1,)), ((), ())), precision=hi_p,
        preferred_element_type=jnp.float32)

    g_phi_win = _scatter(g_phij)                             # (W, 3F)
    g_vcat_win = _scatter(jnp.concatenate(gvj_parts, axis=1))
    g_dw_blk = jax.lax.dot_general(
        rbf_ref[:], gwe, (((0,), (0,)), ((), ())), precision=hi_p,
        preferred_element_type=jnp.float32)
    g_db_blk = jnp.sum(gwe, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gphi_ref[:] = jnp.zeros_like(gphi_ref)
        gvcat_ref[:] = jnp.zeros_like(gvcat_ref)
        gdw_ref[:] = jnp.zeros_like(gdw_ref)
        gdb_ref[:] = jnp.zeros_like(gdb_ref)

    gphi_ref[pl.ds(s, window), :] += g_phi_win
    gvcat_ref[pl.ds(s, window), :] += g_vcat_win
    gdw_ref[:] += g_dw_blk
    gdb_ref[:] += g_db_blk


def _message_bwd_pallas_banded(phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw,
                               db, win_start, gds, gdv, *, n_blk, window,
                               n_pad, routing):
    n_ext, f3 = phi_ext.shape
    F = f3 // 3
    _, _, M = unit3.shape
    e_blk = n_blk * M
    r_pad = rbf.shape[1]
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_msg_bwd_kernel_banded, routing=routing,
                          n_pad=n_pad, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_ext, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ext, f3), full, memory_space=pltpu.VMEM),
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
            pl.BlockSpec((n_ext, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ext, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, r_pad), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_blk, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, f3), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f3), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_ext, f3), phi_ext.dtype),
            jax.ShapeDtypeStruct((n_ext, f3), phi_ext.dtype),
            jax.ShapeDtypeStruct((n_pad * M, r_pad), phi_ext.dtype),
            jax.ShapeDtypeStruct((n_pad * M, 1), phi_ext.dtype),
            jax.ShapeDtypeStruct((3, n_pad, M), phi_ext.dtype),
            jax.ShapeDtypeStruct((r_pad, f3), phi_ext.dtype),
            jax.ShapeDtypeStruct((1, f3), phi_ext.dtype),
        ],
        interpret=interpret,
    )((win_start // 8)[None, :], phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, gds, gdv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def painn_message_fused_banded(phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw,
                               db, win_start, n_blk, window, n_pad,
                               routing="bf16x2"):
    """Banded fused PaiNN message block (see painn_message_fused for the
    math and argument semantics; differences for the banded path):

        phi_ext/vcat_ext: (n_pad + halo, 3F) features in SORTED slot
            order with the wrap halo appended (rows [0, halo) copied).
        nbr: (E, 1) int32 SORTED RANK of each edge's neighbor.
        win_start: (n_pad // n_blk,) int32 8-aligned window starts from
            ops.banding.build_routing_band.
        window: static window width W (every candidate satisfies
            (rank - win_start) mod n_pad < W — host-verified).

    Returns ds (n_pad, F), dv (3, n_pad, F) in SORTED order.
    """
    return _message_pallas_banded(
        phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, win_start,
        n_blk=n_blk, window=window, n_pad=n_pad, routing=routing)


def _fused_banded_fwd(phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db,
                      win_start, n_blk, window, n_pad, routing):
    # recursive decorated call — see _fused_fwd for why
    out = painn_message_fused_banded(
        phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, win_start,
        n_blk, window, n_pad, routing)
    return out, (phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, win_start)


def _fused_banded_bwd(n_blk, window, n_pad, routing, res, ct):
    phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, win_start = res
    gds, gdv = ct
    g_phi, g_vcat, g_rbf, g_envm, g_unit3, g_dw, g_db = (
        _message_bwd_pallas_banded(
            phi_ext, vcat_ext, rbf, envm, nbr, unit3, dw, db, win_start,
            gds, gdv, n_blk=_bwd_block(n_pad, n_blk), window=window,
            n_pad=n_pad, routing=routing))
    g_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    g_ws = np.zeros(win_start.shape, dtype=jax.dtypes.float0)
    return (g_phi, g_vcat, g_rbf, g_envm, g_nbr, g_unit3, g_dw, g_db, g_ws)


painn_message_fused_banded.defvjp(_fused_banded_fwd, _fused_banded_bwd)


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
    # calls the DECORATED op (not the raw pallas call): under an outer
    # differentiation trace (grad-of-grad force losses) the fwd runs on
    # that trace's tracers, and only the custom-vjp rule knows how to
    # linearize the kernel — the raw pallas_call has no JVP rule
    out = painn_message_fused(phi, vcat, rbf, envm, nbr, unit3, dw, db,
                              n_blk, routing)
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
    # routed through the DIFFERENTIABLE wrapper (not the raw pallas
    # call): force losses put this bwd inside the outer training graph,
    # and _message_bwd_op's own custom VJP (the fused bwd2 kernel) is
    # what lets grad-of-grad stay on the fused kernels
    g_phi, g_vcat, g_rbf, g_envm, g_unit3, g_dw, g_db = _message_bwd_op(
        phi, vcat, rbf, envm, nbr, unit3, dw, db, gds, gdv,
        _bwd_block(phi.shape[0], n_blk), routing,
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


def scoped_vmem_compiler_options(n_slots: int,
                                 relax_banded: bool = False) -> dict:
    """Per-jit XLA options for programs containing the banded fused kernel
    at large slot counts (pass as ``jax.jit(..., compiler_options=...)``).

    The banded kernel pins the full sorted+halo phi/vcat tables in VMEM;
    past ~1500 slots its scoped-VMEM frame exceeds XLA's default 16 MB
    limit (measured: 17.3 MB at 1984 slots / 2688 extended rows on the
    4x4 SrTiO3 supercell) and compilation fails with a scoped-vmem stack
    OOM. ``relax_banded=True`` is for programs that differentiate the
    banded kernel inside a relaxation loop (core/local_relax.py): the
    banded BACKWARD pins the tables AND the cotangent tables, measured
    18.42 MB already at 496 slots (2x2 SrTiO3 + halo), so the raise
    kicks in at ~400 slots there. v5e has 128 MB physical VMEM, so
    raising the scoped limit for THESE programs is safe; a
    blanket/global raise is avoided because it also licenses bigger
    fusion scratch everywhere, which can hurt pipelining of small
    programs."""
    if relax_banded and n_slots >= 400:
        return {"xla_tpu_scoped_vmem_limit_kib":
                65536 if n_slots < 3500 else 98304}
    if n_slots < 1400:
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib":
            65536 if n_slots < 3500 else 98304}


class DeviceBand(NamedTuple):
    """Device-staged pieces of an ops.banding.RoutingBand (static ints
    kept as Python ints so they stay compile-time constants)."""

    perm: jnp.ndarray        # (n_pad,) sorted order
    inv_perm: jnp.ndarray    # (n_pad,)
    rank: jnp.ndarray        # (n_pad,) slot -> sorted position
    win_start: jnp.ndarray   # (n_pad // n_blk,) int32
    window: int
    halo: int
    n_blk: int


def stage_band(band) -> "DeviceBand | None":
    """ops.banding.RoutingBand (host numpy) -> DeviceBand (device)."""
    if band is None:
        return None
    return DeviceBand(
        perm=jnp.asarray(band.perm, jnp.int32),
        inv_perm=jnp.asarray(band.inv_perm, jnp.int32),
        rank=jnp.asarray(band.rank, jnp.int32),
        win_start=jnp.asarray(band.win_start, jnp.int32),
        window=int(band.window),
        halo=int(band.halo),
        n_blk=int(band.n_blk),
    )


def prepare_fused_geometry(unit, rbf, env, nbr_j, nbr_mask, n_rbf,
                           n_blk=16, band=None):
    """Pad + flatten per-structure edge geometry for the fused kernel.

    Inputs are the (N, M[, ...]) arrays painn_features already builds;
    returns (rbf_p (E, R_pad), envm_p (E, 1), nbr_p (E, 1), unit_p
    (3, N_pad, M), n_pad, band). Shared across layers AND ensemble
    members — build once per structure.

    ``band`` (a DeviceBand or host RoutingBand, optional) switches the
    geometry to the block-banded layout: rows are permuted into sorted
    spatial order and nbr carries sorted ranks, for
    painn_message_fused_banded.
    """
    N, M = nbr_j.shape
    n_pad = ((N + n_blk - 1) // n_blk) * n_blk
    r_pad = ((n_rbf + 7) // 8) * 8
    pad_n = n_pad - N
    dtype = rbf.dtype
    if band is not None and not isinstance(band, DeviceBand):
        band = stage_band(band)
    envm = env[..., 0] * nbr_mask.astype(dtype)              # (N, M)
    rbf_p = jnp.pad(rbf, ((0, pad_n), (0, 0), (0, r_pad - n_rbf)))
    envm_p = jnp.pad(envm, ((0, pad_n), (0, 0)))             # (N_pad, M)
    nbr_p = jnp.pad(nbr_j, ((0, pad_n), (0, 0))).astype(jnp.int32)
    unit_p = jnp.pad(unit, ((0, pad_n), (0, 0), (0, 0)))     # (N_pad, M, 3)
    if band is not None:
        rbf_p = rbf_p[band.perm]
        envm_p = envm_p[band.perm]
        nbr_p = band.rank[nbr_p[band.perm]]                  # values -> ranks
        unit_p = unit_p[band.perm]
    rbf_p = rbf_p.reshape(n_pad * M, r_pad)
    envm_p = envm_p.reshape(n_pad * M, 1)
    nbr_p = nbr_p.reshape(n_pad * M, 1)
    unit_p = jnp.moveaxis(unit_p, 2, 0)                      # (3, N_pad, M)
    return rbf_p, envm_p, nbr_p, unit_p, n_pad, band
