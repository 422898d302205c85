"""Fused Pallas TPU kernel for the CHGNet atom-graph convolution.

Profiling the LaMnO3 MC hot path shows the atom conv IS the model: the
bond/angle branch costs nothing measurable (127.0 vs 126.8 ms per
64-chain batch with it ablated), while each atom conv layer gathers
a_j = atom[nbr_j] over a (N, 96, F) edge set and runs a two-layer gated
MLP per edge — all through HBM, with TPU row-gathers serializing on the
scalar units. This kernel fuses the whole per-edge pipeline (neighbor
routing, the 3F->F gated MLP with its LayerNorms, the bond-weight mask,
and the neighbor-axis reduction) into one VMEM-resident pass, mirroring
ops/pallas_painn.py.

Math fused (models/chgnet.py:260-267, _apply_gated at :182-192):

    x      = [a_i | a_j | bond_emb]                  # (E, 3F)
    h0     = silu(x @ W0 + b0)        (core & gate branches)
    h1     = h0 @ W1 + b1             (per branch)
    msg    = silu(LN(h1_core)) * sigmoid(LN(h1_gate)) * bond_w * mask
    agg_i  = sum_m msg

The concat never materializes: a_i@W0 and a_j@W0 are precomputed per
ATOM outside (cheap (N, F) matmuls), a_j terms are routed per edge with
a one-hot MXU dot, and the bond term is a per-edge dot inside the
kernel. Branch selection after the shared silu(h0) uses zero-extended
weights ((2F, F) with the other branch's rows zeroed) so no lane-dim
slicing is needed.

Gradients: custom VJP whose backward is itself a fused Pallas kernel
(_conv_bwd_kernel): it recomputes the forward in VMEM (cheaper than
streaming residuals through HBM) and emits every input cotangent in one
pass; weight grads accumulate across grid steps into pinned output
blocks. Same bf16x2/f32 routing switch as the forward; every cotangent
is pinned against the pure-JAX reference VJP in tests (bf16x2 tolerance
~2e-3 on O(1) inputs). The backward is wrapped as _conv_bwd_op, whose
own VJP is the pure-XLA double-VJP of _conv_ref — so force losses
(grad-of-grad) keep the energy forward AND the force pass on the fused
kernels, with only the loss-gradient pass through the force term in XLA
(second order pinned in tests/test_chgnet.py::test_chgnet_conv_second_order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_sampling_tpu.ops.pallas_routing import onehot_router


def _ln(g, b, x, eps=1e-5):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _conv_kernel(ai2_ref, aj2_ref, be_ref, bw_ref, maskf_ref, nbr_ref,
                 w2_ref, wc1_ref, wg1_ref, bc1_ref, bg1_ref,
                 lnc_ref, lng_ref, agg_ref, *, routing="bf16x2"):
    """One block of n_blk centers; E = n_blk * M edges live in VMEM.

    ai2 (blocked (n_blk, 2F) center rows) / aj2 (full (N_pad, 2F)):
    center/neighbor pre-activations for [core|gate] (biases already
    folded into ai2). w2: (F, 2F) bond-basis weights.
    wc1/wg1: (2F, F) zero-extended second-layer weights. lnc/lng:
    (2, F) LayerNorm gain;bias rows.
    """
    E, F = be_ref.shape
    n_pad, _ = aj2_ref.shape
    n_blk = agg_ref.shape[0]
    M = E // n_blk

    _route, _ = onehot_router(nbr_ref[:], n_pad, routing)

    ajr = _route(aj2_ref[:])                                 # (E, 2F)
    ai_b = jnp.broadcast_to(
        ai2_ref[:][:, None, :], (n_blk, M, 2 * F)
    ).reshape(E, 2 * F)
    h0 = ai_b + ajr + jnp.dot(be_ref[:], w2_ref[:],
                              preferred_element_type=jnp.float32)
    h0 = jax.nn.silu(h0)                                     # (E, 2F)

    hc = jnp.dot(h0, wc1_ref[:], preferred_element_type=jnp.float32) + bc1_ref[:]
    hg = jnp.dot(h0, wg1_ref[:], preferred_element_type=jnp.float32) + bg1_ref[:]
    core = jax.nn.silu(_ln(lnc_ref[0:1, :], lnc_ref[1:2, :], hc))
    gate = jax.nn.sigmoid(_ln(lng_ref[0:1, :], lng_ref[1:2, :], hg))
    msg = core * gate * bw_ref[:] * maskf_ref[:]             # (E, F)
    agg_ref[:] = jnp.sum(msg.reshape(n_blk, M, F), axis=1)


def _conv_pallas(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                 lnc, lng, *, n_blk, routing):
    n_pad, f2 = ai2.shape
    F = f2 // 2
    E = be.shape[0]
    M = E // n_pad
    e_blk = n_blk * M
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    return pl.pallas_call(
        functools.partial(_conv_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_blk, f2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_blk, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, F), ai2.dtype),
        interpret=interpret,
    )(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng)


def _conv_kernel_banded(ws_ref, ai2_ref, aj2_ref, be_ref, bw_ref, maskf_ref,
                        nbr_ref, w2_ref, wc1_ref, wg1_ref, bc1_ref, bg1_ref,
                        lnc_ref, lng_ref, agg_ref, *, routing="bf16x2",
                        n_pad=0, window=0):
    """Block-banded variant of :func:`_conv_kernel` — the supercell fast
    path (ops/banding.py): rows arrive in sorted spatial order with the
    wrap halo appended to aj2, and each center block routes against a
    W-wide window of the neighbor table instead of all n_pad rows
    (mirrors ops/pallas_painn._msg_kernel_banded; same ws8 sublane
    trick — see the comment there)."""
    E, F = be_ref.shape
    n_blk = agg_ref.shape[0]
    M = E // n_blk

    s = ws_ref[0, pl.program_id(0)] * 8
    aj_win = aj2_ref[pl.ds(s, window), :]                    # (W, 2F)

    col = nbr_ref[:] - s
    col = jnp.where(col < 0, col + n_pad, col)               # (E, 1)
    _route, _ = onehot_router(col, window, routing)

    ajr = _route(aj_win)                                     # (E, 2F)
    ai_b = jnp.broadcast_to(
        ai2_ref[:][:, None, :], (n_blk, M, 2 * F)
    ).reshape(E, 2 * F)
    h0 = ai_b + ajr + jnp.dot(be_ref[:], w2_ref[:],
                              preferred_element_type=jnp.float32)
    h0 = jax.nn.silu(h0)

    hc = jnp.dot(h0, wc1_ref[:], preferred_element_type=jnp.float32) + bc1_ref[:]
    hg = jnp.dot(h0, wg1_ref[:], preferred_element_type=jnp.float32) + bg1_ref[:]
    core = jax.nn.silu(_ln(lnc_ref[0:1, :], lnc_ref[1:2, :], hc))
    gate = jax.nn.sigmoid(_ln(lng_ref[0:1, :], lng_ref[1:2, :], hg))
    msg = core * gate * bw_ref[:] * maskf_ref[:]
    agg_ref[:] = jnp.sum(msg.reshape(n_blk, M, F), axis=1)


def chgnet_conv_fused_banded(ai2, aj2_ext, be, bw, maskf, nbr, w2, wc1, wg1,
                             bc1, bg1, lnc, lng, win_start, *, n_blk, window,
                             n_pad, routing="bf16x2"):
    """Banded fused CHGNet atom conv (forward-only — the rigid MC hot
    path needs no gradients; relax-mode CHGNet stays on the full-width
    kernel or the gather path). ``ai2``/per-edge tensors in SORTED band
    order ((n_pad, 2F) / (E, ·) with nbr carrying sorted ranks);
    ``aj2_ext`` is the sorted neighbor table with the wrap halo appended
    ((n_pad + halo, 2F)). Returns agg in sorted order (n_pad, F)."""
    n_ext, f2 = aj2_ext.shape
    F = f2 // 2
    E = be.shape[0]
    M = E // n_pad
    e_blk = n_blk * M
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_conv_kernel_banded, routing=routing, n_pad=n_pad,
                          window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((n_blk, f2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_ext, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, F), ai2.dtype),
        interpret=interpret,
    )((win_start // 8)[None, :], ai2, aj2_ext, be, bw, maskf, nbr, w2, wc1,
      wg1, bc1, bg1, lnc, lng)


def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _ln_fwd_bwd(g, b, x, dy, eps=1e-5):
    """LayerNorm forward + backward in one pass. Returns (dx, dgamma, dbeta)
    where dgamma/dbeta are summed over rows."""
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    dgamma = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * g
    dx = inv * (dxhat - dxhat.mean(axis=-1, keepdims=True)
                - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    return dx, dgamma, dbeta


def _conv_bwd_kernel(ai2_ref, aj2_ref, be_ref, bw_ref, maskf_ref, nbr_ref,
                     w2_ref, wc1_ref, wg1_ref, bc1_ref, bg1_ref,
                     lnc_ref, lng_ref, gagg_ref,
                     gai2_ref, gaj2_ref, gbe_ref, gbw_ref, gw2_ref,
                     gwc1_ref, gwg1_ref, gbc1_ref, gbg1_ref,
                     glnc_ref, glng_ref, *, routing="bf16x2"):
    """Fused backward for the atom conv: VMEM forward recompute + all
    input cotangents; weight/aj2 grads accumulate across grid steps."""
    E, F = be_ref.shape
    n_pad, f2 = aj2_ref.shape
    n_blk = gagg_ref.shape[0]
    M = E // n_blk

    _route, _scatter = onehot_router(
        nbr_ref[:], n_pad, routing, f32_precision=jax.lax.Precision.HIGHEST
    )

    # ---- forward recompute ----
    ajr = _route(aj2_ref[:])
    ai_b = jnp.broadcast_to(ai2_ref[:][:, None, :], (n_blk, M, f2)).reshape(E, f2)
    pre = ai_b + ajr + jnp.dot(be_ref[:], w2_ref[:],
                               preferred_element_type=jnp.float32)
    h0 = jax.nn.silu(pre)
    hc = jnp.dot(h0, wc1_ref[:], preferred_element_type=jnp.float32) + bc1_ref[:]
    hg = jnp.dot(h0, wg1_ref[:], preferred_element_type=jnp.float32) + bg1_ref[:]
    gc_, bc_ = lnc_ref[0:1, :], lnc_ref[1:2, :]
    gg_, bg_ = lng_ref[0:1, :], lng_ref[1:2, :]
    mu_c = hc.mean(axis=-1, keepdims=True)
    inv_c = jax.lax.rsqrt(((hc - mu_c) ** 2).mean(axis=-1, keepdims=True) + 1e-5)
    yc = (hc - mu_c) * inv_c * gc_ + bc_
    mu_g = hg.mean(axis=-1, keepdims=True)
    inv_g = jax.lax.rsqrt(((hg - mu_g) ** 2).mean(axis=-1, keepdims=True) + 1e-5)
    yg = (hg - mu_g) * inv_g * gg_ + bg_
    core = jax.nn.silu(yc)
    gate = jax.nn.sigmoid(yg)

    # ---- backward ----
    scale = bw_ref[:] * maskf_ref[:]
    gmsg = jnp.broadcast_to(gagg_ref[:][:, None, :], (n_blk, M, F)).reshape(E, F)
    gbw_ref[:] = gmsg * core * gate * maskf_ref[:]
    gcore = gmsg * gate * scale
    ggate = gmsg * core * scale
    dyc = gcore * _silu_grad(yc)
    dyg = ggate * gate * (1.0 - gate)
    dhc, dgc, dbc = _ln_fwd_bwd(gc_, bc_, hc, dyc)
    dhg, dgg, dbg = _ln_fwd_bwd(gg_, bg_, hg, dyg)
    dh0 = (jax.lax.dot_general(dhc, wc1_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + jax.lax.dot_general(dhg, wg1_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32))
    dpre = dh0 * _silu_grad(pre)
    gai2_ref[:] = jnp.sum(dpre.reshape(n_blk, M, f2), axis=1)
    gbe_ref[:] = jax.lax.dot_general(
        dpre, w2_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    gaj2_blk = _scatter(dpre)
    gw2_blk = jax.lax.dot_general(be_ref[:], dpre, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    gwc1_blk = jax.lax.dot_general(h0, dhc, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    gwg1_blk = jax.lax.dot_general(h0, dhg, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gaj2_ref[:] = jnp.zeros_like(gaj2_ref)
        gw2_ref[:] = jnp.zeros_like(gw2_ref)
        gwc1_ref[:] = jnp.zeros_like(gwc1_ref)
        gwg1_ref[:] = jnp.zeros_like(gwg1_ref)
        gbc1_ref[:] = jnp.zeros_like(gbc1_ref)
        gbg1_ref[:] = jnp.zeros_like(gbg1_ref)
        glnc_ref[:] = jnp.zeros_like(glnc_ref)
        glng_ref[:] = jnp.zeros_like(glng_ref)

    gaj2_ref[:] += gaj2_blk
    gw2_ref[:] += gw2_blk
    gwc1_ref[:] += gwc1_blk
    gwg1_ref[:] += gwg1_blk
    gbc1_ref[:] += jnp.sum(dhc, axis=0, keepdims=True)
    gbg1_ref[:] += jnp.sum(dhg, axis=0, keepdims=True)
    glnc_ref[:] += jnp.concatenate([dgc, dbc], axis=0)
    glng_ref[:] += jnp.concatenate([dgg, dbg], axis=0)


def _conv_bwd_pallas(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                     lnc, lng, gagg, *, n_blk, routing):
    n_pad, f2 = aj2.shape
    F = f2 // 2
    E = be.shape[0]
    M = E // n_pad
    e_blk = n_blk * M
    grid = (n_pad // n_blk,)
    interpret = jax.default_backend() == "cpu"
    full = lambda i: (0, 0)
    blk = lambda i: (i, 0)
    return pl.pallas_call(
        functools.partial(_conv_bwd_kernel, routing=routing),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_blk, f2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, 1), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blk, F), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_blk, f2), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((e_blk, F), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((F, f2), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((f2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, F), full, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, f2), ai2.dtype),
            jax.ShapeDtypeStruct((n_pad, f2), ai2.dtype),
            jax.ShapeDtypeStruct((E, F), ai2.dtype),
            jax.ShapeDtypeStruct((E, F), ai2.dtype),
            jax.ShapeDtypeStruct((F, f2), ai2.dtype),
            jax.ShapeDtypeStruct((f2, F), ai2.dtype),
            jax.ShapeDtypeStruct((f2, F), ai2.dtype),
            jax.ShapeDtypeStruct((1, F), ai2.dtype),
            jax.ShapeDtypeStruct((1, F), ai2.dtype),
            jax.ShapeDtypeStruct((2, F), ai2.dtype),
            jax.ShapeDtypeStruct((2, F), ai2.dtype),
        ],
        interpret=interpret,
    )(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng, gagg)


def _conv_ref(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng):
    """Pure-JAX reference of the fused conv (same padded inputs). On
    non-CPU backends the neighbor access is a one-hot matmul so the VJP
    lowers to MXU dots instead of scatter-adds (see pallas_painn)."""
    n_pad, f2 = ai2.shape
    F = f2 // 2
    E = be.shape[0]
    M = E // n_pad
    j = nbr[:, 0]
    if jax.default_backend() == "cpu":
        ajr = aj2[j]
    else:
        onehot = jax.nn.one_hot(j, n_pad, dtype=ai2.dtype)
        ajr = jax.lax.dot_general(
            onehot, aj2, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)             # exact: 0/1 lhs
    ai_b = jnp.repeat(ai2, M, axis=0)                        # (E, 2F)
    h0 = jax.nn.silu(ai_b + ajr + be @ w2)
    hc = h0 @ wc1 + bc1
    hg = h0 @ wg1 + bg1
    core = jax.nn.silu(_ln(lnc[0:1], lnc[1:2], hc))
    gate = jax.nn.sigmoid(_ln(lng[0:1], lng[1:2], hg))
    msg = core * gate * bw * maskf
    return jnp.sum(msg.reshape(n_pad, M, F), axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15))
def _conv_bwd_op(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                 lnc, lng, ct, n_blk, routing):
    """First-order backward of the fused conv as a differentiable op.

    Forward = the fused Pallas backward kernel (_conv_bwd_pallas); its own
    VJP — what grad-of-grad training losses hit (the force loss is
    d/dtheta of dE/dx) — is the pure-XLA double-VJP of the conv reference
    (_conv_ref). So the energy forward AND the force evaluation both ride
    the fused kernels, and only the loss-gradient pass through the force
    term falls back to XLA (mirrors ops/pallas_painn._message_bwd_op,
    whose second order is a hand-fused bwd2 kernel; here the gated
    MLP + twin LayerNorms make the XLA route the sane one).
    """
    return _conv_bwd_pallas(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1,
                            bc1, bg1, lnc, lng, ct,
                            n_blk=n_blk, routing=routing)


def _conv_bwd_op_fwd(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                     lnc, lng, ct, n_blk, routing):
    out = _conv_bwd_op(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1,
                       bg1, lnc, lng, ct, n_blk, routing)
    return out, (ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                 lnc, lng, ct)


def _conv_bwd_op_bwd(n_blk, routing, res, cg):
    (ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng,
     ct) = res

    def bwd_xla(ai2_, aj2_, be_, bw_, w2_, wc1_, wg1_, bc1_, bg1_, lnc_,
                lng_, ct_):
        def f(a, b, c, d, e, g, h, i, j, k, m):
            return _conv_ref(a, b, c, d, maskf, nbr, e, g, h, i, j, k, m)

        _, vjp = jax.vjp(f, ai2_, aj2_, be_, bw_, w2_, wc1_, wg1_, bc1_,
                         bg1_, lnc_, lng_)
        return vjp(ct_)

    _, vjp2 = jax.vjp(bwd_xla, ai2, aj2, be, bw, w2, wc1, wg1, bc1, bg1,
                      lnc, lng, ct)
    (c_ai2, c_aj2, c_be, c_bw, c_w2, c_wc1, c_wg1, c_bc1, c_bg1, c_lnc,
     c_lng, c_ct) = vjp2(cg)
    c_maskf = jnp.zeros_like(maskf)
    c_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return (c_ai2, c_aj2, c_be, c_bw, c_maskf, c_nbr, c_w2, c_wc1, c_wg1,
            c_bc1, c_bg1, c_lnc, c_lng, c_ct)


_conv_bwd_op.defvjp(_conv_bwd_op_fwd, _conv_bwd_op_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def chgnet_conv_fused(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                      lnc, lng, n_blk=16, routing="bf16x2"):
    """Fused CHGNet atom conv: per-edge gated-MLP messages -> (N_pad, F).

    All inputs padded: N_pad % n_blk == 0, E = N_pad * M rows. maskf is
    the f32 edge mask (0 kills dead/padded edges). routing as in
    ops/pallas_painn.painn_message_fused.
    """
    return _conv_pallas(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1,
                        bg1, lnc, lng, n_blk=n_blk, routing=routing)


def _fused_fwd(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
               lnc, lng, n_blk, routing):
    # recursive decorated call — second-order traces (the force loss's
    # outer grad) would otherwise hit the raw pallas call with JVP
    # tracers (see ops/pallas_painn._fused_fwd)
    out = chgnet_conv_fused(ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1,
                            bc1, bg1, lnc, lng, n_blk, routing)
    return out, (ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1,
                 lnc, lng)


def _fused_bwd(n_blk, routing, res, ct):
    from surface_sampling_tpu.ops.pallas_painn import _bwd_block

    ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng = res
    (g_ai2, g_aj2, g_be, g_bw, g_w2, g_wc1, g_wg1, g_bc1, g_bg1, g_lnc,
     g_lng) = _conv_bwd_op(
        ai2, aj2, be, bw, maskf, nbr, w2, wc1, wg1, bc1, bg1, lnc, lng, ct,
        _bwd_block(ai2.shape[0], n_blk), routing,
    )
    # maskf derives from the boolean edge mask — no gradient flows upstream
    g_maskf = jnp.zeros_like(maskf)
    g_nbr = np.zeros(nbr.shape, dtype=jax.dtypes.float0)
    return (g_ai2, g_aj2, g_be, g_bw, g_maskf, g_nbr, g_w2, g_wc1, g_wg1,
            g_bc1, g_bg1, g_lnc, g_lng)


chgnet_conv_fused.defvjp(_fused_fwd, _fused_bwd)
