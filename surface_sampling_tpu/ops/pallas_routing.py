"""Shared one-hot neighbor routing for the fused Pallas NN kernels.

Both fused-kernel families (ops/pallas_painn.py, ops/pallas_chgnet.py)
route node features to edges as ``onehot @ x`` (and scatter edge
cotangents back as ``onehot^T @ g`` in the backwards). The bf16x2 trick
is the hot-path variant: the one-hot operand is EXACT in bf16 (0/1), so
a hi+lo split of the feature operand gives near-f32 routing in two
single-pass bf16 MXU dots instead of the multi-pass f32 contraction
(flagship: 1238 -> 1934 evals/s; measured error on the SrTiO3 ensemble
is a ~3.7 meV constant offset with <=2e-4 eV state-to-state spread —
far below sampling temperatures).

Mosaic constraint the split depends on: precision must be
``Precision.DEFAULT`` explicitly — the surrounding
``default_matmul_precision("float32")`` context would stamp an fp32
contract precision Mosaic rejects on bf16 operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filter_dot(rbf, dw, routing: str):
    """The radial-filter contraction ``rbf @ dw`` inside the fused
    kernels ((E, R) @ (R, 3F); neither operand is exact in bf16) — its
    MXU pass count tracks the routing mode's error budget:

    * ``"f32"``: the bitwise-parity 6-pass HIGHEST dot.
    * ``"bf16x2"``: 3-pass two-sided hi/lo split (drop only the lo*lo
      term, ~1e-5 relative — an order below the routing split's own
      residual, so the mode's measured error budget is unchanged) at
      half the HIGHEST passes. Mosaic lowers only DEFAULT/HIGHEST dots,
      so the native 3-pass Precision.HIGH is spelled out manually.
    * ``"bf16"``: single-pass DEFAULT (bf16-rounded operands, ~4e-3
      relative — the same scale as the mode's own feature rounding).

    Measured (v5e, flagship shapes, tools A/B): 17.6 / 12.5 / 9.6 ms
    per 384-batch message call at 6 / 3 / 1 passes under bf16x2 routing.
    """
    if routing == "f32":
        return jnp.dot(rbf, dw, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if routing == "bf16":
        return jnp.dot(rbf, dw, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
    dn = (((1,), (0,)), ((), ()))
    rh = rbf.astype(jnp.bfloat16)
    rl = (rbf - rh.astype(jnp.float32)).astype(jnp.bfloat16)
    wh = dw.astype(jnp.bfloat16)
    wl = (dw - wh.astype(jnp.float32)).astype(jnp.bfloat16)

    def _dot(a, b):
        return jax.lax.dot_general(
            a, b, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    return _dot(rh, wh) + _dot(rh, wl) + _dot(rl, wh)


def exact01_dot(a01, x, routing: str, f32_precision=None):
    """``a01 @ x`` where ``a01`` is a 0/1 (selector) matrix — exact in
    bf16, so the pass count is set by ``x`` alone: bf16x2 = hi+lo split
    (2 single-pass dots, near-f32), bf16 = 1 pass, f32 = full-precision
    dot. The explicit-matrix sibling of :func:`onehot_router` for
    selectors that are data (e.g. species one-hots) rather than an
    index table."""
    dn = (((1,), (0,)), ((), ()))
    if routing == "bf16x2":
        a16 = a01.astype(jnp.bfloat16)
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            a16, hi, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
        return out + jax.lax.dot_general(
            a16, lo, dn, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
    if routing == "bf16":
        return jax.lax.dot_general(
            a01.astype(jnp.bfloat16), x.astype(jnp.bfloat16), dn,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a01, x, dn, precision=f32_precision,
        preferred_element_type=jnp.float32)


def onehot_router(nbr, n_pad: int, routing: str, f32_precision=None):
    """(route, scatter) closures over the edge table's one-hot matrix.

    ``nbr``: (E, 1) int32 neighbor index per edge (a loaded kernel ref
    value). ``route(x)`` computes onehot @ x ((n_pad, D) -> (E, D));
    ``scatter(g)`` computes onehot^T @ g ((E, D) -> (n_pad, D)).
    ``routing``: "bf16x2" (hi+lo split dots, the near-f32 default),
    "bf16" (single-pass pure-bf16 dots — drops the lo correction for
    ~2x on the routing FLOPs at ~bf16 feature precision; an opt-in for
    high-temperature sampling where ~1e-2 eV state-to-state noise is
    far below T), or anything else for plain f32 dots at
    ``f32_precision`` (None = backend default).
    """
    if routing not in ("bf16x2", "bf16", "f32"):
        raise ValueError(
            f"unknown routing mode {routing!r}: expected one of "
            "'bf16x2', 'bf16', 'f32'"
        )
    E = nbr.shape[0]
    colid = jax.lax.broadcasted_iota(jnp.int32, (E, n_pad), 1)
    onehot = jnp.where(nbr == colid, 1.0, 0.0)               # (E, n_pad)
    dn_route = (((1,), (0,)), ((), ()))
    dn_scatter = (((0,), (0,)), ((), ()))

    if routing == "bf16x2":
        oh16 = onehot.astype(jnp.bfloat16)

        def _split_dot(x, dims):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                oh16, hi, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            return out + jax.lax.dot_general(
                oh16, lo, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        route = lambda x: _split_dot(x, dn_route)
        scatter = lambda g: _split_dot(g, dn_scatter)
    elif routing == "bf16":
        oh16 = onehot.astype(jnp.bfloat16)

        def _bf16_dot(x, dims):
            return jax.lax.dot_general(
                oh16, x.astype(jnp.bfloat16), dims,
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        route = lambda x: _bf16_dot(x, dn_route)
        scatter = lambda g: _bf16_dot(g, dn_scatter)
    else:

        def route(x):
            return jax.lax.dot_general(
                onehot, x, dn_route, precision=f32_precision,
                preferred_element_type=jnp.float32)

        def scatter(g):
            return jax.lax.dot_general(
                onehot, g, dn_scatter, precision=f32_precision,
                preferred_element_type=jnp.float32)

    return route, scatter
