"""Fused Pallas TPU kernel for the EAM hot loop.

The MC acceptance energy is the framework's innermost op (SURVEY §3.1:
one force-field evaluation per MC step). The XLA fast path
(potentials/eam.py make_eam_static, mode="cheb") is already gather-free,
but XLA still materializes the (chains, pairs) intermediates in HBM. This
kernel fuses the whole pipeline per chain-block in VMEM:

    positions --(static 0/1 matmul, MXU)--> pair endpoints
    -> displacements -> r -> masks
    -> Clenshaw(Chebyshev) rho(r), z2r(r)     [pure VPU FMA]
    -> per-atom reduction (static matmul, MXU)
    -> rho_i, pair-energy_i                    [only (C, N) leaves VMEM]

The embedding term F(rho_i) is applied outside the kernel (a per-atom
spline gather on a (C, N) array — negligible). Single-element tables only
(the Cu/Au benchmark systems); multi-element systems use the XLA path.
Energy-only (no VJP): relaxation paths use the differentiable XLA path.

Exposed as a per-chain energy function with a ``jax.custom_batching``
vmap rule that dispatches the chain axis onto the kernel grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from surface_sampling_tpu.ops.splines import lammps_spline_coeffs, spline_eval_onehot

CHAIN_BLOCK = 64  # chains per kernel program, default
# Larger blocks amortize per-program overhead (~10us each on v5e) and fill
# MXU sublanes (128-tall tiles); the ceiling is VMEM: intermediates are
# (block, N*M) f32, so block * P * 4B * ~8 live arrays must stay << 16 MiB.


def _dense_spline(table_1d: np.ndarray, delta: float, xq: np.ndarray) -> np.ndarray:
    c = lammps_spline_coeffs(table_1d)
    p = xq / delta
    idx = np.clip(p.astype(int), 0, len(table_1d) - 2)
    t = np.minimum(p - idx, 1.0)
    cc = c[idx]
    return ((cc[:, 0] * t + cc[:, 1]) * t + cc[:, 2]) * t + cc[:, 3]


def make_pallas_eam_energy(tables, nbr_table, r_lo: float = 0.8, degree: int = 24,
                           interpret: bool = False, chain_block: int | None = None):
    """Build ``energy(positions (N,3), alive_f (N,)) -> scalar`` (vmappable).

    Args:
        tables: EAMTables (single element).
        nbr_table: StaticNeighborTable for the system spec.
        interpret: run the kernel in interpreter mode (CPU tests).
        chain_block: chains per kernel program (default CHAIN_BLOCK, capped
            so (block, N*M) intermediates fit VMEM).
    """
    if len(tables.numbers) != 1:
        raise ValueError("pallas EAM kernel supports single-element tables")
    N, M = nbr_table.slot_j.shape
    P = N * M
    if chain_block is None:
        # keep ~8 live (block, P) f32 intermediates within ~12 MiB of VMEM
        budget = 12 * 2**20 // (8 * 4 * max(P, 1))
        chain_block = max(8, min(CHAIN_BLOCK, 1 << (budget.bit_length() - 1)))
    block = int(chain_block)
    cutoff = float(tables.cutoff)
    r_hi = float(tables.nr * tables.dr)
    xs = np.linspace(r_lo, r_hi, 30000)
    rho_coef = np.polynomial.chebyshev.Chebyshev.fit(
        xs, _dense_spline(tables.rhor[0], tables.dr, xs), degree
    ).coef
    z2r_coef = np.polynomial.chebyshev.Chebyshev.fit(
        xs, _dense_spline(tables.z2r[0, 0], tables.dr, xs), degree
    ).coef
    mid = 0.5 * (r_lo + r_hi)
    half = 0.5 * (r_hi - r_lo)

    # static matmul operands. Instead of gathering both pair endpoints
    # (8 matmuls), fuse the difference and the aliveness sum:
    #   d = pos @ (gi - gj) - shift        (3 matmuls)
    #   pair_alive = alive @ (gi + gj) > 1.5  (1 matmul)
    rows = np.repeat(np.arange(N), M)
    gj = np.zeros((N, P), np.float32)
    gj[nbr_table.slot_j.reshape(-1), np.arange(P)] = 1.0
    gi = np.zeros((N, P), np.float32)
    gi[rows, np.arange(P)] = 1.0
    gdiff = gi - gj
    gsum = gi + gj
    red = gi.T.copy()
    shift = nbr_table.shift.reshape(P, 3).T.astype(np.float32)
    valid = nbr_table.valid.reshape(1, P).astype(np.float32)

    rho_list = [float(v) for v in rho_coef]
    z2r_list = [float(v) for v in z2r_coef]

    def kernel(posx, posy, posz, alive, gdiff_r, gsum_r, red_r, sx, sy, sz, val,
               rho_out, ep_out):
        ax = alive[...]
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        dx = dot(posx[...], gdiff_r[...]) - sx[...]
        dy = dot(posy[...], gdiff_r[...]) - sy[...]
        dz = dot(posz[...], gdiff_r[...]) - sz[...]
        pair_alive = (dot(ax, gsum_r[...]) > 1.5).astype(jnp.float32)
        r = jnp.sqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12))
        mask = val[...] * pair_alive * (r < cutoff).astype(jnp.float32)
        rs = jnp.where(mask > 0, r, cutoff)
        u = (jnp.clip(rs, r_lo, r_hi) - mid) / half
        two_u = 2.0 * u

        def clenshaw(coef):
            b1 = jnp.zeros_like(u)
            b2 = jnp.zeros_like(u)
            for k in range(len(coef) - 1, 0, -1):
                b1, b2 = coef[k] + two_u * b1 - b2, b1
            return coef[0] + u * b1 - b2

        # quartic repulsion wall below the fit floor (matches eam.py cheb
        # mode; over-rejecting, no transcendental per lane)
        d_in = jnp.maximum(r_lo - rs, 0.0)
        q = 8.0 * d_in
        q2 = q * q
        wall = 100.0 * (q2 + q2 * q2)
        rho_ij = (clenshaw(rho_list) + wall) * mask
        phi = (clenshaw(z2r_list) + wall) / rs * mask
        rho_out[...] = dot(rho_ij, red_r[...])
        ep_out[...] = 0.5 * dot(phi, red_r[...])

    bs_pos = pl.BlockSpec((block, N), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def bs_const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    gdiff_j = jnp.asarray(gdiff)
    gsum_j = jnp.asarray(gsum)
    red_j = jnp.asarray(red)
    sx_j = jnp.asarray(shift[0:1])
    sy_j = jnp.asarray(shift[1:2])
    sz_j = jnp.asarray(shift[2:3])
    val_j = jnp.asarray(valid)

    def batched_rho_ep(positions, alive_f):
        """positions (C, N, 3), alive_f (C, N) -> rho (C, N), epair (C, N)."""
        C = positions.shape[0]
        pad = (-C) % block
        if pad:
            positions = jnp.concatenate(
                [positions, jnp.zeros((pad,) + positions.shape[1:], positions.dtype)], axis=0
            )
            alive_f = jnp.concatenate([alive_f, jnp.zeros((pad, N), alive_f.dtype)], axis=0)
        Cp = positions.shape[0]
        rho, ep = pl.pallas_call(
            kernel,
            grid=(Cp // block,),
            in_specs=[bs_pos] * 4
            + [bs_const((N, P)), bs_const((N, P)), bs_const((P, N)),
               bs_const((1, P)), bs_const((1, P)), bs_const((1, P)), bs_const((1, P))],
            out_specs=[
                pl.BlockSpec((block, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
            ] * 2,
            out_shape=[jax.ShapeDtypeStruct((Cp, N), jnp.float32)] * 2,
            interpret=interpret,
        )(
            positions[:, :, 0].astype(jnp.float32),
            positions[:, :, 1].astype(jnp.float32),
            positions[:, :, 2].astype(jnp.float32),
            alive_f.astype(jnp.float32),
            gdiff_j, gsum_j, red_j, sx_j, sy_j, sz_j, val_j,
        )
        return rho[:C], ep[:C]

    frho_c = jnp.asarray(lammps_spline_coeffs(tables.frho[0]), jnp.float32)
    inv_drho = 1.0 / tables.drho

    def batched_energy(positions, alive_f):
        rho, ep = batched_rho_ep(positions, alive_f)
        F = spline_eval_onehot(frho_c, rho, inv_drho) * alive_f
        return jnp.sum(F + ep, axis=1)

    @jax.custom_batching.custom_vmap
    def energy(positions, alive_f):
        return batched_energy(positions[None], alive_f[None])[0]

    @energy.def_vmap
    def _energy_vmap(axis_size, in_batched, positions, alive_f):
        pb, ab = in_batched
        if not pb:
            positions = jnp.broadcast_to(positions[None], (axis_size,) + positions.shape)
        if not ab:
            alive_f = jnp.broadcast_to(alive_f[None], (axis_size,) + alive_f.shape)
        return batched_energy(positions, alive_f), True

    return energy, batched_energy


def make_eam_pallas_potential(tables, nbr_table, **kw):
    """Wrap the fused kernel as a framework Potential (energy-only: no VJP,
    so pair with relax=None; per-atom energies fall back to the XLA cheb
    path for Boltzmann-weighted proposals)."""
    from surface_sampling_tpu.potentials.base import Potential
    from surface_sampling_tpu.potentials.eam import make_eam_static

    energy_fn, _ = make_pallas_eam_energy(tables, nbr_table, **kw)
    xla_pot = make_eam_static(tables, nbr_table, mode="cheb")

    def energy(positions, type_idx, alive, shifts_unused=None):
        return energy_fn(positions, alive.astype(positions.dtype))

    return Potential(
        energy=energy,
        per_atom_energy=xla_pot.per_atom_energy,
        cutoff=float(tables.cutoff),
        name="eam-pallas",
    )
