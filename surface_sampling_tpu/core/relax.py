"""On-device structure relaxation: masked FIRE inside the MC step.

Replaces the reference's per-move ASE optimizer dispatch
(mcmc/dynamics.py:83-170: FIRE/BFGS/LineSearch/CG with relax_steps=20,
fmax=0.01). FIRE is the right optimizer on TPU: no line searches, no
history matrices — a fixed-shape velocity-Verlet loop whose body is one
fused energy+grad evaluation, runnable under ``lax.while_loop`` inside
``scan``/``vmap``. Frozen bulk atoms (ase FixAtoms analog) and dead slots
enter through a force mask.

The out-of-bounds guard reproduces mcmc/dynamics.py:17-18,159-168: if
|E| > 1000 eV or max|F| > 1000 eV/A after relaxation, the energy is
clamped to +1000 eV so the Metropolis test rejects the move.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

ENERGY_THRESHOLD = 1000.0  # eV (mcmc/dynamics.py:17)
MAX_FORCE_THRESHOLD = 1000.0  # eV/A (mcmc/dynamics.py:18)
# The reference's |E| > 1000 eV guard is an ABSOLUTE bound (dynamics.py:159)
# that any slab beyond ~230 atoms trips on its legitimate cohesive energy
# (-4.3 eV/atom x 288 Si atoms = -1249 eV -> clamped!). Scale it with system
# size: no physical cohesive energy approaches 20 eV/atom, while blow-up
# states (overlaps) reach 1e4+ eV, so over-rejection is preserved.
ENERGY_THRESHOLD_PER_ATOM = 20.0  # eV/atom added to the absolute bound


def energy_threshold(n_atoms) -> jnp.ndarray:
    """Size-aware OOB energy bound: 1000 eV + 20 eV/atom."""
    return ENERGY_THRESHOLD + ENERGY_THRESHOLD_PER_ATOM * n_atoms


class FireConfig(NamedTuple):
    """FIRE hyperparameters (ASE defaults, matching the reference's use)."""

    steps: int = 20            # relax_steps default (dynamics.py:140)
    fmax: float = 0.01         # convergence threshold (dynamics.py:141)
    dt_start: float = 0.1
    dt_max: float = 1.0
    n_min: int = 5
    f_inc: float = 1.1
    f_dec: float = 0.5
    alpha_start: float = 0.1
    f_alpha: float = 0.99
    max_step: float = 0.2      # max total displacement norm per iteration


class RelaxResult(NamedTuple):
    positions: jnp.ndarray
    energy: jnp.ndarray        # post-relax potential energy (OOB-clamped)
    max_force: jnp.ndarray
    converged: jnp.ndarray     # bool
    oob: jnp.ndarray           # bool — energy/force out of bounds
    n_steps: jnp.ndarray       # iterations actually taken


def fire_relax(
    energy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    positions0: jnp.ndarray,
    free_mask: jnp.ndarray,
    cfg: FireConfig = FireConfig(),
) -> RelaxResult:
    """Relax ``positions0`` under ``energy_fn`` with FIRE.

    Args:
        energy_fn: positions -> scalar potential energy (already closed over
            species/alive/shifts).
        positions0: (N, 3) starting geometry.
        free_mask: (N,) bool — True for atoms allowed to move.
        cfg: FIRE hyperparameters.
    """
    dtype = positions0.dtype
    fmask = free_mask[:, None].astype(dtype)
    eg = jax.value_and_grad(energy_fn)

    def force_of(pos):
        e, g = eg(pos)
        return e, -g * fmask

    def fnorm_max(f):
        return jnp.sqrt(jnp.max(jnp.sum(f * f, axis=1)))

    e0, f0 = force_of(positions0)

    def cond(carry):
        i, pos, vel, dt, alpha, n_pos, e, f = carry
        return (i < cfg.steps) & (fnorm_max(f) >= cfg.fmax)

    def body(carry):
        i, pos, vel, dt, alpha, n_pos, e, f = carry
        vf = jnp.sum(f * vel)
        uphill = vf <= 0.0
        v_norm = jnp.sqrt(jnp.sum(vel * vel))
        f_norm = jnp.sqrt(jnp.sum(f * f))
        mixed = (1.0 - alpha) * vel + alpha * f * (v_norm / jnp.maximum(f_norm, 1e-30))
        vel = jnp.where(uphill, jnp.zeros_like(vel), mixed)
        grow = (~uphill) & (n_pos > cfg.n_min)
        dt = jnp.where(grow, jnp.minimum(dt * cfg.f_inc, cfg.dt_max), dt)
        alpha = jnp.where(grow, alpha * cfg.f_alpha, alpha)
        dt = jnp.where(uphill, dt * cfg.f_dec, dt)
        alpha = jnp.where(uphill, jnp.asarray(cfg.alpha_start, dtype), alpha)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        vel = vel + dt * f
        dr = dt * vel
        norm = jnp.sqrt(jnp.sum(dr * dr))
        dr = dr * jnp.minimum(1.0, cfg.max_step / jnp.maximum(norm, 1e-30))
        pos = pos + dr * fmask
        e, f = force_of(pos)
        return (i + 1, pos, vel, dt, alpha, n_pos, e, f)

    init = (
        jnp.asarray(0, jnp.int32),
        positions0,
        jnp.zeros_like(positions0),
        jnp.asarray(cfg.dt_start, dtype),
        jnp.asarray(cfg.alpha_start, dtype),
        jnp.asarray(0, jnp.int32),
        e0,
        f0,
    )
    i, pos, vel, dt, alpha, n_pos, e, f = jax.lax.while_loop(cond, body, init)
    mf = fnorm_max(f)
    return _finish(pos, e, mf, positions0, i, cfg)


def _finish(pos, e, mf, positions0, i, cfg: FireConfig) -> "RelaxResult":
    dtype = pos.dtype
    e_bound = jnp.asarray(energy_threshold(pos.shape[0]), dtype)
    oob = (jnp.abs(e) > e_bound) | (mf > MAX_FORCE_THRESHOLD)
    e_out = jnp.where(oob, e_bound, e)
    nan_guard = jnp.isnan(e_out) | jnp.any(jnp.isnan(pos))
    e_out = jnp.where(nan_guard, e_bound, e_out)
    pos = jnp.where(nan_guard, positions0, pos)
    return RelaxResult(
        positions=pos,
        energy=e_out,
        max_force=mf,
        converged=mf < cfg.fmax,
        oob=oob | nan_guard,
        n_steps=i,
    )


def lbfgs_relax(
    energy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    positions0: jnp.ndarray,
    free_mask: jnp.ndarray,
    cfg: FireConfig = FireConfig(),
) -> RelaxResult:
    """L-BFGS relaxation (optax.lbfgs with zoom linesearch) — the
    quasi-Newton counterpart of the reference's BFGS/BFGSLineSearch
    optimizers (mcmc/dynamics.py:119-124). Frozen atoms enter by
    reparameterizing on masked displacements. Same OOB semantics as FIRE.
    """
    import optax

    dtype = positions0.dtype
    fmask = free_mask[:, None].astype(dtype)

    def loss(delta):
        return energy_fn(positions0 + delta * fmask)

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss)
    delta0 = jnp.zeros_like(positions0)
    opt_state0 = opt.init(delta0)

    def converged(g):
        f = g * fmask
        return jnp.sqrt(jnp.max(jnp.sum(f * f, axis=1))) < cfg.fmax

    def cond(carry):
        i, delta, opt_state, g = carry
        return (i < cfg.steps) & ~converged(g)

    def body(carry):
        i, delta, opt_state, _ = carry
        v, g = value_and_grad(delta, state=opt_state)
        updates, opt_state = opt.update(
            g, opt_state, delta, value=v, grad=g, value_fn=loss
        )
        delta = optax.apply_updates(delta, updates)
        return (i + 1, delta, opt_state, g)

    g0 = jax.grad(loss)(delta0)
    i, delta, opt_state, g = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), delta0, opt_state0, g0)
    )
    pos = positions0 + delta * fmask
    e = energy_fn(pos)
    g_final = jax.grad(loss)(delta)
    mf = jnp.sqrt(jnp.max(jnp.sum((g_final * fmask) ** 2, axis=1)))
    return _finish(pos, e, mf, positions0, i, cfg)


def fire_relax_traj(
    energy_fn: Callable[[jnp.ndarray], jnp.ndarray],
    positions0: jnp.ndarray,
    free_mask: jnp.ndarray,
    cfg: FireConfig = FireConfig(),
    record_interval: int = 5,
):
    """FIRE with trajectory capture — the TrajectoryObserver analog
    (mcmc/dynamics.py:21-80: energies/forces/structures recorded every
    ``record_interval`` optimizer steps).

    Runs a fixed ``cfg.steps`` scan (no early exit; frames past convergence
    repeat the converged geometry) and returns
    (RelaxResult, frames (n_rec, N, 3), frame_energies (n_rec,)).
    """
    dtype = positions0.dtype
    fmask = free_mask[:, None].astype(dtype)
    eg = jax.value_and_grad(energy_fn)

    def force_of(pos):
        e, g = eg(pos)
        return e, -g * fmask

    def fnorm_max(f):
        return jnp.sqrt(jnp.max(jnp.sum(f * f, axis=1)))

    e0, f0 = force_of(positions0)

    def body(carry, _):
        pos, vel, dt, alpha, n_pos, e, f = carry
        done = fnorm_max(f) < cfg.fmax
        vf = jnp.sum(f * vel)
        uphill = vf <= 0.0
        v_norm = jnp.sqrt(jnp.sum(vel * vel))
        f_norm = jnp.sqrt(jnp.sum(f * f))
        mixed = (1.0 - alpha) * vel + alpha * f * (v_norm / jnp.maximum(f_norm, 1e-30))
        vel_n = jnp.where(uphill, jnp.zeros_like(vel), mixed)
        grow = (~uphill) & (n_pos > cfg.n_min)
        dt_n = jnp.where(grow, jnp.minimum(dt * cfg.f_inc, cfg.dt_max), dt)
        alpha_n = jnp.where(grow, alpha * cfg.f_alpha, alpha)
        dt_n = jnp.where(uphill, dt_n * cfg.f_dec, dt_n)
        alpha_n = jnp.where(uphill, jnp.asarray(cfg.alpha_start, dtype), alpha_n)
        n_pos_n = jnp.where(uphill, 0, n_pos + 1)
        vel_n = vel_n + dt_n * f
        dr = dt_n * vel_n
        norm = jnp.sqrt(jnp.sum(dr * dr))
        dr = dr * jnp.minimum(1.0, cfg.max_step / jnp.maximum(norm, 1e-30))
        pos_n = pos + dr * fmask
        e_n, f_n = force_of(pos_n)
        # freeze once converged
        pos_n = jnp.where(done, pos, pos_n)
        e_n = jnp.where(done, e, e_n)
        f_n = jnp.where(done, f, f_n)
        carry = (
            pos_n,
            jnp.where(done, vel, vel_n),
            jnp.where(done, dt, dt_n),
            jnp.where(done, alpha, alpha_n),
            jnp.where(done, n_pos, n_pos_n),
            e_n,
            f_n,
        )
        return carry, (pos_n, e_n)

    init = (
        positions0,
        jnp.zeros_like(positions0),
        jnp.asarray(cfg.dt_start, dtype),
        jnp.asarray(cfg.alpha_start, dtype),
        jnp.asarray(0, jnp.int32),
        e0,
        f0,
    )
    (pos, *_, e, f), (frames, frame_e) = jax.lax.scan(body, init, None, length=cfg.steps)
    result = _finish(pos, e, fnorm_max(f), positions0, jnp.asarray(cfg.steps), cfg)
    frames = frames[::record_interval]
    frame_e = frame_e[::record_interval]
    return result, frames, frame_e
