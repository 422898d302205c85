"""PaiNN training / fine-tuning on energy+force data.

The reference fine-tunes NN potentials externally (CHGNet via
mcmc/uncertainty/json_dataset.py; PaiNN ensembles come pre-trained from
nff). Here training is first-class: a jitted optax loop over padded
batches, with the ensemble axis trained in parallel under the same vmap
used for inference (models/ensemble.py) — E independently-initialized
members cost one batched update.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from surface_sampling_tpu.models.painn import PaiNNConfig, init_painn, painn_apply

train_model = None  # alias assigned below


class PaddedBatch(NamedTuple):
    """Fixed-shape training batch (B structures padded to N_max atoms);
    a NamedTuple so it is a pytree and flows through jit."""

    positions: np.ndarray    # (B, N, 3)
    numbers: np.ndarray      # (B, N) 0 = padding
    shifts: np.ndarray       # (B, K, 3) periodic image shifts (zero-padded)
    energy: np.ndarray       # (B,) eV (or training units)
    forces: np.ndarray       # (B, N, 3)
    magmoms: np.ndarray | None = None   # (B, N) per-atom magnetic moments
    # (MPtrj "m" target for CHGNet fine-tuning, json_dataset.py:128-136)
    magmom_mask: np.ndarray | None = None   # (B,) 1.0 where the frame has
    # magmom labels — unlabeled frames must NOT train the head toward 0


def pad_structures(structures, energies, forces, cutoff: float, n_max=None,
                   k_max=None, magmoms=None):
    """Pad a list of Structures (+labels) into one PaddedBatch."""
    from surface_sampling_tpu.ops.neighbors import pair_shifts_for

    n_max = n_max or max(len(s) for s in structures)
    all_shifts = [
        pair_shifts_for(s.cell, s.scaled_positions, cutoff) for s in structures
    ]
    k_max = k_max or max(len(sh) for sh in all_shifts)
    B = len(structures)
    positions = np.zeros((B, n_max, 3))
    numbers = np.zeros((B, n_max), dtype=np.int32)
    shifts = np.full((B, k_max, 3), 1e6)  # park unused shift slots far away
    forces_arr = np.zeros((B, n_max, 3))
    mag_arr = np.zeros((B, n_max)) if magmoms is not None else None
    mag_mask = np.zeros(B) if magmoms is not None else None
    for b, (s, sh, f) in enumerate(zip(structures, all_shifts, forces)):
        n = len(s)
        positions[b, :n] = s.positions
        numbers[b, :n] = s.numbers
        shifts[b, : len(sh)] = sh
        forces_arr[b, :n] = f
        if mag_arr is not None and magmoms[b] is not None:
            mag_arr[b, :n] = magmoms[b]
            mag_mask[b] = 1.0
    return PaddedBatch(positions, numbers, shifts,
                       np.asarray(energies, dtype=np.float64), forces_arr,
                       mag_arr, mag_mask)


@dataclass
class TrainConfig:
    learning_rate: float = 1e-3
    energy_weight: float = 0.05
    force_weight: float = 0.95
    magmom_weight: float = 0.0   # >0: train the magmom head too (CHGNet
    # "efm" targets, reference json_dataset.py targets="efsm")
    epochs: int = 100
    grad_clip: float = 10.0


def make_loss_fn(cfg, tcfg: TrainConfig, apply_fn=painn_apply):
    """Energy+force loss; ``apply_fn(params, cfg, ...)`` may be any of the
    model families (painn_apply, chgnet_apply, mace_apply)."""

    # The force loss differentiates the energy twice: grad wrt positions
    # inside value_and_grad wrt params. PaiNN's fused Pallas message op
    # IS second-order differentiable (its VJP is _message_bwd_op, whose
    # own VJP is the fused bwd2 kernel — ops/pallas_painn.py), and
    # CHGNet's fused conv likewise — but MEASURED training throughput on
    # v5e strongly favors the pure-XLA modes: the grad-of-grad graph over
    # the one-hot dense routing fuses into large batched MXU matmuls,
    # while the kernel path pays three pallas_call launches per layer per
    # differentiation level with no cross-op fusion
    # (tools/bench_all.py painn_train_xla 19.2k vs painn_train[pallas]
    # 735 structs/s; chgnet 2.8k vs 317 — docs/BENCHMARKS.md). So "auto"
    # resolves training to dense/gather everywhere; pass an explicit
    # message_mode/conv_mode="pallas" cfg to ride the fused VJPs instead
    # (covered by tests/test_training.py second-order parity tests).
    from dataclasses import replace as _dc_replace

    if getattr(cfg, "message_mode", None) == "auto":
        cfg = _dc_replace(cfg, message_mode="dense")
    if getattr(cfg, "conv_mode", None) == "auto":
        cfg = _dc_replace(cfg, conv_mode="gather")

    need_mag = tcfg.magmom_weight > 0.0

    def single_loss(params, positions, numbers, shifts, e_ref, f_ref,
                    m_ref, m_mask):
        alive = numbers > 0

        def e_of(pos):
            out = apply_fn(params, cfg, pos, numbers, alive, shifts)
            if need_mag and "magmom" not in out:
                raise ValueError(
                    "magmom_weight > 0 but the model family returns no "
                    "'magmom' output (only chgnet_apply does)"
                )
            # magmom rides has_aux so one forward serves both losses
            return out["energy"], (out["magmom"] if need_mag else 0.0)

        (e, mag), g = jax.value_and_grad(e_of, has_aux=True)(positions)
        f = -g
        n = jnp.maximum(jnp.sum(alive), 1)
        e_loss = ((e - e_ref) / n) ** 2
        f_mask = alive[:, None]
        f_loss = jnp.sum(jnp.where(f_mask, (f - f_ref) ** 2, 0.0)) / (3 * n)
        loss = tcfg.energy_weight * e_loss + tcfg.force_weight * f_loss
        if need_mag:
            # m_mask zeroes unlabeled frames: they must not pull the
            # magmom head toward the 0.0 padding
            m_loss = jnp.sum(jnp.where(alive, (mag - m_ref) ** 2, 0.0)) / n
            loss = loss + tcfg.magmom_weight * m_mask * m_loss
        return loss

    def batch_loss(params, batch: PaddedBatch):
        m = batch.magmoms
        if m is None:
            m = jnp.zeros(batch.numbers.shape, batch.positions.dtype)
            mm = jnp.zeros(batch.numbers.shape[0], batch.positions.dtype)
        else:
            mm = (batch.magmom_mask
                  if batch.magmom_mask is not None
                  else jnp.ones(batch.numbers.shape[0], batch.positions.dtype))
        losses = jax.vmap(single_loss, in_axes=(None, 0, 0, 0, 0, 0, 0, 0))(
            params,
            batch.positions,
            batch.numbers,
            batch.shifts,
            batch.energy,
            batch.forces,
            m,
            mm,
        )
        return jnp.mean(losses)

    return batch_loss


def train_painn(
    params,
    cfg,
    batches: list[PaddedBatch] | Iterator[PaddedBatch],
    tcfg: TrainConfig = TrainConfig(),
    ensemble: bool = False,
    apply_fn=painn_apply,
):
    """Train (or fine-tune) model params; returns (params, loss_history).

    Works for every model family via ``apply_fn`` (painn_apply default,
    chgnet_apply, mace_apply). With ensemble=True, ``params`` carries a
    leading member axis and every member trains in parallel.
    """
    batches = list(batches)
    if tcfg.magmom_weight > 0.0 and not any(
        b.magmom_mask is not None and np.asarray(b.magmom_mask).any()
        for b in batches
    ):
        raise ValueError(
            "magmom_weight > 0 but no batch carries magmom labels — the "
            "magmom head would silently receive zero gradient for the "
            "whole run; drop magmom_weight or load a labeled dataset"
        )
    loss_fn = make_loss_fn(cfg, tcfg, apply_fn=apply_fn)
    opt = optax.chain(optax.clip_by_global_norm(tcfg.grad_clip), optax.adam(tcfg.learning_rate))

    def to_device(b: PaddedBatch):
        return PaddedBatch(
            jnp.asarray(b.positions, jnp.float32),
            jnp.asarray(b.numbers),
            jnp.asarray(b.shifts, jnp.float32),
            jnp.asarray(b.energy, jnp.float32),
            jnp.asarray(b.forces, jnp.float32),
            None if b.magmoms is None else jnp.asarray(b.magmoms, jnp.float32),
            None if b.magmom_mask is None else jnp.asarray(b.magmom_mask,
                                                           jnp.float32),
        )

    dev_batches = [to_device(b) for b in batches]

    if ensemble:
        opt_state = jax.vmap(opt.init)(params)

        @jax.jit
        def step(params, opt_state, batch):
            def member_update(p, s):
                loss, g = jax.value_and_grad(loss_fn)(p, batch)
                updates, s = opt.update(g, s, p)
                return optax.apply_updates(p, updates), s, loss

            params, opt_state, losses = jax.vmap(member_update)(params, opt_state)
            return params, opt_state, jnp.mean(losses)

    else:
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, batch):
            loss, g = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for _ in range(tcfg.epochs):
        epoch = 0.0
        for batch in dev_batches:
            params, opt_state, loss = step(params, opt_state, batch)
            epoch += float(loss)
        history.append(epoch / len(dev_batches))
    return params, history


def init_ensemble(key, cfg: PaiNNConfig, n_members: int):
    """Independently initialized ensemble (stacked params)."""
    from surface_sampling_tpu.models.ensemble import stack_params

    keys = jax.random.split(key, n_members)
    return stack_params([init_painn(k, cfg) for k in keys])


# family-agnostic alias (train_painn predates the other families)
train_model = train_painn
