"""Sharded fine-tuning: data-parallel and ensemble-parallel train steps.

The reference fine-tunes its NN ensembles one torch process per model
(SURVEY §2.2 NFF / uncertainty pipeline; reference finetuning drivers run
members independently). TPU-native replacement: the train step itself is
pure (params, opt_state, batch) -> (params, opt_state, loss), so

* **data parallelism** shards the structure axis of a PaddedBatch over a
  mesh axis; each device differentiates its shard and one ``pmean`` over
  ICI merges the gradients — the single collective per step. Params and
  optimizer state stay replicated, so every device applies the identical
  update (bitwise) and no re-sync is ever needed.
* **ensemble parallelism** shards the member axis of stacked ensemble
  params; members are independent, so the hot loop has ZERO collectives
  (the same zero-communication shape as chain sharding in
  parallel/chains.py).

Both compose with the existing loss (models/train.make_loss_fn) for every
model family (PaiNN / CHGNet / MACE).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_sharded_train_step(
    loss_fn: Callable,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "chains",
) -> Callable:
    """Data-parallel train step: the PaddedBatch's structure axis is
    sharded over ``axis``; grads/losses are ``pmean``-ed so the update
    equals the full-batch update (shards must be equal-sized, i.e. the
    batch's leading dim divisible by the mesh axis size).

    Returns jitted ``step(params, opt_state, batch) -> (params,
    opt_state, loss)`` with params/opt_state replicated in and out.
    """

    def local_step(params, opt_state, batch):
        loss, g = jax.value_and_grad(loss_fn)(params, batch)
        g = jax.lax.pmean(g, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_ensemble_sharded_train_step(
    loss_fn: Callable,
    opt: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "chains",
) -> Callable:
    """Ensemble-parallel train step: stacked member params (leading member
    axis, divisible by the mesh axis size) shard over ``axis``; every
    member sees the full (replicated) batch and trains independently —
    zero collectives in the loop.

    Returns jitted ``step(params, opt_state, batch) -> (params,
    opt_state, member_losses)``; opt_state must come from
    ``jax.vmap(opt.init)(params)``.
    """

    def local_step(params, opt_state, batch):
        def member_update(p, s):
            loss, g = jax.value_and_grad(loss_fn)(p, batch)
            updates, s = opt.update(g, s, p)
            return optax.apply_updates(p, updates), s, loss

        return jax.vmap(member_update)(params, opt_state)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(sharded)


def train_sharded(
    params,
    cfg,
    batches,
    tcfg,
    mesh: Mesh,
    axis: str = "chains",
    ensemble: bool = False,
    apply_fn=None,
):
    """Mesh-parallel mirror of models/train.train_painn: same loss,
    optimizer and epoch loop, with the step sharded over ``mesh``
    (data-parallel over the structure axis, or member-parallel with
    ensemble=True). Returns (params, loss_history)."""
    from surface_sampling_tpu.models.painn import painn_apply
    from surface_sampling_tpu.models.train import make_loss_fn

    batches = list(batches)
    n_dev = mesh.shape[axis]
    ragged = [b.positions.shape[0] for b in batches
              if b.positions.shape[0] % n_dev != 0]
    if not ensemble and ragged:
        raise ValueError(
            f"data-parallel sharding needs every batch's structure count "
            f"divisible by the {n_dev}-device '{axis}' mesh axis; got batch "
            f"sizes {ragged} (pad or drop the ragged tail batch)")
    loss_fn = make_loss_fn(cfg, tcfg, apply_fn=apply_fn or painn_apply)
    opt = optax.chain(
        optax.clip_by_global_norm(tcfg.grad_clip), optax.adam(tcfg.learning_rate)
    )
    if ensemble:
        n_members = jax.tree.leaves(params)[0].shape[0]
        if n_members % n_dev != 0:
            raise ValueError(
                f"ensemble sharding needs the member count ({n_members}) "
                f"divisible by the {n_dev}-device '{axis}' mesh axis")
        opt_state = jax.vmap(opt.init)(params)
        step = make_ensemble_sharded_train_step(loss_fn, opt, mesh, axis)
    else:
        opt_state = opt.init(params)
        step = make_sharded_train_step(loss_fn, opt, mesh, axis)

    history = []
    for _ in range(tcfg.epochs):
        epoch = 0.0
        for batch in batches:
            params, opt_state, loss = step(params, opt_state, batch)
            epoch += float(jnp.mean(loss))
        history.append(epoch / max(len(batches), 1))
    return params, history
