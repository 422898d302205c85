"""Batched model prediction helpers over structure datasets.

Re-design of mcmc/uncertainty/prediction.py (torch_scatter based): padded
vmapped forwards replace per-structure serial CUDA calls; per-system
pooling uses masked reductions instead of scatter_sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from surface_sampling_tpu.models.painn import PaiNNConfig, painn_apply


def get_prediction(params, cfg: PaiNNConfig, batch, ensemble: bool = False):
    """Forward a PaddedBatch; returns dict of (B,) energies, (B, N, 3)
    forces and (B, N, F) embeddings (prediction.py:14-82 analog)."""

    def one(p, positions, numbers, shifts):
        alive = numbers > 0

        def e_of(pos):
            return painn_apply(p, cfg, pos, numbers, alive, shifts)["energy"]

        e, g = jax.value_and_grad(e_of)(positions)
        out = painn_apply(p, cfg, positions, numbers, alive, shifts)
        return e, -g, out["embedding"]

    def per_structure(positions, numbers, shifts):
        if ensemble:
            e, f, emb = jax.vmap(lambda p: one(p, positions, numbers, shifts))(params)
            return e.mean(), f.mean(axis=0), emb.mean(axis=0), e.std()
        e, f, emb = one(params, positions, numbers, shifts)
        return e, f, emb, jnp.zeros(())

    e, f, emb, estd = jax.vmap(per_structure)(
        jnp.asarray(batch.positions, jnp.float32),
        jnp.asarray(batch.numbers),
        jnp.asarray(batch.shifts, jnp.float32),
    )
    return {"energy": e, "forces": f, "embedding": emb, "energy_std": estd}


def get_embedding(pred: dict, numbers: np.ndarray, pool: str = "mean",
                  center_mask: np.ndarray | None = None) -> np.ndarray:
    """Per-system pooled embeddings from per-atom ones (prediction.py:126
    scatter_sum analog, on padded batches). ``center_mask`` (B, N) restricts
    pooling to selected atoms (e.g. surface atoms from
    models.dataset.make_clustering_dataset)."""
    emb = np.asarray(pred["embedding"])            # (B, N, F)
    alive = np.asarray(numbers) > 0                # (B, N)
    if center_mask is not None:
        alive = alive & np.asarray(center_mask, bool)
    w = alive[..., None].astype(emb.dtype)
    summed = (emb * w).sum(axis=1)
    if pool == "sum":
        return summed
    return summed / np.maximum(w.sum(axis=1), 1.0)


def get_system_val(values: np.ndarray, numbers: np.ndarray, order: str = "mean") -> np.ndarray:
    """Masked per-system reduction of per-atom values
    (prediction.py:181-224 analog)."""
    v = np.asarray(values)
    alive = np.asarray(numbers) > 0
    if v.ndim == 3:  # e.g. forces: reduce vector norm per atom first
        v = np.linalg.norm(v, axis=-1)
    masked = np.where(alive, v, np.nan)
    if order == "sum":
        return np.nansum(masked, axis=1)
    if order == "mean":
        return np.nanmean(masked, axis=1)
    if order == "max":
        return np.nanmax(masked, axis=1)
    if order == "min":
        return np.nanmin(masked, axis=1)
    raise ValueError(order)


def get_errors(pred: dict, batch) -> dict:
    """Energy/force residuals vs a labelled batch (prediction.py:83-125)."""
    alive = np.asarray(batch.numbers) > 0
    n = np.maximum(alive.sum(axis=1), 1)
    e_err = np.abs(np.asarray(pred["energy"]) - np.asarray(batch.energy)) / n
    f_diff = np.asarray(pred["forces"]) - np.asarray(batch.forces)
    f_err = get_system_val(f_diff, batch.numbers, "mean")
    return {"energy_mae_per_atom": e_err, "force_mae": f_err}


def get_residual(pred: dict, batch) -> np.ndarray:
    """Per-system force-residual norms (CP calibration input,
    prediction.py:226-246)."""
    f_diff = np.asarray(pred["forces"]) - np.asarray(batch.forces)
    return get_system_val(f_diff, batch.numbers, "mean")
