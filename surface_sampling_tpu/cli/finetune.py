"""Fine-tune (or train from scratch) a NN potential from a labelled dataset.

The reference trains its nff/chgnet models outside the sampling package
(nff training scripts; CHGNet fine-tuning via
mcmc/uncertainty/json_dataset.py:26-270 feeding chgnet's own trainer).
Here training is in-framework (models/train.py: energy+force[+magmom]
loss for PaiNN / CHGNet / MACE), so the active-learning loop
(examples/08) closes without leaving the CLI:

    sst-finetune --data labelled.json --family painn --out run_ft \\
        [--init model.npz | --config cfg.json] [--epochs 100] [--lr 1e-3]
        [--ensemble 3] [--mesh 8] [--platform cpu]

Outputs in --out: ``model.npz`` (family-matching loader:
models.convert_nff.load_params_npz / models.convert_chgnet.load_chgnet_npz /
models.mace.load_mace_npz — directly consumable by the sampling CLIs'
``calc_settings.model_path``), ``history.csv`` (per-epoch train loss),
``metrics.json`` (final train/val/test losses + timing), ``settings.json``
provenance.

``--mesh N`` runs the data-parallel sharded train step over an N-device
mesh (parallel/training.py; batch_size must be divisible by N).
``--ensemble K`` (PaiNN) trains K independently-initialized members in
parallel and writes ``model_01..K.npz``.
"""

from __future__ import annotations

import argparse
import csv
import json
import time
from pathlib import Path


def _family_tools(family: str):
    """(init_fn(key, cfg), apply_fn, save_fn(path, params, cfg),
    load_fn(path) -> (params, cfg), cfg_cls, cutoff_of(cfg))."""
    if family == "painn":
        from surface_sampling_tpu.models.convert_nff import (
            load_params_npz,
            save_params_npz,
        )
        from surface_sampling_tpu.models.painn import (
            PaiNNConfig,
            init_painn,
            painn_apply,
        )

        return (init_painn, painn_apply, save_params_npz, load_params_npz,
                PaiNNConfig, lambda c: c.cutoff)
    if family == "chgnet":
        from surface_sampling_tpu.models.chgnet import (
            CHGNetConfig,
            chgnet_apply,
            init_chgnet,
        )
        from surface_sampling_tpu.models.convert_chgnet import (
            load_chgnet_npz,
            save_chgnet_npz,
        )

        return (init_chgnet, chgnet_apply, save_chgnet_npz, load_chgnet_npz,
                CHGNetConfig, lambda c: c.atom_graph_cutoff)
    if family == "mace":
        from surface_sampling_tpu.models.mace import (
            MACEConfig,
            init_mace,
            load_mace_npz,
            mace_apply,
            save_mace_npz,
        )

        return (init_mace, mace_apply, save_mace_npz, load_mace_npz,
                MACEConfig, lambda c: c.cutoff)
    raise ValueError(f"unknown family {family!r} (painn | chgnet | mace)")


def _epoch_loss(loss_fn, params, batches, ensemble: bool):
    import jax
    import jax.numpy as jnp

    if not batches:
        return float("nan")
    tot = 0.0
    for b in batches:
        if ensemble:
            tot += float(jnp.mean(jax.vmap(lambda p: loss_fn(p, b))(params)))
        else:
            tot += float(loss_fn(params, b))
    return tot / len(batches)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", required=True,
                    help="labelled dataset: JSON list / npz / MPtrj shard dir")
    ap.add_argument("--family", choices=["painn", "chgnet", "mace"],
                    default="painn")
    ap.add_argument("--init", default=None,
                    help="checkpoint npz to fine-tune from (family loader)")
    ap.add_argument("--config", default=None,
                    help="JSON of config kwargs for a fresh model "
                         "(ignored with --init)")
    ap.add_argument("--out", default="finetune_out")
    ap.add_argument("--epochs", type=int, default=100)  # must be >= 1
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--energy-weight", type=float, default=0.05)
    ap.add_argument("--force-weight", type=float, default=0.95)
    ap.add_argument("--magmom-weight", type=float, default=0.0)
    ap.add_argument("--grad-clip", type=float, default=10.0)
    ap.add_argument("--train-ratio", type=float, default=0.8)
    ap.add_argument("--val-ratio", type=float, default=0.1)
    ap.add_argument("--ensemble", type=int, default=1,
                    help="train K independently-seeded members (painn)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="data-parallel devices for the train step (0 = off)")
    ap.add_argument("--seed", type=int, default=0)
    from surface_sampling_tpu.cli.platform import add_platform_arg, force_platform

    add_platform_arg(ap)
    args = ap.parse_args(argv)
    force_platform(args.platform)

    import jax

    from surface_sampling_tpu.models.dataset import get_train_val_test_loader
    from surface_sampling_tpu.models.train import (
        TrainConfig,
        make_loss_fn,
        train_painn,
    )

    init_fn, apply_fn, save_fn, load_fn, cfg_cls, cutoff_of = _family_tools(
        args.family)
    if args.init:
        params, cfg = load_fn(args.init)
        if args.ensemble > 1:
            raise SystemExit("--ensemble trains fresh members; it cannot "
                             "combine with --init (one checkpoint)")
    else:
        cfg_kw = json.loads(Path(args.config).read_text()) if args.config else {}
        cfg = cfg_cls(**cfg_kw)
        if args.ensemble > 1:
            if args.family != "painn":
                raise SystemExit("--ensemble > 1 is the PaiNN-ensemble path")
            from surface_sampling_tpu.models.train import init_ensemble

            params = init_ensemble(jax.random.PRNGKey(args.seed), cfg,
                                   args.ensemble)
        else:
            params = init_fn(jax.random.PRNGKey(args.seed), cfg)

    tcfg = TrainConfig(
        learning_rate=args.lr, energy_weight=args.energy_weight,
        force_weight=args.force_weight, magmom_weight=args.magmom_weight,
        epochs=args.epochs, grad_clip=args.grad_clip,
    )
    train, val, test = get_train_val_test_loader(
        args.data, cutoff_of(cfg), batch_size=args.batch_size,
        train_ratio=args.train_ratio, val_ratio=args.val_ratio,
        seed=args.seed,
    )
    if not train:
        raise SystemExit(f"no training frames found in {args.data}")
    if args.epochs < 1:
        raise SystemExit("--epochs must be >= 1")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "settings.json").write_text(json.dumps(
        {k: v for k, v in vars(args).items()}, indent=2, default=str))

    ensemble = args.ensemble > 1
    t0 = time.perf_counter()
    if args.mesh > 0:
        from surface_sampling_tpu.parallel import chain_mesh, train_sharded

        if ensemble:
            raise SystemExit("--mesh currently shards the data axis; "
                             "drop --ensemble or --mesh")
        full = [b for b in train if b.positions.shape[0] % args.mesh == 0]
        if len(full) < len(train):
            dropped = sum(b.positions.shape[0] for b in train) - sum(
                b.positions.shape[0] for b in full)
            print(f"--mesh {args.mesh}: dropping the ragged tail batch "
                  f"({dropped} frames; sizes must divide the mesh — "
                  f"pick --batch-size as a multiple of {args.mesh})")
        if not full:
            raise SystemExit(
                f"--mesh {args.mesh} left no full batches; lower --mesh or "
                f"raise the frame count / --batch-size")
        dev_train = [_to_device(b) for b in full]
        params, history = train_sharded(
            params, cfg, dev_train, tcfg, mesh=chain_mesh(args.mesh),
            apply_fn=apply_fn)
    else:
        params, history = train_painn(params, cfg, train, tcfg,
                                      ensemble=ensemble, apply_fn=apply_fn)
    dt = time.perf_counter() - t0

    loss_fn = make_loss_fn(cfg, tcfg, apply_fn=apply_fn)
    val_loss = _epoch_loss(loss_fn, params, [b for b in map(_to_device, val)],
                           ensemble) if val else float("nan")
    test_loss = _epoch_loss(loss_fn, params,
                            [b for b in map(_to_device, test)],
                            ensemble) if test else float("nan")

    with (out / "history.csv").open("w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["epoch", "train_loss"])
        for i, h in enumerate(history):
            w.writerow([i, h])
    (out / "metrics.json").write_text(json.dumps({
        "final_train_loss": history[-1],
        "val_loss": val_loss,
        "test_loss": test_loss,
        "epochs": args.epochs,
        "train_seconds": round(dt, 2),
    }, indent=2, default=str))

    if ensemble:
        for i in range(args.ensemble):
            member = jax.tree.map(lambda x: x[i], params)
            save_fn(out / f"model_{i + 1:02d}.npz", member, cfg)
    else:
        save_fn(out / "model.npz", params, cfg)

    print(f"Trained {args.family} for {args.epochs} epochs "
          f"in {dt:.1f} s; final train loss {history[-1]:.6f}, "
          f"val {val_loss:.6f}, test {test_loss:.6f}")
    print(f"Output folder: {out}")


def _to_device(b):
    import jax.numpy as jnp
    import numpy as np

    from surface_sampling_tpu.models.train import PaddedBatch

    return PaddedBatch(*[
        None if x is None
        else jnp.asarray(x, jnp.float32) if np.asarray(x).dtype.kind == "f"
        else jnp.asarray(x)
        for x in b])


if __name__ == "__main__":
    main()
