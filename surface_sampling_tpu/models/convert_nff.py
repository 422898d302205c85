"""Convert reference nff PaiNN torch checkpoints to JAX param pytrees.

The reference ships trained ensembles as pickled `nff.nn.models.painn.Painn`
torch modules (tutorials/data/SrTiO3_001/nff/model0*/best_model). The nff
package is not installed here, so unpickling fabricates stub Module classes
on the fly — standard torch modules restore their parameter tree through
their ``__dict__``, which is all we need. Torch Linear stores (out, in);
our Dense uses x @ W so weights are transposed on conversion.

Usage:
    python -m surface_sampling_tpu.models.convert_nff <best_model> <out.npz>
"""

from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np


class _StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] in ("nff", "chgnet", "catkit", "pymatgen"):
            import torch.nn as nn

            return type(name, (nn.Module,), {"__module__": module})
        return super().find_class(module, name)


class _PickleModule:
    Unpickler = _StubUnpickler

    @staticmethod
    def load(f, **kw):
        return _StubUnpickler(f).load()


def load_nff_painn(path: str | Path):
    """Load an nff PaiNN checkpoint; returns (state_dict, attrs)."""
    import torch

    m = torch.load(path, map_location="cpu", weights_only=False, pickle_module=_PickleModule)
    attrs = {k: v for k, v in m.__dict__.items() if not k.startswith("_")}
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    return sd, attrs


def nff_to_params(sd: dict, attrs: dict):
    """Map an nff PaiNN state dict onto our param pytree + PaiNNConfig."""
    from surface_sampling_tpu.models.painn import PaiNNConfig

    def lin(prefix, bias=True):
        p = {"w": sd[f"{prefix}.weight"].T.copy()}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = sd[f"{prefix}.bias"].copy()
        return p

    n_layers = len({k.split(".")[1] for k in sd if k.startswith("message_blocks.")})
    feat = sd["embed_block.atom_embed.weight"].shape[1]
    n_rbf = sd["message_blocks.0.inv_message.dist_embed.block.1.weight"].shape[1]
    readout_hidden = sd["readout_blocks.0.readoutdict.energy.0.weight"].shape[0]

    params = {"atom_embed": sd["embed_block.atom_embed.weight"].copy()}
    params["message"] = [
        {
            "inv_dense0": lin(f"message_blocks.{i}.inv_message.inv_dense.layers.0"),
            "inv_dense1": lin(f"message_blocks.{i}.inv_message.inv_dense.layers.1"),
            "dist_embed": lin(f"message_blocks.{i}.inv_message.dist_embed.block.1"),
        }
        for i in range(n_layers)
    ]
    params["update"] = [
        {
            "u_mat": lin(f"update_blocks.{i}.u_mat", bias=False),
            "v_mat": lin(f"update_blocks.{i}.v_mat", bias=False),
            "s_dense0": lin(f"update_blocks.{i}.s_dense.0"),
            "s_dense1": lin(f"update_blocks.{i}.s_dense.1"),
        }
        for i in range(n_layers)
    ]
    params["readout"] = {
        "dense0": lin("readout_blocks.0.readoutdict.energy.0"),
        "dense1": lin("readout_blocks.0.readoutdict.energy.1"),
    }
    cfg = PaiNNConfig(
        feat_dim=feat,
        n_rbf=n_rbf,
        cutoff=float(attrs.get("cutoff", 5.0)),
        n_layers=n_layers,
        max_z=params["atom_embed"].shape[0],
        excl_vol=bool(attrs.get("excl_vol", False)),
        power=float(attrs.get("power", 12)),
        sigma=float(attrs.get("sigma", 1.5)),
        readout_hidden=readout_hidden,
    )
    return params, cfg


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)


def save_params_npz(path, params, cfg) -> None:
    flat = _flatten(params)
    meta = {f"__cfg__{k}": np.asarray(v) for k, v in cfg.__dict__.items()}
    np.savez_compressed(path, **flat, **meta)


def load_params_npz(path):
    from surface_sampling_tpu.models.painn import PaiNNConfig

    d = np.load(path)
    flat = {k: d[k] for k in d.files if not k.startswith("__cfg__")}
    cfg_kw = {}
    for k in d.files:
        if k.startswith("__cfg__"):
            name = k[len("__cfg__"):]
            v = d[k].item()
            cfg_kw[name] = v
    # restore python types; max_neighbors is a runtime padding knob, not a
    # checkpoint property — always take the current default (older npz saved
    # a too-small 48 that silently truncated crowded graphs)
    cfg_kw.pop("max_neighbors", None)
    for int_key in ("feat_dim", "n_rbf", "n_layers", "max_z", "readout_hidden"):
        if int_key in cfg_kw:
            cfg_kw[int_key] = int(cfg_kw[int_key])
    if "excl_vol" in cfg_kw:
        cfg_kw["excl_vol"] = bool(cfg_kw["excl_vol"])
    return _unflatten(flat), PaiNNConfig(**cfg_kw)


def convert(path_in, path_out) -> None:
    sd, attrs = load_nff_painn(path_in)
    params, cfg = nff_to_params(sd, attrs)
    save_params_npz(path_out, params, cfg)


if __name__ == "__main__":
    import sys

    convert(sys.argv[1], sys.argv[2])
