"""MACE state-dict converter — the missing sibling of convert_nff.py /
convert_chgnet.py (SURVEY §2.2 "NffScaleMACE";
/root/reference/scripts/default_settings.py:5 lists the model type).

The reference ships NO MACE weights, so unlike the PaiNN/CHGNet
converters there is no checkpoint to bit-validate against. What this
module pins down is the CONTRACT for loading externally trained weights
into models/mace.py:

  * :func:`export_mace_state_dict` — our params as a flat torch-style
    state dict (``layers.{t}.{name}.weight`` / ``.bias``; Linear weights
    in torch's (out, in) orientation).
  * :func:`convert_mace_state_dict` — the inverse: a flat name->array
    mapping (from ``torch.load(...).state_dict()`` of a model exported
    in this naming, or an npz of the same) back to (params, MACEConfig),
    with dims inferred from shapes. Common official-``mace``-package
    names with an exact semantic counterpart are aliased
    (``node_embedding.linear.weight`` -> atom_embed,
    ``atomic_energies_fn.atomic_energies`` -> atom_ref,
    ``readouts.{t}.linear.weight`` -> per-layer readout); everything
    else in a foreign checkpoint has no 1:1 counterpart — the JAX model
    is a from-paper re-design, not a port — and the converter refuses
    loudly rather than silently mis-mapping (strict=True default).

Round-trip is tested synthetically (tests/test_mace.py): params ->
state dict -> params is exact, and a state dict written through torch
(the baked-in cpu build) loads back bit-identically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from surface_sampling_tpu.models.mace import MACEConfig, init_mace

# our canonical flat naming <- aliases used by the official mace package
# where the semantics genuinely correspond 1:1
_ALIASES = {
    "node_embedding.linear.weight": "atom_embed",
    "atomic_energies_fn.atomic_energies": "atom_ref",
}
_ALIAS_LAYER = {
    # official per-interaction readouts: readouts.{t}.linear.weight/bias
    "readouts.{t}.linear.weight": "layers.{t}.readout.weight",
    "readouts.{t}.linear.bias": "layers.{t}.readout.bias",
}


def _iter_param_leaves(params):
    """Yield (flat_name, leaf, kind) over the params tree, torch-style:
    dense dicts {"w": (in, out)[, "b"]} become name.weight/name.bias."""
    yield "atom_embed", params["atom_embed"], "plain"
    yield "atom_ref", params["atom_ref"], "plain"
    for t, layer in enumerate(params["layers"]):
        for name, leaf in layer.items():
            yield f"layers.{t}.{name}.weight", leaf["w"], "linear_w"
            if "b" in leaf:
                yield f"layers.{t}.{name}.bias", leaf["b"], "plain"


def export_mace_state_dict(params) -> dict:
    """Flat torch-convention state dict of a models/mace.py param tree
    (Linear weights transposed to torch's (out_features, in_features))."""
    sd = {}
    for name, leaf, kind in _iter_param_leaves(params):
        arr = np.asarray(leaf)
        sd[name] = arr.T.copy() if kind == "linear_w" else arr.copy()
    return sd


def _infer_cfg(sd: dict) -> MACEConfig:
    max_z, F = sd["atom_embed"].shape
    layer_ids = sorted({
        int(k.split(".")[1]) for k in sd if k.startswith("layers.")
    })
    n_layers = len(layer_ids)
    R = sd["layers.0.rad0.weight"].shape[1]        # (F, R) in torch orient
    n_inv = sd["layers.0.update0.weight"].shape[1] // F
    l_max = {5: 1, 9: 2, 13: 3}[n_inv]
    eq = "layers.0.v_upd.weight" in sd
    return MACEConfig(feat_dim=F, n_rbf=R, n_layers=n_layers, max_z=max_z,
                      l_max=l_max, equivariant_messages=eq)


def convert_mace_state_dict(sd: dict, cfg: MACEConfig | None = None,
                            strict: bool = True):
    """Rebuild (params, cfg) from a flat state dict (see module
    docstring). ``sd`` values can be torch tensors, numpy arrays, or
    anything ``np.asarray`` accepts. Unknown keys raise when
    ``strict`` (recommended: a foreign checkpoint's unmapped weights
    mean the architectures do NOT correspond — silently dropping them
    would produce a confidently wrong model)."""
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu()
                        if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    # normalize aliases to canonical names
    for alias, canon in _ALIASES.items():
        if alias in sd and canon not in sd:
            sd[canon] = sd.pop(alias)
    t = 0
    while True:
        hit = False
        for alias_t, canon_t in _ALIAS_LAYER.items():
            a, c = alias_t.format(t=t), canon_t.format(t=t)
            if a in sd and c not in sd:
                sd[c] = sd.pop(a)
                hit = True
        if not hit and not any(f"readouts.{t}." in k for k in sd):
            break
        t += 1

    if cfg is None:
        cfg = _infer_cfg(sd)
    # skeleton from init (correct tree structure incl. optional blocks),
    # then overwrite every leaf from the state dict
    import jax

    params = jax.tree.map(np.asarray, init_mace(jax.random.PRNGKey(0), cfg))
    used = set()
    for name, leaf, kind in _iter_param_leaves(params):
        if name not in sd:
            raise KeyError(
                f"state dict is missing {name!r} (expected for "
                f"{cfg.n_layers}-layer l_max={cfg.l_max} "
                f"equivariant={cfg.equivariant_messages} MACE)")
        arr = sd[name].T if kind == "linear_w" else sd[name]
        want = np.asarray(leaf).shape
        if arr.shape != want:
            raise ValueError(
                f"{name!r}: shape {arr.shape} does not match {want}")
        parts = name.replace(".weight", ".w").replace(".bias", ".b").split(".")
        node = params
        for p in parts[:-1]:
            node = node[int(p)] if p.isdigit() else node[p]
        node[parts[-1]] = np.ascontiguousarray(arr)
        used.add(name)
    unknown = sorted(set(sd) - used)
    if unknown and strict:
        raise ValueError(
            "state dict has keys with no counterpart in the JAX MACE "
            f"(architectures differ — refusing to drop them): {unknown[:8]}"
            f"{' ...' if len(unknown) > 8 else ''}")
    return params, cfg


def load_mace_state_dict(path: str | Path, cfg: MACEConfig | None = None,
                         strict: bool = True):
    """Load a state dict from a ``.npz`` (flat arrays) or a torch ``.pt``
    / ``.pth`` file (a pickled state dict, or an object exposing
    ``.state_dict()``) and convert it."""
    p = Path(path)
    if p.suffix == ".npz":
        d = np.load(p)
        sd = {k: d[k] for k in d.files}
    else:
        import torch

        obj = torch.load(p, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return convert_mace_state_dict(sd, cfg, strict=strict)
