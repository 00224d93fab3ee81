"""Checkpoint save/restore (orbax) + torch->rsn weight conversion.

Rebuilds the reference's inherited checkpoint story (SURVEY.md §3.4/§5.4):
step-indexed checkpoints containing {params, opt_state, step} plus the
config dump, written under
  <output_dir>/<experiment>/<method>/<timestamp>/checkpoints/step-XXXXXXXXX
with `steps_per_save` cadence; resume via load_checkpoint(load_dir).

`convert_torch_state_dict` maps a torch state-dict of the reference's
field (keys like `field.mlp_base.layers.N.weight`) onto our params
pytree so trained reference weights can be loaded for parity testing
(SURVEY.md §7.2 step 2).  Torch Linear stores (out, in); we store
(in, out), hence the transposes.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from rsn.models.field import (MID_WIDTH, SKIP_AT, TRUNK_LAYERS, TRUNK_WIDTH,
                              Params)


def save_checkpoint(ckpt_dir: str, step: int, params, opt_state,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"step-{step:09d}"))
    state = {"params": params, "opt_state": opt_state, "step": step}
    if extra:
        state.update(extra)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step-"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def load_checkpoint(path: str, abstract_state: Any = None) -> Dict[str, Any]:
    """Restore a checkpoint; abstract_state=None restores from the
    checkpoint's own saved structure (arrays come back as-is, optax
    states as plain pytrees).

    CROSS-PLATFORM: restoring from metadata alone replays the sharding
    the checkpoint was SAVED under ("Device TPU v5 lite0 was not found"
    when loading a TPU-trained run on CPU) — so the no-target path
    rebuilds abstract ShapeDtypeStructs from the checkpoint metadata,
    which restores onto the current default device. Train-on-TPU /
    inspect-on-CPU is a supported flow (same role as torch.load
    map_location in the reference stack)."""
    import jax
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.abspath(path)
        if abstract_state is None:
            meta = ckptr.metadata(path)
            dev = jax.local_devices()[0]
            shard = jax.sharding.SingleDeviceSharding(dev)
            abstract_state = jax.tree.map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                               sharding=shard)
                if hasattr(m, "shape") else m, meta.item_metadata.tree
                if hasattr(meta, "item_metadata") else meta)
        return ckptr.restore(path, abstract_state)


def _find_key(tree, key):
    if isinstance(tree, (str, bytes)):
        # a string leaf iterates into itself (1-char strings infinitely);
        # never a container we want to descend (ADVICE r4)
        return None
    if isinstance(tree, dict):
        if key in tree:
            return tree[key]
        tree = tree.values()
    if isinstance(tree, (list, tuple)) or hasattr(tree, "__iter__"):
        for v in tree:
            r = _find_key(v, key)
            if r is not None:
                return r
    return None


def checkpoint_is_legacy(path: str) -> bool:
    """True when the checkpoint predates flatten_optimizer: its Adam/
    RAdam moments are stored per parameter leaf (a pytree mirroring
    params) instead of one raveled vector.  Decided from the saved
    orbax metadata — NOT by trial-restoring and catching the mismatch,
    which masked genuine restore failures (corrupt/partial writes)
    behind a confusing legacy-shape error (ADVICE r3)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(os.path.abspath(path))
    tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") else meta
    opt = tree.get("opt_state") if isinstance(tree, dict) else None
    mu = _find_key(opt, "mu") if opt is not None else None
    return mu is not None and not hasattr(mu, "shape")


def dump_config(run_dir: str, config) -> None:
    def to_dict(obj):
        if dataclasses.is_dataclass(obj):
            return {f.name: to_dict(getattr(obj, f.name))
                    for f in dataclasses.fields(obj)}
        if isinstance(obj, dict):
            return {k: to_dict(v) for k, v in obj.items()}
        return obj
    os.makedirs(run_dir, exist_ok=True)
    d = to_dict(config)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(d, f, indent=2)
    try:  # also dump config.yml for ns-train output-layout parity
        import yaml
        with open(os.path.join(run_dir, "config.yml"), "w") as f:
            yaml.safe_dump(d, f, sort_keys=False)
    except Exception:
        pass


# --- torch -> rsn weight conversion (parity testing) -------------------

_HEAD_MAP = {
    # our params key -> reference module name (field.py:61-86)
    "density": "field_output_density",
    "low": "field_output_low",
    "bottleneck": "field_output_bottleneck",
    "mid": "field_output_mid",
    "normals": "field_output_normals",
    "roughness": "field_output_roughness",
    "diff": "field_output_diff",
    "tint": "field_output_tint",
}


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray],
                             prefix: str = "field.") -> Params:
    """Map a reference-field torch state dict to our params pytree.

    Accepts numpy arrays or anything with .numpy(); keys follow
    nerfstudio naming: MLP layers at `mlp_base.layers.N.{weight,bias}`,
    heads at `field_output_*.net.{weight,bias}`.
    """
    def get(name: str) -> np.ndarray:
        for k in (prefix + name, name):
            if k in state_dict:
                v = state_dict[k]
                return v if isinstance(v, np.ndarray) else v.numpy()
        raise KeyError(f"missing torch key {prefix + name}")

    def linear(name: str) -> Dict[str, np.ndarray]:
        return {"w": np.ascontiguousarray(get(name + ".weight").T),
                "b": get(name + ".bias")}

    params: Params = {"trunk": [
        linear(f"mlp_base.layers.{i}") for i in range(TRUNK_LAYERS)]}
    params["mid_mlp"] = linear("mlp_mid.layers.0")
    for ours, theirs in _HEAD_MAP.items():
        params[ours] = linear(theirs + ".net")
    _check_shapes(params)
    return jax.tree.map(lambda x: np.asarray(x, np.float32), params)


def _check_shapes(params: Params) -> None:
    assert params["trunk"][0]["w"].shape[1] == TRUNK_WIDTH
    assert params["trunk"][SKIP_AT]["w"].shape[0] > TRUNK_WIDTH  # skip concat
    assert params["mid"]["w"].shape == (MID_WIDTH, 3)
    assert params["density"]["w"].shape == (TRUNK_WIDTH, 1)


def export_torch_state_dict(params: Params,
                            prefix: str = "field.") -> Dict[str, np.ndarray]:
    """Inverse mapping (for checkpoint-shape parity checks)."""
    out: Dict[str, np.ndarray] = {}
    for i, layer in enumerate(params["trunk"]):
        out[f"{prefix}mlp_base.layers.{i}.weight"] = np.asarray(layer["w"]).T
        out[f"{prefix}mlp_base.layers.{i}.bias"] = np.asarray(layer["b"])
    out[f"{prefix}mlp_mid.layers.0.weight"] = np.asarray(
        params["mid_mlp"]["w"]).T
    out[f"{prefix}mlp_mid.layers.0.bias"] = np.asarray(params["mid_mlp"]["b"])
    for ours, theirs in _HEAD_MAP.items():
        out[f"{prefix}{theirs}.net.weight"] = np.asarray(params[ours]["w"]).T
        out[f"{prefix}{theirs}.net.bias"] = np.asarray(params[ours]["b"])
    return out
