"""Self-describing model checkpoints: config + params pytree in one file.

Preserves the reference's LoadableModel property (ne.modelio / torch/
modelio.py:38-77): a saved model file reconstructs its own architecture —
``load_model(path)`` returns a ready-to-call (model, params) pair without the
caller knowing the constructor arguments.

Format: a single ``.npz`` holding a JSON config blob (model class name +
constructor kwargs) and the flattened params with path-joined keys. Pure
numpy — loadable anywhere, no orbax/pickle dependency, nothing executable.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["register_model", "save_model", "load_model", "MODEL_REGISTRY"]

MODEL_REGISTRY: Dict[str, Any] = {}

_SEP = "||"


def register_model(cls):
    """Class decorator: make a flax model class loadable by name."""
    MODEL_REGISTRY[cls.__name__] = cls
    return cls


def _flatten(tree, prefix="", out=None):
    if out is None:
        out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, prefix + str(k) + _SEP, out)
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_model(path: str, model, params, extra_config: Dict[str, Any] = None):
    """Save a flax module + params. Model class must be @register_model'ed.

    The config records every dataclass field of the module so load_model can
    reconstruct it. jnp/np dtypes are stored by name.
    """
    import dataclasses
    import jax.numpy as jnp

    config = {}
    for field in dataclasses.fields(model):
        if field.name in ("parent", "name"):
            continue
        val = getattr(model, field.name)
        if val is jnp.float32 or val is np.float32:
            val = "float32"
        elif val is jnp.bfloat16:
            val = "bfloat16"
        elif isinstance(val, tuple):
            val = list(val)
        config[field.name] = val
    blob = {
        "class": type(model).__name__,
        "config": config,
        "extra": extra_config or {},
    }

    flat = _flatten(params)
    np.savez(path, __config__=np.frombuffer(
        json.dumps(blob, default=str).encode(), dtype=np.uint8), **flat)


def load_model(path: str) -> Tuple[Any, Dict]:
    """Load (model, params) from a save_model file."""
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    blob = json.loads(bytes(data["__config__"].tobytes()).decode())
    cls = MODEL_REGISTRY.get(blob["class"])
    if cls is None:
        raise ValueError(
            f"model class '{blob['class']}' is not registered; import its module first")
    config = blob["config"]
    if config.get("dtype") == "float32":
        config["dtype"] = jnp.float32
    elif config.get("dtype") == "bfloat16":
        config["dtype"] = jnp.bfloat16
    model = cls(**config)
    flat = {k: data[k] for k in data.files if k != "__config__"}
    params = _unflatten(flat)
    return model, params
