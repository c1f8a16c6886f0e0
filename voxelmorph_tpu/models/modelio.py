"""Self-describing model checkpoints: config + params pytree in one file.

Preserves the reference's LoadableModel property (ne.modelio / torch/
modelio.py:38-77): a saved model file reconstructs its own architecture —
``load_model(path)`` returns a ready-to-call (model, params) pair without the
caller knowing the constructor arguments.

Format: a single ``.npz`` holding a JSON config blob (model class name +
constructor kwargs) and the flattened params with path-joined keys. Pure
numpy — loadable anywhere, no orbax/pickle dependency, nothing executable.

Beyond params, checkpoints may carry *extra trees* (nested dicts of arrays):
the Trainer stores optimizer state, mutable variable collections (e.g.
MeanStream's 'stream'), the global step and the base PRNG key this way, so a
preempted job resumes exactly where it left off — unlike the reference,
whose Keras ``.h5`` restores optimizer slots but not the data-stream RNG.

Config values that are structured objects (e.g. ``LabelsToImageConfig``) are
supported through a small registry: classes decorated with
``@register_config`` must provide ``to_dict()`` / ``from_dict()`` and are
serialized as tagged JSON rather than as opaque reprs.
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional, Tuple

import numpy as np

__all__ = ["register_model", "register_config", "save_model", "load_model",
           "MODEL_REGISTRY", "CONFIG_REGISTRY"]

MODEL_REGISTRY: Dict[str, Any] = {}
CONFIG_REGISTRY: Dict[str, Any] = {}

_SEP = "||"
_EXTRA = "__extra__"


def register_model(cls):
    """Class decorator: make a flax model class loadable by name."""
    MODEL_REGISTRY[cls.__name__] = cls
    return cls


def register_config(cls):
    """Class decorator: make a config object JSON round-trippable.

    The class must implement ``to_dict() -> dict`` and a classmethod
    ``from_dict(dict) -> cls`` with JSON-safe contents.
    """
    assert hasattr(cls, "to_dict") and hasattr(cls, "from_dict"), \
        f"{cls.__name__} needs to_dict/from_dict for checkpoint round-trips"
    CONFIG_REGISTRY[cls.__name__] = cls
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


def _encode_config_value(val):
    """JSON-encode one constructor value, tagging registered config objects."""
    import jax.numpy as jnp

    if type(val).__name__ in CONFIG_REGISTRY:
        return {"__config_class__": type(val).__name__, "data": val.to_dict()}
    if val is jnp.float32 or val is np.float32:
        return "float32"
    if val is jnp.bfloat16:
        return "bfloat16"
    if val is jnp.float16:
        return "float16"
    if isinstance(val, tuple):
        return [_encode_config_value(v) for v in val]
    if isinstance(val, list):
        return [_encode_config_value(v) for v in val]
    if isinstance(val, np.ndarray):
        return {"__ndarray__": val.tolist(), "dtype": str(val.dtype)}
    if isinstance(val, (np.integer,)):
        return int(val)
    if isinstance(val, (np.floating,)):
        return float(val)
    return val


def _decode_config_value(key, val):
    import jax.numpy as jnp

    if isinstance(val, dict) and "__config_class__" in val:
        cls = CONFIG_REGISTRY.get(val["__config_class__"])
        if cls is None:
            raise ValueError(
                f"config class '{val['__config_class__']}' is not registered; "
                "import its module first")
        return cls.from_dict(val["data"])
    if isinstance(val, dict) and "__ndarray__" in val:
        return np.asarray(val["__ndarray__"], dtype=val["dtype"])
    if key == "dtype":
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
                "float16": jnp.float16}.get(val, val)
    if isinstance(val, list):
        return [_decode_config_value(key, v) for v in val]
    return val


def save_model(path: str, model, params, extra_config: Optional[Dict] = None,
               extra_trees: Optional[Dict[str, Dict]] = None):
    """Save a flax module + params (+ optional extra array trees).

    The config records every dataclass field of the module so load_model can
    reconstruct it. ``extra_trees`` maps names to nested dicts of arrays
    (stored under reserved ``__extra__`` keys, invisible to plain loads).
    """
    import dataclasses

    config = {}
    for field in dataclasses.fields(model):
        if field.name in ("parent", "name"):
            continue
        config[field.name] = _encode_config_value(getattr(model, field.name))
    blob = {
        "class": type(model).__name__,
        "config": config,
        "extra": extra_config or {},
    }
    # a checkpoint that cannot round-trip is a landmine — fail at save time
    encoded = json.dumps(blob)

    flat = _flatten(params)
    for name, tree in (extra_trees or {}).items():
        flat.update(_flatten(tree, prefix=_EXTRA + name + _SEP))
    # write-then-rename so a preemption mid-save never corrupts the file a
    # later ``--load-weights latest`` resume would pick up (the tmp name
    # cannot match find_latest_checkpoint's numbered-file pattern)
    import os
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp.npz"
    try:
        np.savez(tmp, __config__=np.frombuffer(encoded.encode(), dtype=np.uint8),
                 **flat)
        os.replace(tmp, final)
    except BaseException:
        # don't leave a full-size partial file behind on failure
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_model(path: str, with_extra: bool = False):
    """Load (model, params) — or (model, params, extra_trees) — from a file."""
    data = np.load(path, allow_pickle=False)
    blob = json.loads(bytes(data["__config__"].tobytes()).decode())
    cls = MODEL_REGISTRY.get(blob["class"])
    if cls is None:
        raise ValueError(
            f"model class '{blob['class']}' is not registered; import its module first")
    config = {k: _decode_config_value(k, v) for k, v in blob["config"].items()}
    model = cls(**config)

    param_flat, extra_flat = {}, {}
    for k in data.files:
        if k == "__config__":
            continue
        if k.startswith(_EXTRA):
            extra_flat[k[len(_EXTRA):]] = data[k]
        else:
            param_flat[k] = data[k]
    params = _unflatten(param_flat)
    if not with_extra:
        return model, params
    return model, params, _unflatten(extra_flat)
