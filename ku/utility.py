"""Model persistence: JSON architecture + weight archive.

Reference: ku/utility.py:7-33 — ``save_model_jh5``/``load_model_jh5`` write
a Keras model as ``<name>.json`` (architecture) + ``<name>.h5`` (weights).
The TPU-native analogue keeps the two-file contract but h5-free: the
architecture side is any JSON-serializable spec dict and the weight side is
an ``.npz`` of the flattened param pytree (keys are ``/``-joined paths), so
checkpoints are portable without TF. Full train-state checkpoints
(params + optimizer + PRNG + step) live in :mod:`ku.io.checkpoint` (orbax).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(value)
    return tree


def save_model_jh5(spec: Any, params, name: str) -> None:
    """Save architecture spec → ``<name>.json``, params → ``<name>.npz``.

    Mirrors the reference's two-file contract (ku/utility.py:7-18).
    """
    with open(name + ".json", "w") as f:
        json.dump(spec, f, indent=2, default=str)
    np.savez(name + ".npz", **_flatten(params))


def load_model_jh5(name: str) -> Tuple[Any, Any]:
    """Load (spec, params) saved by :func:`save_model_jh5`
    (reference ku/utility.py:21-33)."""
    with open(name + ".json") as f:
        spec = json.load(f)
    with np.load(name + ".npz") as data:
        params = _unflatten({k: data[k] for k in data.files})
    return spec, params


def save_weights(params, path: str) -> None:
    np.savez(path if path.endswith(".npz") else path + ".npz", **_flatten(params))


def load_weights(path: str):
    with np.load(path if path.endswith(".npz") else path + ".npz") as data:
        return _unflatten({k: data[k] for k in data.files})


def remove_if_exists(path: str) -> None:
    if os.path.exists(path):
        os.remove(path)
