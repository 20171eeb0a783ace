"""Model export for serving.

The reference has no serving path (SURVEY §1: "no serving path"). Here the
deployment story is ``jax.export``: a jitted inference function is
serialized to a portable StableHLO artifact that any JAX (or PJRT) runtime
can reload and execute without the Python model code — plus the
weight-only JSON+npz format in :mod:`ku.utility` for interop.
"""

from __future__ import annotations

from typing import Callable, Sequence


def export_fn(fn: Callable, example_args: Sequence, path: str) -> None:
    """Serialize ``jit(fn)(*example_args)`` to a StableHLO artifact."""
    import jax
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)


def load_exported(path: str):
    """Reload an exported artifact; returns an object with ``.call(*args)``."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
