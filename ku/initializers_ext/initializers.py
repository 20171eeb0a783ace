"""Initializer extensions.

Reference: ku/initializers_ext/initializers.py:21-44 — ``he_normal`` with a
tunable ``scale`` (VarianceScaling, fan_in, truncated normal). JAX-native:
returns a ``jax.nn.initializers``-style callable ``(key, shape, dtype)``.
"""

from __future__ import annotations

import jax


def he_normal(scale: float = 2.0, seed=None):
    """VarianceScaling(scale, mode='fan_in', distribution='truncated_normal').

    The reference's sole extension over stock he_normal is the tunable
    ``scale`` (reference initializers.py:21-44); default 2.0 matches He.
    """
    return jax.nn.initializers.variance_scaling(
        scale, mode="fan_in", distribution="truncated_normal"
    )
