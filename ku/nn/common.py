"""Shared helpers for the ku layer zoo."""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp

Activation = Optional[Union[str, Callable]]

_ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "softmax": jax.nn.softmax,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "linear": lambda x: x,
    None: lambda x: x,
}


def resolve_activation(activation: Activation) -> Callable:
    if callable(activation):
        return activation
    try:
        return _ACTIVATIONS[activation]
    except KeyError:
        raise ValueError(f"unknown activation {activation!r}")


def truncated_normal_init(stddev: float):
    """TruncatedNormal(mean=0, stddev) truncated at ±2σ (Keras semantics).

    Reference layers initialize equalized-LR kernels with
    TruncatedNormal(stddev=1/lrmul) (reference ku/layer_ext/core.py:56-57).
    """

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev

    return init


def equalized_coeff(gain: float, lrmul: float, fan_in) -> float:
    """Runtime kernel coefficient ``he_std * lrmul``.

    ``he_std = gain / sqrt(fan_in)`` where the reference takes ``fan_in =
    prod(input_shape[1:])`` — i.e. ALL non-batch input dims, including
    spatial dims for convs (reference ku/layer_ext/core.py:53-55,
    convolution.py:66-68). We reproduce that formula for parity.
    """
    return gain / jnp.sqrt(jnp.asarray(fan_in, jnp.float32)) * lrmul


def normalize_tuple(value, rank: int):
    if isinstance(value, int):
        return (value,) * rank
    value = tuple(value)
    assert len(value) == rank
    return value
