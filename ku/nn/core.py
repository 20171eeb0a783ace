"""Core layers: equalized-learning-rate dense.

Reference: ku/layer_ext/core.py:20-76 (``EqualizedLRDense``). The scheme
(StyleGAN): initialize the kernel at TruncatedNormal(std=1/lrmul) and scale
it at *runtime* by ``he_std * lrmul`` with ``he_std = gain /
sqrt(prod(input_shape[1:]))`` so the effective learning rate of every layer
is equalized. XLA folds the scalar multiply into the matmul, so this costs
nothing on the MXU.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ku.nn.common import Activation, resolve_activation, truncated_normal_init


class EqualizedLRDense(nn.Module):
    """Equalized learning-rate dense layer (reference core.py:20-76)."""

    features: int
    activation: Activation = None
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = 1
        for d in x.shape[1:]:
            fan_in *= d
        he_std = self.gain / math.sqrt(fan_in)
        runtime_coeff = he_std * self.lrmul

        kernel = self.param(
            "kernel",
            truncated_normal_init(1.0 / self.lrmul),
            (x.shape[-1], self.features),
        )
        dtype = self.dtype or x.dtype
        y = jnp.dot(
            x.astype(dtype),
            (kernel * runtime_coeff).astype(dtype),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return resolve_activation(self.activation)(y)
