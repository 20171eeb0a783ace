"""Dense + batch-normalization composite layer.

Reference: ku/composite_layer/dense_composite_layer.py:27-52. The reference
stores a BatchNormalization sub-layer but never applies it in ``call``
(:37-46) — a latent bug; the autoencoder reversal code treats the composite
as Dense+BN. We implement the intended behavior (Dense → BN → activation →
dropout) with ``apply_bn`` defaulting to True; set it False for
bit-for-bit reference behavior.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ku.nn.common import Activation, resolve_activation


class DenseBatchNormalization(nn.Module):
    """Dense, optional BN, optional activation, optional dropout
    (reference dense_composite_layer.py:27-52)."""

    features: int
    activation: Activation = None
    dropout_rate: Optional[float] = None
    apply_bn: bool = True
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.features)(x)
        if self.apply_bn:
            x = nn.BatchNorm(
                use_running_average=deterministic,
                momentum=self.momentum,
                epsilon=self.epsilon,
            )(x)
        x = resolve_activation(self.activation)(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x
