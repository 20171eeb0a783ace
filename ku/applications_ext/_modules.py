"""Shared building blocks for the NobodyConvNet backbones.

Conv + BatchNorm + ReLU sandwiches in ranks 2 and 3, plus depthwise /
separable variants built on grouped XLA convs (no per-channel host loops —
see ku/nn/convolution.py). Weight decay is an optimizer concern in JAX
(use ``optax.add_decayed_weights``), not a layer attribute; the reference's
``kernel_regularizer=l2(weight_decay)`` maps to that.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ku.nn.convolution import _depthwise_nd, conv_nd
from ku.nn.common import normalize_tuple


class ConvBNAct(nn.Module):
    """Conv → BN → ReLU (the reference's ubiquitous sandwich)."""

    rank: int
    filters: int
    kernel_size: int = 3
    strides: int = 1
    padding: str = "same"
    dilation: int = 1
    use_act: bool = True
    use_bn: bool = True
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ks = normalize_tuple(self.kernel_size, self.rank)
        st = normalize_tuple(self.strides, self.rank)
        dl = normalize_tuple(self.dilation, self.rank)
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            ks + (x.shape[-1], self.filters),
        )
        x = conv_nd(x, kernel, st, self.padding, self.rank, dl)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=self.bn_momentum
            )(x)
        return nn.relu(x) if self.use_act else x


class DepthwiseBNAct(nn.Module):
    """Depthwise conv → BN → ReLU."""

    rank: int
    kernel_size: int = 3
    depth_multiplier: int = 1
    padding: str = "same"
    dilation: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ks = normalize_tuple(self.kernel_size, self.rank)
        dl = normalize_tuple(self.dilation, self.rank)
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            ks + (x.shape[-1], self.depth_multiplier),
        )
        x = _depthwise_nd(x, kernel, (1,) * self.rank, self.padding, self.rank, dl)
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=self.bn_momentum
        )(x)
        return nn.relu(x)


class SepConvBNAct(nn.Module):
    """Separable conv (depthwise + 1×..×1 pointwise) → BN → ReLU."""

    rank: int
    filters: int
    kernel_size: int = 3
    strides: int = 1
    padding: str = "same"
    dilation: int = 1
    bn_momentum: float = 0.99
    use_bn: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ks = normalize_tuple(self.kernel_size, self.rank)
        st = normalize_tuple(self.strides, self.rank)
        dl = normalize_tuple(self.dilation, self.rank)
        depthwise = self.param(
            "depthwise_kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            ks + (x.shape[-1], 1),
        )
        x = _depthwise_nd(x, depthwise, st, self.padding, self.rank, dl)
        pointwise = self.param(
            "pointwise_kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            (1,) * self.rank + (x.shape[-1], self.filters),
        )
        x = conv_nd(x, pointwise, (1,) * self.rank, "valid", self.rank)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=deterministic, momentum=self.bn_momentum
            )(x)
        return nn.relu(x) if self.use_act else x


def global_avg_pool_keepdims(x, rank: int):
    return jnp.mean(x, axis=tuple(range(1, rank + 1)), keepdims=True)
