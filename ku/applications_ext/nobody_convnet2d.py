"""NobodyConvNet2D — conf-driven 2-D conv backbone.

Reference: ku/applications_ext/nobody_convnet2d.py:19-543. Structure:
stem SeparableConv2D stride-2 (:47-57); Block1 (downsample: Module1 →
Module2 → Module3(SE squeeze-excite, :348-390) → Module4(multiply+conv,
:393-433)); Block2 (residual: Module2/3/4 + Module7 add+conv, :504-543);
Block3 (upsampling variant with Module6); final 3×3 conv Module5
(:436-464). The active call path matches the reference's (its sequences
5-6 are commented out at :114-128); Block3/Module6 are provided for the
full module inventory.

Conf contract (reference :30-38): ``{raw_data_path, model_loading,
hps{bn_momentum, bn_scale, weight_decay}, nn_arch{conv_rate_multiplier,
sp_feature_dim, image_size, cell_size, anchor_scale_size}}``. Weight decay
belongs to the optimizer in JAX (``optax.add_decayed_weights``).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ku.applications_ext._modules import (
    ConvBNAct,
    DepthwiseBNAct,
    SepConvBNAct,
    global_avg_pool_keepdims,
)

_R = 2  # rank


class Module1(nn.Module):
    """SepConv(nc) → Conv(2nc, stride 2) (reference :232-276)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = SepConvBNAct(_R, self.nc, dilation=self.rate,
                         bn_momentum=self.bn_momentum)(x, deterministic)
        return ConvBNAct(_R, int(self.nc * 2), strides=2,
                         bn_momentum=self.bn_momentum)(x, deterministic)


class Module2(nn.Module):
    """Conv(2nc) → Conv(nc) → DepthwiseConv (reference :278-345)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ConvBNAct(_R, int(self.nc * 2), dilation=self.rate,
                      bn_momentum=self.bn_momentum)(x, deterministic)
        x = ConvBNAct(_R, max(1, int(self.nc / 2 * 2)),
                      bn_momentum=self.bn_momentum)(x, deterministic)
        return DepthwiseBNAct(_R, dilation=self.rate,
                              bn_momentum=self.bn_momentum)(x, deterministic)


class Module3(nn.Module):
    """SE-style squeeze-excite: GAP → 1×1(nc/4) → 1×1(nc)
    (reference :348-390)."""

    nc: int
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = global_avg_pool_keepdims(x, _R)
        x = ConvBNAct(_R, max(1, int(self.nc / 4)), kernel_size=1,
                      use_bn=False, use_act=False)(x, deterministic)
        return ConvBNAct(_R, self.nc, kernel_size=1, use_bn=False,
                         use_act=False)(x, deterministic)


class Module4(nn.Module):
    """Multiply two branches then conv (reference :393-433)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        a, b = inputs
        return ConvBNAct(_R, max(1, int(self.nc)), dilation=self.rate,
                         bn_momentum=self.bn_momentum)(a * b, deterministic)


class Module5(nn.Module):
    """Plain 3×3 projection conv, no BN/act (reference :436-464)."""

    nc: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return ConvBNAct(_R, self.nc, use_bn=False, use_act=False)(
            x, deterministic
        )


class Module6(nn.Module):
    """2× upsample → conv → BN → ReLU (reference :467-501)."""

    nc: int
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return ConvBNAct(_R, self.nc, bn_momentum=self.bn_momentum)(
            x, deterministic
        )


class Module7(nn.Module):
    """Residual add then conv (reference :504-543)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        a, b = inputs
        return ConvBNAct(_R, self.nc, dilation=self.rate,
                         bn_momentum=self.bn_momentum)(a + b, deterministic)


class Block1(nn.Module):
    """Downsample block (reference :133-164)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nc2 = int(self.nc * 2)
        x2 = Module1(self.nc, self.rate, self.bn_momentum)(x, deterministic)
        x3 = Module2(nc2, self.rate, self.bn_momentum)(x2, deterministic)
        x4 = Module3(nc2, self.bn_momentum)(x2, deterministic)
        return Module4(nc2, self.rate, self.bn_momentum)([x3, x4], deterministic)


class Block2(nn.Module):
    """Residual block (reference :166-196)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x2 = Module2(self.nc, self.rate, self.bn_momentum)(x, deterministic)
        x3 = Module3(self.nc, self.bn_momentum)(x2, deterministic)
        x4 = Module4(self.nc, self.rate, self.bn_momentum)([x2, x3], deterministic)
        return Module7(self.nc, self.rate, self.bn_momentum)([x, x4], deterministic)


class Block3(nn.Module):
    """Upsampling residual block (reference :199-229)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x2 = Module6(self.nc, self.bn_momentum)(x, deterministic)
        x3 = Module2(self.nc, self.rate, self.bn_momentum)(x2, deterministic)
        x4 = Module3(self.nc, self.bn_momentum)(x2, deterministic)
        x5 = Module4(self.nc, self.rate, self.bn_momentum)([x3, x4], deterministic)
        return Module7(self.nc, self.rate, self.bn_momentum)([x2, x5], deterministic)


class NobodyConvNet2D(nn.Module):
    """Full backbone (reference :19-131). Construct with the conf dict:
    ``NobodyConvNet2D.from_conf(conf, input_shape)``."""

    in_channels: int
    sp_feature_dim: int
    conv_rate_multiplier: int = 1
    bn_momentum: float = 0.99

    @classmethod
    def from_conf(cls, conf, input_shape: Tuple[int, ...]):
        nn_arch = conf["nn_arch"]
        hps = conf.get("hps", {})
        return cls(
            in_channels=int(input_shape[-1]),
            sp_feature_dim=int(nn_arch["sp_feature_dim"]),
            conv_rate_multiplier=int(nn_arch.get("conv_rate_multiplier", 1)),
            bn_momentum=float(hps.get("bn_momentum", 0.99)),
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rate = self.conv_rate_multiplier
        nc = int(self.in_channels * 4)
        # Stem (reference :47-57).
        x = SepConvBNAct(_R, nc, strides=2, dilation=rate,
                         bn_momentum=self.bn_momentum)(x, deterministic)
        # Active sequence path (reference :91-128; sequences 5-6 are
        # commented out there).
        x = Block1(nc, rate, self.bn_momentum)(x, deterministic)
        nc = int(nc * 2)
        x = Block2(nc, rate, self.bn_momentum)(x, deterministic)
        x = Block2(nc, rate, self.bn_momentum)(x, deterministic)
        x = Block2(nc, rate, self.bn_momentum)(x, deterministic)
        return Module5(self.sp_feature_dim)(x, deterministic)
