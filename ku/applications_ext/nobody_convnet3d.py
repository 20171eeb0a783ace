"""NobodyConvNet3D — conf-driven 3-D conv backbone.

Reference: ku/applications_ext/nobody_convnet3d.py:50-582. 3-D analogue of
NobodyConvNet2D using separable 3-D convs (the reference loops K.conv3d
per channel; here grouped XLA convs — ku/nn/convolution.py): channel
growth ×1.5 per Block1 (:95-130), Module2 = sep-conv3d sandwich with a
stride-2 VALID conv (:313-380), Module3 SE (:382-425), Module4
multiply+sep-conv (:427-472), Module6 upsample3d (:505-540), Module7
add+conv (:542-582). Call path: stem → 4×Block1 → Block2 → Block1 →
2×Block2 → Block1 → 2×Block2 → Module5 (:134-158).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ku.applications_ext._modules import (
    ConvBNAct,
    SepConvBNAct,
    global_avg_pool_keepdims,
)

_R = 3


class Module1(nn.Module):
    """SepConv3D(nc) → Conv3D(1.5nc, stride 2) (reference :261-311)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = SepConvBNAct(_R, self.nc, dilation=self.rate,
                         bn_momentum=self.bn_momentum)(x, deterministic)
        return ConvBNAct(_R, int(self.nc * 1.5), strides=2, padding="same",
                         bn_momentum=self.bn_momentum)(x, deterministic)


class Module2(nn.Module):
    """SepConv3D(nc) → Conv3D(nc/2, stride 2, valid) → SepConv3D(nc)
    (reference :313-380)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = SepConvBNAct(_R, self.nc, dilation=self.rate,
                         bn_momentum=self.bn_momentum)(x, deterministic)
        x = ConvBNAct(_R, max(1, int(self.nc / 2)), strides=2,
                      padding="valid", bn_momentum=self.bn_momentum)(
            x, deterministic
        )
        return SepConvBNAct(_R, self.nc, dilation=self.rate,
                            bn_momentum=self.bn_momentum)(x, deterministic)


class Module3(nn.Module):
    """SE squeeze-excite 3-D (reference :382-425)."""

    nc: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = global_avg_pool_keepdims(x, _R)
        x = ConvBNAct(_R, max(1, int(self.nc / 2)), kernel_size=1,
                      use_bn=False, use_act=False)(x, deterministic)
        return ConvBNAct(_R, self.nc, kernel_size=1, use_bn=False,
                         use_act=False)(x, deterministic)


class Module4(nn.Module):
    """Multiply then separable conv (reference :427-472)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        a, b = inputs
        return SepConvBNAct(_R, self.nc, dilation=self.rate,
                            bn_momentum=self.bn_momentum)(a * b, deterministic)


class Module5(nn.Module):
    """Final projection conv (reference :474-503)."""

    nc: int

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return ConvBNAct(_R, self.nc, use_bn=False, use_act=False)(
            x, deterministic
        )


class Module6(nn.Module):
    """2× upsample3d → conv (reference :505-540)."""

    nc: int
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for axis in (1, 2, 3):
            x = jnp.repeat(x, 2, axis=axis)
        return ConvBNAct(_R, self.nc, bn_momentum=self.bn_momentum)(
            x, deterministic
        )


class Module7(nn.Module):
    """Add then conv (reference :542-582)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        a, b = inputs
        return ConvBNAct(_R, self.nc, dilation=self.rate,
                         bn_momentum=self.bn_momentum)(a + b, deterministic)


class Block1(nn.Module):
    """Downsample block with residual (reference :161-193)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        nc15 = int(self.nc * 1.5)
        x2 = Module1(self.nc, self.rate, self.bn_momentum)(x, deterministic)
        x3 = Module2(nc15, self.rate, self.bn_momentum)(x2, deterministic)
        x4 = Module3(nc15)(x2, deterministic)
        x5 = Module4(nc15, self.rate, self.bn_momentum)([x3, x4], deterministic)
        return Module7(nc15, self.rate, self.bn_momentum)([x3, x5], deterministic)


class Block2(nn.Module):
    """Residual block (reference :195-225)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x2 = Module2(self.nc, self.rate, self.bn_momentum)(x, deterministic)
        x3 = Module3(self.nc)(x2, deterministic)
        x4 = Module4(self.nc, self.rate, self.bn_momentum)([x2, x3], deterministic)
        return Module7(self.nc, self.rate, self.bn_momentum)([x3, x4], deterministic)


class Block3(nn.Module):
    """Upsampling block (reference :227-259)."""

    nc: int
    rate: int = 1
    bn_momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x2 = Module6(self.nc, self.bn_momentum)(x, deterministic)
        x3 = Module2(self.nc, self.rate, self.bn_momentum)(x2, deterministic)
        x4 = Module3(self.nc)(x2, deterministic)
        x5 = Module4(self.nc, self.rate, self.bn_momentum)([x3, x4], deterministic)
        return Module7(self.nc, self.rate, self.bn_momentum)([x2, x5], deterministic)


class NobodyConvNet3D(nn.Module):
    """Full 3-D backbone (reference :50-158). ``depth`` limits how many
    Block1 stages run (the full reference path needs large inputs —
    Module2's stride-2 VALID convs shrink spatial dims fast)."""

    in_channels: int
    sp_feature_dim: int
    conv_rate_multiplier: int = 1
    bn_momentum: float = 0.99
    depth: int = 2

    @classmethod
    def from_conf(cls, conf, input_shape: Tuple[int, ...], depth: int = 2):
        nn_arch = conf["nn_arch"]
        hps = conf.get("hps", {})
        return cls(
            in_channels=int(input_shape[-1]),
            sp_feature_dim=int(nn_arch["sp_feature_dim"]),
            conv_rate_multiplier=int(nn_arch.get("conv_rate_multiplier", 1)),
            bn_momentum=float(hps.get("bn_momentum", 0.99)),
            depth=depth,
        )

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        rate = self.conv_rate_multiplier
        nc = int(self.in_channels * 10)
        x = SepConvBNAct(_R, nc, dilation=rate,
                         bn_momentum=self.bn_momentum)(x, deterministic)
        for _ in range(self.depth):
            x = Block1(nc, rate, self.bn_momentum)(x, deterministic)
            nc = int(nc * 1.5)
        return Module5(self.sp_feature_dim)(x, deterministic)
