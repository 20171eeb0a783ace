"""Convolution layer extensions (channels-last, XLA-native).

Reference: ku/layer_ext/convolution.py —
- ``_EqualizedLRConv`` + rank-1/2/3 wrappers (:23-255): runtime-scaled
  kernels (same equalized-LR scheme as the dense layer).
- ``_FusedEqualizedLRConv`` + wrappers (:258-506): the scaled kernel is
  box-smoothed before convolving — pad by 1 on each spatial side and average
  the 2^rank shifted copies (e.g. rank-2 at :324-329). Used for the ≥128 px
  StyleGAN layers.
- ``FusedEqualizedLRConv2DTranspose`` (:509-615): transposed conv whose
  kernel is padded and *summed* (not averaged) over the 4 shifts (:594-599)
  — the StyleGAN fused upsample+conv.
- ``BlurDepthwiseConv2D`` (:618-713): fixed separable [1,2,1]⊗[1,2,1]
  normalized blur as a depthwise conv.
- ``DepthwiseConv3D`` (:716-884) / ``SeparableConv3D`` (:887-1048): the
  reference loops ``K.conv3d`` per channel in Python; here both are a single
  grouped ``lax.conv_general_dilated`` call (``feature_group_count``), which
  XLA tiles onto the MXU directly — no host loop.

All layers are NHWC / NDHWC (TPU-native layout).

``lane_packed=True`` (2-D layers only) runs the layer on a 2x2
space-to-depth packed input — (B, H/2, W/2, 4C) instead of (B, H, W, C) —
computing the identical function with identical parameter shapes; see
ku/nn/packed.py for the layout and the TPU lane-utilization rationale.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ku.nn.common import (
    Activation,
    normalize_tuple,
    resolve_activation,
    truncated_normal_init,
)

_DIMNUMS = {
    1: ("NWC", "WIO", "NWC"),
    2: ("NHWC", "HWIO", "NHWC"),
    3: ("NDHWC", "DHWIO", "NDHWC"),
}


def _padding(padding: Union[str, Sequence]) -> Union[str, Sequence]:
    if isinstance(padding, str):
        return padding.upper()
    return padding


def conv_nd(x, kernel, strides, padding, rank, dilation=None, groups=1):
    """Channels-last N-D convolution via a single XLA conv HLO."""
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=_padding(padding),
        rhs_dilation=dilation or (1,) * rank,
        dimension_numbers=_DIMNUMS[rank],
        feature_group_count=groups,
    )


def _fuse_kernel(kernel, rank: int, average: bool):
    """Pad spatial dims by 1 and combine the 2^rank shifted copies.

    Mirrors reference convolution.py:316-351 (average=True) and :594-599
    (average=False, transpose path).
    """
    pad_cfg = [(1, 1)] * rank + [(0, 0), (0, 0)]
    k = jnp.pad(kernel, pad_cfg)
    shifts = [k]
    for axis in range(rank):
        shifts = [
            s[(slice(None),) * axis + (sl,)]
            for s in shifts
            for sl in (slice(1, None), slice(None, -1))
        ]
    out = shifts[0]
    for s in shifts[1:]:
        out = out + s
    if average:
        out = out / float(len(shifts))
    return out


class _EqualizedLRConvBase(nn.Module):
    """Shared body for (fused) equalized-LR convs."""

    filters: int
    kernel_size: Union[int, Sequence[int]]
    rank: int = 2
    strides: Union[int, Sequence[int]] = 1
    padding: Union[str, Sequence] = "valid"
    dilation_rate: Union[int, Sequence[int]] = 1
    activation: Activation = None
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    fused: bool = False
    dtype: Optional[jnp.dtype] = None
    lane_packed: bool = False

    @nn.compact
    def __call__(self, x):
        rank = self.rank
        ksize = normalize_tuple(self.kernel_size, rank)
        strides = normalize_tuple(self.strides, rank)
        dilation = normalize_tuple(self.dilation_rate, rank)

        in_ch = x.shape[-1]
        if self.lane_packed:
            from ku.nn import packed as _pk

            assert rank == 2 and dilation == (1, 1), "packing is 2-D only"
            assert str(self.padding).lower() == "same"
            assert strides[0] == strides[1]
            in_ch = x.shape[-1] // _pk.PHASES

        # Reference fan-in quirk: prod of ALL non-batch input dims
        # (convolution.py:66-68), spatial dims included. Invariant under
        # packing: H'*W'*4C == H*W*C.
        fan_in = 1
        for d in x.shape[1:]:
            fan_in *= d
        runtime_coeff = (self.gain / math.sqrt(fan_in)) * self.lrmul

        kernel = self.param(
            "kernel",
            truncated_normal_init(1.0 / self.lrmul),
            ksize + (in_ch, self.filters),
        )
        scaled = kernel * runtime_coeff
        if self.fused:
            scaled = _fuse_kernel(scaled, rank, average=True)

        dtype = self.dtype or x.dtype
        if self.lane_packed:
            y = _pk.packed_conv2d(
                x.astype(dtype), scaled.astype(dtype), strides[0]
            )
        else:
            y = conv_nd(
                x.astype(dtype), scaled.astype(dtype), strides, self.padding,
                rank, dilation,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            if self.lane_packed:
                bias = _pk.tile_channels(bias)
            y = y + bias.astype(dtype)
        return resolve_activation(self.activation)(y)


class EqualizedLRConv1D(_EqualizedLRConvBase):
    """Equalized-LR 1D conv (reference convolution.py:120-255)."""

    rank: int = 1
    fused: bool = False


class EqualizedLRConv2D(_EqualizedLRConvBase):
    """Equalized-LR 2D conv (reference convolution.py:120-255)."""

    rank: int = 2
    fused: bool = False


class EqualizedLRConv3D(_EqualizedLRConvBase):
    """Equalized-LR 3D conv (reference convolution.py:120-255)."""

    rank: int = 3
    fused: bool = False


class FusedEqualizedLRConv1D(_EqualizedLRConvBase):
    """Fused equalized-LR 1D conv (reference convolution.py:371-506)."""

    rank: int = 1
    fused: bool = True


class FusedEqualizedLRConv2D(_EqualizedLRConvBase):
    """Fused equalized-LR 2D conv (reference convolution.py:371-506)."""

    rank: int = 2
    fused: bool = True


class FusedEqualizedLRConv3D(_EqualizedLRConvBase):
    """Fused equalized-LR 3D conv (reference convolution.py:371-506)."""

    rank: int = 3
    fused: bool = True


class FusedEqualizedLRConv2DTranspose(nn.Module):
    """Fused equalized-LR transposed 2-D conv (reference convolution.py:509-615).

    The kernel is runtime-scaled, padded by 1 per spatial side, and the four
    shifted copies are *summed* (:594-599) — together with stride 2 this is
    StyleGAN's fused 2× upsample + conv. The reference's Keras kernel-layout
    transposition (:593) is folded away: we store the kernel directly as
    (kh, kw, in, out) HWIO.
    """

    filters: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: str = "valid"
    activation: Activation = None
    use_bias: bool = True
    gain: float = math.sqrt(2.0)
    lrmul: float = 1.0
    dtype: Optional[jnp.dtype] = None
    lane_packed: bool = False

    @nn.compact
    def __call__(self, x):
        ksize = normalize_tuple(self.kernel_size, 2)
        strides = normalize_tuple(self.strides, 2)

        in_ch = x.shape[-1]
        if self.lane_packed:
            from ku.nn import packed as _pk

            assert strides == (2, 2) and str(self.padding).lower() == "same"
            in_ch = x.shape[-1] // _pk.PHASES

        fan_in = 1
        for d in x.shape[1:]:
            fan_in *= d
        runtime_coeff = (self.gain / math.sqrt(fan_in)) * self.lrmul

        kernel = self.param(
            "kernel",
            truncated_normal_init(1.0 / self.lrmul),
            ksize + (in_ch, self.filters),
        )
        fused = _fuse_kernel(kernel * runtime_coeff, 2, average=False)

        dtype = self.dtype or x.dtype
        if self.lane_packed:
            y = _pk.packed_conv_transpose2x(
                x.astype(dtype), fused.astype(dtype)
            )
        else:
            y = lax.conv_transpose(
                x.astype(dtype),
                fused.astype(dtype),
                strides=strides,
                padding=_padding(self.padding),
                dimension_numbers=_DIMNUMS[2],
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            if self.lane_packed:
                bias = _pk.tile_channels(bias)
            y = y + bias.astype(dtype)
        return resolve_activation(self.activation)(y)


def _depthwise_nd(x, kernel_keras, strides, padding, rank, dilation=None):
    """Grouped conv from a Keras-layout depthwise kernel (*spatial, C, mult)."""
    spatial = kernel_keras.shape[:rank]
    in_ch = kernel_keras.shape[rank]
    mult = kernel_keras.shape[rank + 1]
    rhs = jnp.reshape(kernel_keras, spatial + (1, in_ch * mult))
    return conv_nd(x, rhs, strides, padding, rank, dilation, groups=in_ch)


class BlurDepthwiseConv2D(nn.Module):
    """StyleGAN blur layer (reference convolution.py:618-713).

    Depthwise conv whose kernel is initialized to the normalized separable
    ``blur_kernel ⊗ blur_kernel`` (:671-676), tiled over channels. The
    reference marks the weight trainable (:693) though it is semantically a
    fixed blur; ``trainable=False`` freezes it via ``lax.stop_gradient``.
    """

    blur_kernel: Sequence[int] = (1, 2, 1)
    strides: Union[int, Sequence[int]] = 1
    padding: str = "same"
    depth_multiplier: int = 1
    use_bias: bool = True
    trainable: bool = True
    lane_packed: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.lane_packed:
            from ku.nn import packed as _pk

            assert self.depth_multiplier == 1 and self.strides == 1
            assert str(self.padding).lower() == "same"
            in_ch = x.shape[-1] // _pk.PHASES
        k = len(self.blur_kernel)

        def blur_init(key, shape, dtype=jnp.float32):
            b = jnp.asarray(self.blur_kernel, dtype)
            f = b[:, None] * b[None, :]
            f = f / jnp.sum(f)
            f = f[::-1, ::-1][:, :, None, None]
            return jnp.tile(f, (1, 1, in_ch, self.depth_multiplier))

        kernel = self.param("kernel", blur_init, (k, k, in_ch, self.depth_multiplier))
        if not self.trainable:
            kernel = lax.stop_gradient(kernel)
        strides = normalize_tuple(self.strides, 2)
        if self.lane_packed:
            y = _pk.packed_depthwise_conv2d(x, kernel.astype(x.dtype))
        else:
            y = _depthwise_nd(x, kernel.astype(x.dtype), strides, self.padding, 2)
        if self.use_bias:
            # The reference allocates a non-trainable zero bias (:696-700).
            bias = self.param(
                "bias", nn.initializers.zeros, (in_ch * self.depth_multiplier,)
            )
            if self.lane_packed:
                bias = _pk.tile_channels(bias)
            y = y + lax.stop_gradient(bias).astype(x.dtype)
        return y


class DepthwiseConv3D(nn.Module):
    """3-D depthwise conv (reference convolution.py:716-884).

    The reference emits one ``K.conv3d`` per channel in a Python loop
    (:799-849); here it is a single grouped conv — one XLA HLO, MXU-tiled.
    """

    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: str = "valid"
    depth_multiplier: int = 1
    dilation_rate: Union[int, Sequence[int]] = 1
    activation: Activation = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        ksize = normalize_tuple(self.kernel_size, 3)
        strides = normalize_tuple(self.strides, 3)
        dilation = normalize_tuple(self.dilation_rate, 3)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            ksize + (in_ch, self.depth_multiplier),
        )
        y = _depthwise_nd(
            x, kernel.astype(x.dtype), strides, self.padding, 3, dilation
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (in_ch * self.depth_multiplier,)
            )
            y = y + bias.astype(x.dtype)
        return resolve_activation(self.activation)(y)


class SeparableConv3D(nn.Module):
    """Separable 3-D conv: depthwise then 1×1×1 pointwise (reference
    convolution.py:887-1048; pointwise at :1035-1039). Used by
    NobodyConvNet3D."""

    filters: int
    kernel_size: Union[int, Sequence[int]]
    strides: Union[int, Sequence[int]] = 1
    padding: str = "valid"
    depth_multiplier: int = 1
    dilation_rate: Union[int, Sequence[int]] = 1
    activation: Activation = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        ksize = normalize_tuple(self.kernel_size, 3)
        strides = normalize_tuple(self.strides, 3)
        dilation = normalize_tuple(self.dilation_rate, 3)
        depthwise = self.param(
            "depthwise_kernel",
            nn.initializers.lecun_normal(),
            ksize + (in_ch, self.depth_multiplier),
        )
        y = _depthwise_nd(
            x, depthwise.astype(x.dtype), strides, self.padding, 3, dilation
        )
        pointwise = self.param(
            "pointwise_kernel",
            nn.initializers.lecun_normal(),
            (1, 1, 1, in_ch * self.depth_multiplier, self.filters),
        )
        y = conv_nd(y, pointwise.astype(x.dtype), (1, 1, 1), "valid", 3)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.filters,))
            y = y + bias.astype(x.dtype)
        return resolve_activation(self.activation)(y)
