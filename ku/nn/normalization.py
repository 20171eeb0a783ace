"""Normalization layers: AdaIN pair + pixel norm.

Reference: ku/layer_ext/normalization.py —
- ``AdaptiveIN`` (:63-110): classic AdaIN between two image tensors,
  ``s_std·(c−μ_c)/σ_c + s_mean`` with statistics reduced over the non-batch,
  non-channel axes (:92-103).
- ``AdaptiveINWithStyle`` (:11-60): StyleGAN AdaIN — the style vector of
  length 2C is reshaped to (scale, bias) pairs (:48) and applied as
  ``(s0+1)·(c−μ_c)/σ_c + s1`` (:50).

``PixelNorm`` is the pixelwise feature-vector normalization the StyleGAN
example builds inline via a Lambda (reference
examples/style_based_gan/style_based_gan.py mapping net), promoted to a
named layer here.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _reduce_axes(ndim: int, channel_axis: int) -> Sequence[int]:
    if channel_axis < 0:
        channel_axis = ndim + channel_axis
    return tuple(i for i in range(1, ndim) if i != channel_axis)


class AdaptiveIN(nn.Module):
    """AdaIN between a content and a style tensor (reference :63-110)."""

    axis: int = -1
    epsilon: float = 1e-7

    @nn.compact
    def __call__(self, inputs):
        c, s = inputs
        axes = _reduce_axes(c.ndim, self.axis)
        c_mean = jnp.mean(c, axis=axes, keepdims=True)
        c_std = jnp.std(c, axis=axes, keepdims=True) + self.epsilon
        s_mean = jnp.mean(s, axis=axes, keepdims=True)
        s_std = jnp.std(s, axis=axes, keepdims=True)
        return s_std * ((c - c_mean) / c_std) + s_mean


class AdaptiveINWithStyle(nn.Module):
    """StyleGAN AdaIN driven by a dlatent style vector (reference :11-60).

    ``inputs = [content (N,H,W,C), style (N, 2C)]``; the style vector packs
    (scale, bias) per channel and the output is
    ``(scale+1)·(c−μ)/σ + bias``.
    """

    axis: int = -1
    epsilon: float = 1e-7

    @nn.compact
    def __call__(self, inputs):
        c, s = inputs
        assert s.ndim == 2 and s.shape[-1] == 2 * c.shape[-1]
        axes = _reduce_axes(c.ndim, self.axis)
        c_mean = jnp.mean(c, axis=axes, keepdims=True)
        c_std = jnp.std(c, axis=axes, keepdims=True) + self.epsilon
        s = jnp.reshape(s, (-1, 2) + (1,) * (c.ndim - 2) + (c.shape[-1],))
        return (s[:, 0] + 1.0) * ((c - c_mean) / c_std) + s[:, 1]


class PixelNorm(nn.Module):
    """Pixelwise feature normalization: ``x·rsqrt(mean(x², -1)+ε)``."""

    epsilon: float = 1e-8

    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), axis=-1, keepdims=True) + self.epsilon
        )
