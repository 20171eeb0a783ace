"""StyleGAN style-path layers.

Reference: ku/layer_ext/style.py —
- ``StyleMixingRegularization`` (:16-58): with probability ``mixing_prob``
  pick a random cutoff layer in [1, num_layers) and use dlatent ``d1`` for
  layers below the cutoff, ``d2`` at/above it (:44-49).
- ``TruncationTrick`` (:61-128): keep a moving average of the first-layer
  dlatent mean (:98-101) and at inference interpolate toward it with factor
  ``psi`` for layers below ``cutoff`` (:88-95, 104-113).
- ``MinibatchStddevConcat`` (:131-175): group-wise stddev map appended as an
  extra channel (NVIDIA ProGAN/StyleGAN discriminator trick).

Stateless JAX translation: random draws come from flax RNG streams
(``make_rng('style')``), the moving average lives in the ``batch_stats``
variable collection (explicit mutable state instead of
``K.moving_average_update``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class StyleMixingRegularization(nn.Module):
    """Mix two broadcast dlatents at a random layer cutoff (reference :16-58).

    Inputs: ``[d1, d2]`` each (N, num_layers, dlatent_dim). Needs the
    ``'style'`` RNG stream when ``deterministic=False``.
    """

    mixing_prob: Optional[float] = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = False):
        d1, d2 = inputs
        if self.mixing_prob is None or deterministic:
            return d1
        num_layers = d1.shape[1]
        key = self.make_rng("style")
        k_mix, k_cut = jax.random.split(key)
        mix = jax.random.uniform(k_mix) < self.mixing_prob
        random_cutoff = jax.random.randint(k_cut, (), 1, num_layers)
        cutoff = jnp.where(mix, random_cutoff, num_layers)
        layer_idx = jnp.arange(num_layers)[None, :, None]
        return jnp.where(layer_idx < cutoff, d1, d2)


class TruncationTrick(nn.Module):
    """Truncation trick with moving-average dlatent center (reference :61-128).

    Input: (N, num_layers, dlatent_dim). During training the moving mean is
    updated from the layer-0 batch mean (:98-101) and the output is left
    (numerically) untruncated because β applies to ``x − mean`` with the
    *current* mean; at inference layers below ``cutoff`` are interpolated
    toward the moving mean with factor ``psi``.
    """

    psi: float = 0.0
    cutoff: Optional[int] = None
    momentum: float = 0.99

    @nn.compact
    def __call__(self, x, deterministic: bool = False):
        dim = x.shape[-1]
        num_layers = x.shape[1]
        moving_mean = self.variable(
            "batch_stats", "moving_mean", lambda: jnp.zeros((dim,), x.dtype)
        )

        if self.cutoff is not None:
            beta = jnp.where(
                jnp.arange(num_layers)[None, :, None] < self.cutoff,
                jnp.full((1, num_layers, 1), self.psi, x.dtype),
                jnp.ones((1, num_layers, 1), x.dtype),
            )
        else:
            beta = jnp.ones((1, num_layers, 1), x.dtype)

        if deterministic:
            return moving_mean.value + (x - moving_mean.value) * beta

        mean = jnp.mean(x[:, 0], axis=0)
        if not self.is_initializing():
            moving_mean.value = (
                self.momentum * moving_mean.value + (1.0 - self.momentum) * mean
            )
        return moving_mean.value + (x - moving_mean.value) * beta


class MinibatchStddevConcat(nn.Module):
    """Append the group-wise minibatch stddev as one extra channel
    (reference :131-175; matches the NVIDIA implementation).

    Input: (N, H, W, C); the batch is split into groups of ``group_size``
    and channels into ``num_new_features`` groups.
    """

    group_size: int = 4
    num_new_features: int = 1

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        g = min(self.group_size, n)
        f = self.num_new_features
        y = jnp.reshape(x, (g, -1, h, w, c // f, f)).astype(jnp.float32)
        y = y - jnp.mean(y, axis=0, keepdims=True)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(1, 2, 3), keepdims=True)
        y = jnp.mean(y, axis=3)
        y = y.astype(x.dtype)
        y = jnp.tile(y, (g, h, w, 1))
        return jnp.concatenate([x, y], axis=3)
