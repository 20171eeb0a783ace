"""Stateless PRNG key threading.

The reference relies on TF stateful RNG (``K.random_uniform`` in
ku/ebm/rbm.py:46,52 and tfp sampling). The TPU-native design threads
``jax.random`` keys explicitly; :class:`KeySeq` is a small convenience for
host-side loops, while jitted code receives keys as arguments and splits
them with ``jax.random.split``/``fold_in``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class KeySeq:
    """An infinite sequence of PRNG keys for host-side (non-jitted) loops.

    >>> ks = KeySeq(42)
    >>> k0 = ks()          # fresh key
    >>> k1, k2 = ks(2)     # two fresh keys
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def __call__(self, num: int = 1):
        keys = jax.random.split(self._key, num + 1)
        self._key = keys[0]
        if num == 1:
            return keys[1]
        return list(keys[1:])

    @property
    def key(self):
        return self._key


def fold_step(key, step):
    """Derive a per-step key inside a jitted scan: fold the step counter in."""
    return jax.random.fold_in(key, step)


def uniform_from_bits(bits):
    """Map uint32 random bits to uniform floats in [0, 1).

    Keeps the top 24 bits so the uint32→float32 conversion is exact.
    Used by Pallas kernels (``pltpu.prng_random_bits`` returns uint32) and
    mirrored here so host-side oracles can reproduce kernel sampling exactly.
    """
    bits = bits.astype(jnp.uint32)
    return (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
