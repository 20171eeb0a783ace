"""Position encodings.

Reference: ku/layer_ext/position_encoding.py —
- ``OrdinalPositionEncoding`` (:12-46): adds normalized ordinal positions
  ``(1..N)/num_total_seq`` (:23-24,35).
- ``PeriodicPositionEncoding`` (:49-91): standard interleaved sin/cos with
  base ``base_n`` (:62-68).

Both tables are computed inline — XLA constant-folds them under jit.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class OrdinalPositionEncoding(nn.Module):
    """Add the normalized ordinal position (reference :12-46)."""

    num_total_seq: int

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 3
        pos = jnp.arange(1, self.num_total_seq + 1, dtype=x.dtype) / self.num_total_seq
        return x + pos[None, : x.shape[1], None]


class PeriodicPositionEncoding(nn.Module):
    """Interleaved sin/cos position encoding (reference :49-91)."""

    max_seq: int
    d_f: int
    base_n: float = 10000.0

    @nn.compact
    def __call__(self, x):
        assert x.ndim == 3
        pos = np.arange(self.max_seq)[:, None]
        pos_f = np.arange(self.d_f)[None, :]
        angle = pos / np.power(self.base_n, 2 * (pos_f // 2) / np.float32(self.d_f))
        table = np.zeros((self.max_seq, self.d_f), np.float32)
        table[:, 0::2] = np.sin(angle[:, 0::2])
        table[:, 1::2] = np.cos(angle[:, 1::2])
        return x + jnp.asarray(table, x.dtype)[None, : x.shape[1], :]
