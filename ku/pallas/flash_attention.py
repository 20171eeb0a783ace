"""Flash attention for the ``scaled`` similarity path.

Interface: ``flash_attention(q, k, v, softmax_scale)`` with
(B, H, N, D)-shaped inputs. The initial implementation below is a
blockwise-XLA version (O(N) memory via lax.scan over key blocks); the
Pallas TPU kernel drops in behind the same signature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("softmax_scale", "block_size"))
def flash_attention(q, k, v, softmax_scale: float = 1.0, block_size: int = 512):
    """Numerically-stable blockwise attention (online softmax).

    q, k, v: (B, H, N, D). Returns (B, H, N, D). Memory O(N·block) instead
    of O(N²): the N² score matrix never materializes in HBM.
    """
    b, h, n, d = q.shape
    kn = k.shape[2]
    block = min(block_size, kn)
    num_blocks = -(-kn // block)
    pad = num_blocks * block - kn
    if pad:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kb = k.reshape(b, h, num_blocks, block, d)
    vb = v.reshape(b, h, num_blocks, block, v.shape[-1])
    valid = (jnp.arange(num_blocks * block) < kn).reshape(num_blocks, block)

    def body(carry, blk):
        m, l, acc = carry
        k_i, v_i, valid_i = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_i) * softmax_scale
        s = jnp.where(valid_i[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1)
        acc_new = acc * correction[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, v_i)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, n), -jnp.inf, q.dtype),
        jnp.zeros((b, h, n), q.dtype),
        jnp.zeros((b, h, n, v.shape[-1]), q.dtype),
    )
    (m, l, acc), _ = jax.lax.scan(
        body,
        init,
        (
            jnp.moveaxis(kb, 2, 0),
            jnp.moveaxis(vb, 2, 0),
            valid,
        ),
    )
    return acc / l[..., None]
