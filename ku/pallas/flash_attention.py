"""Flash attention — Pallas TPU kernel with an XLA blockwise fallback.

Serves the ``scaled`` similarity path of :class:`ku.nn.MultiHeadAttention`
(reference attention is full-N² softmax(QKᵀ/√d)V on one device,
ku/layer_ext/attention.py:120-136; SURVEY §5 long-context: "implement it
as a Pallas flash-attention kernel").

Kernel design: grid = (B·H, N/BLOCK_Q). Each program owns one query block
in VMEM and streams key/value blocks with an online-softmax running
(max, sum, accumulator) carry — the N×N score matrix never exists. All
matmuls hit the MXU with f32 accumulation. Ring attention over a sharded
sequence axis lives in :func:`ring_attention` (shard_map + ppermute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len,
                  causal):
    """One (batch·head, q-block) program: online softmax over k blocks."""
    q = q_ref[0].astype(jnp.float32)  # (BLOCK_Q, D)
    block_q, d = q.shape
    num_kb = pl.cdiv(kv_len, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        start = kb * block_k
        k_blk = k_ref[0, pl.ds(start, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(start, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_Q, BLOCK_K)

        # Mask key positions beyond the true sequence length.
        key_idx = start + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        s = jnp.where(key_idx < kv_len, s, _NEG_INF)
        if causal:
            q_idx = pl.program_id(1) * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            s = jnp.where(key_idx <= q_idx, s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * corr + jnp.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "block_q", "block_k", "interpret",
                     "causal"),
)
def flash_attention_pallas(q, k, v, softmax_scale: float = 1.0,
                           block_q: int = 128, block_k: int = 128,
                           interpret: bool | None = None,
                           causal: bool = False):
    """Pallas flash attention. q: (B, H, N, D), k/v: (B, H, KN, D)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, n, d = q.shape
    kn = k.shape[2]

    block_q = min(block_q, max(8, n))
    block_k = min(block_k, max(8, kn))
    nq_pad = pl.cdiv(n, block_q) * block_q
    nk_pad = pl.cdiv(kn, block_k) * block_k

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, kn, d)
    vf = v.reshape(b * h, kn, v.shape[-1])
    if nq_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - n), (0, 0)))
    if nk_pad != kn:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - kn), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - kn), (0, 0)))

    grid = (b * h, nq_pad // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=softmax_scale, block_k=block_k, kv_len=kn,
            causal=causal,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, d), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_pad, vf.shape[-1]), lambda bh, qi: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, vf.shape[-1]),
                               lambda bh, qi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, vf.shape[-1]), q.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(qf, kf, vf)
    return out[:, :n, :].reshape(b, h, n, vf.shape[-1])


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_size", "causal")
)
def flash_attention_xla(q, k, v, softmax_scale: float = 1.0,
                        block_size: int = 512, causal: bool = False):
    """Blockwise online-softmax attention in pure XLA (lax.scan) — the
    portable fallback with the same O(N·block) memory profile."""
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
    key_pos = jnp.arange(num_blocks * block).reshape(num_blocks, block)
    q_pos = jnp.arange(n)

    def body(carry, blk):
        m, l, acc = carry
        k_i, v_i, valid_i, key_pos_i = blk
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_i) * softmax_scale
        s = jnp.where(valid_i[None, None, None, :], s, -jnp.inf)
        if causal:
            s = jnp.where(
                key_pos_i[None, None, None, :] <= q_pos[None, None, :, None],
                s, -jnp.inf,
            )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, v_i)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, n), -jnp.inf, q.dtype),
        jnp.zeros((b, h, n), q.dtype),
        jnp.zeros((b, h, n, v.shape[-1]), q.dtype),
    )
    (m, l, acc), _ = jax.lax.scan(
        body, init,
        (jnp.moveaxis(kb, 2, 0), jnp.moveaxis(vb, 2, 0), valid, key_pos),
    )
    return acc / jnp.maximum(l, 1e-30)[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_dispatch(q, k, v, softmax_scale, causal):
    # VMEM guard: the Pallas kernel keeps the full K/V for one (b, h) in
    # VMEM; beyond ~10 MB fall back to the XLA blockwise path.
    kv_bytes = 2 * k.shape[2] * k.shape[3] * 4
    if jax.default_backend() == "tpu" and kv_bytes <= 10 * 1024 * 1024:
        return flash_attention_pallas(q, k, v, softmax_scale=softmax_scale,
                                      causal=causal)
    return flash_attention_xla(q, k, v, softmax_scale=softmax_scale,
                               causal=causal)


def _flash_fwd(q, k, v, softmax_scale, causal):
    return _flash_dispatch(q, k, v, softmax_scale, causal), (q, k, v)


def _flash_bwd(softmax_scale, causal, residuals, g):
    # Backward via the blockwise-XLA formulation (recompute; still O(N)
    # memory) — the classic flash-attention recipe of trading FLOPs for
    # the N² matrix.
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda qq, kk, vv: flash_attention_xla(
            qq, kk, vv, softmax_scale=softmax_scale, causal=causal
        ),
        q, k, v,
    )
    return vjp(g)


_flash_dispatch.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, softmax_scale: float = 1.0,
                    causal: bool = False):
    """Dispatch: Pallas kernel on TPU, XLA blockwise elsewhere.
    Differentiable (custom VJP recomputes blockwise in the backward).
    For explicit block-size control call :func:`flash_attention_pallas`
    or :func:`flash_attention_xla` directly."""
    return _flash_dispatch(q, k, v, softmax_scale, causal)


def ring_attention(q, k, v, mesh, axis_name: str = "data",
                   softmax_scale: float = 1.0):
    """Sequence-parallel attention: q/k/v sharded on the sequence axis over
    ``axis_name``; K/V blocks rotate around the ring with ``ppermute``
    while each device keeps an online-softmax carry (SURVEY §5 long-context
    entry — the reference has no equivalent).

    q, k, v: (B, H, N, D) GLOBAL arrays (host side); returns the global
    attention output. N must divide by the ring size.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.shape[axis_name]
    b, h, n, d = q.shape
    assert n % n_dev == 0

    def local_fn(q_loc, k_loc, v_loc):
        axis_idx = jax.lax.axis_index(axis_name)

        def step(carry, i):
            m, l, acc, k_blk, v_blk = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", q_loc, k_blk) * softmax_scale
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            p = jnp.exp(s - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1)
            acc_new = acc * corr[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_blk
            )
            # Rotate K/V to the next device in the ring.
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            k_next = jax.lax.ppermute(k_blk, axis_name, perm)
            v_next = jax.lax.ppermute(v_blk, axis_name, perm)
            return (m_new, l_new, acc_new, k_next, v_next), None

        # pvary: the fresh accumulators must be marked device-varying to
        # match the loop outputs under shard_map's manual-axes typing.
        init = jax.lax.pvary(
            (
                jnp.full(q_loc.shape[:3], -jnp.inf, q_loc.dtype),
                jnp.zeros(q_loc.shape[:3], q_loc.dtype),
                jnp.zeros(q_loc.shape[:3] + (v_loc.shape[-1],), q_loc.dtype),
            ),
            axis_name,
        ) + (k_loc, v_loc)
        (m, l, acc, _, _), _ = jax.lax.scan(step, init, jnp.arange(n_dev))
        return acc / l[..., None]

    seq_sharded = NamedSharding(mesh, P(None, None, axis_name, None))
    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis_name, None),) * 3,
        out_specs=P(None, None, axis_name, None),
    )
    q_s = jax.device_put(q, seq_sharded)
    k_s = jax.device_put(k, seq_sharded)
    v_s = jax.device_put(v, seq_sharded)
    return shard(q_s, k_s, v_s)
