"""Splash-style block-sparse flash attention for TPU.

Static attention patterns are compiled to *block maps* on the host: for
every query block the list of key blocks it must visit (and for the
backward's dk/dv pass, the transpose). The Pallas kernels stream only the
live blocks — dead blocks cost NO compute and NO HBM traffic (the grid
never visits them; map padding repeats the previous index so the pipeline
elides the DMA). Work scales with the number of live blocks instead of
O(N²): a 64k causal+window pattern runs at the banded-window cost while
also supporting attention-sink ("global prefix") keys and arbitrary
extra/full block patterns (BigBird-style) that a fixed band cannot
express.

This generalizes the dense streaming kernels in
:mod:`ku.pallas.flash_attention` (same transposed-slab layout, same
online-softmax scheme — see that module for the layout rationale); those
stay the fast path for the patterns their grids already elide
(full/causal/sliding-window). Use this module when the pattern needs
escapes from the band (global-prefix keys, extra blocks) or a custom
block-level pattern.

Capability extension beyond the reference (which materializes full N²
score matrices, ku/layer_ext/attention.py:120-136); no reference
analogue.

Supported element-level semantics, fixed per :class:`BlockMask`::

    keep(q, k) = [k <= q                     if causal] AND
                 [(q - k < window) OR (k < global_prefix)
                  OR block(q, k) in extra_blocks       if window]

with ``block_pattern`` mode replacing the window clause by an arbitrary
(nqb, nkb) block-level liveness matrix (element mask = causal only).

The per-slot block maps ride as scalar-prefetch arguments
(``pltpu.PrefetchScalarGridSpec``) so BlockSpec index maps can chase
them; the flag array distinguishes fully-live slots (no element mask
pass at all) from partial slots (in-kernel iota mask, one ``lax.cond``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ku.pallas.flash_attention import _kv_heads

_NEG_INF = -1e30

# Per-slot element-mask flags (host-computed).
_FULL = 0      # every (q, k) in the block passes — no mask pass
_PARTIAL = 1   # causal AND (window OR global-prefix) element mask
_CAUSAL_ONLY = 2  # window-exempt block (extra/pattern): causal mask only


@dataclasses.dataclass(frozen=True)
class BlockMask:
    """Host-precomputed block-sparsity maps for one static pattern.

    Build with :func:`make_block_mask`. ``kmap``/``kcnt``/``kflag`` drive
    the forward and dq kernels (query-major: live key blocks per query
    block); ``qmap``/``qcnt``/``qflag`` drive the dk/dv kernel
    (key-major transpose). Maps are padded by repeating the last live
    index — consecutive equal indices elide the DMA.
    """

    n: int
    kn: int
    block_q: int
    block_k: int
    causal: bool
    window: int | None
    global_prefix: int
    kmap: np.ndarray
    kcnt: np.ndarray
    kflag: np.ndarray
    qmap: np.ndarray
    qcnt: np.ndarray
    qflag: np.ndarray

    @property
    def meta(self):
        """Hashable static kernel config."""
        return (self.causal, self.window, self.global_prefix)

    def arrays(self):
        return tuple(
            jnp.asarray(a, jnp.int32)
            for a in (self.kmap, self.kcnt, self.kflag,
                      self.qmap, self.qcnt, self.qflag))

    @property
    def sparsity(self) -> float:
        """Fraction of (q block, k block) pairs NOT visited."""
        total = (self.n // self.block_q) * (self.kn // self.block_k)
        return 1.0 - float(self.kcnt.sum()) / total


def _slot_maps(live, flag):
    """Compress a (rows, cols) block-liveness matrix into per-row slot
    lists: (map, cnt, flags), map padded with the last live index (or 0
    for empty rows)."""
    rows, _ = live.shape
    cnt = live.sum(axis=1).astype(np.int32)
    width = max(1, int(cnt.max()) if rows else 1)
    idx = np.zeros((rows, width), np.int32)
    flg = np.zeros((rows, width), np.int32)
    for r in range(rows):
        cols = np.nonzero(live[r])[0]
        if len(cols):
            idx[r, :len(cols)] = cols
            idx[r, len(cols):] = cols[-1]
            flg[r, :len(cols)] = flag[r, cols]
    return idx, cnt, flg


def make_block_mask(n, kn=None, block_q: int = 512, block_k: int = 512,
                    *, causal: bool = False, window: int | None = None,
                    global_prefix: int = 0, extra_blocks=(),
                    block_pattern=None) -> BlockMask:
    """Compile a static attention pattern to block maps (host, numpy).

    ``window`` (requires ``causal``): sliding-window band, from which
    ``global_prefix`` keys (attention sinks — the first ``global_prefix``
    positions stay visible to every later query, StreamingLLM-style) and
    ``extra_blocks`` (iterable of (q_block, k_block) pairs forced live,
    BigBird-style) escape; causality always applies. ``block_pattern``:
    an (nqb, nkb) boolean matrix giving arbitrary block-level liveness
    instead of the window clause (mutually exclusive with
    window/global_prefix/extra_blocks).

    ``n`` / ``kn`` must divide by ``block_q`` / ``block_k`` (pad inputs
    to block multiples first — sparse patterns target long, aligned
    sequences).
    """
    kn = n if kn is None else kn
    if n % block_q or kn % block_k:
        raise ValueError(
            f"n ({n}) / kn ({kn}) must divide by block_q ({block_q}) / "
            f"block_k ({block_k})")
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if block_pattern is not None and (window is not None or global_prefix
                                      or len(tuple(extra_blocks))):
        raise ValueError("block_pattern is mutually exclusive with "
                         "window/global_prefix/extra_blocks")
    if (global_prefix or len(tuple(extra_blocks))) and window is None:
        raise ValueError("global_prefix/extra_blocks are escapes from a "
                         "sliding window — pass window too")
    nqb, nkb = n // block_q, kn // block_k
    q0 = np.arange(nqb)[:, None] * block_q
    q1 = q0 + block_q - 1
    k0 = np.arange(nkb)[None, :] * block_k
    k1 = k0 + block_k - 1

    if causal:
        c_live = k0 <= q1
        c_full = k1 <= q0
    else:
        c_live = np.ones((nqb, nkb), bool)
        c_full = c_live

    if block_pattern is not None:
        pat = np.asarray(block_pattern, bool)
        if pat.shape != (nqb, nkb):
            raise ValueError(f"block_pattern shape {pat.shape} != "
                             f"({nqb}, {nkb})")
        live = c_live & pat
        full = c_full & pat
        flag = np.where(full, _FULL, _CAUSAL_ONLY)
    elif window is not None:
        extra = np.zeros((nqb, nkb), bool)
        for qb, kb in extra_blocks:
            extra[qb, kb] = True
        w_live = k1 >= q0 - (window - 1)
        w_full = k0 >= q1 - (window - 1)
        g_live = k0 < global_prefix
        g_full = k1 < global_prefix
        live = c_live & (w_live | g_live | extra)
        full = c_full & (w_full | g_full | extra)
        flag = np.where(full, _FULL, np.where(extra, _CAUSAL_ONLY,
                                              _PARTIAL))
    else:
        live = c_live
        full = c_full
        flag = np.where(full, _FULL, _PARTIAL if causal else _FULL)

    kmap, kcnt, kflag = _slot_maps(live, flag)
    qmap, qcnt, qflag = _slot_maps(live.T, flag.T)
    return BlockMask(n=n, kn=kn, block_q=block_q, block_k=block_k,
                     causal=causal, window=window,
                     global_prefix=global_prefix, kmap=kmap, kcnt=kcnt,
                     kflag=kflag, qmap=qmap, qcnt=qcnt, qflag=qflag)


def _mask_sparse(s, q_start, k_start, flag, *, causal, window,
                 global_prefix, block_q, block_k):
    """Element mask for one (possibly partial) transposed score slab.
    ``q_start``/``k_start``/``flag`` are traced scalars (from the
    prefetched maps); fully-live slots (flag == 0) skip the whole pass
    via lax.cond."""

    def masked(s):
        k_idx = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 0)
        q_idx = q_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, block_q), 1)
        keep = None
        if causal:
            keep = k_idx <= q_idx
        if window is not None:
            w = (q_idx - k_idx < window) | (k_idx < global_prefix) \
                | (flag == _CAUSAL_ONLY)
            keep = w if keep is None else keep & w
        return s if keep is None else jnp.where(keep, s, _NEG_INF)

    return jax.lax.cond(flag > 0, masked, lambda s: s, s)


def _sparse_fwd_kernel(kmap_ref, kcnt_ref, kflag_ref, q_ref, k_ref, v_ref,
                       o_ref, lse_ref, m_scr, l_scr, acc_scr, *, scale,
                       causal, window, global_prefix):
    """Forward grid step — the transposed-slab online-softmax update of
    flash_attention._fwd_kernel, with the key-block index chased through
    the prefetched map and liveness = slot < count."""
    jb = pl.program_id(2)
    qi = pl.program_id(1)
    num = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(jb < kcnt_ref[qi])
    def _():
        kb = kmap_ref[qi, jb]
        flag = kflag_ref[qi, jb]
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_K, BLOCK_Q)
        s = _mask_sparse(s, qi * block_q, kb * block_k, flag,
                         causal=causal, window=window,
                         global_prefix=global_prefix, block_q=block_q,
                         block_k=block_k)
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = l_prev * corr + jnp.sum(p, axis=0, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            v_blk, p.astype(v_blk.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (DV, BLOCK_Q)

    @pl.when(jb == num - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(l)).T


def _sparse_dq_kernel(kmap_ref, kcnt_ref, kflag_ref, q_ref, k_ref, v_ref,
                      do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *, scale,
                      causal, window, global_prefix):
    jb = pl.program_id(2)
    qi = pl.program_id(1)
    num = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(jb < kcnt_ref[qi])
    def _():
        kb = kmap_ref[qi, jb]
        flag = kflag_ref[qi, jb]
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]      # (1, BLOCK_Q)
        delta = delta_ref[0]  # (1, BLOCK_Q)
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = _mask_sparse(s, qi * block_q, kb * block_k, flag,
                         causal=causal, window=window,
                         global_prefix=global_prefix, block_q=block_q,
                         block_k=block_k)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            v_blk, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        dq_scr[:] = dq_scr[:] + scale * jax.lax.dot_general(
            ds, k_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(jb == num - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _sparse_dkv_kernel(qmap_ref, qcnt_ref, qflag_ref, q_ref, k_ref, v_ref,
                       do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_scr,
                       dv_scr, *, scale, causal, window, global_prefix):
    jb = pl.program_id(2)
    kb = pl.program_id(1)
    num = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(jb < qcnt_ref[kb])
    def _():
        qi = qmap_ref[kb, jb]
        flag = qflag_ref[kb, jb]
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = _mask_sparse(s, qi * block_q, kb * block_k, flag,
                         causal=causal, window=window,
                         global_prefix=global_prefix, block_q=block_q,
                         block_k=block_k)
        p = jnp.exp(s - lse)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, DV)
        dp = jax.lax.dot_general(
            v_blk, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_scr[:] = dk_scr[:] + scale * jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, D)

    @pl.when(jb == num - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _check_shapes(q, k, v, block_q, block_k, nqb, nkb):
    b, h, n, d = q.shape
    kn = k.shape[2]
    if n != nqb * block_q or kn != nkb * block_k:
        raise ValueError(
            f"q/k lengths ({n}, {kn}) do not match the BlockMask "
            f"({nqb}x{block_q}, {nkb}x{block_k})")


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_q", "block_k",
                              "meta", "interpret"))
def _sparse_fwd(q, k, v, kmap, kcnt, kflag, softmax_scale, block_q,
                block_k, meta, interpret):
    causal, window, global_prefix = meta
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)
    nqb = kmap.shape[0]
    nkb = kn // block_k
    _check_shapes(q, k, v, block_q, block_k, nqb, nkb)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * hkv, kn, d)
    vf = v.reshape(b * hkv, kn, dv)

    def kv_page(bh):
        return bh if group == 1 else (bh // h) * hkv + (bh % h) // group

    def kv_idx(bh, qi, j, kmap, kcnt, kflag):
        return (kv_page(bh), kmap[qi, j], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, nqb, kmap.shape[1]),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi, j, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), kv_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv),
                         lambda bh, qi, j, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, qi, j, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((dv, block_q), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(_sparse_fwd_kernel, scale=softmax_scale,
                          causal=causal, window=window,
                          global_prefix=global_prefix),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, dv), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(kmap, kcnt, kflag, qf, kf, vf)
    return (out.reshape(b, h, n, dv), lse[..., 0].reshape(b, h, n))


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_q", "block_k",
                              "meta", "interpret"))
def _sparse_bwd(q, k, v, o, lse, do, kmap, kcnt, kflag, qmap, qcnt, qflag,
                softmax_scale, block_q, block_k, meta, interpret):
    causal, window, global_prefix = meta
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv_dim = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)
    nqb = kmap.shape[0]
    nkb = qmap.shape[0]
    _check_shapes(q, k, v, block_q, block_k, nqb, nkb)
    interpret_mode = pltpu.InterpretParams() if interpret else False

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * hkv, kn, d)
    vf = v.reshape(b * hkv, kn, dv_dim)
    dof = do.reshape(b * h, n, dv_dim)
    lsef = lse.reshape(b * h, 1, n)
    deltaf = delta.reshape(b * h, 1, n)

    def kv_page(bh):
        return bh if group == 1 else (bh // h) * hkv + (bh % h) // group

    def kv_idx(bh, qi, j, kmap, kcnt, kflag):
        return (kv_page(bh), kmap[qi, j], 0)

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, nqb, kmap.shape[1]),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, qi, j, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim),
                         lambda bh, qi, j, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, j, *_: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, j, *_: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, j, *_: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )
    dq = pl.pallas_call(
        functools.partial(_sparse_dq_kernel, scale=softmax_scale,
                          causal=causal, window=window,
                          global_prefix=global_prefix),
        grid_spec=dq_grid,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(kmap, kcnt, kflag, qf, kf, vf, dof, lsef, deltaf)

    def q_idx(bh, kb, j, qmap, qcnt, qflag):
        return (bh, qmap[kb, j], 0)

    def q_row(bh, kb, j, qmap, qcnt, qflag):
        return (bh, 0, qmap[kb, j])

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * h, nkb, qmap.shape[1]),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, kb, j, *_: (kv_page(bh), kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim),
                         lambda bh, kb, j, *_: (kv_page(bh), kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim), q_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d),
                         lambda bh, kb, j, *_: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim),
                         lambda bh, kb, j, *_: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv_dim), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        functools.partial(_sparse_dkv_kernel, scale=softmax_scale,
                          causal=causal, window=window,
                          global_prefix=global_prefix),
        grid_spec=dkv_grid,
        out_shape=(
            jax.ShapeDtypeStruct((b * h, kn, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, kn, dv_dim), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(qmap, qcnt, qflag, qf, kf, vf, dof, lsef, deltaf)

    dq = dq.reshape(b, h, n, d)
    if group == 1:
        return (dq, dk.reshape(b, h, kn, d), dv.reshape(b, h, kn, dv_dim))
    # GQA: per-query-head dk/dv partials summed in f32 (see
    # flash_attention._bwd_pallas).
    def gsum(x, dim):
        return x.astype(jnp.float32).reshape(
            b, hkv, group, kn, dim).sum(2).astype(x.dtype)

    return dq, gsum(dk, d), gsum(dv, dv_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _sparse_dispatch(q, k, v, kmap, kcnt, kflag, qmap, qcnt, qflag,
                     softmax_scale, block_q, block_k, meta, interpret):
    o, _ = _sparse_fwd(q, k, v, kmap, kcnt, kflag, softmax_scale, block_q,
                       block_k, meta, interpret)
    return o


def _sparse_dispatch_fwd(q, k, v, kmap, kcnt, kflag, qmap, qcnt, qflag,
                         softmax_scale, block_q, block_k, meta, interpret):
    o, lse = _sparse_fwd(q, k, v, kmap, kcnt, kflag, softmax_scale,
                         block_q, block_k, meta, interpret)
    return o, (q, k, v, o, lse, kmap, kcnt, kflag, qmap, qcnt, qflag)


def _sparse_dispatch_bwd(softmax_scale, block_q, block_k, meta, interpret,
                         res, g):
    q, k, v, o, lse, kmap, kcnt, kflag, qmap, qcnt, qflag = res
    dq, dk, dv = _sparse_bwd(q, k, v, o, lse, g, kmap, kcnt, kflag, qmap,
                             qcnt, qflag, softmax_scale, block_q, block_k,
                             meta, interpret)
    return (dq, dk, dv) + (None,) * 6


_sparse_dispatch.defvjp(_sparse_dispatch_fwd, _sparse_dispatch_bwd)


def sparse_attention(q, k, v, mask: BlockMask, softmax_scale: float = 1.0,
                     interpret: bool | None = None):
    """Block-sparse flash attention over a static :class:`BlockMask`
    pattern. q: (B, H, N, D); k/v: (B, H_kv, KN, D) (GQA streams the
    shared KV page). Differentiable (saved-LSE Pallas backward). Work and
    HBM traffic scale with the live blocks only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if q.shape[2] != mask.n or k.shape[2] != mask.kn:
        raise ValueError(
            f"q/k lengths ({q.shape[2]}, {k.shape[2]}) != BlockMask "
            f"({mask.n}, {mask.kn})")
    return _sparse_dispatch(q, k, v, *mask.arrays(), softmax_scale,
                            mask.block_q, mask.block_k, mask.meta,
                            bool(interpret))
