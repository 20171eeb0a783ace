"""Splash-style block-sparse flash attention for TPU.

Static attention patterns are compiled to *flat block maps* on the host:
one entry per live (query block, key block) pair, grouped into runs (by
query block for the forward/dq kernels, by key block for dk/dv). The
Pallas grid is exactly the live entries — GRID COMPACTION: dead blocks
are not masked, not skipped, they are never grid steps at all (no
compute, no DMA, no sequencer time), and ragged patterns (e.g. an
attention-sink column that every query block visits) waste nothing.
Work scales with the number of live blocks instead of O(N²).

This generalizes the dense streaming kernels in
:mod:`ku.pallas.flash_attention` (same transposed-slab layout, same
online-softmax scheme — see that module for the layout rationale); those
stay the fast path for plain full/causal attention. Use this module when
the pattern needs escapes from a band (global-prefix keys, extra
blocks) or a custom block-level pattern.

Capability extension beyond the reference (which materializes full N²
score matrices, ku/layer_ext/attention.py:120-136); no reference
analogue.

Supported element-level semantics, fixed per :class:`BlockMask`::

    keep(q, k) = [k <= q                     if causal] AND
                 [(q - k < window) OR (k < global_prefix)
                  OR block(q, k) in extra_blocks       if window]

with ``block_pattern`` mode replacing the window clause by an arbitrary
(nqb, nkb) block-level liveness matrix (element mask = causal only).

The flat maps ride as a scalar-prefetch argument
(``pltpu.PrefetchScalarGridSpec``) so BlockSpec index maps chase them;
each entry's flag distinguishes fully-live blocks (no element-mask pass
at all) from partial ones (in-kernel iota mask behind one ``lax.cond``).
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

# Per-entry element-mask flags (host-computed).
_FULL = 0      # every (q, k) in the block passes — no mask pass
_PARTIAL = 1   # causal AND (window OR global-prefix) element mask
_CAUSAL_ONLY = 2  # window-exempt block (extra/pattern): causal mask only

# Flat-map entry columns: [q_block, k_block, flag, first_of_run,
# last_of_run].
_QI, _KB, _FLAG, _FIRST, _LAST = range(5)


@dataclasses.dataclass(frozen=True)
class BlockMask:
    """Host-precomputed flat block maps for one static pattern.

    Build with :func:`make_block_mask`. ``fmap`` drives the forward and
    dq kernels (entries grouped by query block), ``tmap`` the dk/dv
    kernel (grouped by key block); both are (E, 5) int32
    [qi, kb, flag, first, last] where first/last bound each run.
    ``kcnt``/``qcnt`` are per-block live counts (stats + zero-fill of
    never-attended key blocks in the backward).
    """

    n: int
    kn: int
    block_q: int
    block_k: int
    causal: bool
    window: int | None
    global_prefix: int
    fmap: np.ndarray
    tmap: np.ndarray
    kcnt: np.ndarray
    qcnt: np.ndarray

    @property
    def meta(self):
        """Hashable static kernel config."""
        return (self.causal, self.window, self.global_prefix)

    def arrays(self):
        return (jnp.asarray(self.fmap, jnp.int32),
                jnp.asarray(self.tmap, jnp.int32))

    @property
    def sparsity(self) -> float:
        """Fraction of (q block, k block) pairs NOT visited."""
        total = (self.n // self.block_q) * (self.kn // self.block_k)
        return 1.0 - self.fmap.shape[0] / total


def _flat_runs(live, flag, by_col=False):
    """Flatten a (nqb, nkb) block-liveness matrix into flat run entries
    (E, 5) int32 [qi, kb, flag, first, last], grouped by row (q-major,
    ``by_col=False``) or by column (k-major)."""
    entries = []
    outer = live.T if by_col else live
    for r in range(outer.shape[0]):
        cols = np.nonzero(outer[r])[0]
        for i, c in enumerate(cols):
            qi, kb = (c, r) if by_col else (r, c)
            entries.append((qi, kb, flag[qi, kb], int(i == 0),
                            int(i == len(cols) - 1)))
    if not entries:
        raise ValueError("empty block pattern: no live blocks")
    return np.asarray(entries, np.int32)


def make_block_mask(n, kn=None, block_q: int = 512, block_k: int = 512,
                    *, causal: bool = False, window: int | None = None,
                    global_prefix: int = 0, extra_blocks=(),
                    block_pattern=None) -> BlockMask:
    """Compile a static attention pattern to flat block maps (host).

    ``window`` (requires ``causal``): sliding-window band, from which
    ``global_prefix`` keys (attention sinks — the first ``global_prefix``
    positions stay visible to every later query, StreamingLLM-style) and
    ``extra_blocks`` (iterable of (q_block, k_block) pairs forced live,
    BigBird-style) escape; causality always applies. ``block_pattern``:
    an (nqb, nkb) boolean matrix giving arbitrary block-level liveness
    instead of the window clause (mutually exclusive with
    window/global_prefix/extra_blocks). Every query block must keep at
    least one live key block (softmax over an empty row is undefined) —
    custom patterns violating this are rejected; keep the diagonal live.

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

    kcnt = live.sum(axis=1).astype(np.int32)
    if (kcnt == 0).any():
        raise ValueError(
            f"query blocks {np.nonzero(kcnt == 0)[0].tolist()} attend no "
            f"key block — every query needs at least one live key")
    return BlockMask(n=n, kn=kn, block_q=block_q, block_k=block_k,
                     causal=causal, window=window,
                     global_prefix=global_prefix,
                     fmap=_flat_runs(live, flag),
                     tmap=_flat_runs(live, flag, by_col=True),
                     kcnt=kcnt, qcnt=live.sum(axis=0).astype(np.int32))


def _mask_sparse(s, q_start, k_start, flag, *, causal, window,
                 global_prefix, block_q, block_k):
    """Element mask for one (possibly partial) transposed score slab.
    ``q_start``/``k_start``/``flag`` are traced scalars (from the
    prefetched map); fully-live entries (flag == 0) skip the whole pass
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


def _sparse_fwd_kernel(m_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr,
                       l_scr, acc_scr, *, scale, causal, window,
                       global_prefix):
    """Forward grid step over the FLAT map — the transposed-slab
    online-softmax update of flash_attention._fwd_kernel, with scratch
    reset/flush at run boundaries instead of grid-dimension edges. Every
    step is a live block; there is no liveness branch."""
    j = pl.program_id(1)
    qi, kb, flag = m_ref[j, _QI], m_ref[j, _KB], m_ref[j, _FLAG]
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(m_ref[j, _FIRST] == 1)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

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

    @pl.when(m_ref[j, _LAST] == 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(l)).T


def _sparse_dq_kernel(m_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                      delta_ref, dq_ref, dq_scr, *, scale, causal, window,
                      global_prefix):
    j = pl.program_id(1)
    qi, kb, flag = m_ref[j, _QI], m_ref[j, _KB], m_ref[j, _FLAG]
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(m_ref[j, _FIRST] == 1)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

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

    @pl.when(m_ref[j, _LAST] == 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _sparse_dkv_kernel(m_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                       delta_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                       scale, causal, window, global_prefix):
    j = pl.program_id(1)
    qi, kb, flag = m_ref[j, _QI], m_ref[j, _KB], m_ref[j, _FLAG]
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(m_ref[j, _FIRST] == 1)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

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

    @pl.when(m_ref[j, _LAST] == 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _check_shapes(q, k, n, kn):
    if q.shape[2] != n or k.shape[2] != kn:
        raise ValueError(
            f"q/k lengths ({q.shape[2]}, {k.shape[2]}) do not match the "
            f"BlockMask ({n}, {kn})")


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_q", "block_k",
                              "meta", "interpret"))
def _sparse_fwd(q, k, v, fmap, softmax_scale, block_q, block_k, meta,
                interpret):
    causal, window, global_prefix = meta
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * hkv, kn, d)
    vf = v.reshape(b * hkv, kn, dv)

    def kv_page(bh):
        return bh if group == 1 else (bh // h) * hkv + (bh % h) // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, fmap.shape[0]),
        in_specs=[
            pl.BlockSpec((1, block_q, d),
                         lambda bh, j, m: (bh, m[j, _QI], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, j, m: (kv_page(bh), m[j, _KB], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv),
                         lambda bh, j, m: (kv_page(bh), m[j, _KB], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv),
                         lambda bh, j, m: (bh, m[j, _QI], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1),
                         lambda bh, j, m: (bh, m[j, _QI], 0),
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(fmap, qf, kf, vf)
    return (out.reshape(b, h, n, dv), lse[..., 0].reshape(b, h, n))


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_q", "block_k",
                              "meta", "interpret", "zero_fill"))
def _sparse_bwd(q, k, v, o, lse, do, fmap, tmap, softmax_scale, block_q,
                block_k, meta, interpret, zero_fill=()):
    causal, window, global_prefix = meta
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv_dim = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)
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

    def q_blk(bh, j, m):
        return (bh, m[j, _QI], 0)

    def q_row(bh, j, m):
        return (bh, 0, m[j, _QI])

    def kv_blk(bh, j, m):
        return (kv_page(bh), m[j, _KB], 0)

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, fmap.shape[0]),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), kv_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim), q_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), q_blk,
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(fmap, qf, kf, vf, dof, lsef, deltaf)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, tmap.shape[0]),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), kv_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim), q_blk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), q_row,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d),
                         lambda bh, j, m: (bh, m[j, _KB], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim),
                         lambda bh, j, m: (bh, m[j, _KB], 0),
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
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(tmap, qf, kf, vf, dof, lsef, deltaf)

    if zero_fill:
        # Key blocks no query attends are never grid steps, so their
        # dk/dv output blocks are UNWRITTEN (garbage) — zero them with
        # one elementwise pass. ``zero_fill`` is the static tuple of
        # dead key-block indices (host-computed; empty for the usual
        # patterns where every key is attended).
        att = np.ones(kn // block_k, bool)
        att[list(zero_fill)] = False
        # where, not multiply: the unwritten blocks can hold NaN bit
        # patterns and NaN * 0 = NaN.
        att = jnp.asarray(np.repeat(att, block_k))[None, :, None]
        dk = jnp.where(att, dk, 0)
        dv = jnp.where(att, dv, 0)

    dq = dq.reshape(b, h, n, d)
    if group == 1:
        return (dq, dk.reshape(b, h, kn, d), dv.reshape(b, h, kn, dv_dim))
    # GQA: per-query-head dk/dv partials summed in f32 (see
    # flash_attention._bwd_pallas).
    def gsum(x, dim):
        return x.astype(jnp.float32).reshape(
            b, hkv, group, kn, dim).sum(2).astype(x.dtype)

    return dq, gsum(dk, d), gsum(dv, dv_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _sparse_dispatch(q, k, v, fmap, tmap, softmax_scale, block_q, block_k,
                     meta, interpret, zero_fill):
    o, _ = _sparse_fwd(q, k, v, fmap, softmax_scale, block_q, block_k,
                       meta, interpret)
    return o


def _sparse_dispatch_fwd(q, k, v, fmap, tmap, softmax_scale, block_q,
                         block_k, meta, interpret, zero_fill):
    o, lse = _sparse_fwd(q, k, v, fmap, softmax_scale, block_q, block_k,
                         meta, interpret)
    return o, (q, k, v, o, lse, fmap, tmap)


def _sparse_dispatch_bwd(softmax_scale, block_q, block_k, meta, interpret,
                         zero_fill, res, g):
    q, k, v, o, lse, fmap, tmap = res
    dq, dk, dv = _sparse_bwd(q, k, v, o, lse, g, fmap, tmap,
                             softmax_scale, block_q, block_k, meta,
                             interpret, zero_fill)
    return dq, dk, dv, None, None


_sparse_dispatch.defvjp(_sparse_dispatch_fwd, _sparse_dispatch_bwd)


def sparse_attention(q, k, v, mask: BlockMask, softmax_scale: float = 1.0,
                     interpret: bool | None = None):
    """Block-sparse flash attention over a static :class:`BlockMask`
    pattern. q: (B, H, N, D); k/v: (B, H_kv, KN, D) (GQA streams the
    shared KV page). Differentiable (saved-LSE Pallas backward). Work,
    HBM traffic, and grid steps all scale with the live blocks only.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _check_shapes(q, k, mask.n, mask.kn)
    zero_fill = tuple(int(i) for i in np.nonzero(mask.qcnt == 0)[0])
    fmap, tmap = mask.arrays()
    return _sparse_dispatch(q, k, v, fmap, tmap, softmax_scale,
                            mask.block_q, mask.block_k, mask.meta,
                            bool(interpret), zero_fill)
