"""Flash attention — streaming Pallas TPU kernels with an XLA fallback.

Serves the ``scaled`` similarity path of :class:`ku.nn.MultiHeadAttention`
(reference attention is full-N² softmax(QKᵀ/√d)V on one device,
ku/layer_ext/attention.py:120-136; SURVEY §5 long-context: "implement it
as a Pallas flash-attention kernel").

Kernel design (forward): grid = (B·H, N/BLOCK_Q, KN/BLOCK_K) with the
key axis innermost — K/V blocks are STREAMED HBM→VMEM by the Pallas
pipeline (double-buffered), so sequence length is bounded by HBM, not
VMEM. The online-softmax running (max, sum, accumulator) lives in VMEM
scratch that persists across the key-block grid steps; the N×N score
matrix never exists. The forward also emits the log-sum-exp (LSE) per
query row, which the backward consumes.

All score slabs (forward AND backward) are TRANSPOSED — (BLOCK_K,
BLOCK_Q), queries on the 128-lane minor axis — so softmax max/sum are
sublane reductions and per-query stats (m/l/lse/delta) are (1, BLOCK_Q)
lane vectors broadcast across sublanes; cross-lane reduction trees over
a 512-wide minor axis cost ~45% of the row-major kernel's time
(benchmarks/flash_tune_probe.py, amortized: D=128 fwd 10.1→8.4 ms).

Backward: the classic flash-attention two-kernel scheme —
- ``dq`` kernel: grid (B·H, N/BLOCK_Q, KN/BLOCK_K), streams K/V, recomputes
  p = exp(s − lse) (no online max needed — LSE is known), accumulates
  dq += (p ⊙ (do·Vᵀ − Δ))·K·scale with Δ = rowsum(do ⊙ o).
- ``dkv`` kernel: grid (B·H, KN/BLOCK_K, N/BLOCK_Q), streams Q/dO,
  accumulates dv += pᵀ·do and dk += (p ⊙ (do·Vᵀ − Δ))ᵀ·Q·scale.
All matmuls hit the MXU with f32 accumulation.

Ring attention over a sharded sequence axis lives in
:func:`ring_attention` (shard_map + ppermute): causal-capable, blockwise
local updates (no full local score matrix), differentiable.

Sliding-window (Mistral-style local) attention: ``window=w`` restricts
each query to its ``w`` most recent positions (requires ``causal``).
Supported uniformly by the Pallas kernels (fwd + both backward kernels,
band mask + block liveness so out-of-band blocks skip all compute), the
XLA fallback, the differentiable dispatch, and the ring (band over
GLOBAL positions — out-of-band hops no-op in-kernel).

Packed sequences: ``segment_ids`` masks scores across segment
boundaries (block-diagonal attention), composing with causal/window/GQA.
Segment blocks ride as (1, BLOCK_Q) lane / (BLOCK_K, 1) sublane vectors
matching the transposed slab — no in-kernel relayout; boundaries are
data, so no block-level elision. Kernels + fallback + dispatch + ring
(the key-id slice rotates with its K/V block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Forward kernel: streaming K/V, persistent online-softmax scratch.
# ---------------------------------------------------------------------------


def _mask_scores(s, q_start, start, *, kv_len, causal, pad_mask, block_q,
                 block_k, q_off=0, k_off=0, transposed=False, window=None,
                 seg_q=None, seg_k=None):
    """Apply key-padding, causal, and sliding-window masks to a score
    block, eliding the work where statically or dynamically unnecessary
    (interior blocks pay no iota/select passes — at large N the masks
    otherwise cost more VPU time than the matmuls). ``q_off``/``k_off``:
    GLOBAL position offsets (traced int32 scalars in the ring-attention
    per-hop path, static 0 otherwise) added to the local block positions
    for the causal/window masks. ``transposed``: the slab is
    (block_k, block_q) — keys on axis 0, queries on axis 1 (the kernels'
    layout). ``window``: attend only to the ``window`` most recent
    positions (Mistral-style sliding window; requires ``causal``)."""
    shape = (block_k, block_q) if transposed else (block_q, block_k)
    k_axis, q_axis = (0, 1) if transposed else (1, 0)

    def key_idx():
        # Inside the cond branches so interior blocks pay no iota passes.
        return start + jax.lax.broadcasted_iota(jnp.int32, shape, k_axis)

    def query_idx():
        return q_start + jax.lax.broadcasted_iota(jnp.int32, shape, q_axis)

    if seg_q is not None:
        # Packed sequences: scores across segment boundaries are masked.
        # seg_q: (1, BLOCK_Q), seg_k: (BLOCK_K, 1) — broadcast to the
        # transposed slab. Block-level elision is impossible (boundaries
        # are data), so this mask is unconditional.
        assert transposed
        s = jnp.where(seg_k == seg_q, s, _NEG_INF)
    if pad_mask:
        # Only the last key block can contain padded keys (padding is in
        # LOCAL coordinates — independent of the global offsets).
        s = jax.lax.cond(
            start + block_k > kv_len,
            lambda s: jnp.where(key_idx() < kv_len, s, _NEG_INF),
            lambda s: s,
            s,
        )
    if causal:

        def tri(s):
            return jnp.where(k_off + key_idx() <= q_off + query_idx(), s,
                             _NEG_INF)

        # Triangle mask only on diagonal-crossing blocks.
        s = jax.lax.cond(
            k_off + start + block_k - 1 > q_off + q_start, tri,
            lambda s: s, s,
        )
    if window is not None:

        def band(s):
            return jnp.where(
                q_off + query_idx() - (k_off + key_idx()) < window, s,
                _NEG_INF)

        # Band mask only on blocks crossing the lower window edge (the
        # block's max q−k distance reaches the window).
        s = jax.lax.cond(
            q_off + q_start + block_q - 1 - (k_off + start) >= window,
            band, lambda s: s, s,
        )
    return s


def _live_fwd(q_start, start, block_q, block_k, causal, window, q_off,
              k_off):
    """Whether a (q block, k block) pair contributes any unmasked score:
    not entirely above the causal diagonal, and (with a sliding window)
    not entirely below the band."""
    live = True
    if causal:
        live = k_off + start <= q_off + q_start + block_q - 1
    if window is not None:
        live = jnp.logical_and(
            live,
            k_off + start + block_k - 1 >= q_off + q_start - (window - 1))
    return live


def _first_k_block(q_start, window, block_k):
    """First key block that can be inside the sliding-window band for the
    query block starting at ``q_start`` (static-offset banded grids)."""
    return jnp.maximum(0, (q_start - (window - 1)) // block_k)


def _fwd_kernel(*refs, scale, kv_len, causal, pad_mask, offsets,
                window=None, banded=False, segments=False,
                softcap=None, per_seq_off=False):
    """Forward grid step, TRANSPOSED score layout: the slab lives as
    (BLOCK_K, BLOCK_Q) so the softmax max/sum are SUBLANE reductions and
    the per-query running stats are (1, BLOCK_Q) lane vectors whose
    broadcasts replicate across sublanes — both far cheaper on the VPU
    than the cross-lane reduction trees the (BLOCK_Q, BLOCK_K) layout
    needs over a 512-wide minor axis. The accumulator stays transposed
    (DV, BLOCK_Q) (PV is computed as VᵀP) and is untransposed once per
    query block at the last grid step. Measured -14..-18% vs the
    row-major layout at D=64/128 (benchmarks/flash_tune_probe.py)."""
    refs = list(refs)
    if offsets:
        # Per-sequence offsets ride as ONE full-array (b*h, 1) SMEM
        # block (Mosaic rejects (1, 1) blocks over a larger array) and
        # are indexed dynamically by the flattened (batch, head) grid
        # row; scalar offsets are a (1, 1) array read at [0, 0].
        i = pl.program_id(0) if per_seq_off else 0
        q_off, k_off = refs.pop(0)[i, 0], refs.pop(0)[i, 0]
    else:
        q_off = k_off = 0
    seg_q_ref = refs.pop(0) if segments else None
    seg_k_ref = refs.pop(0) if segments else None
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    jb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = pl.program_id(1) * block_q
    # Banded grid (static-offset sliding window): grid step j maps to
    # LOGICAL key block first(qi) + j — only the O(window/block_k) blocks
    # that can intersect the band are visited at all.
    kb = jb + _first_k_block(q_start, window, block_k) if banded else jb
    start = kb * block_k
    # Causal/window: key blocks entirely outside the attended band
    # contribute nothing (with traced global offsets the check is
    # dynamic, a lax.cond).
    live = _live_fwd(q_start, start, block_q, block_k, causal, window,
                     q_off, k_off)
    if banded:
        # Logical blocks past the causal edge can also run past the key
        # axis entirely (their fetch index is clamped — data is garbage).
        live = jnp.logical_and(live, start < kv_len)

    @pl.when(live if (causal or window) else jb >= 0)
    def _():
        # Matmuls run on the operands' NATIVE dtype with f32 accumulation —
        # bf16 inputs hit the MXU at full rate instead of the 4x-slower
        # f32x f32 path (p is computed in f32 and cast back for the PV
        # matmul, the standard flash-attention mixed-precision scheme).
        # (Measured negative: folding scale·log2e into q + exp2 softmax,
        # q-prescale alone, and unrolled K sub-blocks — see
        # benchmarks/flash_tune_probe.py.)
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_K, BLOCK_Q) f32
        if softcap is not None:
            # Gemma-style logit soft-capping: bounded scores BEFORE
            # masking (masks write past the cap on purpose).
            s = softcap * jnp.tanh(s / softcap)

        s = _mask_scores(s, q_start, start, kv_len=kv_len, causal=causal,
                         pad_mask=pad_mask, block_q=block_q,
                         block_k=block_k, q_off=q_off, k_off=k_off,
                         transposed=True, window=window,
                         seg_q=seg_q_ref[0] if segments else None,
                         seg_k=seg_k_ref[0] if segments else None)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)          # (BLOCK_K, BLOCK_Q)
        corr = jnp.exp(m_prev - m_new)  # (1, BLOCK_Q)
        m_scr[:] = m_new
        l_scr[:] = l_prev * corr + jnp.sum(p, axis=0, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            v_blk, p.astype(v_blk.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (DV, BLOCK_Q)

    @pl.when(jb == num_kb - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(l)).T


def _auto_blocks(n, kn, d, dv, block_q, block_k, itemsize=4, bwd=False):
    """Default block sizes: large blocks amortize per-grid-step overhead
    (mask/exp/scratch update) and cut K/V refetch traffic linearly in
    block_q; bounded so q/k/v blocks + the f32 score slab + accumulator
    fit VMEM. Amortized round-3 sweep (benchmarks/flash_tune_probe.py,
    transposed forward): 1024x1024 best for the FORWARD when it fits
    (D=128 bf16 8.44 ms vs 9.14 at 1024x512), 1024x512 otherwise; the
    backward keeps 512-wide key blocks (its two f32 slabs double the
    VMEM pressure and it was not improved by wider blocks)."""
    def fits(bq, bk):
        # Operand blocks at the input itemsize (x2: pipeline double
        # buffer); slab/accumulator/stats are always f32.
        vmem = (itemsize * (2 * bq * d + 2 * bk * (d + dv))  # q, k, v
                + 4 * (bq * bk                               # score slab
                       + bq * dv + 2 * bq))                  # acc + m/l
        return vmem <= 10 * 1024 * 1024
    if block_q is None:
        block_q = next(
            (bq for bq, n_min in ((1024, 4096), (512, 2048), (256, 2048))
             if n >= n_min and fits(bq, 512)), 128)
    if block_k is None:
        if not bwd and kn >= 4096 and fits(block_q, 1024):
            block_k = 1024
        elif kn >= 2048 and fits(block_q, 512):
            block_k = 512
        else:
            block_k = 128
    return block_q, block_k


def _kv_heads(q, k, v):
    """Validate and return (h_kv, group) for grouped-query attention:
    k/v may carry fewer heads than q (GQA; h_kv=1 is MQA) — each query
    head reads the KV head of its group. h_kv == h is standard MHA."""
    h, hkv = q.shape[1], k.shape[1]
    if v.shape[1] != hkv:
        raise ValueError(f"k has {hkv} heads but v has {v.shape[1]}")
    if h % hkv != 0:
        raise ValueError(f"q heads ({h}) must be a multiple of kv heads "
                         f"({hkv})")
    return hkv, h // hkv


def _norm_segments(segment_ids, b, n, kn):
    """Normalize ``segment_ids`` to (seg_q, seg_k) int32 arrays of shape
    (B, N)/(B, KN), or None. A single (B, N) array is used for both sides
    (self-attention)."""
    if segment_ids is None:
        return None
    if isinstance(segment_ids, (tuple, list)):
        seg_q, seg_k = segment_ids
    else:
        seg_q = seg_k = segment_ids
    seg_q = jnp.asarray(seg_q, jnp.int32)
    seg_k = jnp.asarray(seg_k, jnp.int32)
    if seg_q.shape != (b, n) or seg_k.shape != (b, kn):
        raise ValueError(
            f"segment_ids shapes {seg_q.shape}/{seg_k.shape} != "
            f"({b}, {n})/({b}, {kn})")
    return seg_q, seg_k


def _fwd_pallas(q, k, v, softmax_scale, block_q, block_k, causal, interpret,
                q_offset=None, k_offset=None, window=None, segment_ids=None,
                softcap=None):
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    segment_ids = _norm_segments(segment_ids, b, n, kn)
    block_q, block_k = _auto_blocks(n, kn, d, dv, block_q, block_k,
                                    itemsize=q.dtype.itemsize)
    block_q = min(block_q, max(8, n))
    block_k = min(block_k, max(8, kn))
    nq_pad = pl.cdiv(n, block_q) * block_q
    nk_pad = pl.cdiv(kn, block_k) * block_k
    offsets = q_offset is not None

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * hkv, kn, d)
    vf = v.reshape(b * hkv, kn, dv)
    if nq_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, nq_pad - n), (0, 0)))
    if nk_pad != kn:
        kf = jnp.pad(kf, ((0, 0), (0, nk_pad - kn), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, nk_pad - kn), (0, 0)))

    smem = lambda: pl.BlockSpec((1, 1), lambda bh, qi, kb: (0, 0),
                                memory_space=pltpu.SMEM)
    off_specs, off_args = [], ()
    per_seq_off = False
    if offsets:
        qo = jnp.asarray(q_offset, jnp.int32)
        ko = jnp.asarray(k_offset if k_offset is not None else 0,
                         jnp.int32)
        if qo.ndim == 0 and ko.ndim == 0:
            off_specs = [smem(), smem()]
            off_args = (qo.reshape(1, 1), ko.reshape(1, 1))
        else:
            # PER-SEQUENCE offsets (ragged KV-cache prefill): the whole
            # (b*h, 1) table rides as ONE SMEM block (block shape ==
            # array shape — Mosaic rejects (1, 1) blocks over a larger
            # array) and the kernel indexes it by its grid row.
            per_seq_off = True
            per = lambda: pl.BlockSpec((b * h, 1),
                                       lambda bh, qi, kb: (0, 0),
                                       memory_space=pltpu.SMEM)
            off_specs = [per(), per()]
            off_args = (
                jnp.repeat(jnp.broadcast_to(qo.reshape(-1), (b,)),
                           h)[:, None],
                jnp.repeat(jnp.broadcast_to(ko.reshape(-1)
                                            if ko.ndim else ko, (b,)),
                           h)[:, None],
            )

    nkb = nk_pad // block_k
    # Static-offset sliding window: BANDED grid — visit only the
    # O(window/block_k) key blocks that can intersect each query block's
    # band (the kernel adds first(qi) to the grid step to recover the
    # logical block). Work becomes O(N·window), not O(N²) with masking.
    banded = window is not None and not offsets
    w_blocks = min(nkb, (block_q + window - 2) // block_k + 2) if banded \
        else nkb

    def k_block(qi, j):
        kb = j + _first_k_block(qi * block_q, window, block_k) if banded \
            else j
        if causal and not offsets:
            # Fetch clamp: blocks past the causal edge (or the key axis)
            # re-map to the last live block — consecutive equal indices
            # elide the DMA, so dead blocks cost no HBM traffic.
            kb = jnp.minimum(
                kb, jnp.minimum(nkb - 1,
                                (qi * block_q + block_q - 1) // block_k))
        return kb

    def kv_idx(bh, qi, j):
        # GQA: each query head streams its group's KV page.
        page = bh if group == 1 else (bh // h) * hkv + (bh % h) // group
        return (page, k_block(qi, j), 0)

    seg_specs, seg_args = [], ()
    if segment_ids is not None:
        # seg_q rides as (B, 1, N) lane vectors, seg_k as (B, KN, 1)
        # sublane vectors — both match the transposed slab with no
        # in-kernel relayout. Pads get segment -1 (matches nothing).
        seg_q_a, seg_k_a = segment_ids
        seg_specs = [
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, qi, j: (bh // h, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1),
                         lambda bh, qi, j: (bh // h, k_block(qi, j), 0),
                         memory_space=pltpu.VMEM),
        ]
        seg_args = (
            jnp.pad(seg_q_a.reshape(b, 1, n), ((0, 0), (0, 0),
                                               (0, nq_pad - n)),
                    constant_values=-1),
            jnp.pad(seg_k_a.reshape(b, kn, 1), ((0, 0), (0, nk_pad - kn),
                                                (0, 0)),
                    constant_values=-1),
        )

    grid = (b * h, nq_pad // block_q, w_blocks)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=softmax_scale, kv_len=kn,
                          causal=causal, pad_mask=nk_pad != kn,
                          offsets=offsets, window=window, banded=banded,
                          segments=segment_ids is not None,
                          softcap=softcap, per_seq_off=per_seq_off),
        grid=grid,
        in_specs=off_specs + seg_specs + [
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv), kv_idx,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dv), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nq_pad, dv), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((dv, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*off_args, *seg_args, qf, kf, vf)
    return (out[:, :n, :].reshape(b, h, n, dv),
            lse[:, :n, 0].reshape(b, h, n))


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "block_q", "block_k", "interpret",
                     "causal", "window", "logit_softcap"),
)
def flash_attention_pallas(q, k, v, softmax_scale: float = 1.0,
                           block_q: int | None = None,
                           block_k: int | None = None,
                           interpret: bool | None = None,
                           causal: bool = False,
                           window: int | None = None,
                           segment_ids=None,
                           q_offset=None, k_offset=None,
                           logit_softcap=None):
    """Streaming Pallas flash attention. q: (B, H, N, D), k/v: (B, H, KN, D).
    Sequence length is HBM-bounded (K/V blocks stream through the grid).
    ``window``: Mistral-style sliding window — each query attends to the
    ``window`` most recent positions only (requires ``causal=True``).
    ``segment_ids``: packed-sequence masking — a (B, N) int array (or a
    (seg_q, seg_k) pair for cross-attention); scores across segment
    boundaries are masked. Ids must be >= 0 (pads use -1 internally).
    ``q_offset``/``k_offset``: traced int32 GLOBAL position offsets added
    to the local query/key indices in the causal/window mask (the ring
    hops and chunked KV-cache prefill use this — e.g. ``q_offset=idx``
    lets a prompt chunk attend a cache page holding positions 0..idx-1
    before it). Forward-only in this form (the custom-VJP dispatcher
    :func:`flash_attention` covers the training paths)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out, _ = _fwd_pallas(q, k, v, softmax_scale, block_q, block_k, causal,
                         interpret, window=window, segment_ids=segment_ids,
                         q_offset=q_offset, k_offset=k_offset,
                         softcap=logit_softcap)
    return out


# ---------------------------------------------------------------------------
# Backward kernels.
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(*refs, scale, kv_len, causal, pad_mask, offsets,
                   window=None, banded=False, segments=False,
                   softcap=None):
    """dq grid step, transposed slabs (see _fwd_kernel): s/p/ds live as
    (BLOCK_K, BLOCK_Q) so the per-query lse/delta vectors are (1, BLOCK_Q)
    and broadcast across sublanes; dq accumulates row-major via the
    sublane-contraction matmul dsᵀ·K (the same TT form as the forward's
    VᵀP, measured MXU-native)."""
    refs = list(refs)
    if offsets:
        q_off, k_off = refs.pop(0)[0, 0], refs.pop(0)[0, 0]
    else:
        q_off = k_off = 0
    seg_q_ref = refs.pop(0) if segments else None
    seg_k_ref = refs.pop(0) if segments else None
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
     dq_scr) = refs
    jb = pl.program_id(2)
    num_kb = pl.num_programs(2)
    block_q = q_ref.shape[1]
    block_k = k_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = pl.program_id(1) * block_q
    kb = jb + _first_k_block(q_start, window, block_k) if banded else jb
    start = kb * block_k
    live = _live_fwd(q_start, start, block_q, block_k, causal, window,
                     q_off, k_off)
    if banded:
        live = jnp.logical_and(live, start < kv_len)

    @pl.when(live if (causal or window) else jb >= 0)
    def _():
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]      # (1, BLOCK_Q)
        delta = delta_ref[0]  # (1, BLOCK_Q)

        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_K, BLOCK_Q)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
            # d(cap·tanh(s/cap))/ds from the CAPPED value alone:
            # tanh(s/cap) = s_cap/cap (compute before masking — the
            # mask's -1e30 would square to inf; masked p is 0 anyway).
            dcap = 1.0 - (s / softcap) ** 2
        s = _mask_scores(s, q_start, start, kv_len=kv_len, causal=causal,
                         pad_mask=pad_mask, block_q=block_q,
                         block_k=block_k, q_off=q_off, k_off=k_off,
                         transposed=True, window=window,
                         seg_q=seg_q_ref[0] if segments else None,
                         seg_k=seg_k_ref[0] if segments else None)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            v_blk, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, BLOCK_Q)
        ds = p * (dp - delta)
        if softcap is not None:
            ds = ds * dcap
        ds = ds.astype(k_blk.dtype)
        dq_scr[:] = dq_scr[:] + scale * jax.lax.dot_general(
            ds, k_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_Q, D)

    @pl.when(jb == num_kb - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, scale, kv_len, q_len, causal, pad_mask,
                    q_pad_mask, offsets, window=None, banded=False,
                    segments=False, softcap=None):
    refs = list(refs)
    if offsets:
        q_off, k_off = refs.pop(0)[0, 0], refs.pop(0)[0, 0]
    else:
        q_off = k_off = 0
    seg_q_ref = refs.pop(0) if segments else None
    seg_k_ref = refs.pop(0) if segments else None
    (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
     dk_scr, dv_scr) = refs
    jb = pl.program_id(2)
    num_qb = pl.num_programs(2)
    block_k = k_ref.shape[1]
    block_q = q_ref.shape[1]

    @pl.when(jb == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k_start = pl.program_id(1) * block_k
    # Banded grid: the first query block that can see this key block under
    # causality starts at k_start (firstq = k_start // block_q).
    qi = jb + k_start // block_q if banded else jb
    q_start = qi * block_q
    # Causal/window: query blocks entirely outside this key block's band
    # contribute nothing (same liveness condition as the forward, with the
    # roles read from the other side).
    live = _live_fwd(q_start, k_start, block_q, block_k, causal, window,
                     q_off, k_off)
    if banded:
        live = jnp.logical_and(live, q_start < q_len)

    @pl.when(live if (causal or window) else jb >= 0)
    def _():
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]      # (1, BLOCK_Q)
        delta = delta_ref[0]  # (1, BLOCK_Q)

        # Transposed slabs (see _bwd_dq_kernel): per-query vectors
        # broadcast across sublanes; dk/dv accumulate via NN matmuls
        # contracting the slab's BLOCK_Q lane axis with q/do rows.
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_K, BLOCK_Q)
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
            dcap = 1.0 - (s / softcap) ** 2  # see _bwd_dq_kernel
        s = _mask_scores(s, q_start, k_start, kv_len=kv_len, causal=causal,
                         pad_mask=pad_mask, block_q=block_q,
                         block_k=block_k, q_off=q_off, k_off=k_off,
                         transposed=True, window=window,
                         seg_q=seg_q_ref[0] if segments else None,
                         seg_k=seg_k_ref[0] if segments else None)
        p = jnp.exp(s - lse)
        if q_pad_mask:
            # Padded query rows (q_idx >= q_len) have lse = 0 from padding
            # and zero q rows (s = 0, p = 1) — mask them out. Only the last
            # query block can contain padding.
            def qmask(p):
                q_idx = q_start + jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, block_q), 1
                )
                return jnp.where(q_idx < q_len, p, 0.0)

            p = jax.lax.cond(q_start + block_q > q_len, qmask,
                             lambda p: p, p)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, DV)
        dp = jax.lax.dot_general(
            v_blk, do, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, BLOCK_Q)
        ds = p * (dp - delta)
        if softcap is not None:
            ds = ds * dcap
        ds = ds.astype(q.dtype)
        dk_scr[:] = dk_scr[:] + scale * jax.lax.dot_general(
            ds, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BLOCK_K, D)

    @pl.when(jb == num_qb - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_pallas(q, k, v, o, lse, do, softmax_scale, block_q, block_k,
                causal, interpret, softcap=None, q_offset=None, k_offset=None,
                window=None, segment_ids=None):
    b, h, n, d = q.shape
    kn = k.shape[2]
    dv_dim = v.shape[-1]
    hkv, group = _kv_heads(q, k, v)
    segment_ids = _norm_segments(segment_ids, b, n, kn)
    auto_q = block_q is None
    block_q, block_k = _auto_blocks(n, kn, d, dv_dim, block_q, block_k,
                                    itemsize=q.dtype.itemsize, bwd=True)
    if auto_q and d + dv_dim >= 384:
        # The backward kernels hold TWO f32 (bq, bk) slabs (s and dp) plus
        # q/k/v/do blocks — at D>=192 a 1024-row block exceeds the 16 MB
        # scoped-vmem stack (measured OOM at D=256 f32).
        block_q = min(block_q, 512)
    block_q = min(block_q, max(8, n))
    block_k = min(block_k, max(8, kn))
    nq_pad = pl.cdiv(n, block_q) * block_q
    nk_pad = pl.cdiv(kn, block_k) * block_k
    offsets = q_offset is not None

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    def padq(x):
        return jnp.pad(x, ((0, 0), (0, nq_pad - n)) + ((0, 0),) * (x.ndim - 2))

    def padk(x):
        return jnp.pad(x, ((0, 0), (0, nk_pad - kn)) + ((0, 0),) * (x.ndim - 2))

    qf = padq(q.reshape(b * h, n, d))
    kf = padk(k.reshape(b * hkv, kn, d))
    vf = padk(v.reshape(b * hkv, kn, dv_dim))
    dof = padq(do.reshape(b * h, n, dv_dim))
    # lse/delta are laid out (bh, 1, n): the kernels consume them as
    # (1, BLOCK_Q) lane vectors matching the transposed score slabs.
    lsef = jnp.pad(lse.reshape(b * h, 1, n),
                   ((0, 0), (0, 0), (0, nq_pad - n)))
    deltaf = jnp.pad(delta.reshape(b * h, 1, n),
                     ((0, 0), (0, 0), (0, nq_pad - n)))

    interpret_mode = pltpu.InterpretParams() if interpret else False

    def smem3(_a, _b, _c):
        return (0, 0)

    off_specs, off_args = [], ()
    if offsets:
        off_specs = [
            pl.BlockSpec((1, 1), smem3, memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), smem3, memory_space=pltpu.SMEM),
        ]
        off_args = (
            jnp.asarray(q_offset, jnp.int32).reshape(1, 1),
            jnp.asarray(k_offset if k_offset is not None else 0,
                        jnp.int32).reshape(1, 1),
        )

    nkb = nk_pad // block_k
    nqb = nq_pad // block_q
    # Banded grids + causal fetch clamps: same scheme as the forward
    # (see _fwd_pallas) — O(N·window) work, dead blocks elide their DMA.
    banded = window is not None and not offsets
    w_blocks = min(nkb, (block_q + window - 2) // block_k + 2) if banded \
        else nkb
    wq_blocks = min(nqb, (block_k + window - 2) // block_q + 2) if banded \
        else nqb

    def kv_page(bh):
        # GQA: each query head reads its group's KV page.
        return bh if group == 1 else (bh // h) * hkv + (bh % h) // group

    def k_block(qi, j):
        kb = j + _first_k_block(qi * block_q, window, block_k) if banded \
            else j
        if causal and not offsets:
            kb = jnp.minimum(
                kb, jnp.minimum(nkb - 1,
                                (qi * block_q + block_q - 1) // block_k))
        return kb

    def kv_idx(bh, qi, j):
        return (kv_page(bh), k_block(qi, j), 0)

    def q_row_idx(bh, kb, j):
        qi = j + (kb * block_k) // block_q if banded else j
        if causal and not offsets:
            # Dead-early query blocks (above the diagonal) re-map up to
            # the first live one; banded overshoot clamps to the last row.
            qi = jnp.minimum(jnp.maximum(qi, (kb * block_k) // block_q),
                             nqb - 1)
        return qi

    seg_args = ()
    seg_dq_specs, seg_dkv_specs = [], []
    if segment_ids is not None:
        seg_q_a, seg_k_a = segment_ids
        seg_args = (
            jnp.pad(seg_q_a.reshape(b, 1, n), ((0, 0), (0, 0),
                                               (0, nq_pad - n)),
                    constant_values=-1),
            jnp.pad(seg_k_a.reshape(b, kn, 1), ((0, 0), (0, nk_pad - kn),
                                                (0, 0)),
                    constant_values=-1),
        )
        seg_dq_specs = [
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, j: (bh // h, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1),
                         lambda bh, qi, j: (bh // h, k_block(qi, j), 0),
                         memory_space=pltpu.VMEM),
        ]
        seg_dkv_specs = [
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, kb, j: (bh // h, 0,
                                            q_row_idx(bh, kb, j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, 1), lambda bh, kb, j: (bh // h, kb, 0),
                         memory_space=pltpu.VMEM),
        ]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=softmax_scale, kv_len=kn,
                          causal=causal, pad_mask=nk_pad != kn,
                          offsets=offsets, window=window, banded=banded,
                          segments=segment_ids is not None,
                          softcap=softcap),
        grid=(b * h, nqb, w_blocks),
        in_specs=off_specs + seg_dq_specs + [
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), kv_idx,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, kb: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, kb: (bh, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, kb: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(*off_args, *seg_args, qf, kf, vf, dof, lsef, deltaf)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=softmax_scale, kv_len=kn,
                          q_len=n, causal=causal, pad_mask=nk_pad != kn,
                          q_pad_mask=nq_pad != n, offsets=offsets,
                          window=window, banded=banded,
                          segments=segment_ids is not None,
                          softcap=softcap),
        grid=(b * h, nkb, wq_blocks),
        in_specs=off_specs + seg_dkv_specs + [
            pl.BlockSpec((1, block_q, d),
                         lambda bh, kb, qi: (bh, q_row_idx(bh, kb, qi), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d),
                         lambda bh, kb, qi: (kv_page(bh), kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim),
                         lambda bh, kb, qi: (kv_page(bh), kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, dv_dim),
                         lambda bh, kb, qi: (bh, q_row_idx(bh, kb, qi), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, kb, qi: (bh, 0, q_row_idx(bh, kb, qi)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q),
                         lambda bh, kb, qi: (bh, 0, q_row_idx(bh, kb, qi)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda bh, kb, qi: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dv_dim), lambda bh, kb, qi: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nk_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, nk_pad, dv_dim), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret_mode,
    )(*off_args, *seg_args, qf, kf, vf, dof, lsef, deltaf)

    dq = dq[:, :n].reshape(b, h, n, d)
    if group == 1:
        return dq, dk[:, :kn].reshape(b, h, kn, d), \
            dv[:, :kn].reshape(b, h, kn, dv_dim)
    # GQA: the dkv kernel writes PER-QUERY-HEAD partials (parallel grid
    # rows may not scatter-add one KV page); sum each group in f32 here.
    # The partials cost the same HBM as dq — acceptable; an in-kernel
    # group-sequential accumulation could trade grid parallelism for it.
    def gsum(x, dim):
        return x[:, :kn].astype(jnp.float32).reshape(
            b, hkv, group, kn, dim).sum(2).astype(x.dtype)

    return dq, gsum(dk, d), gsum(dv, dv_dim)


# ---------------------------------------------------------------------------
# XLA blockwise fallback (portable; also the non-TPU backward path).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "block_size", "causal",
                              "window", "logit_softcap")
)
def flash_attention_xla(q, k, v, softmax_scale: float = 1.0,
                        block_size: int = 512, causal: bool = False,
                        window: int | None = None, segment_ids=None,
                        logit_softcap: float | None = None):
    """Blockwise online-softmax attention in pure XLA (lax.scan) — the
    portable fallback with the same O(N·block) memory profile. ``window``:
    sliding-window causal attention; ``segment_ids``: packed-sequence
    block-diagonal masking (see :func:`flash_attention`)."""
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    segment_ids = _norm_segments(segment_ids, q.shape[0], q.shape[2],
                                 k.shape[2])
    if k.shape[1] != q.shape[1]:
        # GQA on the portable path: materialize the repeat (the Pallas
        # kernels stream the shared page instead — see _kv_heads).
        _, rep = _kv_heads(q, k, v)
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
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
    if segment_ids is not None:
        seg_q, seg_k = segment_ids
        seg_kb = jnp.moveaxis(
            jnp.pad(seg_k, ((0, 0), (0, pad)),
                    constant_values=-1).reshape(b, num_blocks, block), 1, 0)
    else:
        seg_q = None
        seg_kb = jnp.zeros((num_blocks, b, block), jnp.int32)

    def body(carry, blk):
        m, l, acc = carry
        k_i, v_i, valid_i, key_pos_i, seg_k_i = blk
        # f32 scores/carry regardless of input dtype, mirroring the Pallas
        # kernels' f32 scratch (ADVICE r3): bf16 running max/sum/acc drift
        # from the TPU path at long N in both this forward and its vjp.
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_i,
                       preferred_element_type=jnp.float32) * softmax_scale
        if logit_softcap is not None:
            s = logit_softcap * jnp.tanh(s / logit_softcap)
        # Masks use finite _NEG_INF, not -inf: a sliding window can fully
        # mask EARLY key blocks while the running max is still -inf, and
        # exp(-inf - -inf) = NaN; with -1e30 the block contributes p = 1
        # rows that the next live block's correction factor exp(-1e30 - m)
        # = 0 wipes — the same self-healing scheme as the Pallas kernel.
        s = jnp.where(valid_i[None, None, None, :], s, _NEG_INF)
        if causal:
            s = jnp.where(
                key_pos_i[None, None, None, :] <= q_pos[None, None, :, None],
                s, _NEG_INF,
            )
        if window is not None:
            s = jnp.where(
                q_pos[None, None, :, None] - key_pos_i[None, None, None, :]
                < window, s, _NEG_INF,
            )
        if seg_q is not None:
            s = jnp.where(
                seg_q[:, None, :, None] == seg_k_i[:, None, None, :],
                s, _NEG_INF,
            )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_i,
            preferred_element_type=jnp.float32)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, n), -jnp.inf, jnp.float32),
        jnp.zeros((b, h, n), jnp.float32),
        jnp.zeros((b, h, n, v.shape[-1]), jnp.float32),
    )
    (m, l, acc), _ = jax.lax.scan(
        body, init,
        (jnp.moveaxis(kb, 2, 0), jnp.moveaxis(vb, 2, 0), valid, key_pos,
         seg_kb),
    )
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


# ---------------------------------------------------------------------------
# Differentiable dispatch: Pallas fwd+bwd on TPU, XLA elsewhere.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_dispatch(q, k, v, seg_q, seg_k, softmax_scale, causal, window,
                    softcap):
    segs = None if seg_q is None else (seg_q, seg_k)
    if jax.default_backend() == "tpu":
        return flash_attention_pallas(q, k, v, softmax_scale=softmax_scale,
                                      causal=causal, window=window,
                                      segment_ids=segs,
                                      logit_softcap=softcap)
    return flash_attention_xla(q, k, v, softmax_scale=softmax_scale,
                               causal=causal, window=window,
                               segment_ids=segs, logit_softcap=softcap)


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "causal", "window",
                              "interpret", "softcap")
)
def _fwd_with_lse(q, k, v, segs, softmax_scale, causal, window, interpret,
                  softcap=None):
    return _fwd_pallas(q, k, v, softmax_scale, None, None, causal, interpret,
                       window=window, segment_ids=segs, softcap=softcap)


@functools.partial(
    jax.jit, static_argnames=("softmax_scale", "causal", "window",
                              "interpret", "softcap")
)
def _bwd_jit(q, k, v, o, lse, do, segs, softmax_scale, causal, window,
             interpret, softcap=None):
    return _bwd_pallas(q, k, v, o, lse, do, softmax_scale, None, None,
                       causal, interpret, window=window, segment_ids=segs,
                       softcap=softcap)


def _flash_fwd(q, k, v, seg_q, seg_k, softmax_scale, causal, window,
               softcap):
    segs = None if seg_q is None else (seg_q, seg_k)
    if jax.default_backend() == "tpu":
        o, lse = _fwd_with_lse(q, k, v, segs, softmax_scale, causal, window,
                               False, softcap)
        return o, (q, k, v, segs, o, lse)
    o = flash_attention_xla(q, k, v, softmax_scale=softmax_scale,
                            causal=causal, window=window, segment_ids=segs,
                            logit_softcap=softcap)
    return o, (q, k, v, segs, None, None)


def _flash_bwd(softmax_scale, causal, window, softcap, residuals, g):
    q, k, v, segs, o, lse = residuals
    if o is not None and jax.default_backend() == "tpu":
        # Pallas backward: recompute p per block from the saved LSE — no
        # N² matrix, no full-graph recompute.
        dq, dk, dv = _bwd_jit(q, k, v, o, lse, g, segs, softmax_scale,
                              causal, window, False, softcap)
    else:
        _, vjp = jax.vjp(
            lambda qq, kk, vv: flash_attention_xla(
                qq, kk, vv, softmax_scale=softmax_scale, causal=causal,
                window=window, segment_ids=segs, logit_softcap=softcap
            ),
            q, k, v,
        )
        dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_dispatch.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, softmax_scale: float = 1.0,
                    causal: bool = False, window: int | None = None,
                    segment_ids=None, logit_softcap: float | None = None):
    """Dispatch: streaming Pallas kernels (fwd AND bwd) on TPU, XLA
    blockwise elsewhere. Differentiable. ``window``: sliding-window causal
    attention — each query sees the ``window`` most recent positions
    (requires ``causal=True``). ``segment_ids``: packed-sequence
    block-diagonal masking — (B, N) int array used for both sides, or a
    (seg_q, seg_k) pair; ids must be >= 0. For explicit block-size control
    call :func:`flash_attention_pallas` or :func:`flash_attention_xla`."""
    segs = _norm_segments(segment_ids, q.shape[0], q.shape[2], k.shape[2])
    seg_q, seg_k = segs if segs is not None else (None, None)
    return _flash_dispatch(q, k, v, seg_q, seg_k, softmax_scale, causal,
                           window, logit_softcap)


# ---------------------------------------------------------------------------
# Ring attention (sequence parallelism).
# ---------------------------------------------------------------------------


def _online_block_update(q, k_blk, v_blk, m, l, acc, scale, q_pos,
                         k_pos_start, k_len, causal, chunk: int = 512,
                         window=None, seg_q=None, seg_k_blk=None):
    """Merge one K/V block into an online-softmax carry, processing the
    block in ``chunk``-sized pieces so only a (B,H,Lq,chunk) score slab is
    ever materialized (blockwise — neither the full local score matrix nor
    a full local mask exists). ``q_pos``: (Lq,) global query positions;
    ``k_pos_start``: global position of the block's first key (traced);
    ``k_len``: true (unpadded) key count in the block. ``seg_q``/
    ``seg_k_blk``: optional (B, Lq)/(B, KN) packed-sequence ids."""
    kn = k_blk.shape[2]
    chunk = min(chunk, kn)
    num = -(-kn // chunk)
    pad = num * chunk - kn
    if pad:
        k_blk = jnp.pad(k_blk, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v_blk = jnp.pad(v_blk, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kc = jnp.moveaxis(k_blk.reshape(*k_blk.shape[:2], num, chunk, -1), 2, 0)
    vc = jnp.moveaxis(v_blk.reshape(*v_blk.shape[:2], num, chunk, -1), 2, 0)
    if seg_q is not None:
        sc = jnp.moveaxis(
            jnp.pad(seg_k_blk, ((0, 0), (0, pad)),
                    constant_values=-1).reshape(seg_k_blk.shape[0], num,
                                                chunk), 1, 0)
    else:
        sc = jnp.zeros((num, k_blk.shape[0], chunk), jnp.int32)

    def body(carry, xs):
        m, l, acc = carry
        k_i, v_i, ci, seg_k_i = xs
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_i) * scale
        k_pos_i = k_pos_start + ci * chunk + jnp.arange(chunk)
        mask_i = (k_pos_i - k_pos_start < k_len)[None, :]
        if causal:
            mask_i = mask_i & (k_pos_i[None, :] <= q_pos[:, None])
        if window is not None:
            mask_i = mask_i & (q_pos[:, None] - k_pos_i[None, :] < window)
        s = jnp.where(mask_i[None, None], s, _NEG_INF)
        if seg_q is not None:
            s = jnp.where(
                (seg_q[:, :, None] == seg_k_i[:, None, :])[:, None],
                s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        acc_new = acc * corr[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_i
        )
        return (m_new, l_new, acc_new), None

    (m, l, acc), _ = jax.lax.scan(body, (m, l, acc),
                                  (kc, vc, jnp.arange(num), sc))
    return m, l, acc


def ring_attention(q, k, v, mesh, axis_name: str = "data",
                   softmax_scale: float = 1.0, causal: bool = False,
                   chunk: int = 512, impl: str = "pallas",
                   window: int | None = None, segment_ids=None):
    """Sequence-parallel attention: q/k/v sharded on the sequence axis over
    ``axis_name``; K/V blocks rotate around the ring with ``ppermute``
    while each device keeps a running (output, LSE) carry (SURVEY §5
    long-context entry — the reference has no equivalent).

    ``impl="pallas"`` (default): each hop's local step IS the streaming
    flash kernel — :func:`_fwd_pallas` with traced global-position offsets
    for the causal mask, hop results merged by log-sum-exp; the backward
    is a second ring pass running the saved-LSE Pallas kernels per hop
    (dq accumulates locally, dk/dv rotate home with their blocks) — the
    single-chip kernels' efficiency inside the ring, no autodiff
    recompute. ``impl="xla"``: the portable chunked online-softmax update
    (``chunk`` controls its score-slab width).

    q, k, v: (B, H, N, D) GLOBAL arrays (host side); returns the global
    attention output. N must divide by the ring size. ``window``:
    sliding-window causal attention over GLOBAL positions — hops entirely
    outside a device's band no-op via the in-kernel liveness check.
    ``segment_ids``: packed-sequence block-diagonal masking — a (B, N)
    GLOBAL int array (self-attention); the local query slice stays home
    and the key slice rotates with its K/V block.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    segs = _norm_segments(segment_ids, q.shape[0], q.shape[2], k.shape[2])
    if impl == "xla" and k.shape[1] != q.shape[1]:
        # GQA: the chunked-einsum impl wants matched heads; the Pallas
        # impl streams the shared KV page without materializing this.
        _, rep = _kv_heads(q, k, v)
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    n_dev = mesh.shape[axis_name]
    b, h, n, d = q.shape
    assert n % n_dev == 0
    local = n // n_dev
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
    interpret = jax.default_backend() != "tpu"

    def _rot(x):
        return jax.lax.ppermute(x, axis_name, perm)

    def _varying(tree):
        return jax.lax.pcast(tree, axis_name, to="varying")

    def _hop_offsets(my, i):
        """Global offsets of my queries / the hop-i key block."""
        src = jax.lax.rem(my - i + n_dev, n_dev)
        return my * local, src * local, src

    def local_fwd_impl(q_loc, k_loc, v_loc, seg_q_loc=None, seg_k_loc=None):
        my = jax.lax.axis_index(axis_name)
        has_seg = seg_q_loc is not None

        def step(carry, i):
            if has_seg:
                o_c, lse_c, k_blk, v_blk, seg_blk = carry
            else:
                (o_c, lse_c, k_blk, v_blk), seg_blk = carry, None
            q_off, k_off, src = _hop_offsets(my, i)

            # Every device enters the kernel on every hop (divergent
            # participation deadlocks the interpret machinery's
            # rendezvous); for hops entirely in my causal future the
            # kernel's per-block liveness check skips all compute and the
            # result merges as exp(-inf) = 0.
            o_i, lse_i = _fwd_pallas(
                q_loc, k_blk, v_blk, softmax_scale, None, None, causal,
                interpret,
                q_offset=q_off if causal else None,
                k_offset=k_off if causal else None,
                window=window,
                segment_ids=(seg_q_loc, seg_blk) if has_seg else None,
            )
            # Log-sum-exp merge of per-hop partial attention results.
            lse_new = jnp.logaddexp(lse_c, lse_i)
            w_c = jnp.exp(lse_c - lse_new)[..., None]
            w_i = jnp.exp(lse_i - lse_new)[..., None]
            o_new = o_c * w_c + o_i.astype(jnp.float32) * w_i
            out = (o_new, lse_new, _rot(k_blk), _rot(v_blk))
            if has_seg:
                out += (_rot(seg_blk),)
            return out, None

        init = _varying((
            jnp.zeros(q_loc.shape[:3] + (v_loc.shape[-1],), jnp.float32),
            jnp.full(q_loc.shape[:3], _NEG_INF, jnp.float32),
        )) + (k_loc, v_loc) + ((seg_k_loc,) if has_seg else ())
        (o, lse, *_), _ = jax.lax.scan(step, init, jnp.arange(n_dev))
        return o.astype(q_loc.dtype), lse

    def local_bwd_impl(q_loc, k_loc, v_loc, o, lse, do, seg_q_loc=None,
                       seg_k_loc=None):
        my = jax.lax.axis_index(axis_name)
        has_seg = seg_q_loc is not None

        def step(carry, i):
            if has_seg:
                dq_acc, k_blk, v_blk, dk_acc, dv_acc, seg_blk = carry
            else:
                (dq_acc, k_blk, v_blk, dk_acc, dv_acc), seg_blk = (
                    carry, None)
            q_off, k_off, src = _hop_offsets(my, i)

            # p recomputed per block from the GLOBAL saved LSE — the
            # exact softmax-over-all-keys backward, blockwise. All
            # devices enter every hop (see forward); dead hops produce
            # zero grads via the in-kernel liveness check.
            dq_i, dk_i, dv_i = _bwd_pallas(
                q_loc, k_blk, v_blk, o, lse, do, softmax_scale, None,
                None, causal, interpret,
                q_offset=q_off if causal else None,
                k_offset=k_off if causal else None,
                window=window,
                segment_ids=(seg_q_loc, seg_blk) if has_seg else None,
            )
            # dq stays home; dk/dv travel with their block around the ring
            # (after n_dev rotations both are back at the owner).
            # Accumulators are f32 regardless of input dtype — n_dev
            # sequential bf16 roundings would loosen grads as the ring
            # grows (the single-chip kernels accumulate in f32 scratch).
            out = (dq_acc + dq_i.astype(jnp.float32),
                   _rot(k_blk), _rot(v_blk),
                   _rot(dk_acc + dk_i.astype(jnp.float32)),
                   _rot(dv_acc + dv_i.astype(jnp.float32)))
            if has_seg:
                out += (_rot(seg_blk),)
            return out, None

        f32_zeros = lambda t: jnp.zeros(t.shape, jnp.float32)
        init = _varying((f32_zeros(q_loc),)) + (
            k_loc, v_loc) + _varying(
            (f32_zeros(k_loc), f32_zeros(v_loc))) + (
            (seg_k_loc,) if has_seg else ())
        (dq, _, _, dk, dv, *_), _ = jax.lax.scan(step, init,
                                                 jnp.arange(n_dev))
        return (dq.astype(q_loc.dtype), dk.astype(k_loc.dtype),
                dv.astype(v_loc.dtype))

    @jax.custom_vjp
    def local_pallas(q_loc, k_loc, v_loc):
        return local_fwd_impl(q_loc, k_loc, v_loc)[0]

    def local_pallas_fwd(q_loc, k_loc, v_loc):
        o, lse = local_fwd_impl(q_loc, k_loc, v_loc)
        return o, (q_loc, k_loc, v_loc, o, lse)

    def local_pallas_bwd(res, g):
        return local_bwd_impl(*res, g)

    local_pallas.defvjp(local_pallas_fwd, local_pallas_bwd)

    @jax.custom_vjp
    def local_pallas_seg(q_loc, k_loc, v_loc, seg_q_loc, seg_k_loc):
        return local_fwd_impl(q_loc, k_loc, v_loc, seg_q_loc, seg_k_loc)[0]

    def local_pallas_seg_fwd(q_loc, k_loc, v_loc, seg_q_loc, seg_k_loc):
        o, lse = local_fwd_impl(q_loc, k_loc, v_loc, seg_q_loc, seg_k_loc)
        return o, (q_loc, k_loc, v_loc, o, lse, seg_q_loc, seg_k_loc)

    def local_pallas_seg_bwd(res, g):
        q_loc, k_loc, v_loc, o, lse, seg_q_loc, seg_k_loc = res
        return local_bwd_impl(q_loc, k_loc, v_loc, o, lse, g, seg_q_loc,
                              seg_k_loc) + (None, None)

    local_pallas_seg.defvjp(local_pallas_seg_fwd, local_pallas_seg_bwd)

    def local_xla(q_loc, k_loc, v_loc, seg_q_loc=None, seg_k_loc=None):
        my = jax.lax.axis_index(axis_name)
        q_pos = my * local + jnp.arange(local)
        has_seg = seg_q_loc is not None

        def step(carry, i):
            if has_seg:
                m, l, acc, k_blk, v_blk, seg_blk = carry
            else:
                (m, l, acc, k_blk, v_blk), seg_blk = carry, None
            # K/V block currently held came from rank (my - i) mod n_dev.
            src = jax.lax.rem(my - i + n_dev, n_dev)
            m, l, acc = _online_block_update(
                q_loc, k_blk, v_blk, m, l, acc, softmax_scale,
                q_pos, src * local, local, causal, chunk, window=window,
                seg_q=seg_q_loc, seg_k_blk=seg_blk
            )
            out = (m, l, acc, _rot(k_blk), _rot(v_blk))
            if has_seg:
                out += (_rot(seg_blk),)
            return out, None

        # The fresh accumulators must be marked device-varying to match
        # the loop outputs under shard_map's manual-axes typing.
        init = _varying((
            jnp.full(q_loc.shape[:3], _NEG_INF, jnp.float32),
            jnp.zeros(q_loc.shape[:3], jnp.float32),
            jnp.zeros(q_loc.shape[:3] + (v_loc.shape[-1],), jnp.float32),
        )) + (k_loc, v_loc) + ((seg_k_loc,) if has_seg else ())
        (m, l, acc, *_), _ = jax.lax.scan(step, init, jnp.arange(n_dev))
        return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(q_loc.dtype)

    if segs is None:
        local_fn = local_pallas if impl == "pallas" else local_xla
    else:
        local_fn = local_pallas_seg if impl == "pallas" else local_xla
    seq_sharded = NamedSharding(mesh, P(None, None, axis_name, None))
    seg_spec = P(None, axis_name)
    shard = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(None, None, axis_name, None),) * 3
        + ((seg_spec, seg_spec) if segs is not None else ()),
        out_specs=P(None, None, axis_name, None),
        # pallas_call outputs carry no vma type under shard_map's
        # varying-manual-axes checker (same workaround as the CD DP
        # kernel, ku/pallas/cd_gibbs.py::cd_train_pallas_dp).
        check_vma=impl != "pallas",
    )
    q_s = jax.device_put(q, seq_sharded)
    k_s = jax.device_put(k, seq_sharded)
    v_s = jax.device_put(v, seq_sharded)
    if segs is None:
        return shard(q_s, k_s, v_s)
    seg_sharded = NamedSharding(mesh, seg_spec)
    seg_q_s = jax.device_put(segs[0], seg_sharded)
    seg_k_s = jax.device_put(segs[1], seg_sharded)
    return shard(q_s, k_s, v_s, seg_q_s, seg_k_s)
