"""Flash-decoding kernel: one query token attending over the KV cache.

Covers the per-token decode read of ``MultiHeadAttention`` (reference
``/root/reference/ku/layer_ext/attention.py:24-160`` has no decode cache
at all — this is a beyond-reference serving path), replacing the masked
XLA einsum / gathered-page ``lax.scan`` with a single Pallas program
whose grid streams the cache through VMEM exactly once:

- **dense** cache ``(B, Hkv, D, S)``: grid ``(B, Hkv, ceil(S/bt))``;
  each step DMAs one ``(D, bt)`` K/V slab and folds it into an online
  softmax. The K/V ``index_map`` CLAMPS the block index at the last
  live block (``lengths`` rides as a scalar-prefetch argument), so
  blocks past a sequence's fill level re-point at the same slab and
  Mosaic's pipeliner skips the DMA — a short sequence in a long cache
  reads only its live prefix, where the XLA einsum always reads all S.
- **int8** cache: the K/V slabs stream as int8 (HALF the HBM traffic of
  bf16, a quarter of f32) and dequantize in VMEM. Per-token scales
  multiply the tiny score/prob slabs:
  ``q·(k_int8·s_k) == (q·k_int8)·s_k`` exactly (f32 score
  accumulation), matching the scale-folded XLA path — which, after the
  same scale-folding fix, also streams int8 straight into its matmul
  and measures at parity with this kernel (toy T=8192 on the v5e:
  20.1k tok/s XLA vs 18.3k kernel; the kernel's remaining edge is the
  live-prefix clamp on ragged batches).
- **paged** pool ``(NP, Hkv, D, pg)``: grid ``(B, Hkv)`` with MANUAL
  double-buffered DMA — a ``fori_loop`` walks each row's block table
  (scalar-prefetched) in chunks of several pages, issuing one sliced
  ``make_async_copy`` per page from the HBM-resident pool into a
  contiguous ``(D, chunk·pg)`` VMEM slab (lane offsets are pg-aligned),
  overlapping chunk ``c+1``'s copies with chunk ``c``'s compute, then
  folds the WHOLE slab in one matmul. The serving page size (256 slots)
  is far below the ~1 MB slab the pipeline needs: the v1 design (grid
  ``(B, Hkv, MP)``, one page per grid step via a table-resolving
  ``index_map``) measured 0.73 µs/step against 0.16 µs of DMA — the
  per-step pipeline fixed cost tripled the read time (toy T=8192:
  5.3k tok/s vs the dense kernel's ~18k). Manual DMA decouples the
  in-flight copy granularity (one page) from the compute granularity
  (one multi-page chunk). Unallocated table tail entries are never
  dereferenced: dead page slots in the final chunk re-point at the
  last live page and their keys are masked by position.

Layout (v3, TRANSPOSED cache): K/V arrive with the key axis MINOR —
``(…, D, S)`` — so the cache is lane-pad-free in HBM for ANY head dim.
The optimized-HLO evidence that forced this (round 4, v5e): a Pallas
custom call constrains its operands to the default dim order
``{3,2,1,0}``, and with the old ``(…, S, D)`` convention at D=64 that
layout lane-pads every (8,128) tile ×2 — the kernel physically read
twice the cache bytes and hit 0.49× of the HBM roofline where the XLA
masked einsum (free to keep the cache ``{2,3,1,0}``, i.e. exactly this
transposed form) hit 0.80×. With the key axis minor the constraint and
the pad-free layout coincide. Scores are ``(G, bt)`` (grouped query
heads on sublanes, keys on lanes): QK is a plain ``(G,D)·(D,bt)``
matmul on the slab as it arrives, the int8 per-token scales ride as
``(1, bt)`` lane vectors blocked from ``(…, 1, S)`` views of the
``(…, S)`` scale arrays — and the scale index_map equals the K/V one.
PV is ``(G,bt)·(Dv,bt)ᵀ`` into a ``(G, Dv)`` f32 accumulator; running
max/sum are ``(G, 1)`` f32 VMEM scratch with lane reductions.
(History: v1 had keys on sublanes and scales as ``(…, S, 1)`` arrays
whose trailing unit dim lane-pads ×128 — the scale DMA cost as much as
the K/V slab; v2 fixed the scales but kept ``(…, S, D)`` K/V and so
still paid the ×2 cache padding at sub-128 head dims.)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_attention", "decode_attention_paged"]

_NEG = -1e30


def _kernel(lens_ref, *refs, scale, bt, softcap, quant, nt):
    """One (b, h, t) grid step of the online-softmax cache read."""
    if quant:
        q_ref, k_ref, v_ref, ksc_ref, vsc_ref, o_ref = refs[:6]
        m_scr, l_scr, acc_scr = refs[6:]
    else:
        q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr = refs
    b, t = pl.program_id(0), pl.program_id(2)

    @pl.when(t == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]

    # Fully-dead blocks: the clamped index_map already re-points their
    # DMA at the last live slab (no new traffic); skip the compute too.
    @pl.when(t * bt < length)
    def _body():
        q = q_ref[0, 0]  # (G, D)
        k = k_ref[0, 0]  # (D, bt) — int8 when quant
        if quant:
            k = k.astype(q.dtype)
        # (G, bt): grouped query heads on sublanes, keys on lanes.
        s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * ksc_ref[0, 0]  # (1, bt) per-token k scales
        s = s * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kpos = t * bt + jax.lax.broadcasted_iota(jnp.int32, (1, bt), 1)
        s = jnp.where(kpos < length, s, _NEG)
        m = m_scr[:]  # (G, 1)
        m2 = jnp.maximum(m, s.max(axis=1, keepdims=True))
        p = jnp.exp(s - m2)
        r = jnp.exp(m - m2)
        m_scr[:] = m2
        l_scr[:] = l_scr[:] * r + p.sum(axis=1, keepdims=True)
        v = v_ref[0, 0]  # (Dv, bt) — int8 when quant
        if quant:
            p = p * vsc_ref[0, 0]  # fold v scales into the prob slab
            v = v.astype(q.dtype)
        acc_scr[:] = acc_scr[:] * r + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, Dv) += P·Vᵀ
    @pl.when(t == nt - 1)
    def _done():
        o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _call(q, k, v, lengths, k_scale, v_scale, softmax_scale, softcap,
          block_t, interpret, kv_index, nt):
    """Shared pallas_call assembly for the dense and paged variants.

    ``kv_index(b, h, t, lens)`` -> block index tuple into the
    ``(…, D, bt)``-blocked K/V arrays; the ``(…, 1, S)`` scale views
    block with the SAME index map (their unit dim rides where D does).
    ``nt`` = grid steps over the key axis; ``block_t`` = key block.
    """
    bsz, hkv, g, d = q.shape
    dv = v.shape[2]
    quant = k_scale is not None
    grid = (bsz, hkv, nt)

    qspec = pl.BlockSpec((1, 1, g, d), lambda b, h, t, lens: (b, h, 0, 0))
    kspec = pl.BlockSpec((1, 1, d, block_t), kv_index)
    vspec = pl.BlockSpec((1, 1, dv, block_t), kv_index)
    in_specs = [qspec, kspec, vspec]
    args = (q, k, v)
    if quant:
        # Scales ride as (…, 1, S) views of the (…, S) arrays: the key
        # axis stays on LANES (contiguous in HBM — the DMA is one linear
        # read) and the unit dim satisfies Mosaic's last-two-dims rule
        # by equalling the array dim. A trailing unit dim instead would
        # lane-pad every element ×128 (see module docstring).
        sspec = pl.BlockSpec((1, 1, 1, block_t), kv_index)
        in_specs += [sspec, sspec]
        args += (k_scale[:, :, None, :], v_scale[:, :, None, :])

    out = pl.pallas_call(
        functools.partial(_kernel, scale=softmax_scale, bt=block_t,
                          softcap=softcap, quant=quant, nt=nt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, g, dv),
                                   lambda b, h, t, lens: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, 1), jnp.float32),
                pltpu.VMEM((g, dv), jnp.float32),
            ]),
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray(lengths, jnp.int32), *args)
    return out


def decode_attention(q, k, v, lengths, *, k_scale=None, v_scale=None,
                     softmax_scale: Optional[float] = None,
                     logit_softcap: Optional[float] = None,
                     block_t: Optional[int] = None,
                     interpret: Optional[bool] = None):
    """Single-token attention over a dense TRANSPOSED decode cache.

    q: (B, Hkv, G, D) current-token queries, grouped per KV head.
    k, v: (B, Hkv, D, S) / (B, Hkv, Dv, S) cache, key axis MINOR (any
      dtype; int8 with scales) — lane-pad-free in HBM for any head dim.
    lengths: (B,) int32 — number of LIVE positions per row (index+1).
    k_scale, v_scale: (B, Hkv, S) f32 per-token scales (int8 caches).
    block_t: key-block size; None (default) auto-sizes toward ~1 MB K
      slabs (HBM-latency-bound at small slabs: bt=512 at D=64 f32 paid
      ~0.2 µs of per-grid-step fixed cost per 128 KB slab on the v5e).
    Returns (B, Hkv, G, Dv) in q.dtype with f32 accumulation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    s_total = k.shape[3]
    if block_t is None:
        # ~1 MB K slabs, in [512, 4096], multiples of 512 (the scale
        # view's lane dim needs bt % 128 == 0; D rides sublanes).
        per_key = k.shape[2] * k.dtype.itemsize
        block_t = max(512, min(4096, (1 << 20) // per_key // 512 * 512))
    bt = s_total if s_total <= block_t else block_t
    nt = -(-s_total // bt)

    def kv_index(b, h, t, lens):
        # Clamp at each row's last live block: dead steps re-DMA the
        # same slab (skipped by the pipeliner) and never read past the
        # fill level.
        return (b, h, 0, jnp.minimum(t, (lens[b] - 1) // bt))

    return _call(q, k, v, lengths, k_scale, v_scale, softmax_scale,
                 logit_softcap, bt, interpret, kv_index, nt)


def _paged_kernel(packed_ref, *refs, scale, pg, ppb, softcap, quant):
    """One (b, h) program: stream the row's live pages through a
    double-buffered VMEM slab, one online-softmax fold per chunk.

    packed_ref (SMEM): row b's [length, table...] at packed_ref[b].
    K/V pools (+ scale views when quant) stay HBM-resident (pl.ANY);
    each chunk issues ``ppb`` sliced page copies into lane offsets of a
    contiguous ``(D, ppb·pg)`` slab, so the chunk folds as ONE matmul.
    """
    if quant:
        q_ref, k_ref, v_ref, ksc_ref, vsc_ref, o_ref = refs[:6]
        kbuf, vbuf, ksbuf, vsbuf, sems, ssems = refs[6:]
    else:
        q_ref, k_ref, v_ref, o_ref, kbuf, vbuf, sems = refs
    b, h = pl.program_id(0), pl.program_id(1)
    length = packed_ref[b, 0]
    # Clamp at the table width: a caller that keeps writing past the
    # allocated window (mx slots) reports length > mp·pg; every page is
    # then live and the whole window reads unmasked (matching the XLA
    # path's full-cache behavior) — never walk past the table.
    mp = packed_ref.shape[1] - 1
    npages = jnp.clip((length + pg - 1) // pg, 1, mp)
    nchunks = (npages + ppb - 1) // ppb

    def _copies(c, slot):
        """The chunk-c page copies into buffer ``slot`` (dead entries
        re-point at the last live page; masked by position later). The
        SAME descriptors are rebuilt to wait: start/wait pair per page."""
        out = []
        for p in range(ppb):
            j = jnp.minimum(c * ppb + p, npages - 1)
            pid = packed_ref[b, 1 + j]
            lanes = pl.ds(p * pg, pg)
            out.append(pltpu.make_async_copy(
                k_ref.at[pid, h], kbuf.at[slot, :, lanes],
                sems.at[slot, 0, p]))
            out.append(pltpu.make_async_copy(
                v_ref.at[pid, h], vbuf.at[slot, :, lanes],
                sems.at[slot, 1, p]))
            if quant:
                out.append(pltpu.make_async_copy(
                    ksc_ref.at[pid, h], ksbuf.at[slot, :, lanes],
                    ssems.at[slot, 0, p]))
                out.append(pltpu.make_async_copy(
                    vsc_ref.at[pid, h], vsbuf.at[slot, :, lanes],
                    ssems.at[slot, 1, p]))
        return out

    for dma in _copies(0, 0):
        dma.start()

    def body(c, carry):
        m, l, acc = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _prefetch():
            for dma in _copies(c + 1, 1 - slot):
                dma.start()

        for dma in _copies(c, slot):
            dma.wait()
        q = q_ref[0, 0]  # (G, D)
        k = kbuf[slot]  # (D, ppb·pg) — int8 when quant
        if quant:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * ksbuf[slot]  # (1, ppb·pg) per-token k scales
        s = s * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kpos = c * (ppb * pg) + jax.lax.broadcasted_iota(
            jnp.int32, (1, ppb * pg), 1)
        s = jnp.where(kpos < length, s, _NEG)
        m2 = jnp.maximum(m, s.max(axis=1, keepdims=True))
        p_ = jnp.exp(s - m2)
        r = jnp.exp(m - m2)
        l2 = l * r + p_.sum(axis=1, keepdims=True)
        v = vbuf[slot]  # (Dv, ppb·pg)
        if quant:
            p_ = p_ * vsbuf[slot]  # fold v scales into the prob slab
            v = v.astype(q.dtype)
        acc2 = acc * r + jax.lax.dot_general(
            p_.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (G, Dv) += P·Vᵀ
        return m2, l2, acc2

    g, dv = q_ref.shape[2], o_ref.shape[3]
    m0 = jnp.full((g, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    acc0 = jnp.zeros((g, dv), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _paged_kernel_v3(packed_ref, *refs, scale, pg, ppb, softcap, quant):
    """One (b, h, c) grid step: software-pipelined page-chunk fold.

    v2 (``_paged_kernel``) walked all chunks of a (b, h) row inside one
    grid step with a 2-deep ``fori_loop`` double buffer — but with ~64 KB
    pages the per-page DMA issue latency dominates the transfer, and the
    FIRST chunk of every (b, h) program is fully exposed (at the serving
    page size a row often has only 1-2 chunks, so ~half the cache read
    sat behind un-overlapped DMA issue: 336 tok/s vs the dense kernel's
    803 at the 0.87B T=8192 steady row). v3 puts chunks in the GRID and
    pipelines ACROSS grid steps: every step starts its immediate
    successor's page copies (the successor may belong to the next
    (b, h) row — the whole table is in SMEM, so cross-row lookahead is
    free), waits its own, and folds. Only grid step 0's copies are ever
    exposed. Slot parity is positional (flat step index % 2), so the
    alternation survives DEAD steps (rows with fewer live chunks than
    the static grid depth): dead steps skip wait/compute but still
    prefetch their successor.
    """
    if quant:
        q_ref, k_ref, v_ref, ksc_ref, vsc_ref, o_ref = refs[:6]
        (kbuf, vbuf, ksbuf, vsbuf, sems, ssems,
         m_scr, l_scr, acc_scr) = refs[6:]
    else:
        q_ref, k_ref, v_ref, o_ref = refs[:4]
        kbuf, vbuf, sems, m_scr, l_scr, acc_scr = refs[4:]
    b, h, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb_, nh_, nc_ = (pl.num_programs(0), pl.num_programs(1),
                     pl.num_programs(2))
    mp = packed_ref.shape[1] - 1

    def nchunks_of(bi):
        length = packed_ref[bi, 0]
        npages = jnp.clip((length + pg - 1) // pg, 1, mp)
        return (npages + ppb - 1) // ppb

    def _copies(bi, hi, ci, slot):
        """Chunk ``ci`` of row (bi, hi) into buffer ``slot`` (dead page
        entries re-point at the row's last live page; masked later).
        Rebuilt identically to wait: start/wait pair per descriptor."""
        length = packed_ref[bi, 0]
        npages = jnp.clip((length + pg - 1) // pg, 1, mp)
        out = []
        for p in range(ppb):
            j = jnp.minimum(ci * ppb + p, npages - 1)
            pid = packed_ref[bi, 1 + j]
            lanes = pl.ds(p * pg, pg)
            out.append(pltpu.make_async_copy(
                k_ref.at[pid, hi], kbuf.at[slot, :, lanes],
                sems.at[slot, 0, p]))
            out.append(pltpu.make_async_copy(
                v_ref.at[pid, hi], vbuf.at[slot, :, lanes],
                sems.at[slot, 1, p]))
            if quant:
                out.append(pltpu.make_async_copy(
                    ksc_ref.at[pid, hi], ksbuf.at[slot, :, lanes],
                    ssems.at[slot, 0, p]))
                out.append(pltpu.make_async_copy(
                    vsc_ref.at[pid, hi], vsbuf.at[slot, :, lanes],
                    ssems.at[slot, 1, p]))
        return out

    flat = (b * nh_ + h) * nc_ + c
    slot = jax.lax.rem(flat, 2)
    nch = nchunks_of(b)
    live = c < nch

    @pl.when(flat == 0)
    def _first():  # nobody preceded grid step 0 — start its own copies
        for dma in _copies(b, h, c, slot):
            dma.start()

    # Start the immediate successor's copies iff that step is live (its
    # own wait happens there; dead steps neither start nor wait their
    # own, and the positional slot parity keeps the alternation intact).
    nf = flat + 1
    sc_ = jax.lax.rem(nf, nc_)
    sh = jax.lax.rem(nf // nc_, nh_)
    sb = nf // (nc_ * nh_)

    @pl.when((sb < nb_) & (sc_ < nchunks_of(jnp.minimum(sb, nb_ - 1))))
    def _prefetch():
        for dma in _copies(jnp.minimum(sb, nb_ - 1), sh, sc_, 1 - slot):
            dma.start()

    @pl.when(live)
    def _step():
        for dma in _copies(b, h, c, slot):
            dma.wait()

        @pl.when(c == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, _NEG)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        length = packed_ref[b, 0]
        q = q_ref[0, 0]  # (G, D)
        k = kbuf[slot]  # (D, ppb·pg) — int8 when quant
        if quant:
            k = k.astype(q.dtype)
        s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant:
            s = s * ksbuf[slot]
        s = s * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kpos = c * (ppb * pg) + jax.lax.broadcasted_iota(
            jnp.int32, (1, ppb * pg), 1)
        s = jnp.where(kpos < length, s, _NEG)
        m = m_scr[:]
        m2 = jnp.maximum(m, s.max(axis=1, keepdims=True))
        p_ = jnp.exp(s - m2)
        r = jnp.exp(m - m2)
        m_scr[:] = m2
        l_scr[:] = l_scr[:] * r + p_.sum(axis=1, keepdims=True)
        v = vbuf[slot]
        if quant:
            p_ = p_ * vsbuf[slot]
            v = v.astype(q.dtype)
        acc_scr[:] = acc_scr[:] * r + jax.lax.dot_general(
            p_.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(c == nch - 1)
        def _done():
            o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _paged_kernel_v4(packed_ref, *refs, scale, pg, ppb, softcap, quant):
    """One (b, h, c) grid step: fused-slab page DMA, pipelined like v3.

    v3 still issues ONE descriptor per page (2·ppb per chunk, 4·ppb
    quantized). At serving page sizes that is the bottleneck at scale:
    the big-conf (0.87B) T=8192 step makes 32 attention calls × 64 grid
    steps × 32 page copies ≈ 65k DMA issues per decoded token — the
    measured 336 tok/s vs the dense kernel's 803 works out to ~25 ns of
    issue cost per descriptor, pure overhead against 64 KB transfers.
    v4 collapses a chunk to ONE strided descriptor per pool when the
    chunk's live table entries are physically consecutive
    (``pool[pid0 : pid0+ppb, h]`` — the identity default and fresh
    free-list allocations are consecutive; recycled fragments fall back
    to v3's per-page copies, chosen per chunk at run time from the
    scalar-prefetched table). The VMEM slab is (ppb, D, pg) — pages
    stacked on a leading dim, matching the strided source — so QK/PV
    run as ppb small per-page matmuls around one shared online-softmax
    fold over the (G, ppb·pg) score scratch. Dead in-chunk entries on
    the fast path read in-bounds-but-stale pages (masked by position);
    the fast path is disabled when ``pid0 + ppb`` would overrun the
    pool.
    """
    if quant:
        q_ref, k_ref, v_ref, ksc_ref, vsc_ref, o_ref = refs[:6]
        (kbuf, vbuf, ksbuf, vsbuf, sems, ssems,
         m_scr, l_scr, acc_scr, s_scr) = refs[6:]
    else:
        q_ref, k_ref, v_ref, o_ref = refs[:4]
        kbuf, vbuf, sems, m_scr, l_scr, acc_scr, s_scr = refs[4:]
    b, h, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb_, nh_, nc_ = (pl.num_programs(0), pl.num_programs(1),
                     pl.num_programs(2))
    mp = packed_ref.shape[1] - 1
    np_total = k_ref.shape[0]

    def nchunks_of(bi):
        length = packed_ref[bi, 0]
        npages = jnp.clip((length + pg - 1) // pg, 1, mp)
        return (npages + ppb - 1) // ppb

    def _plan(bi, hi, ci, slot):
        """(contig, fast_copies, slow_copies) for chunk ``ci`` of row
        (bi, hi). ``contig`` is a pure function of the SMEM table, so
        the prefetching step and the waiting step always agree on which
        descriptor set was issued."""
        length = packed_ref[bi, 0]
        npages = jnp.clip((length + pg - 1) // pg, 1, mp)
        pid0 = packed_ref[bi, 1 + jnp.minimum(ci * ppb, mp - 1)]
        contig = pid0 + ppb <= np_total
        for p in range(1, ppb):
            j = ci * ppb + p
            pid = packed_ref[bi, 1 + jnp.minimum(j, mp - 1)]
            # Dead entries (j >= npages) don't constrain the fast path:
            # it reads whatever lives at pid0+p (in bounds, masked).
            contig = contig & ((j >= npages) | (pid == pid0 + p))
        fast = [
            pltpu.make_async_copy(k_ref.at[pl.ds(pid0, ppb), hi],
                                  kbuf.at[slot], sems.at[slot, 0, 0]),
            pltpu.make_async_copy(v_ref.at[pl.ds(pid0, ppb), hi],
                                  vbuf.at[slot], sems.at[slot, 1, 0]),
        ]
        slow = []
        for p in range(ppb):
            j = jnp.minimum(ci * ppb + p, npages - 1)
            pid = packed_ref[bi, 1 + j]
            slow.append(pltpu.make_async_copy(
                k_ref.at[pid, hi], kbuf.at[slot, p], sems.at[slot, 0, p]))
            slow.append(pltpu.make_async_copy(
                v_ref.at[pid, hi], vbuf.at[slot, p], sems.at[slot, 1, p]))
        if quant:
            fast.append(pltpu.make_async_copy(
                ksc_ref.at[pl.ds(pid0, ppb), hi], ksbuf.at[slot],
                ssems.at[slot, 0, 0]))
            fast.append(pltpu.make_async_copy(
                vsc_ref.at[pl.ds(pid0, ppb), hi], vsbuf.at[slot],
                ssems.at[slot, 1, 0]))
            for p in range(ppb):
                j = jnp.minimum(ci * ppb + p, npages - 1)
                pid = packed_ref[bi, 1 + j]
                slow.append(pltpu.make_async_copy(
                    ksc_ref.at[pid, hi], ksbuf.at[slot, p],
                    ssems.at[slot, 0, p]))
                slow.append(pltpu.make_async_copy(
                    vsc_ref.at[pid, hi], vsbuf.at[slot, p],
                    ssems.at[slot, 1, p]))
        return contig, fast, slow

    def _start(bi, hi, ci, slot, gate):
        contig, fast, slow = _plan(bi, hi, ci, slot)

        @pl.when(gate & contig)
        def _():
            for dma in fast:
                dma.start()

        @pl.when(gate & jnp.logical_not(contig))
        def _():
            for dma in slow:
                dma.start()

    def _wait(bi, hi, ci, slot):
        contig, fast, slow = _plan(bi, hi, ci, slot)

        @pl.when(contig)
        def _():
            for dma in fast:
                dma.wait()

        @pl.when(jnp.logical_not(contig))
        def _():
            for dma in slow:
                dma.wait()

    flat = (b * nh_ + h) * nc_ + c
    slot = jax.lax.rem(flat, 2)
    nch = nchunks_of(b)
    live = c < nch

    @pl.when(flat == 0)
    def _first():  # nobody preceded grid step 0 — start its own copies
        _start(b, h, c, slot, live)

    # Start the immediate successor's copies iff that step is live (its
    # own wait happens there; dead steps neither start nor wait their
    # own, and the positional slot parity keeps the alternation intact).
    nf = flat + 1
    sc_ = jax.lax.rem(nf, nc_)
    sh = jax.lax.rem(nf // nc_, nh_)
    sb = jnp.minimum(nf // (nc_ * nh_), nb_ - 1)
    _start(sb, sh, sc_, 1 - slot,
           (nf // (nc_ * nh_) < nb_) & (sc_ < nchunks_of(sb)))

    @pl.when(live)
    def _step():
        _wait(b, h, c, slot)

        @pl.when(c == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, _NEG)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        length = packed_ref[b, 0]
        q = q_ref[0, 0]  # (G, D)
        # Per-page QK into one (G, ppb·pg) f32 score scratch (the slab
        # is page-stacked, so the chunk matmul runs as ppb small ones).
        for p in range(ppb):
            k = kbuf[slot, p]  # (D, pg) — int8 when quant
            if quant:
                k = k.astype(q.dtype)
            sp = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            if quant:
                sp = sp * ksbuf[slot, p]  # (1, pg) per-token k scales
            s_scr[:, p * pg:(p + 1) * pg] = sp
        s = s_scr[:] * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kpos = c * (ppb * pg) + jax.lax.broadcasted_iota(
            jnp.int32, (1, ppb * pg), 1)
        s = jnp.where(kpos < length, s, _NEG)
        m = m_scr[:]
        m2 = jnp.maximum(m, s.max(axis=1, keepdims=True))
        p_ = jnp.exp(s - m2)
        r = jnp.exp(m - m2)
        m_scr[:] = m2
        l_scr[:] = l_scr[:] * r + p_.sum(axis=1, keepdims=True)
        pv = jnp.zeros_like(acc_scr)
        for p in range(ppb):
            # Unlike v2/v3 (dead entries clamp to the last LIVE page),
            # the fast path fills dead slab pages with whatever lives
            # at pid0+p — possibly non-finite garbage that 0-probability
            # alone can't kill (0·NaN = NaN), so zero dead columns of
            # BOTH operands by position.
            livec = (c * (ppb * pg) + p * pg + jax.lax.broadcasted_iota(
                jnp.int32, (1, pg), 1)) < length
            v = vbuf[slot, p]  # (Dv, pg)
            pp = p_[:, p * pg:(p + 1) * pg]
            if quant:
                pp = pp * vsbuf[slot, p]  # fold v scales per page
                v = v.astype(q.dtype)
            pp = jnp.where(livec, pp, 0.0)
            v = jnp.where(livec, v, jnp.zeros_like(v))
            pv = pv + jax.lax.dot_general(
                pp.astype(v.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (G, Dv) += P·Vᵀ
        acc_scr[:] = acc_scr[:] * r + pv

        @pl.when(c == nch - 1)
        def _done():
            o_ref[0, 0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def decode_attention_paged(q, k_pool, v_pool, page_table, lengths, *,
                           k_scale=None, v_scale=None,
                           softmax_scale: Optional[float] = None,
                           logit_softcap: Optional[float] = None,
                           pages_per_block: Optional[int] = None,
                           interpret: Optional[bool] = None,
                           pipelined=False):
    """Single-token attention over a paged TRANSPOSED decode cache.

    q: (B, Hkv, G, D); pools: (NP, Hkv, D, pg) / (NP, Hkv, Dv, pg)
    (+ (NP, Hkv, pg) scales for int8); page_table: (B, MP) int32 pool
    ids per logical page; lengths: (B,) int32 live positions. The table
    and lengths ride as scalar-prefetch args; pages gather via manual
    per-page DMA from the HBM-resident pools (see module docstring) —
    no gathered view is ever materialized, unallocated table tail
    entries are never dereferenced, and each row reads only its live
    prefix. ``pages_per_block``: pages per compute chunk (default
    auto-sizes toward ~1 MB K slabs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(q.shape[-1])
    pg = k_pool.shape[3]
    if not interpret and pg % 128 != 0:
        # Each page DMAs into lane offset p·pg of the VMEM slab, and
        # Mosaic requires memref slices along the lane dim to be
        # 128-aligned (measured fault: "Slice shape along dimension 3
        # must be aligned to tiling (128)"). Production serving pages
        # (256) satisfy this; tiny test pages cannot run compiled.
        raise ValueError(
            f"compiled paged flash-decoding kernel requires "
            f"kv_page_size % 128 == 0 (VMEM lane tiling), got {pg}; "
            f"use the XLA page-scan (flash_decode=False) for smaller "
            f"pages")
    mp = page_table.shape[1]
    if pages_per_block is None:
        per_page = k_pool.shape[2] * pg * k_pool.dtype.itemsize
        pages_per_block = max(1, min(mp, (1 << 20) // per_page))
    ppb = min(mp, pages_per_block)

    # One scalar-prefetch ref: lengths and table PACKED as (B, 1 + MP);
    # in-kernel, lengths live at column 0.
    packed = jnp.concatenate(
        [jnp.asarray(lengths, jnp.int32)[:, None],
         jnp.asarray(page_table, jnp.int32)], axis=1)

    bsz, hkv, g, d = q.shape
    dv = v_pool.shape[2]
    quant = k_scale is not None

    qspec = pl.BlockSpec((1, 1, g, d), lambda b, h, lens: (b, h, 0, 0))
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [qspec, hbm, hbm]
    args = (q, k_pool, v_pool)
    scratch = [
        pltpu.VMEM((2, d, ppb * pg), k_pool.dtype),
        pltpu.VMEM((2, dv, ppb * pg), v_pool.dtype),
        pltpu.SemaphoreType.DMA((2, 2, ppb)),
    ]
    if quant:
        # Scale views (NP, Hkv, 1, pg): key axis on LANES, pg-aligned
        # slab offsets (see the dense variant's scale-layout note).
        in_specs += [hbm, hbm]
        args += (k_scale[:, :, None, :], v_scale[:, :, None, :])
        scratch += [
            pltpu.VMEM((2, 1, ppb * pg), jnp.float32),
            pltpu.VMEM((2, 1, ppb * pg), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, ppb)),
        ]
        # _paged_kernel unpacks (kbuf, vbuf, ksbuf, vsbuf, sems, ssems).
        scratch = [scratch[0], scratch[1], scratch[3], scratch[4],
                   scratch[2], scratch[5]]

    if pipelined == "v4":
        # v4: v3's cross-step pipelining + fused-slab DMA (one strided
        # descriptor per pool when the chunk's pages are consecutive in
        # the pool; per-page copies otherwise — see _paged_kernel_v4).
        nc = -(-mp // ppb)
        scratch = [
            pltpu.VMEM((2, ppb, d, pg), k_pool.dtype),
            pltpu.VMEM((2, ppb, dv, pg), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2, ppb)),
        ]
        if quant:
            scratch = scratch[:2] + [
                pltpu.VMEM((2, ppb, 1, pg), jnp.float32),
                pltpu.VMEM((2, ppb, 1, pg), jnp.float32),
                scratch[2],
                pltpu.SemaphoreType.DMA((2, 2, ppb)),
            ]
        scratch += [
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, dv), jnp.float32),
            pltpu.VMEM((g, ppb * pg), jnp.float32),
        ]
        return pl.pallas_call(
            functools.partial(_paged_kernel_v4, scale=softmax_scale,
                              pg=pg, ppb=ppb, softcap=logit_softcap,
                              quant=quant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, hkv, nc),
                in_specs=[pl.BlockSpec((1, 1, g, d),
                                       lambda b, h, c, lens: (b, h, 0, 0))]
                + in_specs[1:],
                out_specs=pl.BlockSpec((1, 1, g, dv),
                                       lambda b, h, c, lens: (b, h, 0, 0)),
                scratch_shapes=scratch),
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, g, dv), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary",
                                     "arbitrary")),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(packed, *args)

    if pipelined:
        # v3: chunks in the grid, cross-step DMA pipelining (see
        # _paged_kernel_v3). The online-softmax carry moves to VMEM
        # scratch (persists across grid steps); ALL axes are
        # "arbitrary" — the successor-prefetch chain requires strict
        # sequential grid order.
        nc = -(-mp // ppb)
        scratch = scratch + [
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, 1), jnp.float32),
            pltpu.VMEM((g, dv), jnp.float32),
        ]
        return pl.pallas_call(
            functools.partial(_paged_kernel_v3, scale=softmax_scale,
                              pg=pg, ppb=ppb, softcap=logit_softcap,
                              quant=quant),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(bsz, hkv, nc),
                in_specs=[pl.BlockSpec((1, 1, g, d),
                                       lambda b, h, c, lens: (b, h, 0, 0))]
                + in_specs[1:],
                out_specs=pl.BlockSpec((1, 1, g, dv),
                                       lambda b, h, c, lens: (b, h, 0, 0)),
                scratch_shapes=scratch),
            out_shape=jax.ShapeDtypeStruct((bsz, hkv, g, dv), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary",
                                     "arbitrary")),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(packed, *args)

    return pl.pallas_call(
        functools.partial(_paged_kernel, scale=softmax_scale, pg=pg,
                          ppb=ppb, softcap=logit_softcap, quant=quant),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, hkv),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, g, dv),
                                   lambda b, h, lens: (b, h, 0, 0)),
            scratch_shapes=scratch),
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, g, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(packed, *args)
