"""Multi-head attention with five similarity types.

Reference: ku/layer_ext/attention.py:19-160. Similarity types (constants at
:12-16): ``diff_abs``/``plain``/``scaled``/``general``/``additive``
(:120-136). Per-head split at :115-117, output projection ``W_multi_head``
at :87-90,144.

Deviations from the reference, all documented intended-behavior fixes:
- ``diff_abs`` (:121) and ``additive`` (:133-135) as written only
  shape-check when seq_len == head_dim; we implement the intended pairwise
  forms (mean-abs-difference kernel and Bahdanau-style additive scores).
- The mask input M is accepted but its use is commented out in the
  reference (:121-135); ``use_mask=True`` opts into the commented-out
  ``softmax(scores)·M`` semantics, default False matches reference behavior.
- ``dropout_rate`` is stored but unused in the reference call; we apply it
  to attention probabilities when ``deterministic=False`` (set 0.0 for
  exact parity).

The scaled path is the standard softmax(QKᵀ/√d_k)V — on TPU, XLA fuses this
chain; a Pallas flash-attention kernel for long sequences lives in
``ku.pallas.flash_attention`` and can be enabled with ``use_flash=True``.
"""

from __future__ import annotations

import math
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

SIMILARITY_TYPE_DIFF_ABS = "diff_abs"
SIMILARITY_TYPE_PLAIN = "plain"
SIMILARITY_TYPE_SCALED = "scaled"
SIMILARITY_TYPE_GENERAL = "general"
SIMILARITY_TYPE_ADDITIVE = "additive"

_SIMILARITY_TYPES = (
    SIMILARITY_TYPE_DIFF_ABS,
    SIMILARITY_TYPE_PLAIN,
    SIMILARITY_TYPE_SCALED,
    SIMILARITY_TYPE_GENERAL,
    SIMILARITY_TYPE_ADDITIVE,
)


def apply_rope(x, pos, base: float = 10000.0):
    """Rotate head vectors by absolute positions (RoPE, GPT-NeoX
    rotate-half convention): the first/second halves of each head dim
    form 2-D planes rotated by pos·baseⁱ angles, so dot products depend
    on relative position only. ``x``: (B, H, L, D) with D even;
    ``pos``: (L,) shared or (B, L) per-row int positions."""
    d = x.shape[-1]
    if d % 2:
        raise ValueError(f"rope needs an even head dim, got {d}")
    pos = jnp.asarray(pos)
    if pos.ndim not in (1, 2):
        raise ValueError(f"pos must be (L,) or (B, L), got shape "
                         f"{pos.shape}")
    half = d // 2
    freq = base ** (-jnp.arange(half, dtype=jnp.float32) / half)
    ang = pos[..., None].astype(jnp.float32) * freq
    ang = ang[None, None] if ang.ndim == 2 else ang[:, None]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """MHA over ``inputs = [Q, K, V, M]`` (reference attention.py:19-160)."""

    num_head: int
    d_output: int
    dropout_rate: float = 0.0
    similarity_type: str = SIMILARITY_TYPE_SCALED
    use_mask: bool = False
    # use_flash applies to the 'scaled' no-mask path only, and ONLY when
    # attention-probability dropout is inactive (dropout_rate == 0 or
    # deterministic) — the flash kernel never materializes the N² probs
    # to drop. With dropout_rate > 0 TRAINING steps take the dense path
    # (full score matrix!); set dropout_rate=0.0 for long sequences.
    use_flash: bool = False
    # Extensions beyond the reference (which is full-bidirectional only):
    # causal autoregressive masking and Mistral-style sliding-window
    # attention (window most recent positions; requires causal). Both are
    # honored by the dense AND flash paths identically. Packed sequences:
    # __call__(..., segment_ids=(B, N) int array or (seg_q, seg_k) pair)
    # masks attention across segment boundaries on both paths.
    causal: bool = False
    window: Optional[int] = None
    # Grouped-query attention: project K/V to num_kv_head heads
    # (num_kv_head=1 is MQA); each query head attends its group's KV head.
    # None = num_head (standard MHA). Shrinks the K/V projections and the
    # KV cache by num_head/num_kv_head.
    num_kv_head: Optional[int] = None
    # Autoregressive serving: maximum sequence length of the KV cache
    # allocated when __call__ runs with decode=True ('cache' collection
    # mutable; length-1 calls decode one token, length-L calls PREFILL
    # the prompt in one dispatch). Requires causal=True. With a sliding
    # ``window`` the cache is instead a RING BUFFER of
    # global_prefix + window slots (StreamingLLM: pinned attention-sink
    # keys + rolling window) — decode length is UNBOUNDED at constant
    # memory and max_decode_len is ignored.
    max_decode_len: Optional[int] = None
    # Attention sinks (StreamingLLM): the first global_prefix key
    # positions escape the sliding window (causality still applies).
    # Requires window; honored by the dense path and the ring-buffer
    # decode. For the flash path express sinks via block_mask
    # (make_block_mask(global_prefix=...)) — the banded flash kernel has
    # no sink escape.
    global_prefix: int = 0
    # Quantized KV cache for serving: 'int8' stores cached K/V as int8
    # with per-token per-head symmetric scales ((B, H_kv, slots) f32) —
    # halves the cache HBM footprint and read traffic (the long-context
    # decode step is cache-read-bound) at ~0.5% attention error; the
    # dequantize multiply fuses into the cache read. Composes with GQA,
    # the ring buffer, and prefill. None = cache in the K/V dtype.
    kv_cache_dtype: Optional[str] = None
    # PAGED KV cache (vLLM-style block tables, TPU-native): with
    # kv_page_size=P the decode cache becomes a POOL of fixed-size pages
    # (kv_num_pages, H_kv, P, head_dim) shared by every sequence, and
    # each sequence reads/writes its slots THROUGH a per-row page table
    # ((B, ceil(max_decode_len/P)) int32 page ids in the 'cache'
    # collection). Defaults reproduce dense semantics exactly: the table
    # initializes to the identity layout (row b owns pages b·mp..b·mp+mp-1)
    # and kv_num_pages defaults to B·mp. A serving scheduler
    # (ku.nn.ContinuousBatcher) can instead size the pool by EXPECTED
    # length (kv_num_pages < B·mp), overwrite the table values between
    # dispatches, and recycle pages as requests finish — page 0 is
    # conventionally reserved as a scratch target for rows whose writes
    # must be discarded. Composes with GQA, int8 quantization, RoPE,
    # ragged prefill, and the flash prefill path; not with ring caches
    # (window), and paged caches are NOT batch-replicable
    # (fork_cache/beam_search reject them: pool leaves aren't batch-first).
    kv_page_size: Optional[int] = None
    kv_num_pages: Optional[int] = None
    # Logit soft-capping (Gemma-2-style): scores become
    # cap·tanh(score/cap) after scaling, before masking/softmax —
    # bounded logits for training stability. Honored by the dense,
    # flash (fwd + both Pallas backwards + XLA fallback), and all
    # decode paths; block-sparse attention does not support it.
    logit_softcap: Optional[float] = None
    # Rotary position embedding (RoPE, GPT-NeoX rotate-half convention):
    # q/k head vectors are rotated by their ABSOLUTE positions before
    # the dot product, making scores a function of relative position
    # only. Pure preprocessing — composes with every path (dense, flash,
    # block-sparse, decode: keys are rotated before caching, so cached
    # pages never need re-rotation; the ring buffer keeps absolute
    # rotations). Requires the scaled similarity and an even head dim.
    rope: bool = False
    rope_base: float = 10000.0
    # Per-token decode reads (L==1 with a decode cache) through the
    # Pallas flash-decoding kernel (ku/pallas/decode_attention.py): the
    # cache streams through VMEM once per step — int8 caches stream AS
    # int8 (the XLA path's dequant convert materializes a full-precision
    # copy in HBM every step), paged pools gather through the block
    # table in the DMA engine's addressing, and each row reads only its
    # live prefix (the XLA einsum always reads all max_decode_len
    # slots). None = auto: on the TPU backend, the kernel for paged
    # pools and for dense/int8 caches allocated >= 1024 slots, XLA
    # otherwise — the v5e A/Bs (BASELINE.md round 4): at small caches
    # the per-dispatch kernel fixed cost loses to the fused masked
    # einsum (toy d512 T=512: 28.5k vs 31.9k tok/s) while at real sizes
    # the kernel wins (0.87B conf T=2048: 1,434 vs 1,284; ragged T=8192:
    # 13.5k vs 9.7k; paged T=512: 61.8k vs 44.9k). True forces the
    # kernel (interpret mode off-TPU — tests); False forces the XLA
    # paths. Ring caches (window) always use XLA.
    flash_decode: Optional[bool] = None
    # Weight-only int8 serving quantization: the four projection
    # kernels become int8 params + per-output-channel f32 scales
    # ("<name>_scale"), produced from trained float params by
    # ku.nn.quant.quantize_weights(params, template). Halves the
    # weight-read HBM traffic of bf16 decode (the params-dominant term
    # at moderate cache lengths). Similarity-specific weights
    # (W_gen_S/W_add_S_*) stay float. "w8a8" additionally quantizes
    # activations per token at run time (dynamic symmetric int8) so
    # projections run as int8×int8 MXU matmuls — lossy; gate quality
    # before serving with it (ku/nn/quant.py::int8_act_matmul).
    quant_weights: Union[bool, str] = False  # False | True | "w8a8"

    def _cap(self, s):
        """cap·tanh(s/cap) when logit_softcap is set (identity otherwise);
        applied after scaling, before masking."""
        if self.logit_softcap is None:
            return s
        return self.logit_softcap * jnp.tanh(s / self.logit_softcap)

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True,
                 decode: bool = False, segment_ids=None, block_mask=None,
                 prompt_lengths=None):
        if self.similarity_type not in _SIMILARITY_TYPES:
            raise ValueError(f"similarity_type {self.similarity_type!r} is not valid.")
        if self.window is not None and not self.causal:
            raise ValueError("window requires causal=True")
        if block_mask is not None:
            # Block-sparse attention (ku/pallas/sparse_attention.py): the
            # pattern — causality included — is defined by the BlockMask;
            # the layer's causal flag must agree and its window must be
            # unset (the mask's window governs).
            if (self.similarity_type != SIMILARITY_TYPE_SCALED
                    or self.use_mask or decode or segment_ids is not None):
                raise ValueError("block_mask supports the scaled no-mask "
                                 "non-decode path without segment_ids")
            if (self.causal != block_mask.causal or self.window is not None
                    or self.global_prefix):
                raise ValueError(
                    "block_mask pattern conflicts with the layer: set "
                    "causal on the mask (and window/global_prefix only "
                    "on the mask)")
            if self.dropout_rate > 0.0 and not deterministic:
                raise ValueError(
                    "block_mask cannot apply attention-probability "
                    "dropout (no N² probs exist to drop) — set "
                    "dropout_rate=0.0")
        if self.global_prefix:
            if self.window is None:
                raise ValueError("global_prefix (attention sinks) is an "
                                 "escape from a sliding window — set "
                                 "window too")
            if self.use_flash:
                raise ValueError("the flash window kernel has no sink "
                                 "escape — express global_prefix via "
                                 "block_mask instead")
        if decode and not self.causal:
            raise ValueError("decode=True requires causal=True")
        if decode and self.max_decode_len is None and self.window is None:
            raise ValueError("decode=True requires max_decode_len (or a "
                             "sliding window for the ring-buffer cache)")
        if decode and (self.similarity_type != SIMILARITY_TYPE_SCALED
                       or self.use_mask):
            raise ValueError("decode supports the scaled no-mask path")
        if decode and segment_ids is not None:
            raise ValueError("decode does not support segment_ids")
        if self.kv_cache_dtype not in (None, "int8"):
            raise ValueError("kv_cache_dtype must be None or 'int8', got "
                             f"{self.kv_cache_dtype!r}")
        if self.kv_page_size is not None:
            if self.kv_page_size < 1:
                raise ValueError("kv_page_size must be >= 1")
            if self.kv_num_pages is not None and self.kv_num_pages < 1:
                raise ValueError("kv_num_pages must be >= 1")
            if self.window is not None:
                raise ValueError("paged caches do not compose with ring "
                                 "caches (window) — pick one layout")
            if self.max_decode_len is None:
                raise ValueError("kv_page_size requires max_decode_len")
        elif self.kv_num_pages is not None:
            raise ValueError("kv_num_pages requires kv_page_size")
        if self.rope and (self.similarity_type != SIMILARITY_TYPE_SCALED
                          or self.use_mask):
            raise ValueError("rope requires the scaled no-mask path")
        if self.logit_softcap is not None:
            if self.logit_softcap <= 0.0:
                raise ValueError("logit_softcap must be positive, got "
                                 f"{self.logit_softcap}")
            if (self.similarity_type != SIMILARITY_TYPE_SCALED
                    or self.use_mask):
                raise ValueError("logit_softcap requires the scaled "
                                 "no-mask path")
            if block_mask is not None:
                raise ValueError("the block-sparse kernel has no "
                                 "logit_softcap")
        if prompt_lengths is not None:
            # Ragged (continuous-batching) prefill: per-sequence true
            # prompt lengths for a right-padded chunk — each sequence's
            # cache_index advances by its own length, so decode resumes
            # at the right slot per sequence and later overwrites the
            # padding slots.
            if not decode:
                raise ValueError("prompt_lengths is a decode-prefill "
                                 "argument")
            if self.window is not None:
                raise ValueError("ragged prefill is not supported on "
                                 "ring caches (per-sequence ring layouts "
                                 "diverge) — pad to equal lengths")
        q, k, v = inputs[0], inputs[1], inputs[2]
        m = inputs[3] if len(inputs) > 3 else None

        d_k, d_v = k.shape[-1], v.shape[-1]
        h = self.num_head
        hkv = self.num_kv_head if self.num_kv_head is not None else h
        assert d_k % h == 0 and d_v % h == 0
        assert h % hkv == 0, (h, hkv)
        d_k_h, d_v_h = d_k // h, d_v // h

        init = nn.initializers.truncated_normal(stddev=0.02)
        if self.quant_weights:
            # Weight-only int8 serving quantization (per-output-channel
            # symmetric; see ku/nn/quant.py): each projection holds an
            # int8 kernel + f32 column scales produced from trained
            # float params by quantize_weights. The int8 operand streams
            # straight into the matmul (XLA fuses the convert into the
            # dot's weight read — half the HBM traffic of bf16) and the
            # scale multiplies the OUTPUT column, which is exact:
            # x @ (Q·s) == (x @ Q) · s.
            def wparam(name, shape):
                wq8 = self.param(name, nn.initializers.zeros_init(),
                                 shape, jnp.int8)
                sc = self.param(name + "_scale",
                                nn.initializers.ones_init(),
                                (shape[-1],), jnp.float32)
                if self.quant_weights == "w8a8":
                    # W8A8: per-token dynamic int8 activations feed an
                    # int8×int8→int32 MXU dot (no weight convert on the
                    # hot path; lossy — see ku/nn/quant.py).
                    from ku.nn.quant import int8_act_matmul
                    return lambda x: int8_act_matmul(x, wq8, sc)
                return lambda x: (x @ wq8.astype(x.dtype)
                                  ) * sc.astype(x.dtype)
        else:
            def wparam(name, shape):
                w = self.param(name, init, shape)
                return lambda x: x @ w

        proj_q = wparam("W_Q", (d_k, d_k))
        proj_k = wparam("W_K", (d_k, d_k_h * hkv))
        proj_v = wparam("W_V", (d_v, d_v_h * hkv))
        proj_o = wparam("W_multi_head", (d_v, self.d_output))

        def split_heads(x, dh, nh=h):
            b, n = x.shape[0], x.shape[1]
            return jnp.transpose(jnp.reshape(x, (b, n, nh, dh)), (0, 2, 1, 3))

        q_h = split_heads(proj_q(q), d_k_h)
        k_h = split_heads(proj_k(k), d_k_h, hkv)
        v_h = split_heads(proj_v(v), d_v_h, hkv)

        if self.rope:
            if d_k_h % 2:
                raise ValueError(f"rope needs an even head dim, got "
                                 f"{d_k_h}")
            if not decode:
                # Self-attention positions 0..n-1 on both sides; the
                # decode branch rotates by global cache positions below.
                q_h = apply_rope(q_h, jnp.arange(q_h.shape[2]),
                                 self.rope_base)
                k_h = apply_rope(k_h, jnp.arange(k_h.shape[2]),
                                 self.rope_base)

        if decode:
            # Autoregressive KV-cache serving. L == 1: append this token's
            # K/V (h_kv heads — GQA shrinks the cache num_head/num_kv_head
            # ×) and attend the query against the filled prefix. Grouped
            # einsums read the shared KV page without materializing the
            # head repeat. With a sliding window the cache is a RING
            # BUFFER of global_prefix + window slots: sink positions are
            # pinned, later tokens overwrite the oldest in-window slot,
            # and a per-slot global-position array drives the mask —
            # decode length is unbounded at constant memory (StreamingLLM).
            #
            # L > 1: PREFILL — process the whole prompt chunk in ONE
            # dispatch (full-MXU batched matmuls instead of L per-token
            # dispatches) and leave the cache exactly as L single-token
            # steps would. Dense cache: appends at cache_index, so
            # chunked prefill composes (scores run against the full
            # cache page — size prompt chunks accordingly). Ring cache:
            # attention runs over the raw prompt (a window neighbor may
            # occupy a slot that a LATER prompt token overwrites, so the
            # final cache can't serve the prompt's own queries) and the
            # surviving slot contents are gathered in closed form;
            # REQUIRES an empty cache (cache_index == 0) — it overwrites
            # rather than merges.
            bsz, L = q.shape[0], q.shape[1]
            gp, win = self.global_prefix, self.window
            ring = win is not None
            paged = self.kv_page_size is not None
            if paged:
                # Pool layout: mp pages of pg slots per sequence; the
                # attended view is mp·pg >= max_decode_len slots (the
                # shifted-causal masks below hide the round-up tail).
                pg = self.kv_page_size
                mp = -(-self.max_decode_len // pg)
                n_pages = (self.kv_num_pages if self.kv_num_pages
                           is not None else bsz * mp)
                mx = mp * pg
            else:
                mx = gp + win if ring else self.max_decode_len
            qdt = self.kv_cache_dtype
            has_cache = self.has_variable("cache", "cached_key")
            if prompt_lengths is not None:
                if L == 1:
                    raise ValueError(
                        "prompt_lengths requires a chunk of width > 1 "
                        "(per-token steps always advance each sequence "
                        "by 1)")
                prompt_lengths = jnp.asarray(prompt_lengths, jnp.int32)
                if prompt_lengths.shape != (bsz,):
                    raise ValueError(
                        f"prompt_lengths must have shape ({bsz},), got "
                        f"{prompt_lengths.shape}")
            if paged:
                # Page pool + per-row table. The identity default makes
                # an untouched table behave exactly like the dense cache;
                # a scheduler overwrites the values between dispatches.
                if (n_pages < bsz * mp
                        and not self.has_variable("cache", "page_table")):
                    import warnings

                    warnings.warn(
                        f"paged cache: kv_num_pages={n_pages} < "
                        f"B*pages-per-seq={bsz * mp}, so the default "
                        "identity page_table ALIASES pool pages (clamped)"
                        " — wrong attention unless a scheduler (e.g. "
                        "ku.nn.ContinuousBatcher) overwrites the table "
                        "values before real use", stacklevel=2)
                # TRANSPOSED pool (slot axis MINOR): lane-pad-free in
                # HBM for any head dim, and the layout the flash-
                # decoding kernel's operand constraint resolves to
                # without a relayout copy (see decode_attention.py's
                # module docstring for the measured ×2-padding failure
                # of the (…, pg, D) form at D=64).
                ck = self.variable("cache", "pages_k", jnp.zeros,
                                   (n_pages, hkv, d_k_h, pg),
                                   jnp.int8 if qdt else k_h.dtype)
                cv = self.variable("cache", "pages_v", jnp.zeros,
                                   (n_pages, hkv, d_v_h, pg),
                                   jnp.int8 if qdt else v_h.dtype)
                tbl = self.variable(
                    "cache", "page_table",
                    lambda: jnp.minimum(
                        jnp.arange(bsz)[:, None] * mp
                        + jnp.arange(mp)[None], n_pages - 1
                    ).astype(jnp.int32))
            else:
                # Dense cache TRANSPOSED (slot axis MINOR — pad-free
                # lanes at any head dim; the ring cache keeps slots on
                # axis 2: its position bookkeeping gathers along slots
                # and it never feeds the flash-decoding kernel).
                kshape = ((bsz, hkv, mx, d_k_h) if ring
                          else (bsz, hkv, d_k_h, mx))
                vshape = ((bsz, hkv, mx, d_v_h) if ring
                          else (bsz, hkv, d_v_h, mx))
                ck = self.variable("cache", "cached_key", jnp.zeros,
                                   kshape, jnp.int8 if qdt else k_h.dtype)
                cv = self.variable("cache", "cached_value", jnp.zeros,
                                   vshape, jnp.int8 if qdt else v_h.dtype)
            # Per-sequence fill index: ragged prompts (prompt_lengths)
            # and continuous batching leave each sequence at its own
            # position; the uniform case is just the equal-values
            # special case.
            ci = self.variable("cache", "cache_index",
                               lambda: jnp.zeros((bsz,), jnp.int32))
            idx = ci.value  # (B,)
            if self.rope:
                # Rotate by GLOBAL positions BEFORE quantization/caching
                # — cached pages then never need re-rotation.
                gpos = idx[:, None] + jnp.arange(L)[None]
                q_h = apply_rope(q_h, gpos, self.rope_base)
                k_h = apply_rope(k_h, gpos, self.rope_base)
            if paged:
                # Gathered page view in the TRANSPOSED convention
                # (B, hkv, d, mx): downstream prefill reads consume it
                # with slot-minor einsum subscripts.
                def _gather(pool):
                    g = pool[tbl.value]  # (B, mp, hkv, d, pg)
                    return jnp.transpose(g, (0, 2, 3, 1, 4)).reshape(
                        bsz, hkv, g.shape[3], mx)

                def _gather_s(scales):
                    g = scales[tbl.value]  # (B, mp, hkv, pg)
                    return jnp.transpose(g, (0, 2, 1, 3)).reshape(
                        bsz, hkv, mx)

            if qdt:
                ksc = self.variable(
                    "cache", "key_scale_pages" if paged else "key_scale",
                    jnp.zeros,
                    (n_pages, hkv, pg) if paged else (bsz, hkv, mx),
                    jnp.float32)
                vsc = self.variable(
                    "cache",
                    "value_scale_pages" if paged else "value_scale",
                    jnp.zeros,
                    (n_pages, hkv, pg) if paged else (bsz, hkv, mx),
                    jnp.float32)

                def _quant(x):
                    # Symmetric per-token per-head int8: scale so the
                    # max |element| of each (token, head) vector maps
                    # to 127.
                    s = jnp.maximum(
                        jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-12)
                    qv = jnp.clip(jnp.round(x / s[..., None]),
                                  -127, 127).astype(jnp.int8)
                    return qv, s.astype(jnp.float32)

                # int8 × f32-scale dequant promotes to f32; cast back to
                # the model's K/V dtype so a bf16 model's attention (and
                # everything downstream) stays bf16 — the cast is applied
                # identically at quant time and at every read, keeping
                # prefill bit-identical to per-token steps.
                kv_dt = k_h.dtype
                k_st, k_s = _quant(k_h)
                v_st, v_s = _quant(v_h)
                # Keep decode math identical whether a token was cached
                # by prefill or per-token steps: attention always sees
                # the DEQUANTIZED values.
                k_h = (k_st * k_s[..., None]).astype(kv_dt)
                v_h = (v_st * v_s[..., None]).astype(kv_dt)

                if paged:
                    def _read_k():
                        return (_gather(ck.value)
                                * _gather_s(ksc.value)[:, :, None, :]
                                ).astype(kv_dt)

                    def _read_v():
                        return (_gather(cv.value)
                                * _gather_s(vsc.value)[:, :, None, :]
                                ).astype(kv_dt)
                elif ring:
                    def _read_k():
                        return (ck.value
                                * ksc.value[..., None]).astype(kv_dt)

                    def _read_v():
                        return (cv.value
                                * vsc.value[..., None]).astype(kv_dt)
                else:
                    # Transposed dense cache: scales broadcast along
                    # the minor slot axis.
                    def _read_k():
                        return (ck.value
                                * ksc.value[:, :, None, :]).astype(kv_dt)

                    def _read_v():
                        return (cv.value
                                * vsc.value[:, :, None, :]).astype(kv_dt)
            else:
                k_st, v_st = k_h, v_h

                if paged:
                    def _read_k():
                        return _gather(ck.value)

                    def _read_v():
                        return _gather(cv.value)
                else:
                    def _read_k():
                        return ck.value

                    def _read_v():
                        return cv.value
            group = h // hkv
            qg = q_h.reshape(bsz, hkv, group, L, d_k_h)
            # Per-sequence cache writes: vmap a dynamic_update_slice over
            # the batch so every sequence lands at its own index. The
            # update chunk arrives logical (hkv, L, d) per row; the
            # transposed dense cache stores it slot-minor.
            if ring:
                upd4 = jax.vmap(
                    lambda c, u, i: jax.lax.dynamic_update_slice(
                        c, u, (0, i, 0)))
            else:
                upd4 = jax.vmap(
                    lambda c, u, i: jax.lax.dynamic_update_slice(
                        c, u.swapaxes(1, 2), (0, 0, i)))
            upd3 = jax.vmap(
                lambda c, u, i: jax.lax.dynamic_update_slice(c, u, (0, i)))
            if paged:
                # Paged writes: scatter each (row, position) through the
                # page table — pool[table[b, pos//pg], :, pos%pg] = upd.
                # posn is (B, L) GLOBAL positions; right-padded ragged
                # chunks write garbage past each row's true length into
                # the row's OWN pages (invisible below cache_index, then
                # overwritten), exactly like the dense layout.
                def _store(pool, upd, posn):  # upd (B, hkv, L, d)
                    pid = jnp.take_along_axis(tbl.value, posn // pg,
                                              axis=1)
                    # Advanced indices at axes 0 and 3 broadcast to a
                    # leading (B, L); values land as (B, L, hkv, d) —
                    # the slot axis is the pool's MINOR dim.
                    return pool.at[pid, :, :, posn % pg].set(
                        jnp.transpose(upd, (0, 2, 1, 3)))

                def _store_s(scales, upd, posn):  # upd (B, hkv, L)
                    pid = jnp.take_along_axis(tbl.value, posn // pg,
                                              axis=1)
                    return scales.at[pid, :, posn % pg].set(
                        jnp.transpose(upd, (0, 2, 1)))

                # DECODE-STEP writes (L == 1): B unrolled
                # dynamic_update_slices instead of the general scatter
                # above. The (axes 0, 3) advanced-index scatter on the
                # pool goes through XLA's slow scatter path inside the
                # decode scan — round-5 measurement: the paged step ran
                # ~12.6 ms/step over dense at identical bytes while the
                # micro-benched read kernel matched dense, i.e. the
                # WRITE was re-materializing the multi-GB pool. DUS into
                # the scan carry stays in place. Prefill (L > 1) keeps
                # the scatter: one-time cost, many positions per row.
                def _store1(pool, upd, posn):  # upd (B, hkv, 1, d)
                    pid = jnp.take_along_axis(
                        tbl.value, (posn // pg)[:, None], axis=1)[:, 0]
                    off = posn % pg
                    for b in range(bsz):
                        blk = jnp.transpose(upd[b:b + 1], (0, 1, 3, 2))
                        pool = jax.lax.dynamic_update_slice(
                            pool, blk, (pid[b], 0, 0, off[b]))
                    return pool

                def _store1_s(scales, upd, posn):  # upd (B, hkv, 1)
                    pid = jnp.take_along_axis(
                        tbl.value, (posn // pg)[:, None], axis=1)[:, 0]
                    off = posn % pg
                    for b in range(bsz):
                        scales = jax.lax.dynamic_update_slice(
                            scales, upd[b:b + 1], (pid[b], 0, off[b]))
                    return scales
            if ring:
                cpos = self.variable(
                    "cache", "cache_pos",
                    lambda: jnp.full((bsz, mx), -1, jnp.int32))
            if L > 1 and ring:
                # Ring prefill: mask over the prompt itself, then gather
                # each slot's last-written prompt position (sinks: slot s
                # holds position s; ring slots hold the largest
                # gp + (s-gp) + k·win below L).
                if has_cache:
                    raise ValueError(
                        "ring-cache prefill requires an EMPTY cache (it "
                        "overwrites rather than merges) — chunked "
                        "prefill is dense-cache only")
                if self.use_flash:
                    # gp == 0 here (use_flash + global_prefix is
                    # rejected at validation): the prompt pass IS banded
                    # flash attention — O(L·window) work and memory.
                    from ku.pallas.flash_attention import (
                        flash_attention_pallas)

                    head = flash_attention_pallas(
                        q_h, k_h, v_h, softmax_scale=1.0 / math.sqrt(d_k),
                        causal=True, window=win,
                        logit_softcap=self.logit_softcap)
                else:
                    q_pos = jnp.arange(L)[:, None]
                    k_pos = jnp.arange(L)[None, :]
                    keep = (k_pos <= q_pos) & ((q_pos - k_pos < win)
                                               | (k_pos < gp))
                    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k_h
                                   ) / math.sqrt(d_k)
                    s = self._cap(s)
                    s = jnp.where(keep[None, None, None], s, -1e30)
                    p = nn.softmax(s, axis=-1)
                    head = jnp.einsum("bhgqk,bhkd->bhgqd", p, v_h
                                      ).reshape(bsz, h, L, d_v_h)
                sl = jnp.arange(mx)
                r = sl - gp
                last = jnp.where(sl < gp, sl,
                                 gp + r + ((L - 1 - gp - r) // win) * win)
                valid = jnp.where(sl < gp, sl < L, last >= gp)
                src = jnp.clip(last, 0, L - 1)
                ck.value = jnp.where(valid[None, None, :, None],
                                     jnp.take(k_st, src, axis=2), ck.value)
                cv.value = jnp.where(valid[None, None, :, None],
                                     jnp.take(v_st, src, axis=2), cv.value)
                if qdt:
                    ksc.value = jnp.where(valid[None, None, :],
                                          jnp.take(k_s, src, axis=2),
                                          ksc.value)
                    vsc.value = jnp.where(valid[None, None, :],
                                          jnp.take(v_s, src, axis=2),
                                          vsc.value)
                cpos.value = jnp.where(valid[None, :], last[None, :],
                                       cpos.value)
                ci.value = idx + L
            elif L > 1:
                # Dense-cache prefill: write the chunk at each sequence's
                # own idx, attend the updated cache page with a shifted
                # causal mask. Ragged chunks (prompt_lengths): padding
                # positions are written but each cache_index only
                # advances by the true length, so subsequent tokens
                # overwrite the padding slots; outputs at padding query
                # positions are garbage the caller ignores.
                if paged:
                    posn = idx[:, None] + jnp.arange(L)[None]
                    ck.value = _store(ck.value, k_st, posn)
                    cv.value = _store(cv.value, v_st, posn)
                    if qdt:
                        ksc.value = _store_s(ksc.value, k_s, posn)
                        vsc.value = _store_s(vsc.value, v_s, posn)
                else:
                    ck.value = upd4(ck.value, k_st, idx)
                    cv.value = upd4(cv.value, v_st, idx)
                    if qdt:
                        ksc.value = upd3(ksc.value, k_s, idx)
                        vsc.value = upd3(vsc.value, v_s, idx)
                ci.value = idx + (prompt_lengths
                                  if prompt_lengths is not None else L)
                if self.use_flash:
                    # Long-prompt prefill without the L×slots score
                    # matrix: the streaming kernel runs over the cache
                    # page with traced PER-SEQUENCE global query offsets
                    # — causality at q_offset=idx[b] both admits earlier
                    # chunks' keys and masks the unwritten page tail.
                    from ku.pallas.flash_attention import (
                        flash_attention_pallas)

                    # The streaming kernel consumes (B, H, S, D): one
                    # materialized transpose of the cache page per
                    # prefill DISPATCH (amortized over the prompt; the
                    # per-token decode loop never pays it).
                    head = flash_attention_pallas(
                        q_h, _read_k().swapaxes(2, 3),
                        _read_v().swapaxes(2, 3),
                        softmax_scale=1.0 / math.sqrt(d_k),
                        causal=True, q_offset=idx,
                        logit_softcap=self.logit_softcap)
                else:
                    pos = jnp.arange(mx)[None, None, :]
                    keep = pos <= (idx[:, None, None]
                                   + jnp.arange(L)[None, :, None])
                    # Slot-minor cache: XLA absorbs the transposed
                    # operand into the dot dimension numbers — no
                    # materialized relayout.
                    s = jnp.einsum("bhgqd,bhdk->bhgqk", qg, _read_k()
                                   ) / math.sqrt(d_k)
                    s = self._cap(s)
                    s = jnp.where(keep[:, None, None], s, -1e30)
                    p = nn.softmax(s, axis=-1)
                    head = jnp.einsum("bhgqk,bhdk->bhgqd", p, _read_v()
                                      ).reshape(bsz, h, L, d_v_h)
            else:
                if ring:
                    slot = jnp.where(idx < gp, idx,
                                     gp + jax.lax.rem(idx - gp, win))
                    cpos.value = cpos.value.at[
                        jnp.arange(bsz), slot].set(idx)
                    pos = cpos.value  # (B, mx) global positions
                    # Occupied slots only; sinks escape the window.
                    keep = (pos >= 0) & ((pos < gp)
                                         | (idx[:, None] - pos < win))
                elif not paged:
                    slot = idx
                    pos = jnp.arange(mx)[None, :]
                    keep = pos <= idx[:, None]
                if paged:
                    # NB the paged read builds its own per-page liveness
                    # mask (kpos <= idx) inside page_step below — there
                    # is deliberately no slot/pos/keep in this branch.
                    # Static write-path choice by pool size (round-5
                    # hardware A/B, BASELINE.md): the scatter's
                    # re-materialization costs one pool copy per step —
                    # ruinous at multi-GB pools (0.87B conf: 355 -> 818
                    # tok/s switching to DUS) but FREE at small ones,
                    # where the unrolled per-row DUS chain instead adds
                    # serial launch latency (toy conf: scatter 65.5k vs
                    # DUS 38.6k tok/s). Both paths are exactness-tested.
                    if ck.value.nbytes > 8 * 2 ** 20:
                        ck.value = _store1(ck.value, k_st, idx)
                        cv.value = _store1(cv.value, v_st, idx)
                        if qdt:
                            ksc.value = _store1_s(ksc.value, k_s, idx)
                            vsc.value = _store1_s(vsc.value, v_s, idx)
                    else:
                        ck.value = _store(ck.value, k_st, idx[:, None])
                        cv.value = _store(cv.value, v_st, idx[:, None])
                        if qdt:
                            ksc.value = _store_s(ksc.value, k_s,
                                                 idx[:, None])
                            vsc.value = _store_s(vsc.value, v_s,
                                                 idx[:, None])
                else:
                    ck.value = upd4(ck.value, k_st, slot)
                    cv.value = upd4(cv.value, v_st, slot)
                    if qdt:
                        ksc.value = upd3(ksc.value, k_s, slot)
                        vsc.value = upd3(vsc.value, v_s, slot)
                ci.value = idx + 1

                # Auto rule (measured on the v5e — see the flash_decode
                # attribute comment): the kernel pays a per-dispatch
                # fixed cost that only amortizes over enough cache
                # traffic, so small dense/int8 caches keep the fused
                # XLA masked read; paged pools always use the kernel
                # (the DMA-engine table gather beats the blocked
                # page-scan at every measured size). The COMPILED paged
                # kernel additionally needs 128-aligned pages (VMEM
                # lane tiling) — smaller pages fall back to the XLA
                # page-scan, with a warning when the kernel was forced.
                on_tpu = jax.default_backend() == "tpu"
                pg_ok = not paged or pg % 128 == 0 or not on_tpu
                if self.flash_decode is not None:
                    use_kernel = self.flash_decode and pg_ok
                    if self.flash_decode and not pg_ok:
                        import warnings

                        warnings.warn(
                            f"flash_decode=True with kv_page_size={pg}: "
                            f"the compiled paged kernel requires "
                            f"kv_page_size % 128 == 0; using the XLA "
                            f"page-scan read instead")
                else:
                    use_kernel = (on_tpu and pg_ok
                                  and (paged or mx >= 1024))
                if use_kernel and not ring:
                    # Flash-decoding Pallas kernel: one VMEM-streamed
                    # online-softmax pass over the live cache prefix;
                    # int8 pages stream AS int8 (scale-folded exactly
                    # like the XLA paths below), paged pools gather
                    # through the scalar-prefetched block table.
                    from ku.pallas.decode_attention import (
                        decode_attention, decode_attention_paged)

                    kw = dict(
                        k_scale=ksc.value if qdt else None,
                        v_scale=vsc.value if qdt else None,
                        softmax_scale=1.0 / math.sqrt(d_k),
                        logit_softcap=self.logit_softcap)
                    if paged:
                        # pipelined="v4": fused-slab DMA with per-chunk
                        # contiguity fast path + v3-style pipelined
                        # per-page fallback. Hardware A/B (round 5,
                        # results/tpu_r5b.log micro + paged_v4_check):
                        # v2 (the old default) loses 1.5-8x to v3/v4 at
                        # the 0.87B serving shapes (183->428 us/call as
                        # fill drops); v4 >= v3 everywhere, equals it on
                        # fully-fragmented tables, and is bit-exact vs
                        # v2 on compiled Mosaic at fill 0.5/1.0.
                        res = decode_attention_paged(
                            qg[:, :, :, 0], ck.value, cv.value,
                            tbl.value, idx + 1, pipelined="v4", **kw)
                    else:
                        res = decode_attention(
                            qg[:, :, :, 0], ck.value, cv.value,
                            idx + 1, **kw)
                    head = res.reshape(bsz, h, 1, d_v_h)
                elif paged:
                    # Flash-decoding-style read: one lax.scan over the
                    # table entries with an online-softmax carry reads
                    # each page ONCE in place — the materialized gather
                    # view would cost ~3 passes over the cache (pool
                    # read + gathered write + attention read), and the
                    # long-context decode step is cache-read-bound.
                    # BLOCKED: each scan step gathers page_scan_block
                    # table entries at once (one big slab matmul instead
                    # of mp tiny serial ones — the one-page-per-step scan
                    # measured latency-bound at 0.21× the HBM roofline
                    # where the dense read hit 0.80× at T=8192 on the
                    # v5e). The table is padded with entry 0 up to a
                    # block multiple; padded entries read page 0 but
                    # their positions land past max_decode_len so the
                    # liveness mask kills them. f32 accumulators; fully-
                    # dead pages contribute 0 (page 0 always holds
                    # position 0, so the running max is real from the
                    # first scan step on).
                    scale = 1.0 / math.sqrt(d_k)
                    blk = min(8, mp)
                    nsteps = -(-mp // blk)
                    tpad = nsteps * blk - mp
                    tblp = (tbl.value if tpad == 0 else
                            jnp.pad(tbl.value, ((0, 0), (0, tpad))))
                    # (nsteps, B, blk) so scan feeds one block per step.
                    tblp = tblp.reshape(bsz, nsteps, blk).transpose(
                        1, 0, 2)

                    def _slab(g):  # (B, blk, hkv, d, pg) -> blk*pg keys
                        # Slot-minor slab (B, hkv, d, blk*pg).
                        return jnp.transpose(g, (0, 2, 3, 1, 4)).reshape(
                            bsz, hkv, g.shape[3], blk * pg)

                    def _slab_s(g):  # (B, blk, hkv, pg) scales
                        return jnp.transpose(g, (0, 2, 1, 3)).reshape(
                            bsz, hkv, blk * pg)

                    def page_step(carry, xs):
                        m, l, acc = carry
                        j, pid = xs  # step index, (B, blk) pool ids
                        if qdt:
                            # SCALE-FOLDED int8 page read, mirroring the
                            # dense per-token step above: the int8 pages
                            # stream into the matmul through an exact
                            # int8→kv_dt cast and the per-token scales
                            # multiply the (tiny) score/prob slabs —
                            # q·(k_int8·s_k) == (q·k_int8)·s_k, so no
                            # dequantized page copy is materialized and
                            # both per-token paths share one rounding
                            # story (near-tie logits cannot flip
                            # between dense and paged decode).
                            kp = _slab(ck.value[pid].astype(kv_dt))
                            vp = _slab(cv.value[pid]
                                       .astype(jnp.float32))
                            ksp = _slab_s(ksc.value[pid])
                            vsp = _slab_s(vsc.value[pid])
                            s = (jnp.einsum("bhgqd,bhdk->bhgqk", qg, kp)
                                 .astype(jnp.float32)
                                 * ksp[:, :, None, None, :]) * scale
                        else:
                            kp = _slab(ck.value[pid]
                                       .astype(jnp.float32))
                            vp = _slab(cv.value[pid]
                                       .astype(jnp.float32))
                            s = jnp.einsum("bhgqd,bhdk->bhgqk", qg,
                                           kp) * scale
                        s = self._cap(s)
                        kpos = j * (blk * pg) + jnp.arange(blk * pg)
                        live = kpos[None] <= idx[:, None]  # (B, blk*pg)
                        s = jnp.where(live[:, None, None, None], s,
                                      -1e30)
                        m2 = jnp.maximum(m, s.max(-1, keepdims=True))
                        p = jnp.exp(s - m2)
                        r = jnp.exp(m - m2)
                        l2 = l * r + p.sum(-1, keepdims=True)
                        if qdt:  # fold s_v into the prob slab (exact)
                            p = p * vsp[:, :, None, None, :]
                        acc2 = acc * r + jnp.einsum(
                            "bhgqk,bhdk->bhgqd", p, vp)
                        return (m2, l2, acc2), None

                    shp = (bsz, hkv, group, 1)
                    (m, l, acc), _ = jax.lax.scan(
                        page_step,
                        (jnp.full(shp + (1,), -1e30, jnp.float32),
                         jnp.zeros(shp + (1,), jnp.float32),
                         jnp.zeros(shp + (d_v_h,), jnp.float32)),
                        (jnp.arange(nsteps), tblp))
                    head = (acc / l).astype(q_h.dtype).reshape(
                        bsz, h, 1, d_v_h)
                elif qdt:
                    # SCALE-FOLDED int8 read (the decode hot loop is
                    # cache-read-bound at long T): per-token scales
                    # factor out of the dot products —
                    # q·(k_int8·s_k) == (q·k_int8)·s_k — so the int8
                    # cache streams straight into the matmul (the exact
                    # int8→kv_dt cast fuses into the dot operand) and a
                    # full-precision dequantized copy is never
                    # materialized. Measured 3.4× slower than dense the
                    # materializing way at T=8192 on the v5e; the paged
                    # page_step below folds identically, keeping the
                    # two per-token paths' near-tie behavior aligned.
                    sc = 1.0 / math.sqrt(d_k)
                    # Ring caches stay slot-major (B,hkv,S,d); the
                    # dense cache is slot-MINOR (B,hkv,d,S).
                    kd = "bhkd" if ring else "bhdk"
                    s = jnp.einsum(f"bhgqd,{kd}->bhgqk", qg,
                                   ck.value.astype(kv_dt))
                    s = (s.astype(jnp.float32)
                         * (ksc.value * sc)[:, :, None, None, :])
                    s = self._cap(s)
                    s = jnp.where(keep[:, None, None, None, :], s, -1e30)
                    p = nn.softmax(s, axis=-1)
                    pv = (p * vsc.value[:, :, None, None, :]
                          ).astype(kv_dt)
                    head = jnp.einsum(f"bhgqk,{kd}->bhgqd", pv,
                                      cv.value.astype(kv_dt)
                                      ).reshape(bsz, h, 1, d_v_h)
                else:
                    kd = "bhkd" if ring else "bhdk"
                    s = jnp.einsum(f"bhgqd,{kd}->bhgqk", qg, _read_k()
                                   ) / math.sqrt(d_k)
                    s = self._cap(s)
                    s = jnp.where(keep[:, None, None, None, :], s, -1e30)
                    p = nn.softmax(s, axis=-1)
                    head = jnp.einsum(f"bhgqk,{kd}->bhgqd", p, _read_v()
                                      ).reshape(bsz, h, 1, d_v_h)
        elif block_mask is not None:
            from ku.pallas.sparse_attention import sparse_attention

            head = sparse_attention(q_h, k_h, v_h, block_mask,
                                    softmax_scale=1.0 / math.sqrt(d_k))
        elif (
            self.use_flash
            and self.similarity_type == SIMILARITY_TYPE_SCALED
            and not self.use_mask
            and (self.dropout_rate == 0.0 or deterministic)
        ):
            from ku.pallas.flash_attention import flash_attention

            head = flash_attention(q_h, k_h, v_h,
                                   softmax_scale=1.0 / math.sqrt(d_k),
                                   causal=self.causal, window=self.window,
                                   segment_ids=segment_ids,
                                   logit_softcap=self.logit_softcap)
        else:
            if hkv != h:  # GQA on the dense path: materialize the repeat
                k_h = jnp.repeat(k_h, h // hkv, axis=1)
                v_h = jnp.repeat(v_h, h // hkv, axis=1)
            if self.similarity_type == SIMILARITY_TYPE_PLAIN:
                scores = jnp.einsum("bhqd,bhkd->bhqk", q_h, k_h)
            elif self.similarity_type == SIMILARITY_TYPE_SCALED:
                # Reference scales by √d_k (full model dim, :129), not √d_k_h.
                scores = self._cap(
                    jnp.einsum("bhqd,bhkd->bhqk", q_h, k_h)
                    / math.sqrt(d_k))
            elif self.similarity_type == SIMILARITY_TYPE_GENERAL:
                w_gen = self.param("W_gen_S", init, (d_k_h, d_k_h))
                scores = jnp.einsum("bhqd,bhkd->bhqk", q_h, k_h @ w_gen)
            elif self.similarity_type == SIMILARITY_TYPE_DIFF_ABS:
                diff = jnp.abs(q_h[:, :, :, None, :] - k_h[:, :, None, :, :])
                scores = jnp.exp(-jnp.mean(diff, axis=-1))
            else:  # additive
                w_aq = self.param("W_add_S_Q", init, (d_k_h, d_k_h))
                w_ak = self.param("W_add_S_K", init, (d_k_h, d_k_h))
                qa = q_h @ w_aq
                ka = k_h @ w_ak
                scores = jnp.sum(
                    jnp.tanh(qa[:, :, :, None, :] + ka[:, :, None, :, :]), axis=-1
                ) / math.sqrt(d_k_h)

            if self.causal:
                nq, nk = scores.shape[-2], scores.shape[-1]
                q_pos = jnp.arange(nq)[:, None]
                k_pos = jnp.arange(nk)[None, :]
                keep = k_pos <= q_pos
                if self.window is not None:
                    # Attention sinks (global_prefix) escape the window
                    # but not causality (StreamingLLM semantics).
                    keep = keep & ((q_pos - k_pos < self.window)
                                   | (k_pos < self.global_prefix))
                scores = jnp.where(keep[None, None], scores, -1e30)
            if segment_ids is not None:
                # Packed sequences: block-diagonal masking from (B, N) ids
                # (or a (seg_q, seg_k) pair) — same semantics as the flash
                # path's segment_ids.
                seg_q, seg_k = (segment_ids
                                if isinstance(segment_ids, (tuple, list))
                                else (segment_ids, segment_ids))
                keep_seg = (jnp.asarray(seg_q)[:, :, None]
                            == jnp.asarray(seg_k)[:, None, :])
                scores = jnp.where(keep_seg[:, None], scores, -1e30)
            probs = nn.softmax(scores, axis=-1)
            if self.use_mask and m is not None:
                probs = probs * m
            if self.dropout_rate > 0.0 and not deterministic:
                probs = nn.Dropout(rate=self.dropout_rate)(
                    probs, deterministic=False
                )
            head = jnp.einsum("bhqk,bhkd->bhqd", probs, v_h)

        b, n = q.shape[0], q.shape[1]
        head = jnp.reshape(jnp.transpose(head, (0, 2, 1, 3)), (b, n, d_v))
        return proj_o(head)
