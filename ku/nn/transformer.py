"""Transformer composite layers.

Reference: ku/composite_layer/transformer.py —
- ``Transformer`` (:23-108): encoder block = 2× (MHA + dropout + residual +
  LayerNorm) then FFN (4× width, swish → linear) + dropout + residual +
  LayerNorm (:55-96). Input ``[x, mask]``. (The reference reuses
  ``dropout_1`` for the second attention output at :85 — a latent bug; we
  use an independent dropout as intended.)
- ``InterferedTransformer`` (:111-200): takes ``[embedded, x, mask]``,
  tiles the per-sample embedding across the sequence (:166-169) and
  concatenates it before the FFN (:180). As written the reference's final
  residual adds tensors of different widths (concat width vs d_output);
  we apply the intended fix: the FFN maps the concatenated features back to
  ``d_output`` and the residual uses the pre-concat branch.
"""

from __future__ import annotations

import typing

import flax.linen as nn
import jax.numpy as jnp

from ku.nn.attention import SIMILARITY_TYPE_SCALED, MultiHeadAttention


class Transformer(nn.Module):
    """Transformer encoder block (reference transformer.py:23-108).

    ``use_flash`` routes the scaled-similarity attention through the
    streaming Pallas flash kernel (ku/pallas/flash_attention.py) — same
    math, HBM-bounded sequence length. Caveat: with ``dropout_rate > 0``
    TRAINING steps fall back to the dense N² path (flash cannot drop
    attention probabilities it never materializes) — keep dropout at 0
    for long sequences or apply it outside the attention."""

    num_head: int
    d_output: int
    dropout_rate: float = 0.0
    similarity_type: str = SIMILARITY_TYPE_SCALED
    layer_norm_f: bool = True
    use_flash: bool = False
    # Extensions beyond the reference, forwarded to the attention layers:
    # causal/sliding-window masking, grouped-query heads, KV-cache
    # autoregressive decoding (``__call__(..., decode=True)`` with the
    # 'cache' collection mutable; requires causal + max_decode_len),
    # packed-sequence masking (``__call__(..., segment_ids=...)``), and
    # block-sparse patterns (``__call__(..., block_mask=BlockMask)`` —
    # see ku/pallas/sparse_attention.py).
    causal: bool = False
    window: int | None = None
    num_kv_head: int | None = None
    max_decode_len: int | None = None
    # Attention sinks escaping the window (StreamingLLM; with window in
    # decode the KV cache becomes an unbounded-length ring buffer of
    # global_prefix + window slots).
    global_prefix: int = 0
    # 'int8' = quantized KV cache in decode (see MultiHeadAttention).
    kv_cache_dtype: str | None = None
    # Paged KV cache (vLLM-style page pool + per-row tables in decode;
    # see MultiHeadAttention.kv_page_size).
    kv_page_size: int | None = None
    kv_num_pages: int | None = None
    # Rotary position embedding on q/k (see MultiHeadAttention.rope).
    rope: bool = False
    rope_base: float = 10000.0
    # Gemma-style logit soft-capping (see MultiHeadAttention).
    logit_softcap: float | None = None
    # Per-token decode reads through the flash-decoding Pallas kernel
    # (None = auto on TPU; see MultiHeadAttention.flash_decode).
    flash_decode: bool | None = None
    # Weight-only int8 serving quantization: attention projections AND
    # the two FFN kernels hold int8 weights + per-output-channel f32
    # scales; convert trained float params with
    # ku.nn.quant.quantize_weights (see MultiHeadAttention.quant_weights).
    # "w8a8" adds dynamic per-token int8 activations (int8 MXU matmuls).
    quant_weights: typing.Union[bool, str] = False  # False|True|"w8a8"

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True,
                 decode: bool = False, segment_ids=None, block_mask=None,
                 prompt_lengths=None):
        x, m = inputs[0], inputs[1] if len(inputs) > 1 else None

        def attn_block(y):
            y2 = MultiHeadAttention(
                self.num_head,
                self.d_output,
                self.dropout_rate,
                similarity_type=self.similarity_type,
                use_flash=self.use_flash,
                causal=self.causal,
                window=self.window,
                num_kv_head=self.num_kv_head,
                max_decode_len=self.max_decode_len,
                global_prefix=self.global_prefix,
                kv_cache_dtype=self.kv_cache_dtype,
                kv_page_size=self.kv_page_size,
                kv_num_pages=self.kv_num_pages,
                rope=self.rope, rope_base=self.rope_base,
                logit_softcap=self.logit_softcap,
                flash_decode=self.flash_decode,
                quant_weights=self.quant_weights,
            )([y, y, y, m], deterministic=deterministic, decode=decode,
              segment_ids=segment_ids, block_mask=block_mask,
              prompt_lengths=prompt_lengths)
            y2 = nn.Dropout(self.dropout_rate)(y2, deterministic=deterministic)
            y2 = y + y2
            if self.layer_norm_f:
                y2 = nn.LayerNorm(epsilon=1e-6)(y2)
            return y2

        x2 = attn_block(x)
        x3 = attn_block(x2)

        if self.quant_weights:
            # int8 FFN kernels; explicit names keep the param scopes
            # identical to the float branch's auto-named nn.Dense, so
            # quantize_weights aligns a float checkpoint structurally.
            from ku.nn.quant import QuantDense

            aq = self.quant_weights == "w8a8"
            dense1 = QuantDense(int(self.d_output * 4), name="Dense_0",
                                act_quant=aq)
            dense2 = QuantDense(self.d_output, name="Dense_1",
                                act_quant=aq)
        else:
            dense1 = nn.Dense(int(self.d_output * 4))
            dense2 = nn.Dense(self.d_output)
        x4 = dense1(x3)
        x4 = nn.swish(x4)
        x4 = dense2(x4)
        x4 = nn.Dropout(self.dropout_rate)(x4, deterministic=deterministic)
        x4 = x3 + x4
        if self.layer_norm_f:
            x4 = nn.LayerNorm(epsilon=1e-6)(x4)
        return x4


class InterferedTransformer(nn.Module):
    """Transformer block conditioned on a per-sample embedding
    (reference transformer.py:111-200)."""

    num_head: int
    d_output: int
    dropout_rate: float = 0.0
    similarity_type: str = SIMILARITY_TYPE_SCALED
    layer_norm_f: bool = True

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        embedded, x = inputs[0], inputs[1]
        m = inputs[2] if len(inputs) > 2 else None

        num_seq = x.shape[1]
        emb = jnp.tile(embedded[:, None, :], (1, num_seq, 1))
        if self.layer_norm_f:
            emb = nn.LayerNorm()(emb)

        def attn_block(y):
            y2 = MultiHeadAttention(
                self.num_head,
                self.d_output,
                self.dropout_rate,
                similarity_type=self.similarity_type,
            )([y, y, y, m], deterministic=deterministic)
            y2 = y + y2
            if self.layer_norm_f:
                y2 = nn.LayerNorm()(y2)
            return y2

        x2 = attn_block(x)
        x3 = attn_block(x2)
        cat = jnp.concatenate([x3, emb], axis=-1)

        x4 = nn.Dense(self.d_output)(cat)
        x4 = nn.relu(x4)
        x4 = nn.Dense(self.d_output)(x4)
        x4 = x3 + x4
        if self.layer_norm_f:
            x4 = nn.LayerNorm()(x4)
        return nn.Dropout(self.dropout_rate)(x4, deterministic=deterministic)
