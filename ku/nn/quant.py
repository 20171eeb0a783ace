"""Weight-only int8 quantization for the serving path.

No reference analogue (tonandr/keras_unsupervised has no serving or
quantization surface) — this is the standard production-serving lever
for the decode regime the big-conf roofline measured params-dominant
(BASELINE.md round 4: 1.75 GB bf16 weights vs 0.55-1.07 GB KV cache per
step at T=2048): every decode step reads all weights once, so int8
weights halve the dominant HBM term.

Design (TPU-first, mirrors the int8 KV-cache lesson measured on the
v5e): the int8 kernel streams straight into each projection matmul —
XLA fuses the int8→compute-dtype convert into the dot's weight read, so
only int8 bytes cross HBM (the scale-folded int8 KV read hit parity
with the hand-written Pallas kernel this way) — and the per-OUTPUT-
channel f32 scale multiplies the matmul output, which is exact:
``x @ (Q · s) == (x @ Q) · s``.

Quantization is symmetric per output channel: ``s_j = max_i |W_ij|/127``
and ``Q = round(W / s)`` — no zero points (matmul-friendly), no
activation quantization (bf16 activations keep the MXU path and the
accuracy story simple).

Usage (params-as-data, no retraining):

    model_q = Transformer(..., quant_weights=True)
    template = model_q.init(key, x)["params"]      # int8 zeros + scales
    qparams  = quantize_weights(trained_params, template)
    y = model_q.apply({"params": qparams}, x, ...)

``quantize_weights`` walks the TEMPLATE structurally: int8 leaves are
quantized from the float tree, ``<name>_scale`` leaves are computed
alongside, everything else copies through unchanged — so it works for
any composition of quantized modules and never depends on module-type
names matching.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["QuantDense", "quantize_weights", "int8_act_matmul"]


def int8_act_matmul(x, wq8, col_scale):
    """W8A8 dynamic matmul: per-token int8 activations × int8 weights.

    Motivation (v5e, BASELINE.md round 4 session 5): the weight-only
    path streams int8 weights but converts them to bf16 tile-by-tile
    inside the dot fusion — measured ~20% bandwidth-efficiency loss vs
    the pure-bf16 stream (399 vs 506 GB/s achieved on the 0.87B decode
    step). Quantizing the ACTIVATIONS per token (symmetric, dynamic —
    no calibration) turns each projection into an int8×int8→int32 MXU
    matmul: no weight convert on the hot path and twice the MXU
    throughput; the f32 rescale is a per-row × per-column outer factor
    on the (tiny) output tile: ``y ≈ (xq @ wq) · (a_s · s_col)``.

    Lossy (unlike weight-only): the activation rounding adds ≤ 1/254
    relative error per element in row-max units — gate quality with
    ``benchmarks/int8_kv_quality.py`` variants before serving with it.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    a_s = jnp.maximum(amax, 1e-20) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_s),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, wq8, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * a_s
            * col_scale.astype(jnp.float32)).astype(x.dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 kernel + per-column f32 scales.

    Param names: ``kernel`` (int8, (in, features)), ``kernel_scale``
    (f32, (features,)), ``bias`` (f32, (features,)) — the ``kernel`` /
    ``bias`` names match ``nn.Dense`` so ``quantize_weights`` aligns a
    float checkpoint with this module's template structurally.
    ``act_quant`` switches the forward from weight-only (exact given
    the quantized weights) to the W8A8 dynamic path (lossy, int8 MXU).
    """

    features: int
    use_bias: bool = True
    act_quant: bool = False

    @nn.compact
    def __call__(self, x):
        wq = self.param("kernel", nn.initializers.zeros_init(),
                        (x.shape[-1], self.features), jnp.int8)
        sc = self.param("kernel_scale", nn.initializers.ones_init(),
                        (self.features,), jnp.float32)
        if self.act_quant:
            y = int8_act_matmul(x, wq, sc)
        else:
            y = (x @ wq.astype(x.dtype)) * sc.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def _quantize_leaf(w):
    """Symmetric per-output-channel int8: returns (q, scale)."""
    w = jnp.asarray(w, jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))  # all but the output channel
    s = jnp.max(jnp.abs(w), axis=reduce_axes) / 127.0
    s = jnp.where(s == 0, 1.0, s)  # all-zero column -> q = 0, exact
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def quantize_weights(params, template):
    """Map a trained float param tree onto a quant model's template.

    params: the float tree (same module structure, minus the
      ``*_scale`` entries). template: ``model_q.init(...)["params"]``.
    Returns a tree shaped like ``template``: int8 leaves quantized from
    ``params``, ``<name>_scale`` leaves computed, all other leaves
    copied through from ``params`` unchanged (their dtype — e.g. a bf16
    serving cast — is preserved; scales stay f32).
    """

    def rec(tpl, src, path):
        out = {}
        for name, leaf in tpl.items():
            if isinstance(leaf, dict):
                if name not in src:
                    raise ValueError(f"params missing module "
                                     f"{'/'.join(path + (name,))}")
                out[name] = rec(leaf, src[name], path + (name,))
            elif name.endswith("_scale") and name[:-6] in tpl:
                continue  # produced with its base kernel below
            elif leaf.dtype == jnp.int8:
                w = src.get(name)
                if w is None:
                    raise ValueError(f"params missing weight "
                                     f"{'/'.join(path + (name,))}")
                if w.shape != leaf.shape:
                    raise ValueError(
                        f"{'/'.join(path + (name,))}: shape "
                        f"{w.shape} != template {leaf.shape}")
                q, s = _quantize_leaf(w)
                out[name] = q
                out[name + "_scale"] = s
            else:
                out[name] = src[name] if name in src else leaf
            # NB bias/other leaves missing from src fall back to the
            # template value (zeros) — matches a bias-free checkpoint.
        return out

    return rec(dict(template), dict(params), ())
