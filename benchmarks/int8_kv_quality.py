"""int8 KV-cache QUALITY gate: per-token logprob / perplexity delta vs
the f32 cache on a trained example LM, teacher-forced at long T.

"Half the cache traffic" (benchmarks/decode_bench.py int8 A/B) is only
half the claim — this measures what quantization costs in model quality.
Method: train the transformer example's induction-task LM with RoPE (so
the lag-P attention pattern is relative and the model evaluates at
contexts longer than it trained on), then teacher-force the SAME token
sequences through one ``decode=True`` prefill per cache dtype. The
prefill attention reads the dequantized K/V (ku/nn/attention.py:412-443)
and prefill is exactness-tested bit-identical to per-token decode steps,
so one chunk pass per variant yields the full (B, T, V) teacher-forced
logits the step-by-step decode would produce.

Reported per T: mean/p99/max |Δ logprob| of the true next token
(int8 vs f32 cache), perplexity under both, relative Δppl, and both
models' top-1 accuracy on the task (proof the model is functional at
that context length — deltas on a broken model would be noise).

Usage: python benchmarks/int8_kv_quality.py [T ...]
    [kv8|w8|w8kv8|w8a8|w8a8kv8 ...]
(defaults: T 512 2048, variant kv8 = the int8 KV cache; "w8" measures
weight-only int8 quantization — ku/nn/quant.py — against the float
model, "w8kv8" both quantizations composed).
CPU-safe (forced-CPU runs shrink nothing: the pass is one forward).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

if os.environ.get("KU_BENCH_CPU"):
    # Validation runs (e.g. while the TPU is busy with a sweep): the
    # env var JAX_PLATFORMS alone is ignored when the axon plugin is on
    # PYTHONPATH — the config update is required (decode_bench.py idem).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

D_MODEL, HEADS, BLOCKS, VOCAB, PERIOD = 64, 4, 2, 16, 8
# Short training length, long eval: RoPE encodes the lag-P pattern
# RELATIVELY, so the induction head trained at 64 evaluates at 2048+.
# Budget mirrors the example conf that reaches generation accuracy 1.0
# (examples/transformer/transformer_generate_conf.json: 15 x 8192 @
# lr 1e-3 batch 128).
TRAIN_LEN = 64


def make_dataset(n, seq_len, seed=0):
    rng = np.random.default_rng(seed)
    pat = rng.integers(0, VOCAB, size=(n, PERIOD))
    reps = -(-seq_len // PERIOD)
    return np.tile(pat, (1, reps))[:, :seq_len]


def build_core(max_len, kv_cache_dtype=None, quant_weights=False):
    import flax.linen as nn

    from ku.nn import Transformer

    class Core(nn.Module):
        @nn.compact
        def __call__(self, xs, decode=False, prompt_lengths=None):
            x = xs[0]
            for i in range(BLOCKS):
                x = Transformer(HEADS, D_MODEL, 0.0, causal=True,
                                rope=True, max_decode_len=max_len,
                                kv_cache_dtype=kv_cache_dtype,
                                quant_weights=quant_weights,
                                name=f"block_{i}")(
                    [x], decode=decode, prompt_lengths=prompt_lengths)
            return x

    return Core()


def train_lm(epochs=15, n_train=8192, batch=128, lr=1e-3, seed=0):
    """Train the RoPE LM on the induction task at TRAIN_LEN; returns
    (params dict with 'tok' table and 'core', train accuracy)."""
    import flax.linen as nn
    import optax

    from ku.engine_ext import Trainer

    class LM(nn.Module):
        # RoPE provides positions — no learned PE table, so the model
        # evaluates at contexts longer than TRAIN_LEN.
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            tok = nn.Embed(VOCAB, D_MODEL, name="tok")
            x = tok(jnp.asarray(tokens, jnp.int32))
            y = type(build_core(TRAIN_LEN))(name="core")([x])
            return y @ tok.embedding.T

    seqs = make_dataset(n_train, TRAIN_LEN + 1, seed=seed)
    x_train, y_train = seqs[:, :-1], seqs[:, 1:]

    def masked_xent(y_true, logits):
        oh = jax.nn.one_hot(jnp.asarray(y_true, jnp.int32), VOCAB)
        ce = optax.softmax_cross_entropy(logits, oh)
        mask = (jnp.arange(ce.shape[1]) >= PERIOD - 1)[None, :]
        return (ce * mask).sum(1) / mask.sum()

    model = LM()
    trainer = Trainer(model, masked_xent, optimizer=optax.adam(lr))
    trainer.fit(x_train, y_train, batch_size=batch, epochs=epochs,
                verbose=0)
    params = trainer.state["params"]
    logits = model.apply({"params": params}, x_train[:64])
    acc = float((np.asarray(logits).argmax(-1)[:, PERIOD - 1:]
                 == y_train[:64, PERIOD - 1:]).mean())
    return params, acc


def teacher_forced_logits(params, seqs, kv_cache_dtype=None,
                          quant_weights=False):
    """One ragged-free prefill pass: (B, T) tokens → (B, T, V) logits
    through the decode cache path (dequantized reads for int8; int8
    weight-only projections/FFN for quant_weights)."""
    core = build_core(seqs.shape[1], kv_cache_dtype=kv_cache_dtype,
                      quant_weights=quant_weights)
    table = params["tok"]["embedding"]
    x = table[jnp.asarray(seqs, jnp.int32)]
    cparams = params["core"]
    if quant_weights:
        from ku.nn import quantize_weights

        template = core.init(jax.random.key(0), [x[:, :2]])["params"]
        cparams = quantize_weights(cparams, template)
    y, _ = core.apply({"params": cparams}, [x], decode=True,
                      mutable=["cache"])
    return y @ table.T


VARIANTS = {
    "kv8": dict(kv_cache_dtype="int8"),
    "w8": dict(quant_weights=True),
    "w8kv8": dict(kv_cache_dtype="int8", quant_weights=True),
    # W8A8 dynamic: int8 activations too (the only LOSSY matmul path —
    # this row is the quality gate that decides whether the int8-MXU
    # speed is worth it).
    "w8a8": dict(quant_weights="w8a8"),
    "w8a8kv8": dict(kv_cache_dtype="int8", quant_weights="w8a8"),
}


def measure(params, t, n_eval=32, seed=9, variant="kv8"):
    seqs = make_dataset(n_eval, t + 1, seed=seed)
    x, y_true = seqs[:, :-1], seqs[:, 1:]
    lg_f = np.asarray(jax.nn.log_softmax(
        teacher_forced_logits(params, x, None), -1), np.float64)
    lg_q = np.asarray(jax.nn.log_softmax(
        teacher_forced_logits(params, x, **VARIANTS[variant]), -1),
        np.float64)
    idx = np.arange(t)[None].repeat(n_eval, 0)
    rows = np.arange(n_eval)[:, None]
    lp_f = lg_f[rows, idx, y_true]
    lp_q = lg_q[rows, idx, y_true]
    mask = np.arange(t)[None] >= PERIOD - 1  # determined targets only
    d = np.abs(lp_f - lp_q)[mask.repeat(n_eval, 0)]
    ppl_f = float(np.exp(-lp_f[mask.repeat(n_eval, 0)].mean()))
    ppl_q = float(np.exp(-lp_q[mask.repeat(n_eval, 0)].mean()))
    acc_f = float((lg_f.argmax(-1) == y_true)[mask.repeat(n_eval, 0)].mean())
    acc_q = float((lg_q.argmax(-1) == y_true)[mask.repeat(n_eval, 0)].mean())
    return {
        "t": t, "variant": variant,
        "mean_abs_dlogprob": round(float(d.mean()), 6),
        "p99_abs_dlogprob": round(float(np.percentile(d, 99)), 6),
        "max_abs_dlogprob": round(float(d.max()), 6),
        "ppl_f32": round(ppl_f, 6), "ppl_int8": round(ppl_q, 6),
        "rel_dppl": round((ppl_q - ppl_f) / ppl_f, 6),
        "acc_f32": round(acc_f, 4), "acc_int8": round(acc_q, 4),
    }


def main():
    # Usage: int8_kv_quality.py [T ...] [kv8|w8|w8kv8 ...]
    # (defaults: T 512 2048, variant kv8 — the historical record.)
    ts = [int(a) for a in sys.argv[1:] if a.isdigit()] or [512, 2048]
    variants = [a for a in sys.argv[1:] if a in VARIANTS] or ["kv8"]
    print(f"devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    params, train_acc = train_lm()
    print(f"trained: acc={train_acc:.4f} in {time.time() - t0:.1f}s",
          file=sys.stderr)
    out = {"train_acc": round(train_acc, 4),
           "conf": dict(d_model=D_MODEL, heads=HEADS, blocks=BLOCKS,
                        vocab=VOCAB, period=PERIOD,
                        train_len=TRAIN_LEN, rope=True),
           "rows": [measure(params, t, variant=v)
                    for v in variants for t in ts]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
