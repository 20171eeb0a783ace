"""int8 KV-cache QUALITY bound (VERDICT r4 item 6): the quantized cache
must track the f32 cache's per-token logprobs within a documented bound.

Mechanism-level test (fast, no training): teacher-forced logits come
from ONE ``decode=True`` prefill per cache dtype — the prefill attention
reads the dequantized K/V and prefill is exactness-tested bit-identical
to per-token steps (tests/test_layers.py), so this bounds what int8
costs the step-by-step decode too. The embedding table is scaled up to
SHARPEN the logit distribution (stressing the quantization error beyond
an untrained model's near-uniform logits). The asserted numbers here are
the MECHANISM bound for this setup; a fully-trained LM (sharper still)
measures mean |Δ logprob| ~0.02 / p99 ~0.2 with relative Δperplexity
< 0.05% and top-1 agreement within 0.1% at T=512/2048
(benchmarks/int8_kv_quality.py → BASELINE.md, thresholds documented in
docs/source/user_guide.rst).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _core(max_len, qdt):
    import flax.linen as nn

    class Core(nn.Module):
        @nn.compact
        def __call__(self, xs, decode=False):
            x = xs[0]
            for i in range(2):
                x = ku.Transformer(4, 64, 0.0, causal=True, rope=True,
                                   max_decode_len=max_len,
                                   kv_cache_dtype=qdt,
                                   name=f"block_{i}")([x], decode=decode)
            return x

    return Core()


def test_int8_cache_logprob_delta_bound(rng):
    b, t, vocab = 8, 256, 32
    table = jnp.asarray(rng.normal(size=(vocab, 64)).astype(np.float32)
                        * 4.0)  # sharpened: stresses quantization
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, t + 1)), jnp.int32)
    x = table[ids[:, :-1]]
    params = _core(t, None).init(jax.random.key(0), [x],
                                 decode=True)["params"]

    def logits(qdt):
        y, _ = _core(t, qdt).apply({"params": params}, [x], decode=True,
                                   mutable=["cache"])
        return jax.nn.log_softmax(y @ table.T, axis=-1)

    lg_f = np.asarray(logits(None), np.float64)
    lg_q = np.asarray(logits("int8"), np.float64)
    rows = np.arange(b)[:, None]
    cols = np.arange(t)[None]
    y_true = np.asarray(ids[:, 1:])
    lp_f, lp_q = lg_f[rows, cols, y_true], lg_q[rows, cols, y_true]
    d = np.abs(lp_f - lp_q)
    ppl_f, ppl_q = np.exp(-lp_f.mean()), np.exp(-lp_q.mean())
    assert d.mean() < 0.01, d.mean()
    assert np.percentile(d, 99) < 0.05, np.percentile(d, 99)
    assert abs(ppl_q - ppl_f) / ppl_f < 0.005
    # Distribution shape also holds: argmax flips are rare.
    agree = (lg_f.argmax(-1) == lg_q.argmax(-1)).mean()
    assert agree > 0.99, agree


def test_bf16_int8_paged_prefill_matches_steps(rng):
    """bf16 model + int8 cache + PAGED pool: chunk prefill and per-token
    steps must leave bit-identical quantized cache state, and decode
    outputs after either history must agree — the page-scan dequant
    rounds through the model's K/V dtype exactly like the prefill read
    (ku/nn/attention.py page_step), so near-tie logits cannot flip
    between the two paths."""
    b, t, dm, pre = 2, 12, 16, 6
    x = jnp.asarray(rng.normal(size=(b, t, dm)), jnp.bfloat16)
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, num_kv_head=1,
                                  kv_cache_dtype="int8", kv_page_size=4)
    variables = layer.init(jax.random.key(0), [x, x, x])
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          variables["params"])

    def steps_from(cache, lo):
        # cache={} lets apply CREATE the collection (standard stepper
        # pattern) — no hand-zeroed template that could clobber the
        # identity page table.
        outs = []
        for i in range(lo, t):
            tok = x[:, i:i + 1]
            y, cache = layer.apply({"params": params, **cache},
                                   [tok, tok, tok], decode=True,
                                   mutable=["cache"])
            outs.append(np.asarray(y, np.float32))
        return cache, np.concatenate(outs, axis=1)

    # Path A: chunk-prefill the first `pre` tokens, then steps.
    chunk = x[:, :pre]
    _, cache_a = layer.apply({"params": params},
                             [chunk, chunk, chunk], decode=True,
                             mutable=["cache"])
    cache_a = dict(cache_a)
    cache_a, tail_a = steps_from(cache_a, pre)
    # Path B: per-token steps from an empty cache.
    cache_b, all_b = steps_from({}, 0)
    for path, la in jax.tree_util.tree_leaves_with_path(cache_a["cache"]):
        name = str(getattr(path[-1], "key", path[-1]))
        lb = cache_b["cache"]
        for pp in path:
            lb = lb[pp.key]
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=name)
    np.testing.assert_array_equal(tail_a, all_b[:, pre:])


@pytest.mark.parametrize("variant", ["w8a8", "w8a8kv8"])
def test_w8a8_logprob_delta_bound(rng, variant):
    """W8A8 quality bound (VERDICT r4 item 3): int8 weights AND
    dynamically-quantized int8 activations (the only LOSSY matmul path —
    kv8/w8 only round storage) must still track the float model's
    per-token logprobs within a documented bound. Same sharpened-logit
    mechanism setup as the kv8 test above — NB the x4 table scaling
    inflates ABSOLUTE logprob deltas (a ~2% relative logit error on
    logits of magnitude ~50 is a delta of ~1), so the per-token bounds
    here are necessarily loose; the serving-quality claims live in the
    DISTRIBUTION metrics (relative perplexity ~0.2%, top-1 agreement
    1.0 measured on this setup) and in the trained-LM rows of
    benchmarks/int8_kv_quality.py. w8a8kv8 composes the int8 KV cache
    on top."""
    import flax.linen as nn

    from ku.nn import quantize_weights

    b, t, vocab = 8, 256, 32
    qdt = "int8" if variant == "w8a8kv8" else None

    def core(quant):
        class Core(nn.Module):
            @nn.compact
            def __call__(self, xs, decode=False):
                x = xs[0]
                for i in range(2):
                    x = ku.Transformer(4, 64, 0.0, causal=True, rope=True,
                                       max_decode_len=t,
                                       kv_cache_dtype=qdt if quant else None,
                                       quant_weights="w8a8" if quant
                                       else False,
                                       name=f"block_{i}")([x],
                                                          decode=decode)
                return x

        return Core()

    table = jnp.asarray(rng.normal(size=(vocab, 64)).astype(np.float32)
                        * 4.0)
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, t + 1)), jnp.int32)
    x = table[ids[:, :-1]]
    fparams = core(False).init(jax.random.key(0), [x],
                               decode=True)["params"]
    template = core(True).init(jax.random.key(0), [x],
                               decode=True)["params"]
    qparams = quantize_weights(fparams, template)

    def logits(mod, params):
        y, _ = mod.apply({"params": params}, [x], decode=True,
                         mutable=["cache"])
        return jax.nn.log_softmax(y @ table.T, axis=-1)

    lg_f = np.asarray(logits(core(False), fparams), np.float64)
    lg_q = np.asarray(logits(core(True), qparams), np.float64)
    rows = np.arange(b)[:, None]
    cols = np.arange(t)[None]
    y_true = np.asarray(ids[:, 1:])
    lp_f, lp_q = lg_f[rows, cols, y_true], lg_q[rows, cols, y_true]
    d = np.abs(lp_f - lp_q)
    ppl_f, ppl_q = np.exp(-lp_f.mean()), np.exp(-lp_q.mean())
    assert np.isfinite(lg_q).all()
    assert d.mean() < 0.5, d.mean()
    assert np.percentile(d, 99) < 2.0, np.percentile(d, 99)
    assert abs(ppl_q - ppl_f) / ppl_f < 0.01
    agree = (lg_f.argmax(-1) == lg_q.argmax(-1)).mean()
    assert agree > 0.99, agree
