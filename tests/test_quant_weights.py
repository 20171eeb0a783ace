"""Weight-only int8 serving quantization (ku/nn/quant.py).

Three layers of guarantees:

1. ``quantize_weights`` + the quantized modules compute EXACTLY the
   model that dequantized weights describe: running the FLOAT module
   with ``W = Q · s`` substituted matches the quant module on the same
   inputs (the only difference is float association order).
2. When the float weights are already exactly int8-representable
   (constructed as ``Q · s``), quantization is lossless and the quant
   model reproduces the float model.
3. The serving path composes: KV-cache decode (dense/int8/paged),
   chunked prefill, and ``generate`` run through a quant_weights
   Transformer and agree with the dequantized float model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku
from ku.nn import QuantDense, Transformer, quantize_weights


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def dequantize(qparams, template):
    """Rebuild the float tree a quant tree describes (Q · s)."""

    def rec(tpl, q):
        out = {}
        for name, leaf in tpl.items():
            if isinstance(leaf, dict):
                out[name] = rec(leaf, q[name])
            elif name.endswith("_scale") and name[:-6] in tpl:
                continue
            elif leaf.dtype == jnp.int8:
                out[name] = (q[name].astype(jnp.float32)
                             * q[name + "_scale"])
            else:
                out[name] = q[name]
        return out

    return rec(dict(template), dict(qparams))


def test_quant_dense_matches_dequantized(rng):
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 24)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(24,)).astype(np.float32))

    qd = QuantDense(24)
    template = qd.init(jax.random.key(0), x)["params"]
    qp = quantize_weights({"kernel": w, "bias": b}, template)
    got = qd.apply({"params": qp}, x)

    wd = qp["kernel"].astype(jnp.float32) * qp["kernel_scale"]
    np.testing.assert_allclose(got, x @ wd + b, rtol=1e-5, atol=1e-5)
    # Column scales really are per-output-channel symmetric max/127.
    np.testing.assert_allclose(qp["kernel_scale"],
                               np.max(np.abs(np.asarray(w)), 0) / 127.0,
                               rtol=1e-6)
    # Quantization error bound: |W - Q s| <= s/2 elementwise.
    assert np.all(np.abs(np.asarray(w - wd))
                  <= np.asarray(qp["kernel_scale"])[None, :] * 0.5 + 1e-7)


def _models(**kw):
    common = dict(num_head=4, d_output=32, dropout_rate=0.0,
                  causal=True, **kw)
    return (Transformer(**common),
            Transformer(quant_weights=True, **common))


def test_transformer_quant_matches_dequantized_float(rng):
    x = jnp.asarray(rng.normal(size=(2, 10, 32)).astype(np.float32))
    fmodel, qmodel = _models()
    fparams = fmodel.init(jax.random.key(0), [x])["params"]
    template = qmodel.init(jax.random.key(0), [x])["params"]
    qparams = quantize_weights(fparams, template)

    got = qmodel.apply({"params": qparams}, [x])
    want = fmodel.apply({"params": dequantize(qparams, template)}, [x])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_lossless_when_weights_are_int8_exact(rng):
    """Float weights constructed as Q·s quantize losslessly, so the
    quant model reproduces the float model (weight error = 0; only
    float association order differs)."""
    x = jnp.asarray(rng.normal(size=(2, 6, 32)).astype(np.float32))
    fmodel, qmodel = _models()
    fparams = fmodel.init(jax.random.key(0), [x])["params"]

    def snap(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = snap(v)
            elif v.ndim == 2:  # projection/FFN kernels
                s = jnp.maximum(jnp.max(jnp.abs(v), 0), 1e-6) / 127.0
                out[k] = jnp.round(v / s) * s
            else:
                out[k] = v
        return out

    fparams = snap(fparams)
    template = qmodel.init(jax.random.key(0), [x])["params"]
    qparams = quantize_weights(fparams, template)
    got = qmodel.apply({"params": qparams}, [x])
    want = fmodel.apply({"params": fparams}, [x])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("cache_kw", [
    dict(),
    dict(kv_cache_dtype="int8"),
    dict(kv_page_size=8),
])
def test_quant_decode_matches_dequantized(rng, cache_kw):
    """KV-cache per-token decode through a quant model == the float
    model with dequantized weights, step for step."""
    b, t, dm = 2, 12, 32
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    fmodel, qmodel = _models(max_decode_len=t, num_kv_head=2, **cache_kw)
    fparams = fmodel.init(jax.random.key(0), [x])["params"]
    template = qmodel.init(jax.random.key(0), [x])["params"]
    qparams = quantize_weights(fparams, template)
    dparams = dequantize(qparams, template)

    def decode_all(model, params):
        # Fresh cache from a throwaway init apply (reset the data the
        # throwaway token wrote; keep the structural page_table).
        _, mut = model.apply({"params": params}, [x[:, :1]], decode=True,
                             mutable=["cache"])
        cache, steps = mut["cache"], []
        cache = jax.tree_util.tree_map_with_path(
            lambda p, a: (a if str(getattr(p[-1], "key", "")) == "page_table"
                          else jnp.zeros_like(a)), cache)
        for i in range(t):
            y, mut = model.apply({"params": params, "cache": cache},
                                 [x[:, i:i + 1]], decode=True,
                                 mutable=["cache"])
            cache = mut["cache"]
            steps.append(np.asarray(y))
        return np.concatenate(steps, axis=1)

    np.testing.assert_allclose(decode_all(qmodel, qparams),
                               decode_all(fmodel, dparams),
                               rtol=2e-4, atol=2e-4)


def test_quant_generate_end_to_end(rng):
    """generate() through a quant_weights Transformer matches the
    dequantized float model token for token (greedy)."""
    from ku.nn import generate

    vocab, dm, t = 13, 32, 20
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    fmodel, qmodel = _models(max_decode_len=t, num_kv_head=2)
    ids0 = jnp.zeros((2, 4), jnp.int32)
    fparams = fmodel.init(jax.random.key(0), [table[ids0]])["params"]
    template = qmodel.init(jax.random.key(0), [table[ids0]])["params"]
    qparams = quantize_weights(fparams, template)
    dparams = dequantize(qparams, template)

    prompts = jnp.asarray(rng.integers(0, vocab, size=(2, 4)), jnp.int32)
    kw = dict(embed=lambda i, p=None: table[i],
              readout=lambda y: y @ table.T)
    got = generate(qmodel, qparams, prompts, 8, **kw)
    want = generate(fmodel, dparams, prompts, 8, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantize_weights_validates(rng):
    x = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    qd = QuantDense(8)
    template = qd.init(jax.random.key(0), x)["params"]
    with pytest.raises(ValueError, match="missing weight"):
        quantize_weights({"bias": jnp.zeros((8,))}, template)
    with pytest.raises(ValueError, match="shape"):
        quantize_weights({"kernel": jnp.zeros((4, 8)),
                          "bias": jnp.zeros((8,))}, template)

def test_int8_act_matmul_matches_numpy_oracle(rng):
    """The W8A8 dynamic path computes exactly the quantize-matmul-rescale
    it documents (implementation exactness; the APPROXIMATION error vs
    float is bounded separately below)."""
    from ku.nn.quant import int8_act_matmul

    x = rng.normal(size=(3, 5, 16)).astype(np.float32)
    wq = rng.integers(-127, 128, size=(16, 24)).astype(np.int8)
    sc = rng.uniform(0.01, 0.05, size=(24,)).astype(np.float32)
    got = np.asarray(int8_act_matmul(jnp.asarray(x), jnp.asarray(wq),
                                     jnp.asarray(sc)))
    a_s = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-20) / 127.0
    xq = np.clip(np.round(x / a_s), -127, 127).astype(np.int8)
    want = (xq.astype(np.int32) @ wq.astype(np.int32)
            ).astype(np.float32) * a_s * sc
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_quant_dense_w8a8_error_bound(rng):
    """W8A8 is lossy but bounded: per-element activation rounding error
    is <= amax/254, so the output of a random-normal layer stays within
    a few percent of the weight-only (exact) path."""
    x = jnp.asarray(rng.normal(size=(8, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    template = QuantDense(32, use_bias=False).init(
        jax.random.key(0), x)["params"]
    qp = quantize_weights({"kernel": w}, template)
    y_w8 = QuantDense(32, use_bias=False).apply({"params": qp}, x)
    y_a8 = QuantDense(32, use_bias=False, act_quant=True).apply(
        {"params": qp}, x)
    err = np.linalg.norm(np.asarray(y_a8 - y_w8))
    ref = np.linalg.norm(np.asarray(y_w8))
    assert np.isfinite(np.asarray(y_a8)).all()
    assert err / ref < 0.02, err / ref


def test_transformer_w8a8_forward_and_decode(rng):
    """quant_weights="w8a8" threads through attention projections AND
    the FFN; forward and per-token decode stay finite and within a few
    percent of the weight-only path."""
    b, t, dm = 2, 8, 32
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    mods = {
        q: Transformer(4, dm, 0.0, causal=True, max_decode_len=t,
                       quant_weights=q)
        for q in (True, "w8a8")
    }
    float_mod = Transformer(4, dm, 0.0, causal=True, max_decode_len=t)
    fp = float_mod.init(jax.random.key(0), [x])["params"]
    template = mods[True].init(jax.random.key(0), [x])["params"]
    qp = quantize_weights(fp, template)

    outs = {}
    for q, mod in mods.items():
        y = mod.apply({"params": qp}, [x])
        assert np.isfinite(np.asarray(y)).all(), q
        outs[q] = np.asarray(y)
    rel = (np.linalg.norm(outs["w8a8"] - outs[True])
           / np.linalg.norm(outs[True]))
    assert rel < 0.05, rel

    # Per-token decode through the cache path.
    cache = mods["w8a8"].init(jax.random.key(0), [x[:, :1]],
                              decode=True)["cache"]
    ys = []
    for i in range(t):
        y, mut = mods["w8a8"].apply(
            {"params": qp, "cache": cache}, [x[:, i:i + 1]],
            decode=True, mutable=["cache"])
        cache = mut["cache"]
        ys.append(np.asarray(y))
    dec = np.concatenate(ys, axis=1)
    assert np.isfinite(dec).all()
    rel = (np.linalg.norm(dec - outs["w8a8"])
           / np.linalg.norm(outs["w8a8"]))
    assert rel < 0.05, rel
