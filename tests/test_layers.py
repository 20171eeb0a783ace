"""Numerical unit tests for the layer zoo vs numpy oracles (SURVEY §4a).

Each oracle re-implements the reference formula cited in the layer's
docstring, independently in numpy.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku
from ku.nn.convolution import _fuse_kernel


def test_equalized_lr_dense_matches_formula(key, rng):
    x = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    layer = ku.EqualizedLRDense(5, gain=math.sqrt(2), lrmul=0.5)
    params = layer.init(key, x)
    y = layer.apply(params, x)

    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    he_std = math.sqrt(2) / math.sqrt(7)
    expected = np.asarray(x) @ (kernel * he_std * 0.5) + bias
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)
    # Init std should reflect 1/lrmul (truncated normal at ±2σ).
    assert 1.0 < kernel.std() < 2.1


def test_equalized_lr_conv2d_shapes_and_scale(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    layer = ku.EqualizedLRConv2D(6, 3, padding="same", activation="leaky_relu")
    params = layer.init(key, x)
    y = layer.apply(params, x)
    assert y.shape == (2, 8, 8, 6)

    # Scale check: zero-bias linear path vs lax conv oracle.
    layer_lin = ku.EqualizedLRConv2D(6, 3, padding="same", use_bias=False)
    p = layer_lin.init(key, x)
    y_lin = layer_lin.apply(p, x)
    coeff = math.sqrt(2) / math.sqrt(8 * 8 * 3)
    oracle = jax.lax.conv_general_dilated(
        x, p["params"]["kernel"] * coeff, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y_lin), np.asarray(oracle), rtol=1e-5)


def test_fused_kernel_average_rank2():
    k = jnp.asarray(np.arange(3 * 3, dtype=np.float32).reshape(3, 3, 1, 1))
    fused = _fuse_kernel(k, 2, average=True)
    assert fused.shape == (4, 4, 1, 1)
    # Oracle: pad then average 4 shifted copies (reference convolution.py:324-329).
    kp = np.pad(np.asarray(k), [(1, 1), (1, 1), (0, 0), (0, 0)])
    expected = (kp[1:, 1:] + kp[:-1, 1:] + kp[1:, :-1] + kp[:-1, :-1]) / 4.0
    np.testing.assert_allclose(np.asarray(fused), expected)


def test_fused_conv2d_transpose_upsamples(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    layer = ku.FusedEqualizedLRConv2DTranspose(5, 3, strides=2, padding="same")
    params = layer.init(key, x)
    y = layer.apply(params, x)
    assert y.shape == (2, 8, 8, 5)


def test_blur_depthwise_is_121_blur(key):
    x = jnp.zeros((1, 5, 5, 2)).at[0, 2, 2, :].set(1.0)
    layer = ku.BlurDepthwiseConv2D(padding="same", use_bias=False)
    params = layer.init(key, x)
    y = np.asarray(layer.apply(params, x))
    b = np.array([1.0, 2.0, 1.0])
    f = np.outer(b, b) / 16.0
    np.testing.assert_allclose(y[0, 1:4, 1:4, 0], f, rtol=1e-6)
    np.testing.assert_allclose(y[0, 1:4, 1:4, 1], f, rtol=1e-6)
    np.testing.assert_allclose(y.sum(), 2.0, rtol=1e-5)


def test_depthwise_conv3d_groups(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 7, 4)).astype(np.float32))
    layer = ku.DepthwiseConv3D(3, padding="same", depth_multiplier=2)
    params = layer.init(key, x)
    y = layer.apply(params, x)
    assert y.shape == (2, 5, 6, 7, 8)


def test_separable_conv3d(key, rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 4, 3)).astype(np.float32))
    layer = ku.SeparableConv3D(6, 3, padding="same", activation="relu")
    params = layer.init(key, x)
    y = layer.apply(params, x)
    assert y.shape == (1, 4, 4, 4, 6)
    assert np.all(np.asarray(y) >= 0)


def test_adaptive_in_oracle(key, rng):
    c = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    s = rng.normal(loc=2.0, scale=3.0, size=(2, 4, 4, 3)).astype(np.float32)
    layer = ku.AdaptiveIN()
    y = layer.apply({}, [jnp.asarray(c), jnp.asarray(s)])

    eps = 1e-7
    cm = c.mean(axis=(1, 2), keepdims=True)
    cs = c.std(axis=(1, 2), keepdims=True) + eps
    sm = s.mean(axis=(1, 2), keepdims=True)
    ss = s.std(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(np.asarray(y), ss * (c - cm) / cs + sm, rtol=2e-4,
                               atol=1e-5)


def test_adaptive_in_with_style_oracle(key, rng):
    c = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    s = rng.normal(size=(2, 6)).astype(np.float32)
    layer = ku.AdaptiveINWithStyle()
    y = layer.apply({}, [jnp.asarray(c), jnp.asarray(s)])

    eps = 1e-7
    cm = c.mean(axis=(1, 2), keepdims=True)
    cs = c.std(axis=(1, 2), keepdims=True) + eps
    sr = s.reshape(-1, 2, 1, 1, 3)
    expected = (sr[:, 0] + 1) * (c - cm) / cs + sr[:, 1]
    np.testing.assert_allclose(np.asarray(y), expected, rtol=2e-4, atol=1e-5)


def test_pixel_norm(key, rng):
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    y = np.asarray(ku.PixelNorm().apply({}, jnp.asarray(x)))
    norms = np.sqrt((y**2).mean(axis=-1))
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_minibatch_stddev_concat(key, rng):
    x = rng.normal(size=(8, 4, 4, 6)).astype(np.float32)
    layer = ku.MinibatchStddevConcat(group_size=4)
    y = np.asarray(layer.apply({}, jnp.asarray(x)))
    assert y.shape == (8, 4, 4, 7)
    # Oracle (reference style.py:146-165 / NVIDIA impl).
    g = 4
    yy = x.reshape(g, -1, 4, 4, 6, 1)
    yy = yy - yy.mean(axis=0, keepdims=True)
    yy = np.sqrt((yy**2).mean(axis=0) + 1e-8)
    stat = yy.mean(axis=(1, 2, 3), keepdims=True).mean(axis=3)
    expected = np.tile(stat, (g, 4, 4, 1))
    np.testing.assert_allclose(y[..., 6:], expected, rtol=2e-4, atol=1e-6)


def test_style_mixing_regularization(key, rng):
    d1 = jnp.ones((2, 6, 8))
    d2 = jnp.zeros((2, 6, 8))
    layer = ku.StyleMixingRegularization(mixing_prob=1.0)
    y = layer.apply(
        {}, [d1, d2], deterministic=False,
        rngs={"style": jax.random.key(3)},
    )
    y = np.asarray(y)
    # With prob 1, some cutoff in [1, 6): prefix ones, suffix zeros.
    col = y[0, :, 0]
    cut = int(col.sum())
    assert 1 <= cut < 6
    np.testing.assert_allclose(col[:cut], 1.0)
    np.testing.assert_allclose(col[cut:], 0.0)
    # Deterministic: returns d1.
    np.testing.assert_allclose(
        np.asarray(layer.apply({}, [d1, d2], deterministic=True)), 1.0
    )


def test_truncation_trick_train_and_eval(key, rng):
    x = jnp.asarray(rng.normal(size=(4, 6, 8)).astype(np.float32))
    layer = ku.TruncationTrick(psi=0.5, cutoff=3, momentum=0.9)
    variables = layer.init(key, x)
    y, mutated = layer.apply(variables, x, deterministic=False,
                             mutable=["batch_stats"])
    mm = np.asarray(mutated["batch_stats"]["moving_mean"])
    expected_mm = 0.1 * np.asarray(x[:, 0]).mean(axis=0)
    np.testing.assert_allclose(mm, expected_mm, rtol=1e-5)

    # Inference: layers < cutoff shrink toward moving mean by psi.
    y_inf = layer.apply(
        {"batch_stats": mutated["batch_stats"]}, x, deterministic=True
    )
    expected = mm + (np.asarray(x) - mm) * np.where(
        np.arange(6)[None, :, None] < 3, 0.5, 1.0
    )
    np.testing.assert_allclose(np.asarray(y_inf), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize(
    "sim", ["plain", "scaled", "general", "diff_abs", "additive"]
)
def test_multi_head_attention_types(key, rng, sim):
    q = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    m = jnp.ones((2, 1, 5, 5))
    layer = ku.MultiHeadAttention(2, 8, 0.0, similarity_type=sim)
    params = layer.init(key, [q, q, q, m])
    y = layer.apply(params, [q, q, q, m])
    assert y.shape == (2, 5, 8)
    assert np.isfinite(np.asarray(y)).all()


def test_scaled_attention_oracle(key, rng):
    """Scaled similarity vs a numpy softmax(QKᵀ/√d_k)V oracle."""
    q = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, 8, 0.0, similarity_type="scaled")
    params = layer.init(key, [q, q, q, None])
    y = np.asarray(layer.apply(params, [q, q, q, None]))

    p = params["params"]
    qn = np.asarray(q)

    def split(x):
        return np.transpose(x.reshape(1, 4, 2, 4), (0, 2, 1, 3))

    qh = split(qn @ np.asarray(p["W_Q"]))
    kh = split(qn @ np.asarray(p["W_K"]))
    vh = split(qn @ np.asarray(p["W_V"]))
    scores = qh @ np.transpose(kh, (0, 1, 3, 2)) / np.sqrt(8)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    head = probs @ vh
    head = np.transpose(head, (0, 2, 1, 3)).reshape(1, 4, 8)
    expected = head @ np.asarray(p["W_multi_head"])
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_dense(rng):
    from ku.pallas.flash_attention import flash_attention

    q = jnp.asarray(rng.normal(size=(2, 2, 33, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, 57, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, 57, 16)).astype(np.float32))
    out = flash_attention(q, k, v, softmax_scale=0.25)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kwargs", [
    {}, {"num_kv_head": 2}, {"window": 5}, {"num_kv_head": 1, "window": 3},
])
def test_mha_kv_cache_decode_matches_full(key, rng, kwargs):
    """Autoregressive KV-cache decoding (serving path): feeding tokens
    one-by-one with decode=True reproduces the full causal forward — for
    plain MHA, GQA, MQA, and sliding-window variants."""
    b, t, dm = 2, 7, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, **kwargs)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    cache = {}
    steps = []
    for i in range(t):
        tok = x[:, i:i + 1]
        y, mut = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        cache = mut
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cache["cache"]["cache_index"]), t)


def test_transformer_kv_cache_decode_matches_full(key, rng):
    """Transformer block decode (both attention sublayers carry their own
    cache) == full causal forward, token by token."""
    b, t, dm = 2, 6, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, num_kv_head=1,
                           max_decode_len=t)
    variables = block.init(key, [x])
    full = np.asarray(block.apply(variables, [x]))

    cache = {}
    steps = []
    for i in range(t):
        tok = x[:, i:i + 1]
        y, mut = block.apply(
            {"params": variables["params"], **cache},
            [tok], decode=True, mutable=["cache"])
        cache = mut
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("hkv,chunks,flash", [
    (2, (4,), False), (1, (4,), False), (2, (3, 4), False),
    (2, (4,), True), (2, (3, 4), True),  # flash: q_offset 0 and >0 paths
])
def test_mha_prefill_then_decode_matches_full(key, rng, hkv, chunks,
                                              flash):
    """Prefill (decode=True with a length-L chunk) fills the dense cache
    in one dispatch; chunked prefill composes; subsequent per-token
    decode continues where the prompt left off — all == full forward.
    With use_flash the prompt pass runs the streaming kernel over the
    cache page with a traced global query offset."""
    b, t, dm = 2, 9, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, num_kv_head=hkv,
                                  use_flash=flash)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    cache, steps, i = {}, [], 0
    for c in chunks:
        chunk = x[:, i:i + c]
        y, cache = layer.apply(
            {"params": variables["params"], **cache},
            [chunk, chunk, chunk], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
        i += c
    for j in range(i, t):
        tok = x[:, j:j + 1]
        y, cache = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cache["cache"]["cache_index"]), t)


@pytest.mark.parametrize("gp,hkv,pre,flash", [
    (2, 2, 17, False), (2, 1, 17, False), (1, 2, 5, False),
    (2, 2, 2, False), (0, 2, 17, True),  # flash: banded prompt pass
])
def test_mha_ring_prefill_then_decode(key, rng, gp, hkv, pre, flash):
    """Ring-cache prefill: a fresh-cache prompt longer OR shorter than
    the gp+window cache lands the exact state L per-token steps would
    (positions, sink pinning, overwrite order), so continuing decode
    matches the full sink+window forward."""
    b, t, dm, win = 2, 23, 8, 6
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=win,
                                  global_prefix=gp, num_kv_head=hkv,
                                  use_flash=flash)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    chunk = x[:, :pre]
    y, prefill_cache = layer.apply(variables, [chunk, chunk, chunk],
                                   decode=True, mutable=["cache"])
    cache = prefill_cache
    steps = [np.asarray(y)]
    for i in range(pre, t):
        tok = x[:, i:i + 1]
        y, cache = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)

    # The prefilled cache state must equal the state of `pre` per-token
    # steps (same slots, same positions).
    ref_cache = {}
    for i in range(pre):
        tok = x[:, i:i + 1]
        _, ref_cache = layer.apply(
            {"params": variables["params"], **ref_cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
    for k in ("cached_key", "cached_value", "cache_pos", "cache_index"):
        np.testing.assert_allclose(
            np.asarray(prefill_cache["cache"][k]),
            np.asarray(ref_cache["cache"][k]), rtol=1e-5, atol=1e-6,
            err_msg=k)


def test_transformer_prefill_then_decode(key, rng):
    """Transformer block: one-dispatch prompt prefill through both
    attention sublayers, then per-token decode == full forward."""
    b, t, pre, dm = 1, 11, 6, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=t)
    variables = block.init(key, [x])
    full = np.asarray(block.apply(variables, [x]))

    y, cache = block.apply(variables, [x[:, :pre]], decode=True,
                           mutable=["cache"])
    steps = [np.asarray(y)]
    for i in range(pre, t):
        y, cache = block.apply(
            {"params": variables["params"], **cache},
            [x[:, i:i + 1]], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("ring,hkv", [(False, 2), (False, 1), (True, 2)])
def test_mha_int8_kv_cache_decode(key, rng, ring, hkv):
    """int8-quantized KV cache: per-token decode tracks the f32 full
    forward within quantization tolerance, the cache really stores int8,
    and prefill lands bit-identical quantized state to per-token steps
    (dense and ring caches, GQA)."""
    b, t, dm, pre = 2, 13, 16, 7
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    kw = dict(window=6, global_prefix=2) if ring else dict(
        max_decode_len=t)
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  num_kv_head=hkv, kv_cache_dtype="int8",
                                  **kw)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    cache, steps = {}, []
    for i in range(t):
        tok = x[:, i:i + 1]
        y, cache = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
    got = np.concatenate(steps, axis=1)
    np.testing.assert_allclose(got, full, rtol=5e-2, atol=5e-3)
    assert cache["cache"]["cached_key"].dtype == jnp.int8
    assert cache["cache"]["cached_value"].dtype == jnp.int8

    # Prefill must land the exact same quantized state as per-token steps.
    chunk = x[:, :pre]
    _, pc = layer.apply(variables, [chunk, chunk, chunk], decode=True,
                        mutable=["cache"])
    ref = {}
    for i in range(pre):
        tok = x[:, i:i + 1]
        _, ref = layer.apply({"params": variables["params"], **ref},
                             [tok, tok, tok], decode=True,
                             mutable=["cache"])
    for k in ("cached_key", "cached_value", "key_scale", "value_scale"):
        np.testing.assert_array_equal(np.asarray(pc["cache"][k]),
                                      np.asarray(ref["cache"][k]),
                                      err_msg=k)


def test_transformer_int8_kv_cache_decode(key, rng):
    b, t, dm = 1, 9, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=t,
                           kv_cache_dtype="int8")
    variables = block.init(key, [x])
    full = np.asarray(block.apply(variables, [x]))
    cache, steps = {}, []
    for i in range(t):
        y, cache = block.apply(
            {"params": variables["params"], **cache},
            [x[:, i:i + 1]], decode=True, mutable=["cache"])
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=5e-2, atol=1e-2)


@pytest.mark.parametrize("gp,hkv", [(0, 2), (2, 2), (2, 1)])
def test_mha_ring_buffer_decode_unbounded(key, rng, gp, hkv):
    """StreamingLLM ring-buffer decode: with a sliding window the cache
    is global_prefix + window slots and decode length is UNBOUNDED —
    feeding t >> cache-size tokens one-by-one reproduces the full
    sink+window causal forward, with and without sinks/GQA."""
    b, t, dm, win = 2, 23, 8, 6
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=win,
                                  global_prefix=gp, num_kv_head=hkv)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    cache = {}
    steps = []
    for i in range(t):
        tok = x[:, i:i + 1]
        y, mut = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        cache = mut
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)
    # The cache really is bounded: gp + window slots, far below t.
    assert cache["cache"]["cached_key"].shape[2] == gp + win < t
    np.testing.assert_array_equal(
        np.asarray(cache["cache"]["cache_index"]), t)


def test_transformer_ring_buffer_decode(key, rng):
    """Transformer block with sinks + window decodes unbounded lengths
    through ring-buffer caches in both attention sublayers."""
    b, t, dm = 1, 19, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, window=5,
                           global_prefix=1)
    variables = block.init(key, [x])
    full = np.asarray(block.apply(variables, [x]))

    cache = {}
    steps = []
    for i in range(t):
        y, mut = block.apply(
            {"params": variables["params"], **cache},
            [x[:, i:i + 1]], decode=True, mutable=["cache"])
        cache = mut
        steps.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(steps, axis=1), full,
                               rtol=1e-4, atol=1e-5)


def test_mha_global_prefix_validation(key, rng):
    x = jnp.zeros((1, 4, 8))
    with pytest.raises(ValueError, match="window too"):
        ku.MultiHeadAttention(2, 8, causal=True, global_prefix=2).init(
            key, [x, x, x])
    with pytest.raises(ValueError, match="block_mask"):
        ku.MultiHeadAttention(2, 8, causal=True, window=2,
                              global_prefix=1, use_flash=True).init(
            key, [x, x, x])


def test_mha_decode_validation(key, rng):
    x = jnp.zeros((1, 1, 8))
    mha = ku.MultiHeadAttention(2, 8, causal=False, max_decode_len=4)
    with pytest.raises(ValueError, match="causal"):
        mha.init(key, [x, x, x], decode=True)
    mha = ku.MultiHeadAttention(2, 8, causal=True)
    with pytest.raises(ValueError, match="max_decode_len"):
        mha.init(key, [x, x, x], decode=True)


def test_mha_segment_ids_dense_vs_flash(key, rng):
    """Layer-level packed-sequence masking: the dense and flash paths of
    MultiHeadAttention(segment_ids=...) agree, and tokens of one segment
    cannot influence another segment's outputs."""
    b, t, dm = 2, 12, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    seg = np.zeros((b, t), np.int32)
    seg[:, 5:] = 1
    seg_j = jnp.asarray(seg)

    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True)
    flash = ku.MultiHeadAttention(2, dm, 0.0, causal=True, use_flash=True)
    variables = dense.init(key, [x, x, x])
    y_dense = np.asarray(dense.apply(variables, [x, x, x],
                                     segment_ids=seg_j))
    y_flash = np.asarray(flash.apply(variables, [x, x, x],
                                     segment_ids=seg_j))
    np.testing.assert_allclose(y_flash, y_dense, rtol=1e-4, atol=1e-5)

    # Perturbing segment-1 tokens must not change segment-0 outputs.
    x2 = x.at[:, 5:].add(1.7)
    y2 = np.asarray(dense.apply(variables, [x2, x2, x2],
                                segment_ids=seg_j))
    np.testing.assert_allclose(y2[:, :5], y_dense[:, :5], rtol=1e-5,
                               atol=1e-6)
    assert np.abs(y2[:, 5:] - y_dense[:, 5:]).max() > 1e-3

    with pytest.raises(ValueError, match="segment_ids"):
        ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                              max_decode_len=4).apply(
            variables, [x[:, :1], x[:, :1], x[:, :1]], decode=True,
            segment_ids=seg_j[:, :1])


def test_transformer_segment_ids(key, rng):
    """Transformer forwards segment_ids to both attention sublayers:
    cross-segment influence is blocked through the whole block."""
    b, t, dm = 2, 10, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    seg = np.zeros((b, t), np.int32)
    seg[:, 4:] = 3
    seg_j = jnp.asarray(seg)

    block = ku.Transformer(2, dm, 0.0, causal=True)
    variables = block.init(key, [x])
    y = np.asarray(block.apply(variables, [x], segment_ids=seg_j))
    x2 = x.at[:, 4:].add(0.9)
    y2 = np.asarray(block.apply(variables, [x2], segment_ids=seg_j))
    np.testing.assert_allclose(y2[:, :4], y[:, :4], rtol=1e-5, atol=1e-6)

    flash = ku.Transformer(2, dm, 0.0, causal=True, use_flash=True)
    y_flash = np.asarray(flash.apply(variables, [x], segment_ids=seg_j))
    np.testing.assert_allclose(y_flash, y, rtol=1e-4, atol=1e-5)


def test_position_encodings(key, rng):
    x = jnp.zeros((2, 5, 4))
    y = np.asarray(ku.OrdinalPositionEncoding(10).apply({}, x))
    np.testing.assert_allclose(y[0, :, 0], (np.arange(1, 6)) / 10.0, rtol=1e-6)

    y2 = np.asarray(ku.PeriodicPositionEncoding(8, 4, 10000.0).apply({}, x))
    pos = np.arange(8)[:, None]
    pf = np.arange(4)[None, :]
    angle = pos / np.power(10000.0, 2 * (pf // 2) / 4.0)
    table = np.zeros((8, 4), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    np.testing.assert_allclose(y2[0], table[:5], rtol=1e-5, atol=1e-6)


def test_transformer_block(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    m = jnp.ones((2, 1, 5, 5))
    layer = ku.Transformer(2, 8, 0.1)
    params = layer.init(key, [x, m])
    y = layer.apply(params, [x, m])
    assert y.shape == (2, 5, 8)

    emb = jnp.asarray(rng.normal(size=(2, 8)).astype(np.float32))
    it = ku.InterferedTransformer(2, 8, 0.1)
    p2 = it.init(key, [emb, x, m])
    y2 = it.apply(p2, [emb, x, m])
    assert y2.shape == (2, 5, 8)


def test_dense_batch_normalization(key, rng):
    x = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    layer = ku.DenseBatchNormalization(5, activation="relu", dropout_rate=0.1)
    variables = layer.init(key, x)
    y = layer.apply(variables, x, deterministic=True)
    assert y.shape == (4, 5)
    y2, _ = layer.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"],
    )
    assert y2.shape == (4, 5)


def test_gcn_oracle(key, rng):
    n = 5
    x = rng.normal(size=(2, n, 3)).astype(np.float32)
    a = (rng.uniform(size=(2, n, n)) < 0.4).astype(np.float32)
    a = np.maximum(a, np.transpose(a, (0, 2, 1)))
    layer = ku.GraphConvolutionNetwork(n, 4, activation="relu")
    params = layer.init(key, [jnp.asarray(x), jnp.asarray(a)])
    y = np.asarray(layer.apply(params, [jnp.asarray(x), jnp.asarray(a)]))

    w = np.asarray(params["params"]["gcn_weight"])
    at = a + np.eye(n)
    deg = at.sum(-1)
    dis = 1.0 / np.sqrt(deg)
    ahat = at * dis[..., :, None] * dis[..., None, :]
    expected = np.maximum(ahat @ x @ w, 0.0)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)

    out = layer.apply(params, [jnp.asarray(x), jnp.asarray(a)],
                      method=None)
    assert out.shape == (2, n, 4)


def test_he_normal_initializer(key):
    from ku.initializers_ext import he_normal

    init = he_normal(scale=2.0)
    w = init(key, (1000, 100))
    std = float(jnp.std(w))
    # Truncated-normal variance scaling: std ≈ sqrt(2/1000) within tolerance.
    assert 0.7 * np.sqrt(2 / 1000) < std < 1.1 * np.sqrt(2 / 1000)


def test_generate_greedy_matches_manual_loop(key, rng):
    """ku.nn.generate (prefill + scanned decode, two dispatches) emits
    the same tokens as a hand-rolled per-token greedy loop."""
    from ku.nn import generate

    vocab, dm, b, p, steps = 11, 8, 2, 4, 6
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True,
                           max_decode_len=p + steps)

    def embed(ids, pos=None):
        return table[ids]

    def readout(y):
        return y @ table.T

    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    variables = block.init(key, [embed(ids)])
    params = variables["params"]

    got = np.asarray(generate(block, params, ids, steps,
                              embed=embed, readout=readout))

    # Manual loop: prefill via per-token decode calls, then greedy.
    cache, cur = {}, ids
    toks = []
    y = None
    for i in range(p):
        y, cache = block.apply({"params": params, **cache},
                               [embed(cur[:, i:i + 1])], decode=True,
                               mutable=["cache"])
    tok = jnp.argmax(readout(y)[:, 0], axis=-1)
    for _ in range(steps):
        toks.append(np.asarray(tok))
        y, cache = block.apply({"params": params, **cache},
                               [embed(tok[:, None])], decode=True,
                               mutable=["cache"])
        tok = jnp.argmax(readout(y)[:, 0], axis=-1)
    np.testing.assert_array_equal(got, np.stack(toks, axis=1))
    assert got.shape == (b, steps)


def test_generate_samplers(key, rng):
    """top_k=1 sampling == greedy; temperature sampling is deterministic
    per key, in-vocab, and jit-compatible."""
    from ku.nn import generate, make_sampler

    vocab, dm, b, p, steps = 7, 8, 2, 3, 5
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, window=4,
                           global_prefix=1)  # ring cache: unbounded
    embed, readout = (lambda i, p=None: table[i]), (lambda y: y @ table.T)
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]

    g = generate(block, params, ids, steps, embed=embed, readout=readout)
    k1 = generate(block, params, ids, steps, embed=embed, readout=readout,
                  sampler=make_sampler(temperature=1e-4, top_k=1),
                  rng=jax.random.key(3))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(k1))

    samp = make_sampler(temperature=1.0, top_k=3)
    jitted = jax.jit(lambda ids, r: generate(
        block, params, ids, steps, embed=embed, readout=readout,
        sampler=samp, rng=r))
    s1 = np.asarray(jitted(ids, jax.random.key(5)))
    s2 = np.asarray(jitted(ids, jax.random.key(5)))
    np.testing.assert_array_equal(s1, s2)
    assert s1.shape == (b, steps) and s1.min() >= 0 and s1.max() < vocab


@pytest.mark.parametrize("qdt,flash", [(None, False), ("int8", False),
                                       (None, True)])
def test_mha_ragged_prefill_continuous_batching(key, rng, qdt, flash):
    """Ragged prefill (prompt_lengths): one right-padded batched prefill
    + per-token decode reproduces, for every sequence, the batch-1
    uniform prefill + decode of that sequence alone — per-sequence
    cache_index, padding slots overwritten, dense/int8/flash paths."""
    b, dm, pad, steps, total = 3, 8, 7, 3, 10
    lens = np.array([7, 4, 6])
    x = jnp.asarray(rng.normal(size=(b, total, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=total, num_kv_head=2,
                                  kv_cache_dtype=qdt, use_flash=flash)
    variables = layer.init(key, [x, x, x])
    params = {"params": variables["params"]}

    chunk = x[:, :pad]
    y0, cache = layer.apply(variables, [chunk, chunk, chunk], decode=True,
                            prompt_lengths=jnp.asarray(lens),
                            mutable=["cache"])
    np.testing.assert_array_equal(
        np.asarray(cache["cache"]["cache_index"]), lens)
    step_outs = []
    for i in range(steps):
        tok = x[jnp.arange(b), lens + i][:, None]
        y_i, cache = layer.apply(
            {**params, **cache}, [tok, tok, tok], decode=True,
            mutable=["cache"])
        step_outs.append(np.asarray(y_i))

    for bi in range(b):
        xb = x[bi:bi + 1, : lens[bi]]
        yb, cb = layer.apply(variables, [xb, xb, xb], decode=True,
                             mutable=["cache"])
        np.testing.assert_allclose(np.asarray(y0)[bi, : lens[bi]],
                                   np.asarray(yb)[0], rtol=2e-4,
                                   atol=2e-5)
        for i in range(steps):
            tb = x[bi:bi + 1, lens[bi] + i][:, None]
            yb_i, cb = layer.apply({**params, **cb}, [tb, tb, tb],
                                   decode=True, mutable=["cache"])
            np.testing.assert_allclose(step_outs[i][bi, 0],
                                       np.asarray(yb_i)[0, 0], rtol=2e-4,
                                       atol=2e-5)


def test_generate_ragged_prompts(key, rng):
    """generate(prompt_lengths=...) on right-padded prompts emits, per
    sequence, exactly what batch-1 generate on the unpadded prompt
    emits (greedy)."""
    from ku.nn import generate

    vocab, dm, b, pad, steps = 11, 8, 3, 5, 4
    lens = np.array([5, 2, 4])
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True,
                           max_decode_len=pad + steps)
    embed = lambda i, p=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, pad)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]

    got = np.asarray(generate(block, params, ids, steps, embed=embed,
                              readout=readout,
                              prompt_lengths=jnp.asarray(lens)))
    for bi in range(b):
        solo = np.asarray(generate(block, params,
                                   ids[bi:bi + 1, : lens[bi]], steps,
                                   embed=embed, readout=readout))
        np.testing.assert_array_equal(got[bi], solo[0], err_msg=str(bi))


def test_beam_search_beam1_equals_greedy(key, rng):
    from ku.nn import beam_search, generate

    vocab, dm, b, p, steps = 9, 8, 2, 4, 5
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True,
                           max_decode_len=p + steps)
    embed = lambda i, pos=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]

    g = np.asarray(generate(block, params, ids, steps, embed=embed,
                            readout=readout))
    beams, scores = beam_search(block, params, ids, steps, embed=embed,
                                readout=readout, beam_size=1)
    np.testing.assert_array_equal(np.asarray(beams)[:, 0], g)
    assert np.asarray(scores).shape == (b, 1)


def test_beam_search_exhaustive_small(key, rng):
    """With beam_size >= V**(steps-1) the search is exhaustive: the top
    beam must equal the brute-force argmax over all V**steps sequences
    scored by teacher-forced log-probability, and its score must match."""
    from ku.nn import beam_search

    vocab, dm, b, p, steps = 5, 8, 2, 3, 3
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True,
                           max_decode_len=p + steps)
    embed = lambda i, pos=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]

    beams, scores = beam_search(block, params, ids, steps, embed=embed,
                                readout=readout, beam_size=vocab ** 2)
    beams, scores = np.asarray(beams), np.asarray(scores)

    # Brute force: teacher-forced full forwards over all 125 sequences.
    from itertools import product
    cands = np.array(list(product(range(vocab), repeat=steps)), np.int32)
    best_score = np.full((b,), -np.inf)
    best_seq = np.zeros((b, steps), np.int32)
    for cand in cands:
        seq = np.concatenate(
            [np.asarray(ids), np.tile(cand, (b, 1))], axis=1)
        y = block.apply({"params": params}, [embed(jnp.asarray(seq))])
        logp = np.asarray(jax.nn.log_softmax(readout(y), axis=-1))
        # log p(cand_t | prefix) read at positions p-1 .. p+steps-2.
        sc = sum(logp[:, p - 1 + t, cand[t]] for t in range(steps))
        upd = sc > best_score
        best_score = np.where(upd, sc, best_score)
        best_seq[upd] = cand
    np.testing.assert_array_equal(beams[:, 0], best_seq)
    np.testing.assert_allclose(scores[:, 0], best_score, rtol=1e-4,
                               atol=1e-5)
    # Scores must be sorted best-first.
    assert (np.diff(scores, axis=1) <= 1e-6).all()


def test_serving_validation_guards(key, rng):
    """Misuse fails fast: ring prefill into a non-empty cache, width-1
    prompt_lengths, and wrong-shaped prompt_lengths all raise."""
    dm = 8
    x = jnp.asarray(rng.normal(size=(2, 6, dm)).astype(np.float32))
    ring = ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=3,
                                 global_prefix=1)
    variables = ring.init(key, [x, x, x])
    chunk = x[:, :3]
    _, cache = ring.apply(variables, [chunk, chunk, chunk], decode=True,
                          mutable=["cache"])
    with pytest.raises(ValueError, match="EMPTY cache"):
        ring.apply({"params": variables["params"], **cache},
                   [chunk, chunk, chunk], decode=True, mutable=["cache"])

    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=6)
    dv = dense.init(key, [x, x, x])
    tok = x[:, :1]
    with pytest.raises(ValueError, match="width > 1"):
        dense.apply(dv, [tok, tok, tok], decode=True,
                    prompt_lengths=jnp.asarray([1, 1]), mutable=["cache"])
    with pytest.raises(ValueError, match="shape"):
        dense.apply(dv, [chunk, chunk, chunk], decode=True,
                    prompt_lengths=jnp.asarray([[2], [3]]),
                    mutable=["cache"])


@pytest.mark.parametrize("same_draft,gamma", [(True, 3), (False, 3),
                                              (False, 1), (False, 5)])
def test_speculative_generate_equals_greedy(key, rng, same_draft, gamma):
    """Speculative decoding is EXACT: output == target-only greedy
    generate, whether the draft is the target itself (accept-all fast
    path) or an unrelated model (frequent rejections); the acceptance
    diagnostic reflects the difference."""
    from ku.nn import generate, speculative_generate

    vocab, dm, b, p, steps = 7, 8, 2, 4, 9
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    mx = p + steps + gamma + 1
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=mx)
    embed = lambda i, pos=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]
    if same_draft:
        draft, dparams = block, params
    else:
        draft = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=mx)
        dparams = draft.init(jax.random.key(99), [embed(ids)])["params"]

    want = np.asarray(generate(block, params, ids, steps, embed=embed,
                               readout=readout))
    got, acc = speculative_generate(
        block, params, draft, dparams, ids, steps, embed=embed,
        readout=readout, gamma=gamma)
    np.testing.assert_array_equal(np.asarray(got), want)
    acc = np.asarray(acc)
    if same_draft:
        # Target-as-draft accepts everything: gamma+1 tokens per round.
        np.testing.assert_allclose(acc, gamma + 1.0)
    else:
        assert (acc >= 1.0).all() and (acc <= gamma + 1.0).all()


def test_fork_cache_prefix_caching(key, rng):
    """A shared prefix prefilled once and forked n ways serves divergent
    suffixes identically to prefilling each full sequence separately."""
    from ku.nn import fork_cache

    dm, pre, n = 8, 5, 3
    x = jnp.asarray(rng.normal(size=(1, pre, dm)).astype(np.float32))
    sufs = jnp.asarray(rng.normal(size=(n, 4, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=16, num_kv_head=1)
    variables = layer.init(key, [x, x, x])
    params = {"params": variables["params"]}

    _, shared = layer.apply(variables, [x, x, x], decode=True,
                            mutable=["cache"])
    forked = {"cache": fork_cache(shared["cache"], n)}
    ys, cache = layer.apply(
        {**params, **forked}, [sufs, sufs, sufs], decode=True,
        mutable=["cache"])

    for i in range(n):
        seq = jnp.concatenate([x, sufs[i:i + 1]], axis=1)
        # Forked suffix outputs == full-sequence forward outputs.
        full = layer.apply(variables, [seq, seq, seq])
        np.testing.assert_allclose(np.asarray(ys)[i], np.asarray(full)[
            0, pre:], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cache["cache"]["cache_index"]), pre + 4)


def test_speculative_sampling_matches_target_distribution(key, rng):
    """Speculative SAMPLING (temperature mode) preserves the target
    distribution exactly: over 8192 independent rows, the empirical
    joint distribution of the first two sampled tokens matches the
    teacher-forced target probabilities within multinomial noise, even
    though proposals come from an unrelated draft model."""
    from ku.nn import speculative_generate

    vocab, dm, b, p, steps, gamma = 5, 8, 8192, 2, 2, 2
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    mx = p + steps + gamma + 1
    block = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=mx)
    draft = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=mx)
    embed = lambda i, pos=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    prompt = np.array([1, 3], np.int32)
    ids = jnp.asarray(np.tile(prompt, (b, 1)))
    params = block.init(key, [embed(ids[:1])])["params"]
    dparams = draft.init(jax.random.key(123), [embed(ids[:1])])["params"]

    got, _ = speculative_generate(
        block, params, draft, dparams, ids, steps, embed=embed,
        readout=readout, gamma=gamma, temperature=1.0,
        rng=jax.random.key(7))
    got = np.asarray(got)

    # Teacher-forced exact probabilities.
    def probs_after(prefix):  # (1, L) -> (V,) next-token distribution
        y = block.apply({"params": params},
                        [embed(jnp.asarray(prefix)[None])])
        return np.asarray(jax.nn.softmax(readout(y)[0, -1]))

    p1 = probs_after(prompt)
    joint = np.zeros((vocab, vocab))
    for x1 in range(vocab):
        p2 = probs_after(np.concatenate([prompt, [x1]]).astype(np.int32))
        joint[x1] = p1[x1] * p2

    emp = np.zeros((vocab, vocab))
    for x1, x2 in got:
        emp[x1, x2] += 1.0 / b
    # Multinomial se <= sqrt(0.25/8192) ~ 0.0055; 0.025 is >4.5 sigma.
    np.testing.assert_allclose(emp, joint, atol=0.025)
    assert abs(emp.sum() - 1.0) < 1e-6


def test_mask_after_eos():
    from ku.nn import mask_after_eos

    ids = jnp.asarray([[3, 7, 2, 5, 5], [1, 1, 1, 1, 1], [7, 3, 3, 7, 4]])
    out, lens = mask_after_eos(ids, eos_id=7, pad_id=0)
    np.testing.assert_array_equal(np.asarray(out),
                                  [[3, 7, 0, 0, 0], [1, 1, 1, 1, 1],
                                   [7, 0, 0, 0, 0]])
    np.testing.assert_array_equal(np.asarray(lens), [2, 5, 1])


def test_apply_rope_relative_shift_invariance(rng):
    """RoPE's defining property: rotated dot products depend only on the
    RELATIVE position — shifting both positions by s leaves every
    q·k score unchanged."""
    from ku.nn import apply_rope

    q = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 5, 8)).astype(np.float32))
    pos = jnp.arange(5)
    s0 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, pos),
                    apply_rope(k, pos))
    s7 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, pos + 7),
                    apply_rope(k, pos + 7))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s7), rtol=1e-4,
                               atol=1e-5)
    # And it is NOT position-independent: mixing shifts changes scores.
    s_mix = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, pos),
                       apply_rope(k, pos + 7))
    assert np.abs(np.asarray(s_mix) - np.asarray(s0)).max() > 1e-3


@pytest.mark.parametrize("kwargs", [
    {"max_decode_len": 23}, {"max_decode_len": 23, "kv_cache_dtype": "int8"},
    {"window": 6, "global_prefix": 2},
])
def test_mha_rope_decode_matches_full(key, rng, kwargs):
    """RoPE decode: rotate-before-cache reproduces the full rotated
    forward through prefill + per-token steps — dense, int8, and ring
    caches."""
    b, t, dm, pre = 2, 13, 16, 5
    tol = dict(rtol=5e-2, atol=5e-3) if "kv_cache_dtype" in kwargs \
        else dict(rtol=1e-4, atol=1e-5)
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True, rope=True,
                                  num_kv_head=1, **kwargs)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))

    chunk = x[:, :pre]
    y, cache = layer.apply(variables, [chunk, chunk, chunk], decode=True,
                           mutable=["cache"])
    outs = [np.asarray(y)]
    for i in range(pre, t):
        tok = x[:, i:i + 1]
        y, cache = layer.apply(
            {"params": variables["params"], **cache},
            [tok, tok, tok], decode=True, mutable=["cache"])
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, **tol)


def test_mha_rope_flash_matches_dense(key, rng):
    """RoPE is pure preprocessing: the flash path (rotated q/k into the
    unchanged kernel) == the dense rotated path."""
    b, t, dm = 2, 40, 16
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True, rope=True)
    flash = ku.MultiHeadAttention(2, dm, 0.0, causal=True, rope=True,
                                  use_flash=True)
    variables = dense.init(key, [x, x, x])
    yd = dense.apply(variables, [x, x, x])
    yf = flash.apply(variables, [x, x, x])
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yd), rtol=2e-4,
                               atol=2e-5)


def test_transformer_rope_generate(key, rng):
    """RoPE threads through Transformer and the generate loop (no
    external position table needed — positions live in the rotation)."""
    from ku.nn import generate

    vocab, dm, b, p, steps = 9, 16, 2, 4, 5
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True, rope=True,
                           max_decode_len=p + steps)
    embed = lambda i, pos=None: table[i]  # noqa: E731
    readout = lambda y: y @ table.T  # noqa: E731
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = block.init(key, [embed(ids)])["params"]

    got = np.asarray(generate(block, params, ids, steps, embed=embed,
                              readout=readout))
    # Manual per-token decode oracle.
    cache, y = {}, None
    for i in range(p):
        y, cache = block.apply({"params": params, **cache},
                               [embed(ids[:, i:i + 1])], decode=True,
                               mutable=["cache"])
    tok = jnp.argmax(readout(y)[:, 0], axis=-1)
    toks = []
    for _ in range(steps):
        toks.append(np.asarray(tok))
        y, cache = block.apply({"params": params, **cache},
                               [embed(tok[:, None])], decode=True,
                               mutable=["cache"])
        tok = jnp.argmax(readout(y)[:, 0], axis=-1)
    np.testing.assert_array_equal(got, np.stack(toks, axis=1))


def test_mha_logit_softcap_oracle_and_paths(key, rng):
    """logit_softcap: dense path == numpy tanh-cap oracle; flash path ==
    dense; decode (prefill + steps, int8 ring too) == full forward."""
    b, t, dm, cap = 2, 12, 16, 4.0
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))

    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=False,
                                  logit_softcap=cap)
    variables = dense.init(key, [x, x, x])
    y = np.asarray(dense.apply(variables, [x, x, x]))

    # Numpy oracle through the same projections.
    p = variables["params"]
    qh = (np.asarray(x) @ np.asarray(p["W_Q"])).reshape(b, t, 2, 8)
    kh = (np.asarray(x) @ np.asarray(p["W_K"])).reshape(b, t, 2, 8)
    vh = (np.asarray(x) @ np.asarray(p["W_V"])).reshape(b, t, 2, 8)
    s = np.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(dm)
    s = cap * np.tanh(s / cap)
    e = np.exp(s - s.max(-1, keepdims=True))
    pr = e / e.sum(-1, keepdims=True)
    head = np.einsum("bhqk,bkhd->bqhd", pr, vh).reshape(b, t, dm)
    expected = head @ np.asarray(p["W_multi_head"])
    np.testing.assert_allclose(y, expected, rtol=2e-4, atol=2e-5)

    # Flash == dense (causal; XLA-fallback dispatch on CPU).
    dc = ku.MultiHeadAttention(2, dm, 0.0, causal=True, logit_softcap=cap)
    fc = ku.MultiHeadAttention(2, dm, 0.0, causal=True, logit_softcap=cap,
                               use_flash=True)
    vc = dc.init(key, [x, x, x])
    np.testing.assert_allclose(np.asarray(fc.apply(vc, [x, x, x])),
                               np.asarray(dc.apply(vc, [x, x, x])),
                               rtol=2e-4, atol=2e-5)

    # Decode (prefill + per-token, int8 ring) == full forward.
    ring = ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=5,
                                 global_prefix=1, kv_cache_dtype="int8",
                                 logit_softcap=cap)
    vr = ring.init(key, [x, x, x])
    full = np.asarray(ring.apply(vr, [x, x, x]))
    chunk = x[:, :4]
    yy, cache = ring.apply(vr, [chunk, chunk, chunk], decode=True,
                           mutable=["cache"])
    outs = [np.asarray(yy)]
    for i in range(4, t):
        tok = x[:, i:i + 1]
        yy, cache = ring.apply({"params": vr["params"], **cache},
                               [tok, tok, tok], decode=True,
                               mutable=["cache"])
        outs.append(np.asarray(yy))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=5e-2, atol=5e-3)


def test_mha_flash_softcap_prefill_regression(key, rng):
    """use_flash + logit_softcap through the jitted public kernel wrapper
    (prefill decode path) — regression for the static_argnames omission
    that made the float cap a tracer captured by the kernel closure."""
    b, t, dm, pre, cap = 2, 10, 16, 6, 4.0
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, use_flash=True,
                                  logit_softcap=cap)
    variables = layer.init(key, [x, x, x])
    full = np.asarray(layer.apply(variables, [x, x, x]))
    chunk = x[:, :pre]
    y, cache = layer.apply(variables, [chunk, chunk, chunk], decode=True,
                           mutable=["cache"])
    outs = [np.asarray(y)]
    for i in range(pre, t):
        tok = x[:, i:i + 1]
        y, cache = layer.apply({"params": variables["params"], **cache},
                               [tok, tok, tok], decode=True,
                               mutable=["cache"])
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=2e-4, atol=2e-5)


def test_softcap_and_rope_validation(key, rng):
    x = jnp.zeros((1, 4, 8))
    with pytest.raises(ValueError, match="positive"):
        ku.MultiHeadAttention(2, 8, logit_softcap=0.0).init(key, [x, x, x])
    from ku.nn import apply_rope
    with pytest.raises(ValueError, match="even head dim"):
        apply_rope(jnp.zeros((1, 2, 4, 7)), jnp.arange(4))
    with pytest.raises(ValueError, match="pos must be"):
        apply_rope(jnp.zeros((1, 2, 4, 8)), jnp.int32(3))


def test_decode_config_sweep_matches_full(key):
    """Randomized combination sweep over the serving-config space (GQA ×
    ring/sinks × int8 × RoPE × softcap × prefill chunking): per-token
    decode after an optional prefill must reproduce the full forward for
    EVERY sampled combination — the pairwise interactions no individual
    test covers."""
    srng = np.random.default_rng(2026)
    b, t, dm = 2, 11, 16
    for trial in range(10):
        hkv = int(srng.choice([1, 2]))
        ring = bool(srng.integers(0, 2))
        kw = dict(window=int(srng.integers(3, 7)),
                  global_prefix=int(srng.integers(0, 3))) if ring else \
            dict(max_decode_len=t)
        qdt = "int8" if srng.integers(0, 2) else None
        rope = bool(srng.integers(0, 2))
        cap = float(srng.choice([0.0, 4.0, 30.0])) or None
        pre = int(srng.integers(1, 7))  # 1 = pure per-token decode
        x = jnp.asarray(srng.normal(size=(b, t, dm)).astype(np.float32))
        layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                      num_kv_head=hkv,
                                      kv_cache_dtype=qdt, rope=rope,
                                      logit_softcap=cap, **kw)
        msg = (f"trial {trial}: hkv={hkv} ring={ring} kw={kw} qdt={qdt} "
               f"rope={rope} cap={cap} pre={pre}")
        variables = layer.init(key, [x, x, x])
        full = np.asarray(layer.apply(variables, [x, x, x]))
        cache, outs, i = {}, [], 0
        if pre > 1:
            chunk = x[:, :pre]
            y, cache = layer.apply(variables, [chunk, chunk, chunk],
                                   decode=True, mutable=["cache"])
            outs.append(np.asarray(y))
            i = pre
        for j in range(i, t):
            tok = x[:, j:j + 1]
            y, cache = layer.apply(
                {"params": variables["params"], **cache},
                [tok, tok, tok], decode=True, mutable=["cache"])
            outs.append(np.asarray(y))
        tol = dict(rtol=6e-2, atol=6e-3) if qdt else dict(rtol=2e-4,
                                                          atol=2e-5)
        np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                                   err_msg=msg, **tol)
