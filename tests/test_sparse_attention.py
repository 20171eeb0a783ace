"""Block-sparse (splash-style) flash attention vs dense oracles.

CPU runs the kernels in interpret mode (tests/conftest.py forces the cpu
backend); compiled-Mosaic variants live in tests_tpu/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ku.pallas.sparse_attention import (BlockMask, make_block_mask,
                                        sparse_attention)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _dense_keep(n, kn, block_q, block_k, causal, window, global_prefix,
                extra_blocks=(), block_pattern=None):
    """Element-level keep matrix for the sparse semantics (numpy)."""
    q_pos = np.arange(n)[:, None]
    k_pos = np.arange(kn)[None, :]
    keep = np.ones((n, kn), bool)
    if causal:
        keep &= k_pos <= q_pos
    if block_pattern is not None:
        pat = np.asarray(block_pattern, bool)
        keep &= np.repeat(np.repeat(pat, block_q, 0), block_k, 1)
    elif window is not None:
        w = (q_pos - k_pos < window) | (k_pos < global_prefix)
        for qb, kb in extra_blocks:
            w[qb * block_q:(qb + 1) * block_q,
              kb * block_k:(kb + 1) * block_k] = True
        keep &= w
    return keep


def _dense_attn(q, k, v, scale, keep):
    h = q.shape[1]
    if k.shape[1] != h:
        k = jnp.repeat(k, h // k.shape[1], axis=1)
        v = jnp.repeat(v, h // v.shape[1], axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    s = jnp.where(jnp.asarray(keep)[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def test_make_block_mask_structure():
    """Flat block map construction: runs, fullness flags, sparsity."""
    m = make_block_mask(128, block_q=16, block_k=16, causal=True,
                        window=24, global_prefix=4)
    # Row 0 (queries 0-15): only k block 0 (diagonal).
    assert m.kcnt[0] == 1
    row0 = m.fmap[m.fmap[:, 0] == 0]
    assert list(row0[0, :2]) == [0, 0] and row0[0, 3] == 1  # first
    # Deep row 7: sink block 0 first (partial: only k<4 pass) + 3 band
    # blocks; run boundaries marked.
    row7 = m.fmap[m.fmap[:, 0] == 7]
    assert list(row7[:, 1]) == [0, 5, 6, 7]
    assert row7[0, 2] == 1          # sink block is partial
    assert row7[0, 3] == 1 and row7[-1, 4] == 1
    assert m.kcnt[7] == 4
    assert m.sparsity > 0.5
    # The transposed map covers the same entries, grouped by key block.
    assert m.tmap.shape == m.fmap.shape
    assert m.qcnt.sum() == m.kcnt.sum() == m.fmap.shape[0]
    # tmap runs: k block 0 (the sink column) is live for ALL q blocks.
    col0 = m.tmap[m.tmap[:, 1] == 0]
    assert list(col0[:, 0]) == list(range(8))
    assert col0[0, 3] == 1 and col0[-1, 4] == 1 and (col0[1:-1, 3:] == 0).all()

    with pytest.raises(ValueError, match="divide"):
        make_block_mask(100, block_q=16, block_k=16)
    with pytest.raises(ValueError, match="window"):
        make_block_mask(64, block_q=16, block_k=16, window=8)
    with pytest.raises(ValueError, match="escapes"):
        make_block_mask(64, block_q=16, block_k=16, causal=True,
                        global_prefix=4)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_block_mask(64, block_q=16, block_k=16, causal=True, window=8,
                        block_pattern=np.ones((4, 4), bool))


@pytest.mark.parametrize("conf", [
    dict(causal=True),
    dict(causal=True, window=20),
    dict(causal=True, window=20, global_prefix=5),
    dict(causal=True, window=20, global_prefix=5,
         extra_blocks=((5, 1), (4, 0))),
])
def test_sparse_matches_dense(rng, conf):
    """Forward + grads vs the dense oracle across pattern primitives."""
    b, h, n, d = 2, 2, 96, 16
    scale = 0.25
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    mask = make_block_mask(n, block_q=16, block_k=16, **conf)
    keep = _dense_keep(n, n, 16, 16, conf.get("causal", False),
                       conf.get("window"), conf.get("global_prefix", 0),
                       conf.get("extra_blocks", ()))

    out = sparse_attention(q, k, v, mask, softmax_scale=scale)
    want = _dense_attn(q, k, v, scale, keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    gs = jax.grad(lambda q, k, v: jnp.sum(
        sparse_attention(q, k, v, mask, softmax_scale=scale) * g),
        argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(
        _dense_attn(q, k, v, scale, keep) * g),
        argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip(gs, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_sparse_block_pattern(rng):
    """Arbitrary block-level pattern (block_pattern mode): a strided
    pattern with causal element masking matches the dense oracle."""
    b, h, n, d = 1, 2, 96, 16
    nb = n // 16
    pat = np.zeros((nb, nb), bool)
    for i in range(nb):
        pat[i, i] = True          # diagonal (keeps every row live)
        pat[i, max(0, i - 2)] = True
        pat[i, 0] = True          # global first block
    mask = make_block_mask(n, block_q=16, block_k=16, causal=True,
                           block_pattern=pat)
    keep = _dense_keep(n, n, 16, 16, True, None, 0, block_pattern=pat)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    out = sparse_attention(q, k, v, mask, softmax_scale=0.25)
    want = _dense_attn(q, k, v, 0.25, keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    gs = jax.grad(lambda q: jnp.sum(
        sparse_attention(q, k, v, mask, softmax_scale=0.25) ** 2))(q)
    gd = jax.grad(lambda q: jnp.sum(
        _dense_attn(q, k, v, 0.25, keep) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), rtol=2e-3,
                               atol=2e-4)


def test_sparse_unattended_keys_zero_grad(rng):
    """Cross-attention block pattern where some key blocks are attended
    by nobody: their dk/dv must be ZERO (their output blocks are never
    grid steps — the zero-fill pass covers them)."""
    b, h, n, kn, d = 1, 2, 32, 96, 16
    pat = np.zeros((2, 6), bool)
    pat[0, 0] = pat[0, 2] = True
    pat[1, 1] = True                  # columns 3,4,5 never attended
    mask = make_block_mask(n, kn, block_q=16, block_k=16,
                           block_pattern=pat)
    assert list(np.nonzero(mask.qcnt == 0)[0]) == [3, 4, 5]
    keep = _dense_keep(n, kn, 16, 16, False, None, 0, block_pattern=pat)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, kn, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, kn, d)).astype(np.float32))

    out = sparse_attention(q, k, v, mask, softmax_scale=0.25)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_dense_attn(q, k, v, 0.25, keep)),
                               rtol=2e-4, atol=2e-5)

    gs = jax.grad(lambda q, k, v: jnp.sum(
        sparse_attention(q, k, v, mask, softmax_scale=0.25) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(
        _dense_attn(q, k, v, 0.25, keep) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    assert np.all(np.asarray(gs[1])[:, :, 48:] == 0)
    assert np.all(np.asarray(gs[2])[:, :, 48:] == 0)
    for got, want, name in zip(gs, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)

    with pytest.raises(ValueError, match="attend no"):
        make_block_mask(n, kn, block_q=16, block_k=16,
                        block_pattern=np.zeros((2, 6), bool))


def test_sparse_gqa(rng):
    """GQA: fewer KV heads stream shared pages through the sparse grid."""
    b, h, hkv, n, d = 1, 4, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, hkv, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, hkv, n, d)).astype(np.float32))
    mask = make_block_mask(n, block_q=16, block_k=16, causal=True,
                           window=20)
    keep = _dense_keep(n, n, 16, 16, True, 20, 0)

    out = sparse_attention(q, k, v, mask, softmax_scale=0.25)
    want = _dense_attn(q, k, v, 0.25, keep)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    gs = jax.grad(lambda q, k, v: jnp.sum(
        sparse_attention(q, k, v, mask, softmax_scale=0.25) * g),
        argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(
        _dense_attn(q, k, v, 0.25, keep) * g),
        argnums=(0, 1, 2))(q, k, v)
    for got, want_g, name in zip(gs, gd, ("dq", "dk", "dv")):
        assert got.shape == (q if name == "dq" else k).shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want_g),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_sparse_vs_flash_causal(rng):
    """Pure-causal sparse == the dense streaming flash kernel."""
    from ku.pallas.flash_attention import flash_attention

    b, h, n, d = 1, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    mask = make_block_mask(n, block_q=16, block_k=16, causal=True)
    np.testing.assert_allclose(
        np.asarray(sparse_attention(q, k, v, mask, softmax_scale=0.25)),
        np.asarray(flash_attention(q, k, v, softmax_scale=0.25,
                                   causal=True)),
        rtol=2e-4, atol=2e-5)


def test_sparse_shape_validation(rng):
    q = jnp.zeros((1, 2, 64, 16))
    mask = make_block_mask(32, block_q=16, block_k=16, causal=True)
    with pytest.raises(ValueError, match="BlockMask"):
        sparse_attention(q, q, q, mask)


def test_mha_block_mask(rng):
    """Layer-level block-sparse attention: MultiHeadAttention(
    block_mask=...) matches the dense layer restricted to the pattern;
    conflicting configs raise."""
    import ku

    key = jax.random.PRNGKey(3)
    b, t, dm = 2, 64, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    mask = make_block_mask(t, block_q=16, block_k=16, causal=True,
                           window=20, global_prefix=3)
    layer = ku.MultiHeadAttention(2, dm, 0.0, causal=True)
    variables = layer.init(key, [x, x, x])
    y = np.asarray(layer.apply(variables, [x, x, x], block_mask=mask))

    # Dense oracle: rebuild the layer math with the element-level keep.
    keep = _dense_keep(t, t, 16, 16, True, 20, 3)
    p = variables["params"]

    def split(z, w):
        return jnp.transpose((z @ w).reshape(b, t, 2, dm // 2),
                             (0, 2, 1, 3))

    qh = split(x, p["W_Q"])
    kh = split(x, p["W_K"])
    vh = split(x, p["W_V"])
    head = _dense_attn(qh, kh, vh, 1.0 / np.sqrt(dm), keep)
    want = np.asarray(
        jnp.transpose(head, (0, 2, 1, 3)).reshape(b, t, dm)
        @ p["W_multi_head"])
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    # Transformer forwards it; cross-pattern influence is blocked.
    block = ku.Transformer(2, dm, 0.0, causal=True)
    bv = block.init(key, [x])
    yb = np.asarray(block.apply(bv, [x], block_mask=mask))
    assert yb.shape == (b, t, dm) and np.isfinite(yb).all()

    with pytest.raises(ValueError, match="conflicts"):
        ku.MultiHeadAttention(2, dm, 0.0, causal=False).apply(
            variables, [x, x, x], block_mask=mask)
    with pytest.raises(ValueError, match="conflicts"):
        ku.MultiHeadAttention(2, dm, 0.0, causal=True, window=20).apply(
            variables, [x, x, x], block_mask=mask)
    with pytest.raises(ValueError, match="dropout"):
        ku.MultiHeadAttention(2, dm, 0.5, causal=True).apply(
            variables, [x, x, x], block_mask=mask, deterministic=False,
            rngs={"dropout": key})
    with pytest.raises(ValueError, match="segment_ids"):
        ku.MultiHeadAttention(2, dm, 0.0, causal=True).apply(
            variables, [x, x, x], block_mask=mask,
            segment_ids=jnp.zeros((b, t), jnp.int32))
