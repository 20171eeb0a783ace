"""Flash attention: Pallas kernel (interpret), XLA fallback, ring
attention over an 8-device sequence ring — all vs the dense oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ku.pallas.flash_attention import (
    flash_attention_pallas,
    flash_attention_xla,
    ring_attention,
)


def _dense(q, k, v, scale):
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("n,kn", [(32, 32), (40, 72), (128, 256), (40, 44),
                                  (20, 44), (44, 20)])
def test_pallas_flash_matches_dense(rng, n, kn):
    # (40,44)/(20,44)/(44,20): kn NOT a multiple of block_k (and n of
    # block_q) so the lax.cond key-pad/q-pad mask branches actually
    # compile in — with multiples only they are statically elided.
    q = jnp.asarray(rng.normal(size=(2, 2, n, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 2, kn, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 2, kn, 64)).astype(np.float32))
    out = flash_attention_pallas(q, k, v, softmax_scale=0.125, block_q=32,
                                 block_k=32, interpret=True)
    expected = _dense(np.asarray(q), np.asarray(k), np.asarray(v), 0.125)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4, atol=2e-5)


def test_xla_fallback_matches_dense(rng):
    q = jnp.asarray(rng.normal(size=(1, 2, 33, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 57, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 57, 16)).astype(np.float32))
    out = flash_attention_xla(q, k, v, softmax_scale=0.25, block_size=16)
    expected = _dense(np.asarray(q), np.asarray(k), np.asarray(v), 0.25)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_ring_attention_8_devices(rng):
    """Sequence sharded over an 8-device ring == dense attention."""
    from ku.dist import make_mesh

    mesh = make_mesh({"data": 8})
    n = 64  # 8 per device
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    out = ring_attention(q, k, v, mesh, axis_name="data", softmax_scale=0.25)
    expected = _dense(np.asarray(q), np.asarray(k), np.asarray(v), 0.25)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_flash_attention_differentiable(rng):
    """Custom VJP: grads through the dispatching flash_attention match
    grads through dense attention."""
    from ku.pallas.flash_attention import flash_attention

    q = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 16, 8)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, softmax_scale=0.25) ** 2)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("kn", [48, 44])
def test_pallas_backward_matches_dense(rng, causal, kn):
    """The Pallas backward kernels (dq + dk/dv from the saved LSE) match
    dense-attention grads — validated in interpret mode. kn=44 exercises
    the conditional key-padding mask (not a multiple of block_k)."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    n, d = 40, 16
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, kn, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, kn, d)).astype(np.float32))
    if causal:
        kn_eff = n
        k, v = k[:, :, :n], v[:, :, :n]
    g = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))

    o, lse = _fwd_pallas(q, k, v, 0.25, 16, 16, causal, True)
    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.25, 16, 16, causal, True)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        if causal:
            mask = jnp.tril(jnp.ones((n, k.shape[2]), bool))
            s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) * g)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_ring_attention_causal_8_devices(rng):
    """Causal ring attention on 8 devices == dense causal attention, and
    its gradients match the dense oracle (ring is differentiable)."""
    from ku.dist import make_mesh
    from ku.pallas.flash_attention import ring_attention

    mesh = make_mesh({"data": 8})
    n = 64
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))

    out = ring_attention(q, k, v, mesh, axis_name="data", softmax_scale=0.25,
                         causal=True, chunk=4)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    mask = np.tril(np.ones((n, n), bool))
    s = np.where(mask[None, None], s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-5)

    # Gradient through the ring vs the dense oracle.
    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh, axis_name="data",
                           softmax_scale=0.25, causal=True, chunk=8) ** 2
        )

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        s = jnp.where(jnp.asarray(mask)[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


@pytest.mark.parametrize("n", [32, 40])
def test_causal_flash_matches_dense(rng, n):
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    out_p = flash_attention_pallas(q, k, v, softmax_scale=0.25, block_q=16,
                                   block_k=16, interpret=True, causal=True)
    out_x = flash_attention_xla(q, k, v, softmax_scale=0.25, block_size=16,
                                causal=True)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
    mask = np.tril(np.ones((n, n), bool))
    s = np.where(mask[None, None], s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(np.asarray(out_p), expected, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_x), expected, rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("d", [128, 256])
def test_pallas_flash_mxu_head_dims(rng, d):
    """Head dims >= 128 (the MXU regime, VERDICT r3 item 2): forward and
    backward kernels match the dense oracle at D=128/256."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    n = 48
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    k = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    v = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32)) * 0.1
    scale = 1.0 / np.sqrt(d)
    out = flash_attention_pallas(q, k, v, softmax_scale=scale, block_q=16,
                                 block_k=16, interpret=True)
    expected = _dense(np.asarray(q), np.asarray(k), np.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=2e-5)

    g = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    o, lse = _fwd_pallas(q, k, v, scale, 16, 16, True, True)
    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, scale, 16, 16, True, True)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) * g)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_mha_flash_path_d128(rng):
    """MultiHeadAttention's flash path at head dim 128 (num_head=2,
    d_model=256) matches the non-flash scaled path."""
    import flax.linen as fnn

    from ku.nn import MultiHeadAttention

    b, n, dm = 2, 24, 256
    q = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32)) * 0.1
    mha_flash = MultiHeadAttention(num_head=2, d_output=dm, use_flash=True)
    mha_plain = MultiHeadAttention(num_head=2, d_output=dm, use_flash=False)
    variables = mha_flash.init(jax.random.key(0), [q, q, q])
    out_f = mha_flash.apply(variables, [q, q, q])
    out_p = mha_plain.apply(variables, [q, q, q])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)


def _dense_window(q, k, v, scale, window):
    """Dense sliding-window causal oracle (numpy)."""
    n, kn = q.shape[2], k.shape[2]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    q_pos = np.arange(n)[:, None]
    k_pos = np.arange(kn)[None, :]
    keep = (k_pos <= q_pos) & (q_pos - k_pos < window)
    s = np.where(keep[None, None], s, -np.inf)
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("n,window", [(64, 16), (64, 1), (40, 17),
                                      (40, 100), (48, 24)])
def test_sliding_window_matches_dense(rng, n, window):
    """Sliding-window causal flash (Pallas interpret + XLA fallback) vs
    the dense banded oracle. Covers window < block, window = 1, window
    not a multiple of the block, window >= n (== plain causal), and n not
    a multiple of the block (pad-mask interaction)."""
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    expected = _dense_window(np.asarray(q), np.asarray(k), np.asarray(v),
                             0.25, window)
    out_p = flash_attention_pallas(q, k, v, softmax_scale=0.25, block_q=16,
                                   block_k=16, interpret=True, causal=True,
                                   window=window)
    out_x = flash_attention_xla(q, k, v, softmax_scale=0.25, block_size=16,
                                causal=True, window=window)
    np.testing.assert_allclose(np.asarray(out_p), expected, rtol=2e-4,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_x), expected, rtol=2e-4,
                               atol=2e-5)


@pytest.mark.parametrize("window", [16, 23])
def test_pallas_backward_window_matches_dense(rng, window):
    """The Pallas backward kernels under a sliding window match dense
    banded-attention grads (interpret mode)."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    n, d = 56, 16
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))

    o, lse = _fwd_pallas(q, k, v, 0.25, 16, 16, True, True, window=window)
    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.25, 16, 16, True, True,
                             window=window)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        q_pos = jnp.arange(n)[:, None]
        k_pos = jnp.arange(n)[None, :]
        keep = (k_pos <= q_pos) & (q_pos - k_pos < window)
        s = jnp.where(keep[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) * g)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_flash_window_differentiable_dispatch(rng):
    """Grads through the public flash_attention with a window (XLA
    fallback custom-VJP path on CPU) match the dense banded oracle."""
    from ku.pallas.flash_attention import flash_attention

    n, window = 32, 9
    q = jnp.asarray(rng.normal(size=(1, 2, n, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 8)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, softmax_scale=0.25,
                                       causal=True, window=window) ** 2)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        q_pos = jnp.arange(n)[:, None]
        k_pos = jnp.arange(n)[None, :]
        keep = (k_pos <= q_pos) & (q_pos - k_pos < window)
        s = jnp.where(keep[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4)


def test_ring_attention_window_8_devices(rng):
    """Sliding-window causal ring attention (8-device sequence ring,
    window crossing shard boundaries) == dense banded oracle, forward and
    gradients, for both impls."""
    from ku.dist import make_mesh
    from ku.pallas.flash_attention import ring_attention

    mesh = make_mesh({"data": 8})
    n, window = 64, 12  # 8 per device; band spans ~2 shards
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    expected = _dense_window(np.asarray(q), np.asarray(k), np.asarray(v),
                             0.25, window)
    for impl in ("pallas", "xla"):
        out = ring_attention(q, k, v, mesh, axis_name="data",
                             softmax_scale=0.25, causal=True, chunk=8,
                             impl=impl, window=window)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                                   atol=1e-5, err_msg=impl)

    def loss_ring(q, k, v):
        return jnp.sum(
            ring_attention(q, k, v, mesh, axis_name="data",
                           softmax_scale=0.25, causal=True,
                           window=window) ** 2
        )

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        q_pos = jnp.arange(n)[:, None]
        k_pos = jnp.arange(n)[None, :]
        keep = (k_pos <= q_pos) & (q_pos - k_pos < window)
        s = jnp.where(keep[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_mha_causal_window_flash_vs_dense(rng):
    """MultiHeadAttention causal/window extensions: the flash path and
    the dense path agree; window without causal raises."""
    from ku.nn import MultiHeadAttention

    b, n, dm = 2, 40, 64
    q = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32)) * 0.1
    for kwargs in ({"causal": True}, {"causal": True, "window": 11}):
        mha_flash = MultiHeadAttention(num_head=2, d_output=dm,
                                       use_flash=True, **kwargs)
        mha_plain = MultiHeadAttention(num_head=2, d_output=dm,
                                       use_flash=False, **kwargs)
        variables = mha_flash.init(jax.random.key(0), [q, q, q])
        out_f = mha_flash.apply(variables, [q, q, q])
        out_p = mha_plain.apply(variables, [q, q, q])
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=str(kwargs))

    bad = MultiHeadAttention(num_head=2, d_output=dm, window=8)
    with pytest.raises(ValueError, match="causal"):
        bad.init(jax.random.key(0), [q, q, q])


def test_window_requires_causal():
    z = jnp.zeros((1, 1, 16, 8))
    with pytest.raises(ValueError, match="causal"):
        flash_attention_pallas(z, z, z, causal=False, window=8,
                               interpret=True)
    with pytest.raises(ValueError, match="causal"):
        flash_attention_xla(z, z, z, window=8)


@pytest.mark.parametrize("hkv,window", [(2, None), (1, None), (2, 11)])
def test_gqa_flash_matches_repeated_dense(rng, hkv, window):
    """Grouped-query attention (k/v with fewer heads; hkv=1 is MQA):
    Pallas kernels (fwd + both backwards) and the XLA fallback match
    dense attention over group-repeated K/V — incl. combined with a
    sliding window."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    h, n, d = 4, 40, 16
    causal = window is not None
    q = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, hkv, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, hkv, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    rep = h // hkv

    def dense_out(q, k, v):
        kr = jnp.repeat(k, rep, axis=1)
        vr = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * 0.25
        if causal:
            q_pos = jnp.arange(n)[:, None]
            k_pos = jnp.arange(n)[None, :]
            keep = k_pos <= q_pos
            if window is not None:
                keep = keep & (q_pos - k_pos < window)
            s = jnp.where(keep[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vr)

    expected = np.asarray(dense_out(q, k, v))
    o, lse = _fwd_pallas(q, k, v, 0.25, 16, 16, causal, True, window=window)
    np.testing.assert_allclose(np.asarray(o), expected, rtol=2e-4,
                               atol=2e-5)
    out_x = flash_attention_xla(q, k, v, softmax_scale=0.25, block_size=16,
                                causal=causal, window=window)
    np.testing.assert_allclose(np.asarray(out_x), expected, rtol=2e-4,
                               atol=2e-5)

    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.25, 16, 16, causal,
                             True, window=window)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense_out(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        assert got.shape == want.shape, (name, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_gqa_dispatch_differentiable(rng):
    """Public flash_attention with GQA shapes: grads through the
    custom-VJP dispatch match the repeated-dense oracle."""
    from ku.pallas.flash_attention import flash_attention

    h, hkv, n, d = 4, 2, 24, 8
    q = jnp.asarray(rng.normal(size=(1, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, hkv, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, hkv, n, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, softmax_scale=0.25,
                                       causal=True) ** 2)

    def loss_dense(q, k, v):
        kr = jnp.repeat(k, h // hkv, axis=1)
        vr = jnp.repeat(v, h // hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * 0.25
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, vr) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def test_gqa_invalid_heads():
    q = jnp.zeros((1, 4, 16, 8))
    k = jnp.zeros((1, 3, 16, 8))
    with pytest.raises(ValueError, match="multiple"):
        flash_attention_pallas(q, k, k, interpret=True)


def test_mha_gqa_flash_vs_dense(rng):
    """MultiHeadAttention num_kv_head: flash and dense paths agree; K/V
    projections shrink to num_kv_head heads."""
    from ku.nn import MultiHeadAttention

    b, n, dm = 2, 24, 64
    q = jnp.asarray(rng.normal(size=(b, n, dm)).astype(np.float32)) * 0.1
    mha_f = MultiHeadAttention(num_head=4, d_output=dm, num_kv_head=2,
                               use_flash=True, causal=True)
    mha_p = MultiHeadAttention(num_head=4, d_output=dm, num_kv_head=2,
                               use_flash=False, causal=True)
    variables = mha_f.init(jax.random.key(0), [q, q, q])
    assert variables["params"]["W_K"].shape == (dm, dm // 2)
    assert variables["params"]["W_V"].shape == (dm, dm // 2)
    out_f = mha_f.apply(variables, [q, q, q])
    out_p = mha_p.apply(variables, [q, q, q])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-4, atol=2e-5)


def test_ring_attention_gqa_8_devices(rng):
    """GQA inside the sequence ring: 8-device causal ring attention with
    2 KV heads for 4 query heads == repeated-dense oracle (fwd + grads)."""
    from ku.dist import make_mesh
    from ku.pallas.flash_attention import ring_attention

    mesh = make_mesh({"data": 8})
    h, hkv, n, d = 4, 2, 64, 16
    q = jnp.asarray(rng.normal(size=(1, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, hkv, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, hkv, n, d)).astype(np.float32))

    def dense_out(q, k, v):
        kr = jnp.repeat(k, h // hkv, axis=1)
        vr = jnp.repeat(v, h // hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * 0.25
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, vr)

    out = ring_attention(q, k, v, mesh, axis_name="data",
                         softmax_scale=0.25, causal=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(dense_out(q, k, v)),
                               rtol=1e-4, atol=1e-5)

    gr = jax.grad(lambda q, k, v: jnp.sum(
        ring_attention(q, k, v, mesh, axis_name="data", softmax_scale=0.25,
                       causal=True) ** 2), argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense_out(q, k, v) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gr, gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-4, err_msg=name)


def _dense_segments(q, k, v, scale, seg_q, seg_k, causal=False):
    """Dense block-diagonal (packed-sequence) oracle (numpy)."""
    n, kn = q.shape[2], k.shape[2]
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    keep = seg_q[:, :, None] == seg_k[:, None, :]  # (B, N, KN)
    if causal:
        q_pos = np.arange(n)[:, None]
        k_pos = np.arange(kn)[None, :]
        keep = keep & (k_pos <= q_pos)[None]
    s = np.where(keep[:, None], s, -np.inf)
    # Fully-masked rows (no same-segment keys) produce 0 output.
    e = np.exp(s - np.where(np.isinf(s.max(-1, keepdims=True)), 0,
                            s.max(-1, keepdims=True)))
    e = np.where(np.isinf(s), 0, e)
    denom = e.sum(-1, keepdims=True)
    p = np.where(denom > 0, e / np.maximum(denom, 1e-30), 0)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


@pytest.mark.parametrize("causal,hkv", [(False, 2), (True, 2), (True, 1)])
def test_segment_ids_match_dense(rng, causal, hkv):
    """Packed-sequence masking (segment_ids): Pallas kernels (fwd + both
    backwards) and the XLA fallback match the dense block-diagonal
    oracle, composing with causal and GQA. Boundaries are NOT aligned to
    the 16-wide blocks."""
    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    h, n, d = 2, 48, 16
    q = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, hkv, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, hkv, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    # Two different packings; boundaries at 19/37 and 7/23/40.
    seg = np.zeros((2, n), np.int32)
    seg[0, 19:] = 1
    seg[0, 37:] = 2
    seg[1, 7:] = 5
    seg[1, 23:] = 6
    seg[1, 40:] = 9
    seg_j = jnp.asarray(seg)

    kr = np.repeat(np.asarray(k), h // hkv, axis=1)
    vr = np.repeat(np.asarray(v), h // hkv, axis=1)
    expected = _dense_segments(np.asarray(q), kr, vr, 0.25, seg, seg,
                               causal=causal)

    o, lse = _fwd_pallas(q, k, v, 0.25, 16, 16, causal, True,
                         segment_ids=seg_j)
    np.testing.assert_allclose(np.asarray(o), expected, rtol=2e-4,
                               atol=2e-5)
    out_x = flash_attention_xla(q, k, v, softmax_scale=0.25, block_size=16,
                                causal=causal, segment_ids=seg_j)
    np.testing.assert_allclose(np.asarray(out_x), expected, rtol=2e-4,
                               atol=2e-5)

    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.25, 16, 16, causal,
                             True, segment_ids=seg_j)

    def loss_dense(q, k, v):
        kr = jnp.repeat(k, h // hkv, axis=1)
        vr = jnp.repeat(v, h // hkv, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * 0.25
        keep = seg_j[:, :, None] == seg_j[:, None, :]
        if causal:
            q_pos = jnp.arange(n)[:, None]
            k_pos = jnp.arange(n)[None, :]
            keep = keep & (k_pos <= q_pos)[None]
        s = jnp.where(keep[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, vr) * g)

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_segment_dispatch_differentiable(rng):
    """Public flash_attention(segment_ids=...): grads through the
    custom-VJP dispatch (XLA fallback on CPU) match the dense oracle;
    bad shapes raise."""
    from ku.pallas.flash_attention import flash_attention

    n, d = 32, 8
    q = jnp.asarray(rng.normal(size=(1, 2, n, d)).astype(np.float32))
    seg = jnp.asarray(np.r_[np.zeros(13), np.ones(19)].astype(np.int32))[
        None]

    def loss_flash(q):
        return jnp.sum(flash_attention(q, q, q, softmax_scale=0.25,
                                       causal=True, segment_ids=seg) ** 2)

    def loss_dense(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, q) * 0.25
        q_pos = jnp.arange(n)[:, None]
        k_pos = jnp.arange(n)[None, :]
        keep = (seg[:, :, None] == seg[:, None, :]) & (k_pos <= q_pos)[None]
        s = jnp.where(keep[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, q) ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_flash)(q)),
                               np.asarray(jax.grad(loss_dense)(q)),
                               rtol=1e-3, atol=1e-4)

    with pytest.raises(ValueError, match="segment_ids shapes"):
        flash_attention(q, q, q, segment_ids=jnp.zeros((1, 7), jnp.int32))


@pytest.mark.parametrize("impl", ["pallas", "xla"])
def test_ring_attention_segments_8_devices(rng, impl):
    """Packed sequences inside the sequence ring (both impls): the key-id
    slice rotates with its K/V block; causal + segments == dense
    block-diagonal oracle (fwd + grads). Boundaries are NOT aligned to
    the 8-way shard (local length 8)."""
    from ku.dist import make_mesh
    from ku.pallas.flash_attention import ring_attention

    mesh = make_mesh({"data": 8})
    h, n, d = 2, 64, 16
    q = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, h, n, d)).astype(np.float32))
    seg = np.zeros((2, n), np.int32)
    seg[0, 27:] = 1
    seg[1, 13:] = 4
    seg[1, 50:] = 7
    seg_j = jnp.asarray(seg)

    def dense_out(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        keep = (seg_j[:, :, None] == seg_j[:, None, :]) & jnp.tril(
            jnp.ones((n, n), bool))[None]
        s = jnp.where(keep[:, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    ring = lambda q, k, v: ring_attention(
        q, k, v, mesh, axis_name="data", softmax_scale=0.25, causal=True,
        impl=impl, segment_ids=seg_j)
    np.testing.assert_allclose(np.asarray(ring(q, k, v)),
                               np.asarray(dense_out(q, k, v)),
                               rtol=1e-4, atol=1e-5)

    if impl == "pallas":
        gr = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(lambda q, k, v: jnp.sum(dense_out(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(gr, gd, ("dq", "dk", "dv")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-4, err_msg=name)


def test_ring_pallas_vs_xla_impls(rng):
    """The kernel-based ring (impl='pallas') and the chunked-einsum ring
    (impl='xla') agree, causal and not."""
    from ku.dist import make_mesh

    mesh = make_mesh({"data": 8})
    n = 64
    q = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, n, 16)).astype(np.float32))
    for causal in (False, True):
        out_p = ring_attention(q, k, v, mesh, axis_name="data",
                               softmax_scale=0.25, causal=causal,
                               impl="pallas")
        out_x = ring_attention(q, k, v, mesh, axis_name="data",
                               softmax_scale=0.25, causal=causal,
                               impl="xla", chunk=8)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                                   rtol=1e-4, atol=1e-5, err_msg=str(causal))


def test_flash_pallas_q_offset_prefill_parity(rng):
    """flash_attention_pallas with a traced q_offset (KV-cache prefill
    shape: L queries over a longer cache page) == dense shifted-causal
    oracle — including masking of the page's unwritten tail."""
    import jax
    import jax.numpy as jnp

    from ku.pallas.flash_attention import flash_attention_pallas

    b, h, L, mx, d, idx = 2, 3, 5, 16, 8, 4
    q = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))
    page = np.zeros((b, h, mx, d), np.float32)
    page[:, :, : idx + L] = rng.normal(size=(b, h, idx + L, d))
    k = jnp.asarray(page)
    v = jnp.asarray(rng.normal(size=(b, h, mx, d)).astype(np.float32))

    got = jax.jit(
        lambda q, k, v, off: flash_attention_pallas(
            q, k, v, softmax_scale=0.3, causal=True, q_offset=off)
    )(q, k, v, jnp.int32(idx))

    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), page) * 0.3
    keep = np.arange(mx)[None, :] <= idx + np.arange(L)[:, None]
    s = np.where(keep[None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


def test_flash_pallas_per_batch_q_offset(rng):
    """Per-sequence q_offset array (ragged prefill): every batch row
    masks at its own global offset."""
    import jax
    import jax.numpy as jnp

    from ku.pallas.flash_attention import flash_attention_pallas

    b, h, L, mx, d = 3, 2, 4, 12, 8
    offs = np.array([0, 3, 7])
    q = jnp.asarray(rng.normal(size=(b, h, L, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, mx, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, mx, d)).astype(np.float32))

    got = jax.jit(
        lambda q, k, v, off: flash_attention_pallas(
            q, k, v, softmax_scale=0.35, causal=True, q_offset=off)
    )(q, k, v, jnp.asarray(offs, jnp.int32))

    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * 0.35
    keep = (np.arange(mx)[None, None, :]
            <= offs[:, None, None] + np.arange(L)[None, :, None])
    s = np.where(keep[:, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_kernels_logit_softcap_parity(rng, causal):
    """Soft-capped flash kernels (fwd + dq/dkv from saved LSE) == the
    dense cap·tanh oracle and its autodiff grads — the backward's
    chain-rule factor is reconstructed from the capped score alone."""
    import jax
    import jax.numpy as jnp

    from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

    b, h, n, d, cap = 1, 2, 40, 8, 3.0
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    o, lse = _fwd_pallas(q, k, v, 0.5, 16, 16, causal, True, softcap=cap)
    dq, dk, dv = _bwd_pallas(q, k, v, o, lse, g, 0.5, 16, 16, causal,
                             True, softcap=cap)

    def dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.5
        s = cap * jnp.tanh(s / cap)
        if causal:
            keep = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]
            s = jnp.where(keep[None, None], s, -jnp.inf)
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    np.testing.assert_allclose(np.asarray(o), np.asarray(dense(q, k, v)),
                               rtol=2e-4, atol=2e-5)
    gd = jax.grad(lambda q, k, v: jnp.sum(dense(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for got, want, name in zip((dq, dk, dv), gd, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-4, err_msg=name)


def test_flash_dispatch_softcap_grads(rng):
    """The differentiable dispatcher threads logit_softcap (XLA fallback
    on CPU): value + grads == dense capped oracle."""
    import jax
    import jax.numpy as jnp

    from ku.pallas.flash_attention import flash_attention

    b, h, n, d, cap = 2, 2, 24, 8, 5.0
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, softmax_scale=0.3,
                                       causal=True, logit_softcap=cap) ** 2)

    def loss_dense(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.3
        s = cap * jnp.tanh(s / cap)
        keep = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]
        s = jnp.where(keep[None, None], s, -jnp.inf)
        return jnp.sum(
            jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v) ** 2)

    v1, g1 = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    v2, g2 = jax.value_and_grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4)
