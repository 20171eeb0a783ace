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
