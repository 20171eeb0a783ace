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


@pytest.mark.parametrize("n,kn", [(32, 32), (40, 72), (128, 256)])
def test_pallas_flash_matches_dense(rng, n, kn):
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
