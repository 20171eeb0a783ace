"""Fused style-block epilogue kernel vs the XLA composition."""

import jax
import jax.numpy as jnp
import numpy as np

from ku.pallas.fused_synthesis import _epilogue_xla, _fused_forward


def test_fused_epilogue_matches_xla(rng):
    b, h, w, c = 3, 8, 8, 16
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    wn = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    style = jnp.asarray(rng.normal(size=(b, 2 * c)).astype(np.float32))
    out_k = _fused_forward(x, noise, wn, style, interpret=True)
    out_x = _epilogue_xla(x, noise, wn, style)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-4, atol=1e-5)


def test_fused_epilogue_grad(rng):
    from ku.pallas.fused_synthesis import fused_style_epilogue

    b, h, w, c = 2, 4, 4, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(h, w, c)).astype(np.float32))
    wn = jnp.ones((c,))
    style = jnp.asarray(rng.normal(size=(b, 2 * c)).astype(np.float32))

    g1 = jax.grad(lambda xx: jnp.sum(
        fused_style_epilogue(xx, noise, wn, style) ** 2))(x)
    g2 = jax.grad(lambda xx: jnp.sum(
        _epilogue_xla(xx, noise, wn, style) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)


def test_generator_fused_flag_equivalent(key, rng):
    """Fused and unfused generators share param trees and agree exactly in
    the deterministic path (noise = 0 vs noise skipped)."""
    from ku.models import StyleGANGenerator

    kwargs = dict(resolution=16, ch_base=64, max_ch=32, latent_dim=16,
                  dlatent_dim=32, dense1_dim=32, num_mapping_layers=3,
                  num_classes=10, mixing_prob=0.9, trunc_psi=0.7,
                  trunc_cutoff=4)
    gen_a = StyleGANGenerator(**kwargs)
    gen_b = StyleGANGenerator(fused_epilogue=True, **kwargs)
    z1 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    inputs = (z1, label, z2)
    rngs = {"params": key, "noise": jax.random.key(1), "style": jax.random.key(2)}
    va = gen_a.init(rngs, inputs)
    # Same param tree works for both (noise_weight path shared).
    out_a = gen_a.apply(va, inputs, deterministic=True)
    out_b = gen_b.apply(va, inputs, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=2e-4, atol=2e-5)
