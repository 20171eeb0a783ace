"""Lane-repacking (2x2 space-to-depth) exactness tests.

ku/nn/packed.py claims every packed op computes the identical function on
the packed layout with identical parameter trees. Verified here against the
XLA oracles op-by-op and end-to-end on the StyleGAN generator/discriminator
(same params applied packed and unpacked), including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ku.models import StyleGANDiscriminator, StyleGANGenerator
from ku.nn.packed import (
    depth_to_space,
    packed_adain_with_style,
    packed_conv2d,
    packed_conv_transpose2x,
    packed_depthwise_conv2d,
    packed_pixel_norm,
    space_to_depth,
)

DIMNUMS = ("NHWC", "HWIO", "NHWC")


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 5)).astype(np.float32))
    xp = space_to_depth(x)
    assert xp.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space(xp)), np.asarray(x))
    # Phase-major order: packed channel (ph*2+pw)*C + c.
    np.testing.assert_array_equal(
        np.asarray(xp[0, 0, 0, 5:10]), np.asarray(x[0, 0, 1, :])
    )
    np.testing.assert_array_equal(
        np.asarray(xp[0, 0, 0, 10:15]), np.asarray(x[0, 1, 0, :])
    )


@pytest.mark.parametrize("k,s", [(1, 1), (3, 1), (3, 2), (4, 2), (5, 1)])
@pytest.mark.parametrize("shape", [(8, 8, 3, 5), (16, 8, 4, 4)])
def test_packed_conv2d_matches_same_conv(rng, k, s, shape):
    h, w, c, f = shape
    x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, c, f)).astype(np.float32))
    want = lax.conv_general_dilated(x, kern, (s, s), "SAME",
                                    dimension_numbers=DIMNUMS)
    got = depth_to_space(packed_conv2d(space_to_depth(x), kern, s))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_depthwise_matches_grouped_conv(rng):
    c = 5
    x = jnp.asarray(rng.normal(size=(2, 8, 8, c)).astype(np.float32))
    kd = jnp.asarray(rng.normal(size=(3, 3, c, 1)).astype(np.float32))
    want = lax.conv_general_dilated(
        x, jnp.reshape(kd, (3, 3, 1, c)), (1, 1), "SAME",
        dimension_numbers=DIMNUMS, feature_group_count=c,
    )
    got = depth_to_space(packed_depthwise_conv2d(space_to_depth(x), kd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_conv_transpose2x_matches_lax(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(4, 4, 3, 5)).astype(np.float32))
    want = lax.conv_transpose(x, kern, (2, 2), "SAME",
                              dimension_numbers=DIMNUMS)
    got = depth_to_space(packed_conv_transpose2x(space_to_depth(x), kern))
    assert got.shape == want.shape == (2, 16, 16, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_packed_pixel_norm_and_adain(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    want = x * lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + 1e-8
    )
    got = depth_to_space(packed_pixel_norm(space_to_depth(x)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    s = jnp.asarray(rng.normal(size=(2, 12)).astype(np.float32))
    cm = jnp.mean(x, axis=(1, 2), keepdims=True)
    cs = jnp.std(x, axis=(1, 2), keepdims=True) + 1e-7
    sv = s.reshape(-1, 2, 1, 1, 6)
    want = (sv[:, 0] + 1.0) * ((x - cm) / cs) + sv[:, 1]
    got = depth_to_space(
        packed_adain_with_style(space_to_depth(x), s, eps=1e-7)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


# -- end-to-end: same params, packed vs unpacked StyleGAN ---------------------


def _gen(lane_packing, res=32):
    return StyleGANGenerator(
        resolution=res, ch_base=64, max_ch=32, latent_dim=16,
        dlatent_dim=32, dense1_dim=32, num_mapping_layers=3,
        num_classes=10, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=4,
        lane_packing=lane_packing, lane_pack_min=8,
    )


def _disc(lane_packing, res=32):
    return StyleGANDiscriminator(
        resolution=res, ch_base=64, max_ch=32, label_usage=True,
        lane_packing=lane_packing, lane_pack_min=8,
    )


def test_generator_packed_matches_unpacked(key, rng):
    z1 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    inputs = (z1, label, z2)
    rngs = {"params": key, "noise": jax.random.key(1),
            "style": jax.random.key(2)}
    ref, pk = _gen(False), _gen(True)
    variables = ref.init(rngs, inputs, deterministic=True)
    # Identical param tree: packed apply consumes the unpacked-init params.
    img_ref = ref.apply(variables, inputs, deterministic=True)
    img_pk = pk.apply(variables, inputs, deterministic=True)
    assert img_pk.shape == img_ref.shape == (2, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(img_pk), np.asarray(img_ref),
                               rtol=1e-4, atol=1e-5)
    # And the packed init produces the same tree structure/shapes.
    v2 = pk.init(rngs, inputs, deterministic=True)
    ref_shapes = jax.tree.map(jnp.shape, variables)
    pk_shapes = jax.tree.map(jnp.shape, v2)
    assert ref_shapes == pk_shapes


def test_generator_packed_train_mode_runs(key, rng):
    z1 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    inputs = (z1, label, z2)
    gen = _gen(True)
    rngs = {"params": key, "noise": jax.random.key(1),
            "style": jax.random.key(2)}
    variables = gen.init(rngs, inputs)
    img, mutated = gen.apply(
        variables, inputs, deterministic=False,
        rngs={"noise": jax.random.key(3), "style": jax.random.key(4)},
        mutable=["batch_stats"],
    )
    assert img.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    assert "batch_stats" in mutated


def test_discriminator_packed_matches_unpacked(key, rng):
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    ref, pk = _disc(False), _disc(True)
    variables = ref.init(key, (imgs, labels))
    out_ref = ref.apply(variables, (imgs, labels))
    out_pk = pk.apply(variables, (imgs, labels))
    assert out_pk.shape == out_ref.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(out_pk), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    v2 = pk.init(key, (imgs, labels))
    assert jax.tree.map(jnp.shape, v2) == jax.tree.map(jnp.shape, variables)


def test_packed_gradients_match_unpacked(key, rng):
    """Param gradients through the packed path equal the unpacked ones."""
    imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    ref, pk = _disc(False), _disc(True)
    variables = ref.init(key, (imgs, labels))

    def loss(params, module):
        out = module.apply({"params": params}, (imgs, labels))
        return jnp.sum(out**2)

    g_ref = jax.grad(loss)(variables["params"], ref)
    g_pk = jax.grad(loss)(variables["params"], pk)
    flat_ref, _ = jax.tree.flatten(g_ref)
    flat_pk, _ = jax.tree.flatten(g_pk)
    for a, b in zip(flat_ref, flat_pk):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=1e-4)


def test_progressive_stage_transfer_with_packing(key, rng):
    """Progressive growth across the packing boundary: a 16px (never
    packed) stage's params graft into a 32px packed stage by name with
    identical shapes, and the packed stage runs with the grafted tree —
    packing keeps parameter trees layout-independent across resolutions."""
    from ku.backprop.gan import _merge_shared

    small = _gen(False, res=16)
    big = _gen(True, res=32)  # lane_pack_min=8 -> 16/32px layers packed
    rngs = {"params": key, "noise": jax.random.key(1),
            "style": jax.random.key(2)}
    z1 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(2, 1)))
    inputs = (z1, label, z2)
    v_small = small.init(rngs, inputs, deterministic=True)
    v_big = big.init(rngs, inputs, deterministic=True)
    merged = _merge_shared(v_big["params"], v_small["params"])
    img = big.apply({"params": merged,
                     "batch_stats": v_big["batch_stats"]},
                    inputs, deterministic=True)
    assert img.shape == (2, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))
