"""StyleGAN model family: shapes, RNG plumbing, progressive weight
sharing, and a tiny end-to-end GAN training step via the engine."""

import jax
import jax.numpy as jnp
import numpy as np

from ku.models import (
    MappingNetwork,
    StyleGANDiscriminator,
    StyleGANGenerator,
    cal_num_chs,
)

RES = 32  # small for CPU tests; 128 in the real config


def _gen(res=RES, label_usage=True):
    return StyleGANGenerator(
        resolution=res, ch_base=64, max_ch=32, latent_dim=16,
        dlatent_dim=32, dense1_dim=32, num_mapping_layers=3,
        num_classes=10, label_usage=label_usage, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=4,
    )


def _gen_inputs(rng, batch=2, label_usage=True):
    z1 = jnp.asarray(rng.normal(size=(batch, 16)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(batch, 16)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(batch, 1)))
    return (z1, label, z2) if label_usage else (z1, z2)


def test_cal_num_chs():
    assert cal_num_chs(0, 1024, 512) == 512
    assert cal_num_chs(2, 1024, 512) == 256
    assert cal_num_chs(6, 1024, 512) == 16


def test_mapping_network_broadcast(key, rng):
    m = MappingNetwork(latent_dim=16, dlatent_dim=32, dense1_dim=32,
                       num_mapping_layers=3, num_broadcast_layers=8,
                       num_classes=10)
    z = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    label = jnp.asarray([[1], [3]])
    params = m.init(key, z, label)
    d = m.apply(params, z, label)
    assert d.shape == (2, 8, 32)
    # All broadcast layers identical.
    np.testing.assert_allclose(np.asarray(d[:, 0]), np.asarray(d[:, 7]))


def test_generator_forward_train_and_eval(key, rng):
    gen = _gen()
    inputs = _gen_inputs(rng)
    variables = gen.init(
        {"params": key, "noise": jax.random.key(1), "style": jax.random.key(2)},
        inputs,
    )
    img, mutated = gen.apply(
        variables, inputs,
        rngs={"noise": jax.random.key(3), "style": jax.random.key(4)},
        mutable=["batch_stats"], deterministic=False,
    )
    assert img.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert float(np.abs(np.asarray(img)).max()) <= 1.0  # tanh output

    # Inference: deterministic, no rngs needed.
    img_eval = gen.apply(variables, inputs, deterministic=True)
    assert img_eval.shape == (2, RES, RES, 3)


def test_discriminator_forward(key, rng):
    disc = StyleGANDiscriminator(resolution=RES, ch_base=64, max_ch=32,
                                 dropout_rate=0.0)
    x = jnp.asarray(rng.normal(size=(4, RES, RES, 3)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 10, size=(4, 1)).astype(np.float32))
    params = disc.init(key, (x, label))
    out = disc.apply(params, (x, label))
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_progressive_weight_sharing(key, rng):
    """A 16px generator's params are a subtree of the 32px generator's —
    progressive growth transfers by name (replaces create_prog_model)."""
    gen_small = _gen(res=16)
    gen_big = _gen(res=32)
    rngs = {"params": key, "noise": jax.random.key(1), "style": jax.random.key(2)}
    p_small = gen_small.init(rngs, _gen_inputs(rng))["params"]
    p_big = gen_big.init(rngs, _gen_inputs(rng))["params"]

    synth_small = p_small["synthesis"]
    synth_big = p_big["synthesis"]
    shared = set(synth_small) & set(synth_big)
    assert "conv_4x4" in shared and "conv_3" in shared
    # Transfer: all small-res layers exist in the big tree with equal shapes
    # (to_rgb differs in input channels across stages by design).
    for name in shared - {"to_rgb"}:
        small_shapes = jax.tree.map(jnp.shape, synth_small[name])
        big_shapes = jax.tree.map(jnp.shape, synth_big[name])
        assert small_shapes == big_shapes, name
    # Mapping net is fully shared.
    assert set(p_small["map"]) == set(p_big["map"])


def test_stylegan_with_gan_engine(rng):
    """One real engine step at 8×8: softplus-R1 mode (the reference's
    default StyleGAN mode, gan.py:108)."""
    from ku.backprop import STYLE_GAN_SOFTPLUS_INVERSE_R1_GP, GAN

    res = 8
    gen = _gen(res=res)
    disc = StyleGANDiscriminator(resolution=res, ch_base=64, max_ch=32)

    conf = {
        "hps": {
            "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
            "epochs": 1, "batch_step": 2, "disc_k_step": 2, "r_gamma": 10.0,
            "disc_ext_hps": {"lr": 1.5e-4, "beta_1": 0.0, "beta_2": 0.99},
            "gen_disc_hps": {"lr": 1.5e-3, "beta_1": 0.0, "beta_2": 0.99},
        },
        "nn_arch": {"gen_rng_streams": ["noise", "style"]},
    }

    class _It:
        def __iter__(self):
            return self

        def __next__(self):
            batch = 4
            return {
                "x": rng.normal(size=(batch, res, res, 3)).astype(np.float32),
                "z": (
                    rng.normal(size=(batch, 16)).astype(np.float32),
                    rng.integers(0, 10, size=(batch, 1)),
                    rng.normal(size=(batch, 16)).astype(np.float32),
                ),
                "label": rng.integers(0, 10, size=(batch, 1)).astype(np.float32),
            }

    engine = GAN(conf, gen, disc).compose_gan_with_mode().compile()
    h = engine.fit_generator(_It(), verbose=0)
    assert np.isfinite(h["disc_ext_loss"]).all()
    assert np.isfinite(h["gen_disc_loss"]).all()

    z = (
        jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32)),
        jnp.asarray(rng.integers(0, 10, size=(2, 1))),
        jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32)),
    )
    img = engine.generate(z)
    assert img.shape == (2, res, res, 3)


def test_bf16_generator_matches_f32_roughly(key, rng):
    """bf16 compute path: f32 params, f32 output, values close to the
    f32 path (mixed precision, not quantization)."""
    inputs = _gen_inputs(rng)
    gen32 = _gen(res=16)
    gen16 = StyleGANGenerator(
        resolution=16, ch_base=64, max_ch=32, latent_dim=16,
        dlatent_dim=32, dense1_dim=32, num_mapping_layers=3,
        num_classes=10, label_usage=True, mixing_prob=0.9,
        trunc_psi=0.7, trunc_cutoff=4, dtype=jnp.bfloat16,
    )
    rngs = {"params": key, "noise": jax.random.key(1), "style": jax.random.key(2)}
    v32 = gen32.init(rngs, inputs)
    out32 = gen32.apply(v32, inputs, deterministic=True)
    out16 = gen16.apply(v32, inputs, deterministic=True)
    assert out16.dtype == jnp.float32
    assert jax.tree.leaves(v32["params"])[0].dtype == jnp.float32
    # tanh outputs in [-1,1]; bf16 rounding keeps them within ~2e-2.
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32), atol=4e-2)
