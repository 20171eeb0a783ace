"""GAN engine: all five composing modes run jitted alternating steps and
train a toy 1-D GAN (reference ku/backprop/gan.py capability surface)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ku.backprop import (
    LSGAN,
    PIX2PIX_GAN,
    STYLE_GAN_REGULAR,
    STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
    STYLE_GAN_WGAN_GP,
    GAN,
    compose_gan_with_mode,
    get_loss_conf,
)


class ToyGen(nn.Module):
    out_dim: int = 8

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        h = nn.relu(nn.Dense(16)(z))
        return nn.Dense(self.out_dim)(h)


class ToyDisc(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(list(x), axis=-1)
        h = nn.relu(nn.Dense(16)(x))
        return nn.Dense(1)(h)


def _data_iter(rng, mode, n_dim=8, batch=16):
    while True:
        x = rng.normal(loc=2.0, scale=0.5, size=(batch, n_dim)).astype(np.float32)
        z = rng.normal(size=(batch, 4)).astype(np.float32)
        batch_d = {"x": x, "z": z}
        if mode == PIX2PIX_GAN:
            batch_d["cond"] = rng.normal(size=(batch, 2)).astype(np.float32)
        yield batch_d


@pytest.mark.parametrize(
    "mode",
    [STYLE_GAN_REGULAR, STYLE_GAN_WGAN_GP, STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
     LSGAN, PIX2PIX_GAN],
)
def test_all_modes_step(rng, mode):
    conf = {
        "hps": {
            "composing_mode": mode,
            "epochs": 2,
            "batch_step": 3,
            "disc_k_step": 2,
            "r_gamma": 10.0,
            "wgan_lambda": 10.0,
            "wgan_target": 1.0,
            "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
            "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        }
    }
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    history = engine.fit_generator(_data_iter(rng, mode), verbose=0)
    assert len(history["disc_ext_loss"]) == 2
    assert np.isfinite(history["disc_ext_loss"]).all()
    assert np.isfinite(history["gen_disc_loss"]).all()

    # Generation works and produces the right shape.
    z = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    if mode == PIX2PIX_GAN:
        out = engine.generate(z)
    else:
        out = engine.generate(z)
    assert out.shape == (4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_gan_actually_learns_mean(rng):
    """Non-saturating GAN on N(2, .5) data: generator mean should move
    from ~0 toward the data mean."""
    conf = {
        "hps": {
            "composing_mode": STYLE_GAN_REGULAR,
            "epochs": 30,
            "batch_step": 8,
            "disc_k_step": 1,
            "disc_ext_hps": {"lr": 2e-3, "beta_1": 0.5, "beta_2": 0.999},
            "gen_disc_hps": {"lr": 2e-3, "beta_1": 0.5, "beta_2": 0.999},
        }
    }
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    z_fixed = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))

    engine.fit_generator(_data_iter(rng, STYLE_GAN_REGULAR), verbose=0)
    mean_after = float(jnp.mean(engine.generate(z_fixed)))
    assert mean_after > 0.8, f"generator mean {mean_after} did not move toward 2.0"


def test_lazy_r1_interval(rng):
    """r1_interval > 1 (lazy regularization, StyleGAN2 §B extension):
    trains finite, and at interval=1 the loss graph equals the default."""
    conf = {
        "hps": {
            "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
            "epochs": 2, "batch_step": 3, "disc_k_step": 1, "r_gamma": 10.0,
            "r1_interval": 2,
            "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
            "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        }
    }
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    h = engine.fit_generator(
        _data_iter(rng, STYLE_GAN_SOFTPLUS_INVERSE_R1_GP), verbose=0)
    assert np.isfinite(h["disc_ext_loss"]).all()
    assert np.isfinite(h["gen_disc_loss"]).all()

    # interval=1 must reproduce the always-on R1 loss exactly.
    conf1 = {"hps": dict(conf["hps"], r1_interval=1)}
    e1 = GAN(conf1, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    batch = next(_data_iter(np.random.default_rng(0),
                            STYLE_GAN_SOFTPLUS_INVERSE_R1_GP))
    e1.init_state(jax.tree.map(jnp.asarray, batch), seed=0)
    d1 = float(e1._disc_loss(e1.state["disc_params"], e1.state,
                             jax.tree.map(jnp.asarray, batch),
                             jax.random.key(2)))
    conf0 = {"hps": {k: v for k, v in conf["hps"].items()
                     if k != "r1_interval"}}
    e0 = GAN(conf0, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    e0.init_state(jax.tree.map(jnp.asarray, batch), seed=0)
    d0 = float(e0._disc_loss(e0.state["disc_params"], e0.state,
                             jax.tree.map(jnp.asarray, batch),
                             jax.random.key(2)))
    np.testing.assert_allclose(d1, d0, rtol=1e-6)


def test_evaluate_uses_always_on_r1(rng):
    """evaluate() must report the always-on R1 loss regardless of the
    lazy-R1 training interval or the current step parity — otherwise two
    evaluations one step apart differ by an arbitrary interval-scaled
    penalty."""
    base_hps = {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "epochs": 1, "batch_step": 1, "disc_k_step": 1, "r_gamma": 10.0,
        "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
    }
    batch = next(_data_iter(np.random.default_rng(3),
                            STYLE_GAN_SOFTPLUS_INVERSE_R1_GP))

    def eval_loss(hps, step):
        e = GAN({"hps": dict(hps)}, ToyGen(), ToyDisc())
        e.compose_gan_with_mode().compile()
        e.init_state(jax.tree.map(jnp.asarray, batch), seed=0)
        e.state["step"] = jnp.asarray(step, jnp.int32)
        return e.evaluate(iter([batch] * 2), steps=1, seed=4)["disc_ext_loss"]

    lazy_at_odd = eval_loss(dict(base_hps, r1_interval=16), step=7)
    lazy_at_mult = eval_loss(dict(base_hps, r1_interval=16), step=16)
    always = eval_loss(base_hps, step=7)
    np.testing.assert_allclose(lazy_at_odd, always, rtol=1e-5)
    np.testing.assert_allclose(lazy_at_mult, always, rtol=1e-5)


def test_save_load_roundtrip(rng, tmp_path):
    conf = {"hps": {"composing_mode": LSGAN, "epochs": 1, "batch_step": 2,
                    "disc_k_step": 1}}
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    engine.fit_generator(_data_iter(rng, LSGAN), verbose=0)
    engine.save_gan_model(str(tmp_path))

    z = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    out1 = np.asarray(engine.generate(z))

    engine2 = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    engine2.load_gan_model(str(tmp_path))
    out2 = np.asarray(engine2.generate(z))
    np.testing.assert_allclose(out1, out2, rtol=1e-6)


def test_load_before_compile_then_fit(rng, tmp_path):
    """load_gan_model() BEFORE compile() must still train: compile()
    back-fills the opt states that the uncompiled load left as None
    (regression: previously fit passed None opt state into the jitted
    step)."""
    conf = {"hps": {"composing_mode": LSGAN, "epochs": 1, "batch_step": 2,
                    "disc_k_step": 1}}
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    engine.fit_generator(_data_iter(rng, LSGAN), verbose=0)
    engine.save_gan_model(str(tmp_path))

    engine2 = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode()
    engine2.load_gan_model(str(tmp_path))  # not compiled yet
    assert engine2.state["gen_opt"] is None
    engine2.compile()
    assert engine2.state["gen_opt"] is not None
    assert engine2.state["disc_opt"] is not None
    h = engine2.fit_generator(_data_iter(rng, LSGAN), verbose=0)
    assert np.isfinite(h["disc_ext_loss"]).all()


def test_compose_gan_with_mode_wrapper():
    engine = compose_gan_with_mode(ToyGen(), ToyDisc(), STYLE_GAN_REGULAR)
    assert engine.composing_mode == STYLE_GAN_REGULAR
    assert "disc_ext_losses" in engine.loss_conf


def test_get_loss_conf_shapes():
    """Loss-conf contract parity (reference gan.py:44-92)."""
    hps = {"r_gamma": 5.0, "wgan_lambda": 10.0, "wgan_target": 1.0}
    for t, n_disc in [(0, 2), (1, 3), (2, 3), (3, 2)]:
        lc = get_loss_conf(hps, t)
        assert len(lc["disc_ext_losses"]) == n_disc
        assert len(lc["disc_ext_loss_weights"]) == n_disc
        assert len(lc["gen_disc_losses"]) == 1
    assert get_loss_conf(hps, 1)["disc_ext_loss_weights"] == [-1.0, 1.0, 1.0]
    with pytest.raises(ValueError):
        get_loss_conf(hps, 99)


def test_evaluate_no_updates(rng):
    conf = {"hps": {"composing_mode": LSGAN, "epochs": 1, "batch_step": 1,
                    "disc_k_step": 1}}
    engine = GAN(conf, ToyGen(), ToyDisc()).compose_gan_with_mode().compile()
    engine.fit_generator(_data_iter(rng, LSGAN), verbose=0)
    before = np.asarray(
        jax.tree.leaves(engine.state["gen_params"])[0]
    ).copy()
    metrics = engine.evaluate(_data_iter(rng, LSGAN), steps=3)
    assert np.isfinite(metrics["disc_ext_loss"])
    assert np.isfinite(metrics["gen_disc_loss"])
    after = np.asarray(jax.tree.leaves(engine.state["gen_params"])[0])
    np.testing.assert_allclose(before, after)  # no parameter updates


def test_r1_fused_vjp_matches_separate_grad(rng):
    """The fused-vjp R1 (input grad reusing the stacked forward) must equal
    the separate jax.grad R1 — same loss AND same parameter grads."""
    base = {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "epochs": 1, "batch_step": 1, "disc_k_step": 1, "r_gamma": 10.0,
        "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
    }
    batch = jax.tree.map(jnp.asarray, next(_data_iter(
        np.random.default_rng(5), STYLE_GAN_SOFTPLUS_INVERSE_R1_GP)))

    def loss_and_grads(hps):
        e = GAN({"hps": dict(hps)}, ToyGen(), ToyDisc())
        e.compose_gan_with_mode().compile()
        e.init_state(batch, seed=0)
        return jax.value_and_grad(e._disc_loss)(
            e.state["disc_params"], e.state, batch, jax.random.key(3))

    l_fused, g_fused = loss_and_grads(dict(base, r1_fused_vjp=True))
    l_sep, g_sep = loss_and_grads(base)  # default: separate-grad R1
    np.testing.assert_allclose(float(l_fused), float(l_sep), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_fused, g_sep,
    )


@pytest.mark.parametrize("remat", ["dots", "nothing"])
def test_remat_policies_match_exact(rng, remat):
    """Remat changes only what the backward recomputes: losses and grads
    are identical with any policy."""
    base = {
        "composing_mode": STYLE_GAN_SOFTPLUS_INVERSE_R1_GP,
        "epochs": 1, "batch_step": 1, "disc_k_step": 1, "r_gamma": 10.0,
        "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
    }
    batch = jax.tree.map(jnp.asarray, next(_data_iter(
        np.random.default_rng(6), STYLE_GAN_SOFTPLUS_INVERSE_R1_GP)))

    def d_and_g(hps):
        e = GAN({"hps": dict(hps)}, ToyGen(), ToyDisc())
        e.compose_gan_with_mode().compile()
        e.init_state(batch, seed=0)
        d, dg = jax.value_and_grad(e._disc_loss)(
            e.state["disc_params"], e.state, batch, jax.random.key(3))
        (g, _), gg = jax.value_and_grad(e._gen_loss, has_aux=True)(
            e.state["gen_params"], e.state, batch, jax.random.key(4))
        return d, dg, g, gg

    d0, dg0, g0, gg0 = d_and_g(base)
    d1, dg1, g1, gg1 = d_and_g(dict(base, remat=remat))
    np.testing.assert_allclose(float(d0), float(d1), rtol=1e-6)
    np.testing.assert_allclose(float(g0), float(g1), rtol=1e-6)
    for a, b in ((dg0, dg1), (gg0, gg1)):
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6),
            a, b,
        )
