"""Example-level StyleGAN surface: evaluate's per-class PNG dump and the
progressive trainer (reference examples/style_based_gan/style_based_gan.py
:1337-1359 evaluate, :851-1159 progressive)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "style_based_gan"))
try:
    from style_based_gan import StyleGAN, TrainingSequenceFFHQ
finally:
    sys.path.pop(0)


def _tiny_conf(tmp_path, resolution=8, epochs=1):
    return {
        "mode": "train",
        "raw_data_path": str(tmp_path / "no_such_dir"),  # synthetic data
        "gan_mode": 2,
        "hps": {
            "epochs": epochs, "batch_step": 2, "disc_k_step": 1,
            "batch_size": 2, "mixing_prob": 0.9, "trunc_psi": 0.0,
            "trunc_cutoff": 4, "trunc_momentum": 0.99, "r_gamma": 10.0,
            "ch_base": 64, "max_ch": 16,
        },
        "nn_arch": {"label_usage": True, "resolution": resolution,
                    "lane_packing": False,
                    "gen_prog_resolutions": [4, 8],
                    "disc_prog_resolutions": [4, 8]},
        "map_nn_arch": {"latent_dim": 4, "dense1_dim": 8, "num_classes": 4,
                        "dlatent_dim": 8, "num_layers": 2},
        "disc_ext_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
        "gen_disc_hps": {"lr": 1e-3, "beta_1": 0.0, "beta_2": 0.99},
    }


def test_evaluate_writes_per_class_pngs(tmp_path):
    """StyleGAN.evaluate dumps one PNG (+ raw array) per class (reference
    :1347-1359 writes per-class PNGs via imsave)."""
    pytest.importorskip("matplotlib")
    conf = _tiny_conf(tmp_path)
    s_gan = StyleGAN(conf)
    seq = TrainingSequenceFFHQ(s_gan.raw_data_path, s_gan._hps,
                               s_gan._nn_arch, s_gan.map_nn_arch)
    s_gan.compile()
    s_gan.init_state(jax.tree.map(jnp.asarray, next(iter(seq))), seed=0)

    out_dir = tmp_path / "results"
    s_gan.evaluate(result_dir=str(out_dir), num_per_class=2, classes=(0, 3))
    for c in (0, 3):
        npy = out_dir / f"class_{c}.npy"
        png = out_dir / f"class_{c}.png"
        assert npy.exists(), npy
        assert png.exists(), png
        imgs = np.load(npy)
        assert imgs.shape == (2, 8, 8, 3)
        assert np.isfinite(imgs).all()
        assert imgs.min() >= -1e-3 and imgs.max() <= 1.0 + 1e-3


def test_fit_progressively_checkpoints_and_resume(tmp_path):
    """Example-level progressive run: per-stage checkpoints land, the
    final sample dump is written, and an 'auto' resume of a finished run
    trains zero additional stages (reference fit_generator_progressively
    surface, :851-1159)."""
    pytest.importorskip("matplotlib")
    from ku.utils import CheckpointCallback

    conf = _tiny_conf(tmp_path)
    s_gan = StyleGAN(conf)
    ckpt_dir = str(tmp_path / "prog_ckpt")
    cb = CheckpointCallback(ckpt_dir, every=1)
    sample_dir = str(tmp_path / "results")
    hist = s_gan.fit_progressively(sample_dir=sample_dir, callbacks=[cb])
    assert len(hist) == 2  # stages 4px and 8px
    assert cb.mgr.latest_step() == 1
    assert os.path.exists(os.path.join(sample_dir, "progressive_final.npy"))

    # Auto-resume of a COMPLETE run: nothing left to train.
    s_gan2 = StyleGAN(_tiny_conf(tmp_path))
    cb2 = CheckpointCallback(ckpt_dir, every=1)
    hist2 = s_gan2.fit_progressively(sample_dir=sample_dir,
                                     callbacks=[cb2],
                                     initial_epoch="auto")
    assert hist2 == []
    # The restored final-stage state generates.
    imgs = s_gan2.generate_samples(2)
    assert imgs.shape == (2, 8, 8, 3)


def test_large_batch_serving_uses_unpacked_layout(tmp_path):
    """generate_samples(n >= 64) routes through the unpacked serving
    clone with the SAME params; outputs match the engine's (packed-
    configured) generate path for identical latents (layout-independent
    params, deterministic mode)."""
    conf = _tiny_conf(tmp_path)
    conf["nn_arch"]["lane_packing"] = True  # inert at res 8, but routes
    s_gan = StyleGAN(conf)
    seq = TrainingSequenceFFHQ(s_gan.raw_data_path, s_gan._hps,
                               s_gan._nn_arch, s_gan.map_nn_arch)
    s_gan.compile()
    s_gan.init_state(jax.tree.map(jnp.asarray, next(iter(seq))), seed=0)

    rng = np.random.default_rng(0)
    n = 64
    z1 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    z2 = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 4, size=(n, 1)))
    z = (z1, labels, z2)
    img_serving = np.asarray(s_gan._infer_generate(z))
    img_engine = np.asarray(s_gan.generate(z))
    np.testing.assert_allclose(img_serving, img_engine, rtol=2e-4,
                               atol=2e-5)
    # And the public surface takes the serving branch for n >= 64.
    imgs = s_gan.generate_samples(n)
    assert imgs.shape == (n, 8, 8, 3)
    assert hasattr(s_gan, "_gen_infer_jit")
