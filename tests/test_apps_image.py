"""NobodyConvNet backbones + image utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from ku.applications_ext import NobodyConvNet2D, NobodyConvNet3D
from ku.image_utils import (
    get_one_hot,
    resize,
    resize_batch,
    resize_image_to_target_symmeric_size,
)

CONF = {
    "raw_data_path": "",
    "model_loading": False,
    "hps": {"bn_momentum": 0.99, "bn_scale": True, "weight_decay": 1e-4},
    "nn_arch": {
        "conv_rate_multiplier": 1,
        "sp_feature_dim": 16,
        "image_size": 32,
        "cell_size": 8,
        "anchor_scale_size": 2,
    },
}


def test_nobody_convnet2d(key, rng):
    model = NobodyConvNet2D.from_conf(CONF, (1, 32, 32, 3))
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(key, x)
    y = model.apply(variables, x, deterministic=True)
    # stem /2 then Block1 /2 → 8×8, sp_feature_dim channels.
    assert y.shape == (2, 8, 8, 16)
    # Train mode updates batch stats.
    y2, mutated = model.apply(variables, x, deterministic=False,
                              mutable=["batch_stats"])
    assert y2.shape == (2, 8, 8, 16)
    assert mutated["batch_stats"]


def test_nobody_convnet3d(key, rng):
    model = NobodyConvNet3D.from_conf(CONF, (1, 24, 24, 24, 1), depth=1)
    x = jnp.asarray(rng.normal(size=(1, 24, 24, 24, 1)).astype(np.float32))
    variables = model.init(key, x)
    y = model.apply(variables, x, deterministic=True)
    assert y.shape[0] == 1 and y.shape[-1] == 16
    assert np.isfinite(np.asarray(y)).all()


def test_resize_bilinear():
    img = np.zeros((4, 4, 1), np.float32)
    img[1:3, 1:3, 0] = 1.0
    out = np.asarray(resize(img, (8, 8)))
    assert out.shape == (8, 8, 1)
    assert 0.9 < out[3, 3, 0] <= 1.0  # center preserved
    assert abs(out.mean() - img.mean()) < 0.05  # mass roughly preserved


def test_resize_batch():
    imgs = np.random.default_rng(0).normal(size=(3, 8, 8, 3)).astype(np.float32)
    out = np.asarray(resize_batch(imgs, (16, 16)))
    assert out.shape == (3, 16, 16, 3)


def test_symmetric_resize_pads():
    img = np.ones((10, 20, 3), np.float32)  # wide
    out, w, h, pt, pl, pb, pr = resize_image_to_target_symmeric_size(img, 16)
    assert out.shape == (16, 16, 3)
    assert (w, h) == (20, 10)
    assert pt + pb == 16 - int(10 / 20 * 16)
    assert pl == pr == 0
    # Padded rows are zero.
    assert float(jnp.abs(out[0]).max()) == 0.0

    tall = np.ones((20, 10, 3), np.float32)
    out2, w2, h2, pt2, pl2, pb2, pr2 = resize_image_to_target_symmeric_size(tall, 16)
    assert out2.shape == (16, 16, 3)
    assert pl2 + pr2 == 16 - int(10 / 20 * 16)


def test_get_one_hot():
    labels = np.array([[[0], [2]], [[1], [99]]])  # 99 out of range → class 0
    oh = get_one_hot(labels, 3)
    assert oh.shape == (2, 2, 3)
    np.testing.assert_allclose(oh[0, 0], [1, 0, 0])
    np.testing.assert_allclose(oh[0, 1], [0, 0, 1])
    np.testing.assert_allclose(oh[1, 1], [1, 0, 0])  # fallback to class 0
