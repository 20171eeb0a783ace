"""Loss/metric parity tests vs the reference formulas (SURVEY §4b)."""

import jax
import jax.numpy as jnp
import numpy as np

from ku.loss_ext import (
    CategoricalCrossentropyWithLabelGT,
    categorical_crossentropy_with_label_gt,
    gradient_penalty,
    r1_penalty,
    r_penalty_loss,
    softplus_inverse_loss,
    softplus_loss,
    wgan_gp_loss,
    wgan_loss,
)
from ku.metrics_ext import MeanIoUExt


def test_wgan_loss(rng):
    y = rng.normal(size=(4, 3)).astype(np.float32)
    out = np.asarray(wgan_loss(None, jnp.asarray(y)))
    np.testing.assert_allclose(out, y.mean(-1), rtol=1e-6)


def test_softplus_pair(rng):
    y = rng.normal(size=(5,)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(softplus_loss(None, jnp.asarray(y))),
        np.log1p(np.exp(y)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(softplus_inverse_loss(None, jnp.asarray(y))),
        np.log1p(np.exp(-y)), rtol=1e-5,
    )


def test_r_penalty_from_grads(rng):
    g = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(r_penalty_loss(jnp.asarray(g), r_gamma=10.0))
    expected = 10.0 * 0.5 * (g**2).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_wgan_gp_from_grads(rng):
    g = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    out = np.asarray(wgan_gp_loss(jnp.asarray(g), 10.0, 1.0))
    norm = np.sqrt((g**2).sum(axis=(1, 2, 3)) + 1e-7)
    np.testing.assert_allclose(out, 10.0 * (norm - 1.0) ** 2, rtol=1e-5)


def test_r1_penalty_end_to_end(rng):
    """R1 through a quadratic disc has a closed form: D(x)=Σ a·x² ⇒
    ∇=2ax ⇒ penalty = γ/2·Σ4a²x²."""
    a = 0.7
    x = jnp.asarray(rng.normal(size=(3, 2, 2, 1)).astype(np.float32))

    def disc(xx):
        return a * jnp.sum(jnp.square(xx), axis=(1, 2, 3))

    out = np.asarray(r1_penalty(disc, x, r_gamma=10.0))
    expected = 10.0 * 0.5 * (4 * a * a * np.asarray(x) ** 2).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_gradient_penalty_end_to_end(rng):
    x = jnp.asarray(rng.normal(size=(3, 2, 2, 1)).astype(np.float32))

    def disc(xx):
        return jnp.sum(xx, axis=(1, 2, 3))  # ∇ = 1 ⇒ ‖∇‖=√4=2

    out = np.asarray(gradient_penalty(disc, x, 10.0, 1.0))
    np.testing.assert_allclose(out, 10.0 * (2.0 - 1.0) ** 2, rtol=1e-3)


def test_cce_with_label_gt(rng):
    labels = np.array([0, 2, 1])
    probs = np.full((3, 3), 0.2, np.float32)
    probs[np.arange(3), labels] = 0.6
    out = np.asarray(
        categorical_crossentropy_with_label_gt(
            jnp.asarray(labels), jnp.asarray(probs), num_classes=3
        )
    )
    np.testing.assert_allclose(out, -np.log(0.6), rtol=1e-5)

    # Smoothing: soft targets.
    out_s = np.asarray(
        categorical_crossentropy_with_label_gt(
            jnp.asarray(labels), jnp.asarray(probs), num_classes=3,
            label_smoothing=0.3,
        )
    )
    soft = np.full((3, 3), 0.1)
    soft[np.arange(3), labels] += 0.7
    expected = -(soft * np.log(probs)).sum(-1)
    np.testing.assert_allclose(out_s, expected, rtol=1e-5)

    wrapper = CategoricalCrossentropyWithLabelGT(num_classes=3)
    assert np.isclose(float(wrapper(labels, jnp.asarray(probs))), -np.log(0.6),
                      rtol=1e-5)


def test_mean_iou_ext():
    m = MeanIoUExt(num_classes=2)
    y_true = np.array([0, 0, 1, 1])
    y_pred = np.eye(2)[[0, 1, 1, 1]]  # one wrong prediction for class 0
    iou = m(y_true, y_pred)
    # cm = [[1,1],[0,2]]: IoU0 = 1/2, IoU1 = 2/3 → mean 7/12
    np.testing.assert_allclose(iou, (0.5 + 2 / 3) / 2, rtol=1e-6)

    # Accumulation doubles counts → same IoU.
    iou2 = m(y_true, y_pred)
    np.testing.assert_allclose(iou2, iou, rtol=1e-6)

    # One-hot ground truth accepted too.
    m2 = MeanIoUExt(num_classes=2, accum_enable=False)
    iou3 = m2(np.eye(2)[y_true], y_pred)
    np.testing.assert_allclose(iou3, iou, rtol=1e-6)
