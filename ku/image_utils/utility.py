"""Image preprocessing utilities — device-resident via jax.image.

Reference: ku/image_utils/utility.py —
- ``resize`` (:29-94): affine-transform resize; a ``device`` flag selects
  scipy.ndimage (CPU) vs an optional CuPy path (GPU). TPU-native: one
  jitted ``jax.image.resize`` (fusable into the input pipeline) for any
  device; the ``device`` parameter is kept for signature parity and
  ignored (SURVEY §2.4: "TPU equivalent: jax.image.resize fused into the
  input pipeline").
- ``resize_image_to_target_symmeric_size`` (:97-177): letterbox to a
  square ``size``, returning pads for inverse mapping (same return tuple,
  including the reference's swapped (pad_r, pad_l) order for tall images).
- ``get_one_hot`` (:179-203): the reference's double Python loop with an
  IndexError→class-0 fallback becomes a vectorized clip + one_hot.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEVICE_CPU = 0
DEVICE_GPU = 1  # accepted for parity; everything runs on the JAX backend


@functools.partial(jax.jit, static_argnames=("h", "w", "method"))
def _resize_hw(image, h: int, w: int, method: str = "linear"):
    return jax.image.resize(
        image, (h, w, image.shape[2]), method=method
    )


def resize(image, size: tuple, mode: str = "constant", device: int = DEVICE_CPU):
    """Resize an HWC image to ``size=(w, h)`` (reference :29-94).

    ``mode``/``device`` kept for parity; resampling is bilinear on-device.
    """
    w, h = size
    return _resize_hw(jnp.asarray(image), int(h), int(w))


@functools.partial(jax.jit, static_argnames=("h", "w", "out_h", "out_w"))
def _resize_batch(images, h: int, w: int, out_h: int, out_w: int):
    return jax.image.resize(
        images, (images.shape[0], out_h, out_w, images.shape[3]), "linear"
    )


def resize_batch(images, size: tuple):
    """Batched NHWC resize — one XLA op for the whole input pipeline batch
    (no reference analogue; the reference resizes per image on host)."""
    images = jnp.asarray(images)
    w, h = size
    return _resize_batch(images, images.shape[1], images.shape[2], int(h), int(w))


def resize_image_to_target_symmeric_size(image, size: int,
                                         device: int = DEVICE_CPU):
    """Letterbox to a square of ``size`` (reference :97-177). Returns
    ``(image_p, w, h, pad_t, pad_l, pad_b, pad_r)`` — identical contract,
    including the (pad_r, pad_l) left-right order quirk for tall images."""
    image = jnp.asarray(image)
    h, w = int(image.shape[0]), int(image.shape[1])
    pad_t = pad_b = pad_l = pad_r = 0
    if w >= h:
        w_p, h_p = size, int(h / w * size)
        pad = size - h_p
        pad_t, pad_b = pad // 2, pad // 2 + (pad % 2)
        image_p = resize(image, (w_p, h_p))
        image_p = jnp.pad(image_p, ((pad_t, pad_b), (0, 0), (0, 0)))
    else:
        h_p, w_p = size, int(w / h * size)
        pad = size - w_p
        pad_l, pad_r = pad // 2, pad // 2 + (pad % 2)
        image_p = resize(image, (w_p, h_p))
        image_p = jnp.pad(image_p, ((0, 0), (pad_r, pad_l), (0, 0)))
    return image_p, w, h, pad_t, pad_l, pad_b, pad_r


def get_one_hot(inputs, num_classes: int):
    """One-hot a (a, b, 1) label map to (a, b, num_classes)
    (reference :179-203). Out-of-range labels fall back to class 0, exactly
    like the reference's IndexError handler."""
    labels = np.asarray(inputs)[..., 0].astype(np.int64)
    labels = np.where((labels >= 0) & (labels < num_classes), labels, 0)
    return np.asarray(jax.nn.one_hot(labels, num_classes), np.float64)
