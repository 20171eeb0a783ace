"""Metric extensions.

Reference: ku/metrics_ext/metrics.py:24-73 — ``MeanIoUExt``: MeanIoU that
accepts one-hot predictions (argmax first, :50), with an optional
non-accumulating mode (:72-73). JAX-native: the confusion-matrix update is
a jitted scatter-add; state is an explicit array on the instance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def _confusion_matrix(y_true, y_pred, num_classes: int, weights=None):
    idx = y_true * num_classes + y_pred
    if weights is None:
        weights = jnp.ones_like(idx, jnp.float64 if jax.config.jax_enable_x64
                                else jnp.float32)
    cm = jnp.zeros((num_classes * num_classes,), weights.dtype)
    cm = cm.at[idx].add(weights)
    return cm.reshape(num_classes, num_classes)


class MeanIoUExt:
    """Mean IoU over one-hot truth/prediction tensors
    (reference metrics.py:24-73)."""

    def __init__(self, num_classes: int, accum_enable: bool = True,
                 name=None, dtype=None):
        self.num_classes = num_classes
        self.accum_enable = accum_enable
        self.name = name or "mean_iou_ext"
        self.reset_state()

    def reset_state(self):
        self.total_cm = np.zeros((self.num_classes, self.num_classes),
                                 np.float64)

    def update_state(self, y_true, y_pred, sample_weight=None):
        """y_true: one-hot or integer labels; y_pred: one-hot vectors
        (argmax'd, reference :50)."""
        y_pred = jnp.argmax(jnp.asarray(y_pred), axis=-1).reshape(-1)
        y_true = jnp.asarray(y_true)
        if y_true.ndim > 1 and y_true.shape[-1] == self.num_classes:
            y_true = jnp.argmax(y_true, axis=-1)
        y_true = y_true.reshape(-1).astype(jnp.int32)
        w = None if sample_weight is None else jnp.asarray(sample_weight).reshape(-1)
        cm = np.asarray(
            _confusion_matrix(y_true, y_pred.astype(jnp.int32),
                              self.num_classes, w)
        )
        if self.accum_enable:
            self.total_cm += cm
        else:
            self.total_cm = cm.astype(np.float64)
        return self.total_cm

    def result(self) -> float:
        cm = self.total_cm
        sum_over_row = cm.sum(axis=0)
        sum_over_col = cm.sum(axis=1)
        true_pos = np.diag(cm)
        denom = sum_over_row + sum_over_col - true_pos
        valid = denom > 0
        iou = np.where(valid, true_pos / np.maximum(denom, 1e-12), 0.0)
        n_valid = max(valid.sum(), 1)
        return float(iou.sum() / n_valid)

    def __call__(self, y_true, y_pred, sample_weight=None) -> float:
        self.update_state(y_true, y_pred, sample_weight)
        return self.result()
