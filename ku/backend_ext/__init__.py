"""Backend shim — API-parity layer over jax.numpy.

The reference wraps TF ops behind ``ku.backend_ext.tensorflow_backend``
(pad/transpose/where/cond/broadcast_to/add_n plus TFP's
MultivariateNormalDiag; reference ku/backend_ext/tensorflow_backend.py:10-67)
so its layers never touch raw TF. On TPU/JAX no shim is needed — jnp IS the
backend — but we keep the module and names so reference users find the same
surface. Gaussian sampling is stateless: functions that sample take a PRNG
key instead of relying on global RNG state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pad(x, paddings, mode="CONSTANT", constant_values=0):
    mode = {"CONSTANT": "constant", "REFLECT": "reflect", "SYMMETRIC": "symmetric"}.get(
        str(mode).upper(), mode
    )
    if mode == "constant":
        return jnp.pad(x, paddings, mode=mode, constant_values=constant_values)
    return jnp.pad(x, paddings, mode=mode)


def transpose(x, perm=None):
    return jnp.transpose(x, axes=perm)


def where(condition, x=None, y=None):
    if x is None and y is None:
        return jnp.where(condition)
    return jnp.where(condition, x, y)


def cond(pred, true_fn, false_fn, *operands):
    return jax.lax.cond(pred, true_fn, false_fn, *operands)


def broadcast_to(x, shape):
    return jnp.broadcast_to(x, shape)


def add_n(xs):
    out = xs[0]
    for x in xs[1:]:
        out = out + x
    return out


class MultivariateNormalDiag:
    """Minimal stand-in for tfp.distributions.MultivariateNormalDiag.

    Only the surface the reference uses (``.sample()``; reference
    ku/backend_ext/tensorflow_backend.py:32-46, ku/ebm/rbm.py:64-67) —
    sampling takes an explicit key because JAX PRNG is stateless.
    """

    def __init__(self, loc, scale_diag=None):
        self.loc = jnp.asarray(loc)
        self.scale_diag = None if scale_diag is None else jnp.asarray(scale_diag)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.loc.shape
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        scale = 1.0 if self.scale_diag is None else self.scale_diag
        return self.loc + eps * scale

    def log_prob(self, x):
        scale = jnp.ones_like(self.loc) if self.scale_diag is None else self.scale_diag
        z = (x - self.loc) / scale
        return jnp.sum(
            -0.5 * z**2 - jnp.log(scale) - 0.5 * jnp.log(2.0 * jnp.pi), axis=-1
        )


def multivariate_normal_diag(loc=0.0, scale_diag=None, name=None):
    return MultivariateNormalDiag(loc=loc, scale_diag=scale_diag)
