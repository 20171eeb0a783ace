"""Train-state container.

A minimal, pytree-registered train state (params + optimizer state + PRNG
key + step) used by checkpoints; engines that need more (the GAN engine's
dual-model state) use plain dicts with the same conventions.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


@jax.tree_util.register_pytree_node_class
class TrainState:
    """params / opt_state / key / step, orbax-serializable."""

    def __init__(self, params: Any, opt_state: Any, key: Any, step):
        self.params = params
        self.opt_state = opt_state
        self.key = key
        self.step = step

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, key):
        import jax.numpy as jnp

        return cls(params, tx.init(params), key, jnp.zeros((), jnp.int32))

    def apply_gradients(self, grads, tx: optax.GradientTransformation):
        updates, opt_state = tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        key, _ = jax.random.split(self.key)
        return TrainState(params, opt_state, key, self.step + 1)

    def tree_flatten(self):
        return (self.params, self.opt_state, self.key, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
