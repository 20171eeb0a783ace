"""Model-engine extensions: Trainer + structural model surgery.

Reference: ku/engine_ext/training.py (``ModelExt``):
- ``train_step``/``test_step`` (:38-112): the reference overrides Keras to
  smuggle a persistent GradientTape watching the raw inputs
  (``self.tape_handler``/``self.assigned_inputs``, :62-65) so gradient-
  penalty losses can later differentiate wrt inputs. TPU-native: penalties
  take ``jax.grad`` wrt inputs *inside* the jitted step (see
  ku/loss_ext/loss.py), so :class:`Trainer` is an ordinary jitted
  grad-update loop — no hidden state, no eager mode.
- ``glue_layers`` (:114-193): splice new layers between named layers
  (head / middle / tail cases) — here pure list surgery on specs.
- ``create_prog_model`` (:195-293): truncated sub-models for progressive
  GAN training — FORWARD keeps layers 0..depth plus a fixed tail
  (:236-262), BACKWARD keeps layers depth..end (:263-291). Weight reuse
  across stages comes from flax name-based param trees: a truncated Stack
  reuses the sub-tree of the full model's params selected by layer names.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ku.engine_ext.spec import LayerSpec, Stack

PROGRESSIVE_MODE_FORWARD = 0
PROGRESSIVE_MODE_BACKWARD = 1


# -- structural surgery on spec lists ---------------------------------------


def _index_of(specs: Sequence[LayerSpec], name: str) -> int:
    for i, s in enumerate(specs):
        if s.name == name:
            return i
    raise ValueError(f"layer {name!r} not found")


def glue_layers(specs: Sequence[LayerSpec], new_specs: Sequence[LayerSpec],
                first_layer_name: Optional[str] = None,
                last_layer_name: Optional[str] = None) -> Tuple[LayerSpec, ...]:
    """Splice ``new_specs`` into ``specs`` (reference training.py:114-193).

    - head:   ``first_layer_name is None`` → new layers feed the model from
      ``last_layer_name`` on.
    - tail:   ``last_layer_name is None`` → new layers appended after
      ``first_layer_name``.
    - middle: both given → replace everything strictly between them.
    """
    specs = list(specs)
    if first_layer_name is None and last_layer_name is None:
        raise ValueError("first_layer_name or last_layer_name must be given")
    if first_layer_name is None:
        return tuple(new_specs) + tuple(specs[_index_of(specs, last_layer_name):])
    if last_layer_name is None:
        return tuple(specs[: _index_of(specs, first_layer_name) + 1]) + tuple(new_specs)
    return (
        tuple(specs[: _index_of(specs, first_layer_name) + 1])
        + tuple(new_specs)
        + tuple(specs[_index_of(specs, last_layer_name):])
    )


def create_prog_specs(specs: Sequence[LayerSpec], mode: int, prog_depth: int,
                      fixed_layer_names: Sequence[str] = ()) -> Tuple[LayerSpec, ...]:
    """Truncated spec list for progressive training
    (reference training.py:195-293).

    FORWARD (generator growth): layers [0, prog_depth) plus the fixed tail
    layers (e.g. to-RGB), in original order. BACKWARD (discriminator
    growth): fixed head layers plus layers [prog_depth, end).
    """
    specs = list(specs)
    fixed = set(fixed_layer_names)
    if mode == PROGRESSIVE_MODE_FORWARD:
        kept = [s for i, s in enumerate(specs) if i < prog_depth or s.name in fixed]
    elif mode == PROGRESSIVE_MODE_BACKWARD:
        kept = [s for i, s in enumerate(specs) if i >= prog_depth or s.name in fixed]
    else:
        raise ValueError("mode is not valid.")
    return tuple(kept)


def select_params(full_params, specs: Sequence[LayerSpec]):
    """Sub-tree of a Stack's params for a truncated spec list — this is how
    truncated progressive models share weights with the full model
    (flax params are name-keyed, so selection is a dict filter)."""
    names = {s.name for s in specs}
    return {k: v for k, v in full_params.items() if k in names}


def merge_params(full_params, partial_params):
    """Write a truncated model's trained params back into the full tree."""
    out = dict(full_params)
    out.update(partial_params)
    return out


def train_on_batch_forward_prog_model(specs, full_params, x, y, loss_fn,
                                      prog_depth: int,
                                      fixed_layer_names: Sequence[str] = (),
                                      lr: float = 1e-3):
    """One SGD step on the FORWARD-truncated sub-model, weights shared
    with the full model (reference ModelExt.train_on_batch_forward_
    prog_model, training.py:335-388). Returns (updated_full_params, loss).
    """
    return _train_on_batch_prog(
        specs, full_params, x, y, loss_fn,
        create_prog_specs(specs, PROGRESSIVE_MODE_FORWARD, prog_depth,
                          fixed_layer_names), lr,
    )


def train_on_batch_backward_prog_model(specs, full_params, x, y, loss_fn,
                                       prog_depth: int,
                                       fixed_layer_names: Sequence[str] = (),
                                       lr: float = 1e-3):
    """BACKWARD-truncated counterpart (reference training.py:389-443)."""
    return _train_on_batch_prog(
        specs, full_params, x, y, loss_fn,
        create_prog_specs(specs, PROGRESSIVE_MODE_BACKWARD, prog_depth,
                          fixed_layer_names), lr,
    )


def _train_on_batch_prog(specs, full_params, x, y, loss_fn, sub_specs, lr):
    sub = Stack(specs=sub_specs)
    sub_params = select_params(full_params, sub_specs)

    def loss_of(p):
        return jnp.mean(loss_fn(y, sub.apply({"params": p}, x)))

    loss, grads = jax.value_and_grad(loss_of)(sub_params)
    new_sub = jax.tree.map(lambda p, g: p - lr * g, sub_params, grads)
    return merge_params(full_params, new_sub), float(loss)


# -- Trainer ---------------------------------------------------------------


class Trainer:
    """Jitted train/test loop for a flax module (ModelExt's train_step /
    test_step surface, reference training.py:38-112).

    ``loss_fn(y_true, y_pred) -> per-example loss``; reduction is mean.
    """

    def __init__(self, module, loss_fn: Callable, optimizer=None,
                 metrics: Sequence[Callable] = (), seed: int = 0,
                 has_batch_stats: bool = False, rng_streams: Sequence[str] = ()):
        self.module = module
        self.loss_fn = loss_fn
        self.tx = optimizer if optimizer is not None else optax.adam(1e-3)
        self.metrics = list(metrics)
        self.has_batch_stats = has_batch_stats
        self.rng_streams = tuple(rng_streams)
        self._seed = seed
        self.state = None

    def init(self, sample_x):
        key = jax.random.key(self._seed)
        init_rngs = {"params": key}
        for i, s in enumerate(self.rng_streams):
            init_rngs[s] = jax.random.fold_in(key, i + 1)
        variables = self.module.init(init_rngs, sample_x)
        params = variables["params"]
        self.state = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        return self

    def _train_step_inner(self, state, x, y, key):
        def loss_of(params):
            variables = {"params": params}
            if self.has_batch_stats:
                variables["batch_stats"] = state["batch_stats"]
            rngs = {s: jax.random.fold_in(key, i) for i, s in
                    enumerate(self.rng_streams)}
            kwargs = dict(deterministic=False)
            if self.has_batch_stats:
                y_pred, mutated = self.module.apply(
                    variables, x, rngs=rngs, mutable=["batch_stats"], **kwargs
                )
                new_stats = mutated["batch_stats"]
            else:
                y_pred = self.module.apply(variables, x, rngs=rngs, **kwargs)
                new_stats = state["batch_stats"]
            return jnp.mean(self.loss_fn(y, y_pred)), (y_pred, new_stats)

        (loss, (y_pred, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state["params"])
        updates, opt_state = self.tx.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": params,
            "batch_stats": new_stats,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        return new_state, loss, y_pred

    @functools.partial(jax.jit, static_argnums=(0,))
    def _train_step(self, state, x, y, key):
        return self._train_step_inner(state, x, y, key)

    @functools.partial(jax.jit, static_argnums=(0,))
    def _test_step(self, state, x, y):
        variables = {"params": state["params"]}
        if self.has_batch_stats:
            variables["batch_stats"] = state["batch_stats"]
        y_pred = self.module.apply(variables, x, deterministic=True)
        return jnp.mean(self.loss_fn(y, y_pred)), y_pred

    def train_step(self, x, y, key=None):
        if self.state is None:
            self.init(x)
        key = key if key is not None else jax.random.fold_in(
            jax.random.key(self._seed), int(self.state["step"])
        )
        self.state, loss, y_pred = self._train_step(self.state, x, y, key)
        logs = {"loss": float(loss)}
        for m in self.metrics:
            logs[getattr(m, "name", m.__class__.__name__)] = m(y, y_pred)
        return logs

    def test_step(self, x, y):
        loss, y_pred = self._test_step(self.state, x, y)
        logs = {"loss": float(loss)}
        for m in self.metrics:
            logs[getattr(m, "name", m.__class__.__name__)] = m(y, y_pred)
        return logs

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _train_epoch(self, state, xb, yb, num_steps, key):
        """One full epoch as a lax.scan over pre-batched data — a single
        device dispatch per epoch (vs one per batch)."""

        def step(carry, xs):
            st, key = carry
            x, y = xs
            key, sub = jax.random.split(key)
            st, loss, _ = self._train_step_inner(st, x, y, sub)
            return (st, key), loss

        (state, _), losses = jax.lax.scan(step, (state, key), (xb, yb),
                                          length=num_steps)
        return state, losses

    def fit(self, X, Y, batch_size: int, epochs: int, verbose: int = 1,
            shuffle: bool = True):
        import numpy as np

        n = X.shape[0]
        rng = np.random.default_rng(self._seed)
        if self.state is None:
            self.init(jnp.asarray(X[:1]))
        history = []
        num_steps = n // batch_size
        for e in range(epochs):
            idx = rng.permutation(n) if shuffle else np.arange(n)
            idx = idx[: num_steps * batch_size]
            xb = jnp.asarray(X[idx]).reshape((num_steps, batch_size)
                                             + X.shape[1:])
            yb = jnp.asarray(Y[idx]).reshape((num_steps, batch_size)
                                             + Y.shape[1:])
            key = jax.random.fold_in(jax.random.key(self._seed), e)
            self.state, losses = self._train_epoch(self.state, xb, yb,
                                                   num_steps, key)
            history.append(float(jnp.mean(losses)))
            if verbose:
                print(f"epoch {e + 1}/{epochs} loss: {history[-1]:f}")
        return history

    def predict(self, X, batch_size: int = 256):
        import numpy as np

        outs = []
        for i in range(0, X.shape[0], batch_size):
            variables = {"params": self.state["params"]}
            if self.has_batch_stats:
                variables["batch_stats"] = self.state["batch_stats"]
            outs.append(
                np.asarray(
                    self.module.apply(
                        variables, jnp.asarray(X[i : i + batch_size]),
                        deterministic=True,
                    )
                )
            )
        return np.concatenate(outs, axis=0)
