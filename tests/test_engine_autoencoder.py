"""Spec engine: Stack building, glue/progressive surgery, encoder reversal
(reference semantics from ku/backprop/autoencoder.py + engine_ext/training.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ku.backprop import (
    make_autoencoder_from_encoder,
    make_autoencoder_with_sym_sc,
    make_decoder_from_encoder,
    reverse_specs,
)
from ku.engine_ext import (
    PROGRESSIVE_MODE_BACKWARD,
    PROGRESSIVE_MODE_FORWARD,
    Stack,
    Trainer,
    create_prog_specs,
    glue_layers,
    infer_shapes,
    spec,
)


def _dense_encoder():
    return (
        spec("dense", "enc1", units=16, activation="relu"),
        spec("dense", "enc2", units=8, activation="relu"),
        spec("dense", "enc3", units=4),
    )


def _conv_encoder():
    return (
        spec("conv2d", "c1", filters=8, kernel_size=3, strides=2,
             padding="same", activation="relu"),
        spec("conv2d", "c2", filters=16, kernel_size=3, strides=2,
             padding="same", activation="relu"),
    )


def test_stack_builds_and_runs(key, rng):
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    model = Stack(specs=_dense_encoder())
    params = model.init(key, x)
    y = model.apply(params, x)
    assert y.shape == (2, 4)


def test_infer_shapes():
    shapes = infer_shapes(_dense_encoder(), (2, 32))
    assert shapes == [(2, 32), (2, 16), (2, 8), (2, 4)]


def test_reverse_dense_encoder(key, rng):
    """Dense(u)→Dense(input_dim) mirroring (reference autoencoder.py:69-76)."""
    enc = _dense_encoder()
    dec = reverse_specs(enc, (2, 32))
    assert [s.cfg["units"] for s in dec] == [8, 16, 32]

    ae = make_autoencoder_from_encoder(enc, (2, 32))
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    params = ae.init(key, x)
    y = ae.apply(params, x)
    assert y.shape == (2, 32)


def test_reverse_conv_encoder(key, rng):
    """Strided Conv2D→Conv2DTranspose (reference :121-148)."""
    enc = _conv_encoder()
    dec = reverse_specs(enc, (1, 16, 16, 3))
    assert dec[0].kind == "conv2d_transpose" and dec[0].cfg["filters"] == 8
    assert dec[1].kind == "conv2d_transpose" and dec[1].cfg["filters"] == 3

    ae = make_autoencoder_from_encoder(enc, (1, 16, 16, 3))
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    params = ae.init(key, x)
    y = ae.apply(params, x)
    assert y.shape == (1, 16, 16, 3)


def test_reverse_flatten_and_conv1d(key, rng):
    enc = (
        spec("conv1d", "c1", filters=8, kernel_size=3, strides=2,
             padding="same", activation="relu"),
        spec("flatten", "f1"),
        spec("dense", "d1", units=4),
    )
    ae = make_autoencoder_from_encoder(enc, (2, 16, 3))
    x = jnp.asarray(rng.normal(size=(2, 16, 3)).astype(np.float32))
    params = ae.init(key, x)
    y = ae.apply(params, x)
    assert y.shape == (2, 16, 3)


def test_sym_skip_autoencoder(key, rng):
    enc = _conv_encoder()
    ae = make_autoencoder_with_sym_sc(enc, (1, 16, 16, 3))
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    params = ae.init(key, x)
    y = ae.apply(params, x)
    assert y.shape == (1, 16, 16, 3)
    # Skip connections add params vs the plain AE (wider decoder convs).
    plain = make_autoencoder_from_encoder(enc, (1, 16, 16, 3))
    n_skip = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    n_plain = sum(
        np.prod(p.shape) for p in jax.tree.leaves(plain.init(key, x))
    )
    assert n_skip > n_plain


def test_gcn_reversal(key, rng):
    enc = (spec("gcn", "g1", n_node=5, d_out=6, activation="relu"),)
    dec = reverse_specs(enc, (2, 5, 3))
    assert dec[0].kind == "gcn" and dec[0].cfg["d_out"] == 3

    decoder = make_decoder_from_encoder(enc, (2, 5, 3))
    h = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
    a = jnp.ones((2, 5, 5))
    params = decoder.init(key, [h, a])
    y = decoder.apply(params, [h, a])
    assert y.shape == (2, 5, 3)


def test_glue_layers():
    """Reference training.py:114-193 three splice cases."""
    specs = _dense_encoder()
    new = (spec("dense", "mid", units=12),)
    # middle
    out = glue_layers(specs, new, "enc1", "enc3")
    assert [s.name for s in out] == ["enc1", "mid", "enc3"]
    # head
    out = glue_layers(specs, new, last_layer_name="enc2")
    assert [s.name for s in out] == ["mid", "enc2", "enc3"]
    # tail
    out = glue_layers(specs, new, first_layer_name="enc2")
    assert [s.name for s in out] == ["enc1", "enc2", "mid"]


def test_create_prog_specs_and_param_sharing(key, rng):
    """Reference training.py:195-293: FORWARD keeps head+fixed tail,
    BACKWARD keeps tail; truncated models share weights by name."""
    specs = _dense_encoder()
    fwd = create_prog_specs(specs, PROGRESSIVE_MODE_FORWARD, 1, ("enc3",))
    assert [s.name for s in fwd] == ["enc1", "enc3"]
    bwd = create_prog_specs(specs, PROGRESSIVE_MODE_BACKWARD, 1)
    assert [s.name for s in bwd] == ["enc2", "enc3"]

    full = Stack(specs=specs)
    x = jnp.asarray(rng.normal(size=(2, 32)).astype(np.float32))
    full_params = full.init(key, x)["params"]
    sub = Stack(specs=bwd)
    x8 = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
    sub_params = {k: full_params[k] for k in ("enc2", "enc3")}
    y = sub.apply({"params": sub_params}, x8)
    assert y.shape == (2, 4)


def test_trainer_fits_regression(rng):
    """Trainer (ModelExt train_step parity) reduces loss on a linear task."""
    X = rng.normal(size=(256, 8)).astype(np.float32)
    w_true = rng.normal(size=(8, 1)).astype(np.float32)
    Y = X @ w_true

    model = Stack(specs=(spec("dense", "out", units=1),))
    tr = Trainer(model, lambda y, p: jnp.mean((y - p) ** 2, axis=-1),
                 optimizer=optax.adam(1e-2), seed=0)
    history = tr.fit(X, Y, batch_size=32, epochs=20, verbose=0)
    assert history[-1] < history[0] * 0.1
    pred = tr.predict(X[:8])
    assert pred.shape == (8, 1)


def test_train_on_batch_prog_models(key, rng):
    """Progressive per-batch training on truncated sub-models with weight
    sharing (reference training.py:335-443)."""
    import optax
    from ku.engine_ext import (
        train_on_batch_backward_prog_model,
        train_on_batch_forward_prog_model,
    )

    specs = _dense_encoder()
    full = Stack(specs=specs)
    x32 = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    params = dict(full.init(key, x32)["params"])
    loss_fn = lambda y, p: jnp.mean((y - p) ** 2, axis=-1)

    # FORWARD: train layers [0, 1) + fixed tail 'enc3' on 32-dim input.
    y8 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    # sub-model enc1 (32→16) + enc3 (16→4)? enc3 expects 8-dim — use depth 2.
    new_params, loss = train_on_batch_forward_prog_model(
        specs, params, x32, jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
        loss_fn, prog_depth=2, lr=1e-2,
    )
    assert np.isfinite(loss)
    assert not np.allclose(np.asarray(new_params["enc1"]["kernel"]),
                           np.asarray(params["enc1"]["kernel"]))
    # Untouched layer keeps its weights.
    np.testing.assert_allclose(np.asarray(new_params["enc3"]["kernel"]),
                               np.asarray(params["enc3"]["kernel"]))

    # BACKWARD: train layers [1, end) on 16-dim input.
    x16 = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    y4 = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
    new_params2, loss2 = train_on_batch_backward_prog_model(
        specs, params, x16, y4, loss_fn, prog_depth=1, lr=1e-2,
    )
    assert np.isfinite(loss2)
    np.testing.assert_allclose(np.asarray(new_params2["enc1"]["kernel"]),
                               np.asarray(params["enc1"]["kernel"]))
    assert not np.allclose(np.asarray(new_params2["enc2"]["kernel"]),
                           np.asarray(params["enc2"]["kernel"]))


def test_train_state(key):
    import optax
    from ku.core import TrainState

    tx = optax.sgd(0.1)
    params = {"w": jnp.ones((3,))}
    state = TrainState.create(params, tx, key)
    grads = {"w": jnp.ones((3,))}
    state2 = state.apply_gradients(grads, tx)
    np.testing.assert_allclose(np.asarray(state2.params["w"]), 0.9)
    assert int(state2.step) == 1
    # pytree-registered: works under tree_map / jit.
    leaves = jax.tree.leaves(state2)
    assert len(leaves) >= 2
