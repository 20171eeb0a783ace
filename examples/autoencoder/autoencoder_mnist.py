"""Autoencoder MNIST via the ku.backprop reversal wrappers.

BASELINE.json config: "Autoencoder / semi-supervised MNIST via
ku.backprop wrappers". Reference capability:
ku/backprop/autoencoder.py — the decoder is NOT designed by hand, it is
the structural reversal of the encoder (``make_autoencoder_from_encoder``,
:423-450), here over layer specs (see ku/backprop/autoencoder.py).

Semi-supervised part: the trained encoder's latent features feed a softmax
probe trained on a small labeled subset.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from ku.backprop import make_autoencoder_from_encoder  # noqa: E402
from ku.engine_ext import Stack, Trainer, spec  # noqa: E402

ENCODER_SPECS = (
    spec("dense", "enc1", units=256, activation="relu"),
    spec("dense", "enc2", units=64, activation="relu"),
    spec("dense", "enc3", units=32),
)


def main():
    V, gt = common.load_mnist()
    X = (V / 255.0).astype(np.float32)
    batch_size = 128

    ae = make_autoencoder_from_encoder(ENCODER_SPECS, (batch_size, X.shape[1]))
    trainer = Trainer(
        ae, lambda y, p: jnp.mean((y - p) ** 2, axis=-1),
        optimizer=optax.adam(1e-3),
    )
    steps_per_epoch = max(1, X.shape[0] // batch_size)
    epochs = max(3, int(np.ceil(1000 / steps_per_epoch)))
    start = time.time()
    trainer.fit(X, X, batch_size=batch_size, epochs=epochs, verbose=0)
    print(f"Elasped time: {time.time() - start:f}s")
    recon = trainer.predict(X[:2048])
    err = float(np.mean((recon - X[:2048]) ** 2))
    print(f"Reconstruction MSE: {err:.5f}")

    # Semi-supervised probe: encoder features + softmax on 25% of labels.
    enc = Stack(specs=ENCODER_SPECS)
    enc_params = {
        k: v for k, v in trainer.state["params"]["encoder"].items()
    }
    z = np.asarray(enc.apply({"params": enc_params}, jnp.asarray(X)))
    n_lab = max(256, len(z) // 4)
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=1000).fit(z[:n_lab], gt[:n_lab])
    acc = clf.score(z[n_lab:], gt[n_lab:])
    print(f"Semi-supervised probe accuracy ({n_lab} labels): {acc:.4f}")


if __name__ == "__main__":
    main()
