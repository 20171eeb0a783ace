"""Vanilla GAN on MNIST — alternating G/D training via the ku engine.

BASELINE.json config: "Vanilla GAN alternating G/D training on MNIST".
Uses the non-saturating regular mode (reference gan.py:1016-1051 +
loss conf :60-64): one jitted step = k disc updates + 1 gen update.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ku.backprop import STYLE_GAN_REGULAR, GAN  # noqa: E402

LATENT = 64


class Generator(nn.Module):
    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        h = nn.relu(nn.Dense(256)(z))
        h = nn.relu(nn.Dense(512)(h))
        return nn.tanh(nn.Dense(784)(h))


class Discriminator(nn.Module):
    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.leaky_relu(nn.Dense(512)(x), 0.2)
        h = nn.leaky_relu(nn.Dense(256)(h), 0.2)
        return nn.Dense(1)(h)


class BatchIter:
    def __init__(self, X, batch_size, seed=0):
        self.X, self.b = X, batch_size
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self):
        idx = self.rng.integers(0, len(self.X), size=self.b)
        return {
            "x": self.X[idx],
            "z": self.rng.normal(size=(self.b, LATENT)).astype(np.float32),
        }


def main():
    V, _ = common.load_mnist()
    X = (V / 127.5 - 1.0).astype(np.float32)  # [-1, 1] for tanh G

    conf = {
        "hps": {
            "composing_mode": STYLE_GAN_REGULAR,
            "epochs": 5,
            "batch_step": 50,
            "disc_k_step": 1,
            "steps_per_call": 10,
            "disc_ext_hps": {"lr": 2e-4, "beta_1": 0.5, "beta_2": 0.999},
            "gen_disc_hps": {"lr": 2e-4, "beta_1": 0.5, "beta_2": 0.999},
        }
    }
    engine = GAN(conf, Generator(), Discriminator())
    engine.compose_gan_with_mode().compile()

    start = time.time()
    engine.fit_generator(BatchIter(X, 128), verbose=1)
    print(f"Elasped time: {time.time() - start:f}s")

    z = jnp.asarray(np.random.default_rng(1).normal(size=(16, LATENT))
                    .astype(np.float32))
    samples = np.asarray(engine.generate(z))
    print(f"sample range: [{samples.min():.3f}, {samples.max():.3f}], "
          f"mean {samples.mean():.3f}")
    os.makedirs("results", exist_ok=True)
    np.save("results/gan_mnist_samples.npy", (samples + 1) / 2)
    # Crude mode-collapse check: sample variance across the batch.
    print(f"inter-sample std: {samples.std(axis=0).mean():.4f}")


if __name__ == "__main__":
    main()
