"""Pix2pix conditional GAN — image-to-image translation.

Covers the reference's PIX2PIX_GAN composing mode (reference
ku/backprop/gan.py:1127-1174: conditional inputs feed the discriminator
alongside real/fake images, and the generator loss adds an L1
reconstruction term on G(z), :1173) with a runnable task: digits
inpainting — the condition is an image with its center masked out, the
target is the full image. The generator is a symmetric-skip autoencoder
built by encoder reversal (ku.backprop.make_autoencoder_with_sym_sc).
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

from ku.backprop import PIX2PIX_GAN, GAN, make_autoencoder_with_sym_sc  # noqa: E402
from ku.engine_ext import spec  # noqa: E402

SIZE = 28


class UNetGenerator(nn.Module):
    """Symmetric-skip autoencoder over the masked condition image."""

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        enc = (
            spec("conv2d", "e1", filters=16, kernel_size=3, strides=2,
                 padding="same", activation="relu"),
            spec("conv2d", "e2", filters=32, kernel_size=3, strides=2,
                 padding="same", activation="relu"),
        )
        ae = make_autoencoder_with_sym_sc(enc, (1, SIZE, SIZE, 1))
        out = ae(z, deterministic=deterministic)
        return nn.tanh(nn.Conv(1, (1, 1))(out))


class PatchDisc(nn.Module):
    """Conditional discriminator over (cond, image) pairs."""

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        cond, x = inputs
        h = jnp.concatenate([cond, x], axis=-1)
        h = nn.leaky_relu(nn.Conv(16, (3, 3), strides=(2, 2))(h), 0.2)
        h = nn.leaky_relu(nn.Conv(32, (3, 3), strides=(2, 2))(h), 0.2)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(1)(h)


class BatchIter:
    def __init__(self, imgs, batch, seed=0):
        self.imgs = imgs
        self.b = batch
        self.rng = np.random.default_rng(seed)

    def __iter__(self):
        return self

    def __next__(self):
        idx = self.rng.integers(0, len(self.imgs), size=self.b)
        x = self.imgs[idx]
        cond = x.copy()
        m = SIZE // 4
        cond[:, m : SIZE - m, m : SIZE - m, :] = 0.0  # mask the center
        # z = the condition itself (generator input); cond feeds D too.
        return {"x": x, "z": cond, "cond": cond}


def main():
    V, _ = common.load_mnist(flatten=False)
    imgs = (V / 127.5 - 1.0).astype(np.float32)

    conf = {
        "hps": {
            "composing_mode": PIX2PIX_GAN,
            "epochs": 3,
            "batch_step": 30,
            "disc_k_step": 1,
            "pix2pix_l1_weight": 100.0,
            "disc_ext_hps": {"lr": 2e-4, "beta_1": 0.5, "beta_2": 0.999},
            "gen_disc_hps": {"lr": 2e-4, "beta_1": 0.5, "beta_2": 0.999},
        }
    }
    engine = GAN(conf, UNetGenerator(), PatchDisc())
    engine.compose_gan_with_mode().compile()

    start = time.time()
    engine.fit_generator(BatchIter(imgs, 64), verbose=1)
    print(f"Elasped time: {time.time() - start:f}s")

    # Inpainting quality: L1 inside the masked region, fake vs real.
    batch = next(BatchIter(imgs, 256, seed=9))
    fake = np.asarray(engine.generate(jnp.asarray(batch["z"])))
    m = SIZE // 4
    sl = np.s_[:, m : SIZE - m, m : SIZE - m, :]
    err = float(np.abs(fake[sl] - batch["x"][sl]).mean())
    base = float(np.abs(batch["cond"][sl] - batch["x"][sl]).mean())
    print(f"masked-region L1: {err:.4f} (blank-input baseline {base:.4f})")
    os.makedirs("results", exist_ok=True)
    np.save("results/pix2pix_samples.npy", (fake[:16] + 1) / 2)


if __name__ == "__main__":
    main()
