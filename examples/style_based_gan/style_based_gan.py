"""Style-based GAN on FFHQ thumbnails — example application.

Reference: examples/style_based_gan/style_based_gan.py:73-1588. This
example wires the ku StyleGAN model family (ku/models/stylegan.py — the
mapping/synthesis/discriminator topology documented there) into the GAN
engine (ku/backprop/gan.py) in the reference's default softplus-R1 mode
(reference :108, gan_mode 2), with:

- FFHQ thumbnail pipeline (``TrainingSequenceFFHQ``, reference
  :1373-1480): 128×128 PNGs from ``raw_data_path``, labels = filename
  index clamped to ``num_classes``; falls back to a synthetic dataset when
  the directory is absent so the example runs offline.
- per-epoch sample-image dump to ``results/`` (reference :825-835) and
  model saves each epoch (reference :822-823).
- progressive training via resolution-staged models
  (``fit_progressively``; replaces the reference's layer-index
  ``create_prog_model`` schedule with resolution stages — flax params
  transfer between stages by layer name).

Config contract: style_based_gan_conf.json (reference
style_based_gan_conf.json:1-64). ``nn_arch.lane_packing`` (default true,
visible in the conf) selects the space-to-depth packed layout
(ku/nn/packed.py): identical math and parameter trees, but same-seed
training-noise REALIZATIONS differ packed vs unpacked (see PARITY.md) —
flip the key only at the start of a run, not across a resume.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402  (bootstraps repo root)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ku.backprop import STYLE_GAN_SOFTPLUS_INVERSE_R1_GP, AbstractGAN  # noqa: E402
from ku.core.config import load_config  # noqa: E402
from ku.models import StyleGANDiscriminator, StyleGANGenerator  # noqa: E402


class TrainingSequenceFFHQ:
    """FFHQ thumbnail batch iterator (reference :1373-1480).

    Yields the engine's dict batches: real images in [-1, 1] (generator
    outputs tanh), labels = file index % num_classes, latents z1/z2.
    """

    def __init__(self, raw_data_path, hps, nn_arch, map_nn_arch,
                 batch_shuffle=True, seed=0):
        self.batch_size = int(hps["batch_size"])
        self.latent_dim = int(map_nn_arch["latent_dim"])
        self.num_classes = int(map_nn_arch["num_classes"])
        self.resolution = int(nn_arch["resolution"])
        self.label_usage = bool(nn_arch.get("label_usage", True))
        self.rng = np.random.default_rng(seed)
        self.batch_shuffle = batch_shuffle

        self.files = sorted(glob.glob(os.path.join(raw_data_path, "**", "*.png"),
                                      recursive=True))
        self.synthetic = not self.files
        if self.synthetic:
            print(f"[style_based_gan] no images under {raw_data_path!r}; "
                  "using a synthetic dataset")

        # Prefer the native C++ resize+normalize+prefetch pipeline
        # (ku/native/loader.cpp); fall back to per-image Python/JAX.
        self._native = None
        self._native_errors_seen = 0
        if not self.synthetic:
            try:
                from ku.native import NativeImagePipeline

                if NativeImagePipeline.available():
                    self._native = NativeImagePipeline(
                        out_h=self.resolution, out_w=self.resolution,
                        n_threads=4, capacity=4 * self.batch_size,
                    )
            except Exception:
                self._native = None

    def _load_image(self, path):
        import matplotlib.image as mpimg

        img = np.asarray(mpimg.imread(path), np.float32)
        if img.max() > 1.5:  # uint8-ranged
            img = img / 255.0
        if img.shape[0] != self.resolution:
            from ku.image_utils import resize

            img = np.asarray(resize(img[..., :3],
                                    (self.resolution, self.resolution)))
        return img[..., :3] * 2.0 - 1.0

    def __iter__(self):
        return self

    def __next__(self):
        b = self.batch_size
        if self.synthetic:
            # Smooth random blobs in [-1, 1].
            base = self.rng.normal(size=(b, 8, 8, 3)).astype(np.float32)
            x = np.asarray(
                jax.image.resize(base, (b, self.resolution, self.resolution, 3),
                                 "linear")
            )
            x = np.tanh(x)
            labels = self.rng.integers(0, self.num_classes, size=(b, 1))
        else:
            idx = self.rng.integers(0, len(self.files), size=b) \
                if self.batch_shuffle else np.arange(b) % len(self.files)
            if self._native is not None and self._native.supports_files():
                # Fully native: file read + libpng decode + resize all in
                # the C++ workers — no Python in the decode path.
                for i in idx:
                    self._native.submit_file(self.files[i])
                x = self._native.get_batch(b)
                # A failed decode delivers a zeroed frame (order must
                # hold) — surface it rather than silently training on
                # black images.
                errs = self._native.errors()
                if errs > self._native_errors_seen:
                    print(f"[style_based_gan] WARNING: "
                          f"{errs - self._native_errors_seen} PNG decode "
                          f"failure(s) in this batch — zeroed frames "
                          f"entered training (total {errs})")
                    self._native_errors_seen = errs
            elif self._native is not None:
                import matplotlib.image as mpimg

                for i in idx:
                    raw = np.asarray(mpimg.imread(self.files[i]))
                    if raw.dtype != np.uint8:
                        raw = (raw * 255).astype(np.uint8)
                    self._native.submit(np.ascontiguousarray(raw[..., :3]))
                x = self._native.get_batch(b)
            else:
                x = np.stack([self._load_image(self.files[i]) for i in idx])
            labels = (idx % self.num_classes).reshape(-1, 1)

        z1 = self.rng.normal(size=(b, self.latent_dim)).astype(np.float32)
        z2 = self.rng.normal(size=(b, self.latent_dim)).astype(np.float32)
        batch = {"x": x.astype(np.float32)}
        if self.label_usage:
            batch["z"] = (z1, labels.astype(np.int32), z2)
            batch["label"] = labels.astype(np.float32)
        else:
            batch["z"] = (z1, z2)
        return batch


class StyleGAN(AbstractGAN):
    """Reference class surface (:73-1371)."""

    def __init__(self, conf):
        self.map_nn_arch = conf["map_nn_arch"]
        self.disc_nn_arch = conf.get("disc_nn_arch", {})
        self._nn_arch = conf["nn_arch"]
        self._hps = conf["hps"]
        conf.setdefault("hps", {})["composing_mode"] = int(
            conf.get("gan_mode", STYLE_GAN_SOFTPLUS_INVERSE_R1_GP)
        )
        conf["nn_arch"]["gen_rng_streams"] = ["noise", "style"]
        self.raw_data_path = conf.get("raw_data_path", "")
        super().__init__(conf)

    def _modules_at(self, resolution: int, lane_packing=None):
        n = self._nn_arch
        h = self._hps
        m = self.map_nn_arch
        if lane_packing is None:
            lane_packing = bool(n.get("lane_packing", True))
        dtype = {"bfloat16": jnp.bfloat16, "float32": None}.get(
            n.get("dtype"), None
        )
        gen = StyleGANGenerator(
            resolution=resolution,
            ch_base=int(h["ch_base"]), max_ch=int(h["max_ch"]),
            latent_dim=int(m["latent_dim"]), dlatent_dim=int(m["dlatent_dim"]),
            dense1_dim=int(m["dense1_dim"]),
            num_mapping_layers=int(m["num_layers"]),
            num_classes=int(m["num_classes"]),
            label_usage=bool(n["label_usage"]),
            mixing_prob=h.get("mixing_prob"),
            trunc_psi=float(h.get("trunc_psi", 0.0)),
            trunc_cutoff=h.get("trunc_cutoff"),
            trunc_momentum=float(h.get("trunc_momentum", 0.99)),
            dtype=dtype,
            lane_packing=lane_packing,
        )
        disc = StyleGANDiscriminator(
            resolution=resolution,
            ch_base=int(h["ch_base"]), max_ch=int(h["max_ch"]),
            dropout_rate=float(self.disc_nn_arch.get("dropout_rate", 0.0)),
            label_usage=bool(n["label_usage"]),
            dtype=dtype,
            lane_packing=lane_packing,
        )
        return gen, disc

    def _create_generator(self):
        return self._modules_at(int(self._nn_arch["resolution"]))[0]

    def _create_discriminator(self):
        return self._modules_at(int(self._nn_arch["resolution"]))[1]

    # -- training ----------------------------------------------------------

    def train(self, sample_dir: str = "results", save_dir: str = "."):
        """Alternating training with per-epoch sampling + saves
        (reference :556-849)."""
        os.makedirs(sample_dir, exist_ok=True)
        seq = TrainingSequenceFFHQ(self.raw_data_path, self._hps,
                                   self._nn_arch, self.map_nn_arch)
        self.compile()
        epochs = int(self._hps["epochs"])
        hist = {"disc_ext_loss": [], "gen_disc_loss": []}
        for e in range(epochs):
            sub = dict(self.hps)
            sub["epochs"] = 1
            old, self.hps = self.hps, sub
            try:
                h = self.fit_generator(seq, verbose=1, seed=e)
            finally:
                self.hps = old
            hist["disc_ext_loss"] += h["disc_ext_loss"]
            hist["gen_disc_loss"] += h["gen_disc_loss"]
            self.save_gan_model(save_dir)
            self._dump_samples(os.path.join(sample_dir, f"epoch_{e + 1}.npy"))
        return hist

    def fit_progressively(self, sample_dir: str = "results", callbacks=(),
                          mesh=None, initial_epoch=0):
        """Progressive resolution schedule (reference
        ``fit_generator_progressively``, :851-1159): one stage per entry of
        ``nn_arch.gen_prog_resolutions``; weights transfer by name.
        Delegates to the engine's hardened progressive loop — callbacks
        (per-stage checkpoints via CheckpointCallback), ``mesh`` data
        parallelism, and ``initial_epoch="auto"`` stage resume all work
        here exactly as in ``fit_generator``."""
        os.makedirs(sample_dir, exist_ok=True)
        self.compile()
        resolutions = self._nn_arch.get(
            "gen_prog_resolutions", [int(self._nn_arch["resolution"])]
        )

        def factory(stage, g_res, d_res):
            res = int(g_res if g_res else resolutions[-1])
            print(f"[progressive] stage {stage}: resolution {res}")
            gen, disc = self._modules_at(res)
            nn_arch_stage = dict(self._nn_arch)
            nn_arch_stage["resolution"] = res
            seq = TrainingSequenceFFHQ(self.raw_data_path, self._hps,
                                       nn_arch_stage, self.map_nn_arch)
            return gen, disc, seq

        sub = dict(self.hps)
        sub["epochs"] = len(resolutions)
        old, self.hps = self.hps, sub
        try:
            hist = self.fit_generator_progressively(
                factory, gen_prog_depths=resolutions,
                disc_prog_depths=self._nn_arch.get(
                    "disc_prog_resolutions", resolutions),
                verbose=1, seed=100, mesh=mesh, callbacks=callbacks,
                initial_epoch=initial_epoch,
            )
        finally:
            self.hps = old
        self._dump_samples(os.path.join(sample_dir, "progressive_final.npy"))
        return hist

    def _dump_samples(self, path, n: int = 4, imgs=None):
        """Write a sample batch as .npy + a PNG grid (reference dumps PNGs
        via imsave, :825-835 and :1347-1359)."""
        if imgs is None:
            imgs = np.asarray(self.generate_samples(n))
        np.save(path, imgs)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.image as mpimg

            grid = np.concatenate(list(np.clip(imgs, 0, 1)), axis=1)
            mpimg.imsave(path.replace(".npy", ".png"), grid)
        except Exception:
            pass

    # -- inference ---------------------------------------------------------

    def _infer_generate(self, z):
        """Large-batch serving path: apply the SAME params through an
        UNPACKED generator clone — lane packing is a small-batch lever
        (BASELINE.md serving section: 1.69× at batch 12 but 0.65× at
        batch 256, where the packed kernels' structural-zero MACs
        dominate a full MXU). Parameter trees are layout-independent
        (tests/test_packed.py), so this is a pure layout switch."""
        if not hasattr(self, "_gen_infer_jit"):
            gen_infer = self._modules_at(
                int(self._nn_arch["resolution"]), lane_packing=False
            )[0]
            self._gen_infer_jit = jax.jit(
                lambda v, z: gen_infer.apply(v, z, deterministic=True)
            )
        variables = {"params": self.state["gen_params"]}
        if self.state["gen_stats"]:
            variables["batch_stats"] = self.state["gen_stats"]
        return self._gen_infer_jit(variables, z)

    def generate_samples(self, n: int, labels=None, seed: int = 0):
        """Sample n images in [0, 1] (reference ``generate``, :1361-1371).
        Batches >= 64 route through the unpacked serving layout (see
        :meth:`_infer_generate`)."""
        rng = np.random.default_rng(seed)
        m = self.map_nn_arch
        z1 = rng.normal(size=(n, int(m["latent_dim"]))).astype(np.float32)
        z2 = rng.normal(size=(n, int(m["latent_dim"]))).astype(np.float32)
        if self._nn_arch.get("label_usage", True):
            if labels is None:
                labels = rng.integers(0, int(m["num_classes"]), size=(n, 1))
            z = (jnp.asarray(z1), jnp.asarray(labels), jnp.asarray(z2))
        else:
            z = (jnp.asarray(z1), jnp.asarray(z2))
        if n >= 64 and bool(self._nn_arch.get("lane_packing", True)):
            img = self._infer_generate(z)
        else:
            img = self.generate(z, key=jax.random.key(seed))
        return (np.asarray(img) + 1.0) / 2.0

    def evaluate(self, result_dir: str = "results", num_per_class: int = 1,
                 classes=(0,)):
        """Per-class sample dump as PNGs + raw arrays (reference :1337-1359
        writes per-class PNGs via imsave)."""
        os.makedirs(result_dir, exist_ok=True)
        for c in classes:
            labels = np.full((num_per_class, 1), c)
            imgs = self.generate_samples(num_per_class, labels=labels, seed=c)
            self._dump_samples(os.path.join(result_dir, f"class_{c}.npy"),
                               imgs=imgs)


def main():
    conf_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "style_based_gan_conf.json"
    )
    conf = load_config(conf_path)
    s_gan = StyleGAN(conf)
    start = time.time()
    if conf["mode"] == "train":
        s_gan.train()
    elif conf["mode"] == "train_progressively":
        s_gan.fit_progressively()
    elif conf["mode"] == "evaluate":
        s_gan.evaluate()
    print(f"Elasped time: {time.time() - start:f}s")


if __name__ == "__main__":
    main()
