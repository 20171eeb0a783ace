"""Flagship trained-artifact run: StyleGAN on real digit images.

The reference's de-facto validation is its committed run products —
per-epoch sample dumps from actual StyleGAN training (reference
examples/style_based_gan/style_based_gan.py:825-835). This driver
produces ku's equivalent on the offline dataset this image ships
(examples/common.load_mnist fallback: sklearn digits upscaled to 28×28;
there is no FFHQ and no egress):

1. Writes the digits as PNG files ordered so file-index % 10 == digit —
   the example's FFHQ pipeline derives labels from the sorted file index
   (style_based_gan.py:144), so the class conditioning is REAL digit
   labels while exercising the exact training path FFHQ would (native
   C++ libpng loader included).
2. Trains the class-conditional 32px StyleGAN with per-epoch sample
   grids + loss logging and orbax CheckpointCallback resume
   (``initial_epoch="auto"``): kill the process at any point and rerun —
   it continues from the last completed epoch. Artifacts under
   ``digits_run/``: samples/epoch_####.png, loss_curve.png,
   history.json, checkpoints.

Usage: python train_digits.py [epochs] [batch_step]   (default 30 × 64)
Backend: TPU when the axon tunnel is up (probed in a subprocess);
otherwise CPU — the run is sized to make visible progress either way.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402  (bootstraps repo root + compile cache)

import numpy as np  # noqa: E402

_HERE = os.path.dirname(os.path.abspath(__file__))
DATA_DIR = os.path.join(_HERE, "digits_data")
# KU_DIGITS_RUN_DIR: separate artifact lineages per backend (the
# committed digits_run/ holds the round-4 CPU run; a TPU run must not
# resume from — or overwrite — its history/checkpoints).
RUN_DIR = os.environ.get("KU_DIGITS_RUN_DIR",
                         os.path.join(_HERE, "digits_run"))

CONF = {
    "mode": "train",
    "raw_data_path": DATA_DIR,
    "gan_mode": 2,  # softplus + R1 (reference default)
    "hps": {
        "epochs": 30,
        "batch_step": 64,
        "steps_per_call": 8,
        "disc_k_step": 1,
        "batch_size": 16,
        "mixing_prob": 0.9,
        "trunc_psi": 0.0,
        "trunc_cutoff": 4,
        "trunc_momentum": 0.99,
        "r_gamma": 10.0,
        "ch_base": 2048,  # ch at 4px = min(2048/2^k, max_ch) → 256 @ 32px
        "max_ch": 256,
        "wgan_lambda": 10.0,
        "wgan_target": 1.0,
    },
    "nn_arch": {
        "label_usage": True,
        "lane_packing": True,
        "resolution": 32,
        "num_classes": 10,
    },
    "map_nn_arch": {
        "latent_dim": 64,
        "dense1_dim": 64,
        "dlatent_dim": 64,
        "num_classes": 10,
        "num_layers": 4,
    },
    "disc_nn_arch": {"dropout_rate": 0.0},
    "disc_ext_hps": {"lr": 0.0015, "beta_1": 0.0, "beta_2": 0.99},
    "gen_disc_hps": {"lr": 0.0015, "beta_1": 0.0, "beta_2": 0.99},
}


def prepare_data():
    """Write digit PNGs so sorted-file-index % 10 == the digit label."""
    if os.path.isdir(DATA_DIR) and len(os.listdir(DATA_DIR)) > 100:
        return
    os.makedirs(DATA_DIR, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.image as mpimg

    V, labels = common.load_mnist(flatten=False)
    V = np.asarray(V).reshape(len(V), 28, 28)
    by_class = [np.flatnonzero(labels == c) for c in range(10)]
    n = 10 * min(len(ix) for ix in by_class)
    for i in range(n):
        c = i % 10
        img = V[by_class[c][i // 10]] / 255.0
        rgb = np.repeat(np.clip(img, 0, 1)[..., None], 3, axis=-1)
        mpimg.imsave(os.path.join(DATA_DIR, f"digit_{i:05d}.png"), rgb)
    print(f"[train_digits] wrote {n} PNGs to {DATA_DIR}")


def pick_backend():
    """TPU if the axon tunnel answers in a subprocess, else CPU (an
    in-process failed init is cached by jax, so probe out-of-process)."""
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print(jax.default_backend())"],
            capture_output=True, text=True, timeout=300)
        # Check the PLATFORM, not just a clean exit: on a host without
        # the axon plugin the probe succeeds on CPU, and labeling that
        # "tpu" would skip the steps_per_call=1 CPU compile fix.
        if r.returncode == 0 and r.stdout.strip().endswith("tpu"):
            return "tpu"
    except subprocess.TimeoutExpired:
        pass
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu"


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch_step = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    # Backend first: prepare_data's load_mnist touches jax.image.resize,
    # which would initialize (and cache) a dead axon backend.
    backend = pick_backend()
    print(f"[train_digits] backend: {backend}")
    prepare_data()

    from style_based_gan import StyleGAN, TrainingSequenceFFHQ
    from ku.utils.callbacks import CheckpointCallback, LambdaCallback

    conf = json.loads(json.dumps(CONF))  # deep copy
    conf["hps"]["epochs"] = epochs
    conf["hps"]["batch_step"] = batch_step
    if backend == "cpu":
        # steps_per_call fuses 8 logical steps into one dispatch to
        # amortize the TPU tunnel round trip; on CPU it only multiplies
        # the XLA-CPU compile graph 8x (>40 min at 32px, measured).
        conf["hps"]["steps_per_call"] = 1
    os.makedirs(os.path.join(RUN_DIR, "samples"), exist_ok=True)
    hist_path = os.path.join(RUN_DIR, "history.json")
    history = (json.load(open(hist_path))
               if os.path.exists(hist_path) else
               {"epoch": [], "disc_ext_loss": [], "gen_disc_loss": [],
                "wall_s": []})

    gan = StyleGAN(conf)
    seq = TrainingSequenceFFHQ(DATA_DIR, conf["hps"], conf["nn_arch"],
                               conf["map_nn_arch"])
    # Keep wall_s monotonic across kill/resume: continue from the last
    # recorded value instead of this process's clock.
    t0 = time.time() - (history["wall_s"][-1] if history["wall_s"]
                        else 0.0)

    def on_epoch_end(engine, epoch, logs):
        n = 20
        labels = np.arange(n).reshape(-1, 1) % 10  # two of each class
        imgs = gan.generate_samples(n, labels=labels, seed=7)
        gan._dump_samples(
            os.path.join(RUN_DIR, "samples", f"epoch_{epoch + 1:04d}.npy"),
            imgs=imgs)
        history["epoch"].append(epoch + 1)
        history["disc_ext_loss"].append(float(logs["disc_ext_loss"]))
        history["gen_disc_loss"].append(float(logs["gen_disc_loss"]))
        history["wall_s"].append(round(time.time() - t0, 1))
        json.dump(history, open(hist_path, "w"), indent=1)
        print(f"[train_digits] epoch {epoch + 1}/{epochs} "
              f"d={logs['disc_ext_loss']:.4f} g={logs['gen_disc_loss']:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    callbacks = [
        CheckpointCallback(os.path.join(RUN_DIR, "ckpt"), every=1,
                           max_to_keep=2),
        LambdaCallback(on_epoch_end=on_epoch_end),
    ]
    gan.compile()
    gan.fit_generator(seq, verbose=0, seed=0, callbacks=callbacks,
                      initial_epoch="auto")
    gan.save_gan_model(RUN_DIR)

    # Loss curves + a final per-class grid.
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(history["epoch"], history["disc_ext_loss"], label="disc")
        ax.plot(history["epoch"], history["gen_disc_loss"], label="gen")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
        ax.set_title(f"StyleGAN digits 32px ({backend})")
        fig.tight_layout()
        fig.savefig(os.path.join(RUN_DIR, "loss_curve.png"), dpi=120)
    except Exception as e:
        print(f"[train_digits] loss plot skipped: {e!r}")
    gan.evaluate(result_dir=os.path.join(RUN_DIR, "per_class"),
                 num_per_class=8, classes=range(10))
    print(f"[train_digits] done: {len(history['epoch'])} epochs, "
          f"artifacts in {RUN_DIR}")


if __name__ == "__main__":
    main()
