"""MNIST digit classification with the NobodyConvNet2D backbone.

Reference: examples/mnist_digit_classfication/nobody_convnet2d_mnist.py:22-149
— NobodyConvNet2D → Flatten → Dense(10) trained with Adam on MNIST
(:55-56, :113). Directory name keeps the reference's spelling.

TPU-native: jitted Trainer (one compiled step), device-resident batches.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402

import flax.linen as nn  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from ku.applications_ext import NobodyConvNet2D  # noqa: E402
from ku.core.config import load_config  # noqa: E402
from ku.engine_ext import Trainer  # noqa: E402
from ku.loss_ext import categorical_crossentropy_with_label_gt  # noqa: E402


class ConvNetClassifier(nn.Module):
    """Backbone → flatten → Dense(10, softmax) (reference :55-56)."""

    conf: dict

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feat = NobodyConvNet2D.from_conf(self.conf, x.shape)(
            x / 255.0, deterministic=deterministic
        )
        feat = feat.reshape(feat.shape[0], -1)
        return nn.softmax(nn.Dense(10)(feat))


def main():
    conf = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "nobody_convnet2d_mnist_conf.json")
    )
    hps = conf["hps"]
    V, gt = common.load_mnist(flatten=False)

    model = ConvNetClassifier(conf=dict(conf))
    trainer = Trainer(
        model,
        lambda y, p: categorical_crossentropy_with_label_gt(y, p, num_classes=10),
        optimizer=optax.adamw(
            hps["lr"], b1=hps["beta_1"], b2=hps["beta_2"],
            weight_decay=hps.get("weight_decay", 0.0),
        ),
        has_batch_stats=True,
    )

    start = time.time()
    if "train" in conf["mode"]:
        trainer.fit(V, gt, batch_size=int(hps["batch_size"]),
                    epochs=int(hps["epochs"]))
    print(f"Elasped time: {time.time() - start:f}s")

    if "test" in conf["mode"]:
        pred = trainer.predict(V)
        acc = float((np.argmax(pred, -1) == gt).mean())
        print(f"Training-set accuracy: {acc:.4f}")
        with open("solution.csv", "w") as f:
            f.write("ImageId,Label\n")
            for i, v in enumerate(pred):
                f.write(f"{i + 1},{int(np.argmax(v))}\n")


if __name__ == "__main__":
    main()
