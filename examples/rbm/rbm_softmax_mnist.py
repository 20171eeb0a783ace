"""Semi-supervised MNIST: RBM pretraining + softmax classifier.

Reference: examples/rbm/rbm_softmax_mnist.py:34-168 — model =
Input(784) → /255 → RBM(rbm_hps, 128) → Dense(10, softmax) (:53-64);
``train()`` runs unsupervised CD on the RBM, then supervised fit of the
classifier (:74-94); ``test()`` writes Kaggle-format ``solution.csv``
(:113-127). Config contract: rbm_softmax_mnist_conf.json.

TPU-native: the RBM trains with the fused Pallas CD kernel (one device
call per epoch); the supervised phase is a jitted Trainer. The RBM's
features feed the classifier as hidden *probabilities* under
``stop_gradient`` — the reference forwards a sampled, gradient-less
Bernoulli draw (rbm.py:80-86), so its RBM weights are equally frozen
during the supervised phase; probabilities are the deterministic
equivalent.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402  (bootstraps repo root on sys.path)

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from ku.core.config import load_config  # noqa: E402
from ku.ebm import RBM  # noqa: E402
from ku.engine_ext import Trainer  # noqa: E402
from ku.loss_ext import categorical_crossentropy_with_label_gt  # noqa: E402


class RBMSoftmaxModel(nn.Module):
    """/255 → RBM hidden probabilities (frozen) → Dense(10, softmax)."""

    output_dim: int = 128

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        w = self.param("rbm_weight", nn.initializers.zeros_init(),
                       (x.shape[-1], self.output_dim))
        bh = self.param("rbm_hidden_bias", nn.initializers.zeros_init(),
                        (self.output_dim,))
        # Same visible distribution the RBM was pretrained on: binarized
        # pixels (train/serve consistency; Bernoulli visibles).
        x = (x / 255.0 > 0.5).astype(jnp.float32)
        h = jax.nn.sigmoid(x @ jax.lax.stop_gradient(w)
                           + jax.lax.stop_gradient(bh))
        return nn.softmax(nn.Dense(10, name="softmax")(h))


class MNISTClassifier:
    """Reference class surface (:34-127)."""

    MODEL_PATH = "digit_classificaton_model"

    def __init__(self, conf):
        self.conf = conf
        self.hps = conf["hps"]
        self.nn_arch = conf["nn_arch"]
        self.model_loading = conf["model_loading"]

        self.rbm = RBM(conf["rbm_hps"], self.nn_arch["output_dim"], seed=0)
        self.model = RBMSoftmaxModel(output_dim=self.nn_arch["output_dim"])
        self.trainer = Trainer(
            self.model,
            lambda y, p: categorical_crossentropy_with_label_gt(
                y, p, num_classes=10
            ),
            optimizer=optax.adam(
                self.hps["lr"], b1=self.hps["beta_1"], b2=self.hps["beta_2"]
            ),
        )
        if self.model_loading:
            from ku.utility import load_model_jh5

            _, params = load_model_jh5(self.MODEL_PATH)
            self.trainer.init(jnp.zeros((1, 784)))
            self.trainer.state["params"] = params

    def train(self, V=None, gt=None):
        if V is None:
            V, gt = common.load_mnist()
        # Unsupervised phase: Bernoulli CD on binarized visibles; the
        # classifier consumes the SAME distribution through the frozen
        # features (train/serve consistency — the reference's double /255
        # is itself inconsistent).
        print("Train the RBM model.")
        self.rbm.fit((V / 255.0 > 0.5).astype(np.float32))

        # Supervised phase (RBM features frozen).
        print("Train the NN model.")
        self.trainer.init(jnp.asarray(V[:1]))
        self.trainer.state["params"] = dict(
            self.trainer.state["params"],
            rbm_weight=self.rbm.params["rbm_weight"],
            rbm_hidden_bias=self.rbm.params["hidden_bias"],
        )
        # The conf's epochs are calibrated for 42k-row Kaggle MNIST
        # (~330 steps/epoch); on smaller fallback datasets, scale epochs
        # to keep the same optimizer-step budget.
        batch_size = int(self.hps["batch_size"])
        steps_per_epoch = max(1, V.shape[0] // batch_size)
        epochs = int(self.hps["epochs"]) * max(1, int(np.ceil(330 / steps_per_epoch)))
        self.trainer.fit(V, gt, batch_size=batch_size, epochs=epochs,
                         verbose=0)
        print(f"supervised: {epochs} epoch(s), "
              f"final loss {self.trainer.test_step(jnp.asarray(V[:512]), jnp.asarray(gt[:512]))['loss']:f}")

        print("Save the model.")
        from ku.utility import save_model_jh5

        save_model_jh5(dict(self.conf), self.trainer.state["params"],
                       self.MODEL_PATH)

    def test(self, V=None, out_path: str = "solution.csv"):
        if V is None:
            V, _ = common.load_mnist()
        res = self.trainer.predict(V)
        with open(out_path, "w") as f:
            f.write("ImageId,Label\n")
            for i, v in enumerate(res):
                f.write(f"{i + 1},{int(np.argmax(v))}\n")
        return res


def main():
    conf = load_config(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "rbm_softmax_mnist_conf.json")
    )
    mc = MNISTClassifier(conf)
    start = time.time()
    if "train" in conf["mode"]:
        mc.train()
    print(f"Elasped time: {time.time() - start:f}s")
    if "test" in conf["mode"]:
        start = time.time()
        res = mc.test()
        V, gt = common.load_mnist()
        acc = float((np.argmax(res, -1) == gt).mean())
        print(f"Elasped time: {time.time() - start:f}s")
        print(f"Training-set accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
