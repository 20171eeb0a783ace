"""DBN greedy layer-wise pretraining + MNIST classification fine-tune.

BASELINE.json config: "DBN greedy layer-wise pretrain + MNIST
digit-classification fine-tune". Reference components: ku/ebm/dbn.py
(greedy stack, :34-55) + the rbm_softmax example pattern
(examples/rbm/rbm_softmax_mnist.py:53-94).

Pipeline: binarized MNIST → DBN(784→256→128) CD pretrain (fused Pallas
kernel per epoch on TPU) → softmax head fine-tuned on the top-layer
features (frozen DBN weights feed deterministic sigmoid probabilities,
matching the rbm_softmax example's convention).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from ku.ebm import DBN, RBM  # noqa: E402
from ku.engine_ext import Trainer  # noqa: E402
from ku.loss_ext import categorical_crossentropy_with_label_gt  # noqa: E402

HPS = {"lr": 1e-3, "batch_size": 128, "epochs": 8}
DIMS = (256, 128)


class DBNSoftmax(nn.Module):
    """Frozen DBN feature stack → Dense(10, softmax)."""

    dims: tuple = DIMS
    in_dim: int = 784

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d_prev = self.in_dim
        h = x
        for i, d in enumerate(self.dims):
            w = self.param(f"w_{i}", nn.initializers.zeros_init(), (d_prev, d))
            b = self.param(f"b_{i}", nn.initializers.zeros_init(), (d,))
            h = jax.nn.sigmoid(h @ jax.lax.stop_gradient(w)
                               + jax.lax.stop_gradient(b))
            d_prev = d
        return nn.softmax(nn.Dense(10)(h))


def main():
    V, gt = common.load_mnist()
    Vb = (V / 255.0 > 0.5).astype(np.float32)

    print("Greedy layer-wise DBN pretraining.")
    dbn = DBN(HPS)
    for i, d in enumerate(DIMS):
        dbn.add_stack(RBM(HPS, d, seed=i))
    start = time.time()
    dbn.fit(Vb)
    print(f"Elasped time: {time.time() - start:f}s")

    print("Fine-tune the softmax head.")
    model = DBNSoftmax()
    trainer = Trainer(
        model,
        lambda y, p: categorical_crossentropy_with_label_gt(y, p, num_classes=10),
        optimizer=optax.adam(1e-3),
    )
    trainer.init(jnp.asarray(Vb[:1]))
    params = dict(trainer.state["params"])
    for i, rbm in enumerate(dbn.rbm_layers):
        params[f"w_{i}"] = rbm.params["rbm_weight"]
        params[f"b_{i}"] = rbm.params["hidden_bias"]
    trainer.state["params"] = params

    steps_per_epoch = max(1, Vb.shape[0] // HPS["batch_size"])
    epochs = max(2, int(np.ceil(660 / steps_per_epoch)))
    trainer.fit(Vb, gt, batch_size=HPS["batch_size"], epochs=epochs, verbose=0)
    pred = trainer.predict(Vb)
    acc = float((np.argmax(pred, -1) == gt).mean())
    print(f"Training-set accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
