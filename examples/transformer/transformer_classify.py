"""Transformer sequence-classification example — duplicate-of-first task.

Exercises the ku attention/transformer stack end-to-end through the
jitted :class:`ku.engine_ext.Trainer` (one dispatch per epoch):
``Embed → PeriodicPositionEncoding → N × Transformer → mean-pool →
Dense``. The reference ships the Transformer/MultiHeadAttention layers
(ku/composite_layer/transformer.py:23-108, ku/layer_ext/attention.py:
19-160) but no example that trains them; this closes that gap with a
task that REQUIRES content-based attention: label 1 iff the first token
re-appears later in the sequence (pooling alone cannot solve it — the
model must compare positions against position 0; the classifier reads
out position 0, whose attention query IS the first token's embedding,
so duplicate evidence accumulates exactly there).

``nn_arch.use_flash`` routes the scaled-similarity path through the
streaming Pallas flash-attention kernel (ku/pallas/flash_attention.py);
default off at this toy length where XLA's fused softmax is ideal.

Config contract (reference style): transformer_classify_conf.json with
``{mode, hps{lr, batch_size, epochs}, nn_arch{...}}``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402  (bootstraps repo root + compile cache)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import flax.linen as nn  # noqa: E402
import optax  # noqa: E402

from ku.core.config import load_config  # noqa: E402
from ku.engine_ext import Trainer  # noqa: E402
from ku.nn import PeriodicPositionEncoding, Transformer  # noqa: E402


def make_dataset(n: int, seq_len: int, vocab: int, seed: int = 0):
    """Label 1 iff tokens[0] appears again in tokens[1:]; balanced."""
    rng = np.random.default_rng(seed)
    x = rng.integers(1, vocab, size=(n, seq_len))
    y = np.zeros((n,), np.int32)
    half = n // 2
    # Positive half: plant a copy of token 0 at a random later position.
    pos = rng.integers(1, seq_len, size=half)
    x[np.arange(half), pos] = x[np.arange(half), 0]
    y[:half] = 1
    # Negative half: remove accidental duplicates of the first token.
    for i in range(half, n):
        dup = x[i, 1:] == x[i, 0]
        x[i, 1:][dup] = (x[i, 1:][dup] % (vocab - 2)) + 1
        if (x[i, 1:] == x[i, 0]).any():  # wrapped onto the token itself
            x[i, 0] = vocab - 1 if x[i, 0] != vocab - 1 else 1
        y[i] = int((x[i, 1:] == x[i, 0]).any())
    perm = rng.permutation(n)
    return x[perm], y[perm]


class TransformerClassifier(nn.Module):
    vocab: int = 32
    seq_len: int = 24
    d_model: int = 32
    num_head: int = 4
    num_blocks: int = 2
    dropout_rate: float = 0.0
    use_flash: bool = False

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        x = nn.Embed(self.vocab, self.d_model, name="embed")(
            jnp.asarray(tokens, jnp.int32)
        )
        x = PeriodicPositionEncoding(max_seq=self.seq_len,
                                     d_f=self.d_model)(x)
        for i in range(self.num_blocks):
            x = Transformer(
                num_head=self.num_head, d_output=self.d_model,
                dropout_rate=self.dropout_rate, use_flash=self.use_flash,
                name=f"block_{i}",
            )([x], deterministic=deterministic)
        # Position-0 readout (see module docstring).
        return nn.Dense(2, name="head")(x[:, 0])


def softmax_xent(y_true, logits):
    oh = jnp.zeros_like(logits).at[
        jnp.arange(logits.shape[0]), jnp.asarray(y_true, jnp.int32)
    ].set(1.0)
    return optax.softmax_cross_entropy(logits, oh)


def main():
    conf_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "transformer_classify_conf.json",
    )
    conf = load_config(conf_path)
    hps, arch = conf["hps"], conf["nn_arch"]

    x_train, y_train = make_dataset(int(hps.get("num_train", 8192)),
                                    int(arch["seq_len"]),
                                    int(arch["vocab"]), seed=0)
    x_test, y_test = make_dataset(2048, int(arch["seq_len"]),
                                  int(arch["vocab"]), seed=1)

    model = TransformerClassifier(
        vocab=int(arch["vocab"]), seq_len=int(arch["seq_len"]),
        d_model=int(arch["d_model"]), num_head=int(arch["num_head"]),
        num_blocks=int(arch.get("num_blocks", 2)),
        dropout_rate=float(arch.get("dropout_rate", 0.0)),
        use_flash=bool(arch.get("use_flash", False)),
    )
    trainer = Trainer(model, softmax_xent,
                      optimizer=optax.adam(float(hps["lr"])),
                      rng_streams=("dropout",))

    start = time.time()
    trainer.fit(x_train, y_train, batch_size=int(hps["batch_size"]),
                epochs=int(hps["epochs"]), verbose=1)
    logits = trainer.predict(x_test)
    acc = float((logits.argmax(-1) == y_test).mean())
    print(f"test accuracy: {acc:.4f}")
    print(f"Elasped time: {time.time() - start:f}s")
    return acc


if __name__ == "__main__":
    main()
