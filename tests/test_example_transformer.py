"""Transformer example (examples/transformer): dataset correctness, the
training pipeline, and flash/non-flash model parity."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "transformer"))
try:
    from transformer_classify import (
        TransformerClassifier,
        make_dataset,
        softmax_xent,
    )
finally:
    sys.path.pop(0)


def test_dataset_labels_correct():
    x, y = make_dataset(512, 16, 24, seed=3)
    recheck = np.array([(row[1:] == row[0]).any() for row in x], np.int32)
    np.testing.assert_array_equal(y, recheck)
    assert 0.4 < y.mean() < 0.6  # balanced


def test_training_pipeline_runs_and_improves():
    import optax

    from ku.engine_ext import Trainer

    x, y = make_dataset(2048, 12, 16, seed=0)
    model = TransformerClassifier(vocab=16, seq_len=12, d_model=32,
                                  num_head=4, num_blocks=1)
    tr = Trainer(model, softmax_xent, optimizer=optax.adam(1e-3),
                 rng_streams=("dropout",))
    h = tr.fit(x, y, batch_size=128, epochs=3, verbose=0)
    assert np.isfinite(h).all()
    logits = tr.predict(x[:64])
    assert logits.shape == (64, 2)


def test_flash_path_matches_plain():
    """use_flash=True (streaming kernel, interpret on CPU) produces the
    same logits as the XLA softmax path for identical params."""
    x, _ = make_dataset(8, 16, 16, seed=1)
    kw = dict(vocab=16, seq_len=16, d_model=32, num_head=2, num_blocks=1)
    plain = TransformerClassifier(**kw, use_flash=False)
    flash = TransformerClassifier(**kw, use_flash=True)
    variables = plain.init(jax.random.key(0), x)
    lp = plain.apply(variables, x)
    lf = flash.apply(variables, x)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lp), rtol=2e-4,
                               atol=2e-5)
