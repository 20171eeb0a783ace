"""Transformer example (examples/transformer): dataset correctness, the
training pipeline, and flash/non-flash model parity."""

import os
import sys

import jax
import numpy as np
import pytest

_XDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "transformer")
sys.path.insert(0, _XDIR)
try:
    from transformer_classify import (
        TransformerClassifier,
        make_dataset,
        softmax_xent,
    )
finally:
    # Remove by VALUE: the example module itself inserts dirs at [0]
    # during import, so pop(0) would evict the wrong entry and leak
    # the examples dir onto sys.path for the whole session.
    sys.path.remove(_XDIR)


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


def test_generate_example_pipeline():
    """The LM generation example end-to-end at toy scale: train the
    periodic-copy LM briefly, then serve with ku.nn.generate (prefill +
    one-scan decode) — generated tokens must beat chance decisively and
    track the cyclic continuation."""
    import jax.numpy as jnp
    import optax

    from ku.engine_ext import Trainer
    from ku.nn import generate

    sys.path.insert(0, _XDIR)
    try:
        from transformer_generate import LM, LMCore
        from transformer_generate import make_dataset as mk
    finally:
        sys.path.remove(_XDIR)

    vocab, seq_len, period = 8, 12, 4
    seqs = mk(2048, seq_len + 1, period, vocab, seed=0)
    x, y = seqs[:, :-1], seqs[:, 1:]
    model = LM(vocab=vocab, seq_len=seq_len, d_model=32, num_head=2,
               num_blocks=2)

    def masked_xent(y_true, logits):
        oh = jax.nn.one_hot(jnp.asarray(y_true, jnp.int32), vocab)
        ce = optax.softmax_cross_entropy(logits, oh)
        mask = (jnp.arange(ce.shape[1]) >= period - 1)[None, :]
        return (ce * mask).sum(1) / mask.sum()

    tr = Trainer(model, masked_xent, optimizer=optax.adam(2e-3))
    h = tr.fit(x, y, batch_size=128, epochs=10, verbose=0)
    assert np.isfinite(h).all()

    params = tr.state["params"]
    table, pos_table = params["tok"]["embedding"], params["pos"]
    core = LMCore(32, 2, 2, max_decode_len=seq_len)
    test = mk(128, seq_len, period, vocab, seed=1)
    ids = jnp.asarray(test[:, : seq_len // 2], jnp.int32)
    gen = np.asarray(generate(
        core, params["core"], ids, seq_len - seq_len // 2,
        embed=lambda i, p: table[i] + pos_table[p][None],
        readout=lambda yy: yy @ table.T))
    acc = float((gen == test[:, seq_len // 2:]).mean())
    assert acc > 0.6, acc  # chance is 1/8


def test_server_simulation_completes():
    """The online-serving demo (open-loop arrivals through the paged
    slot pool) completes a small workload with sane scheduling stats."""
    sys.path.insert(0, _XDIR)
    try:
        from transformer_server import simulate
    finally:
        sys.path.remove(_XDIR)

    r = simulate(num_requests=6, num_slots=2, vocab=13, d_model=16,
                 num_head=2, prompt_len=4, max_decode_len=48, chunk=3,
                 page=8, verbose=False)
    assert r["requests"] == 6
    assert r["generated_tokens"] > 0
    assert r["prefill_rounds"] >= r["admissions"]
    assert 0 < r["peak_pages_in_use"] <= r["pool_pages"]
    assert 0 < r["slot_utilization"] <= 1
