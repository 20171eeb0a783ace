"""Continuous batching (ku/nn/serving.py): slot-pool scheduling over the
KV-cache protocol must be output-equivalent to per-request generate().

Reference analogue: none — the reference has no serving path; these
tests hold the scheduler to the exactness bar of the rest of the serving
stack (tests/test_layers.py decode/prefill/ragged suites)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku
from ku.nn import generate
from ku.nn.serving import ContinuousBatcher


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _lm(key, rng, vocab=11, dm=8, max_decode_len=32, **mha):
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    block = ku.Transformer(2, dm, 0.0, causal=True,
                           max_decode_len=max_decode_len, **mha)
    embed = lambda ids, pos=None: table[ids]
    readout = lambda y: y @ table.T
    ids0 = jnp.zeros((1, 2), jnp.int32)
    params = block.init(key, [embed(ids0)])["params"]
    return block, params, embed, readout, vocab


@pytest.mark.parametrize("qdt", [None, "int8"])
def test_continuous_batcher_matches_generate(key, rng, qdt):
    """A 2-slot batcher serving 5 ragged requests (chunk 3) emits, per
    request, exactly the greedy tokens batch-1 generate() emits — slot
    recycling, dummy-row admission, and dead-row decode never leak
    across rows."""
    block, params, embed, readout, vocab = _lm(
        key, rng, max_decode_len=32, kv_cache_dtype=qdt)

    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 1, 4, 2, 4)]
    budgets = [6, 9, 4, 7, 5]

    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3)
    got = cb.serve(prompts, budgets)

    for pr, budget, out in zip(prompts, budgets, got):
        want = np.asarray(generate(block, params, jnp.asarray(pr)[None],
                                   budget, embed=embed, readout=readout))
        np.testing.assert_array_equal(out, want[0])

    # 5 requests through 2 slots ⇒ slots were actually recycled.
    assert cb.last_stats["admission_events"] >= 3
    assert cb.last_stats["decoded_tokens"] == sum(budgets)


def test_continuous_batcher_eos(key, rng):
    """eos_id truncates each sequence at its first EOS (inclusive) and
    frees the slot — outputs are prefixes of the no-EOS run (greedy
    decode is schedule-independent)."""
    block, params, embed, readout, vocab = _lm(key, rng)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (2, 3, 4)]
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=2)
    full = cb.serve(prompts, 8)
    # Pick an EOS id that actually occurs mid-stream in some output.
    eos = next(int(t) for out in full for t in out[1:-1])

    cb2 = ContinuousBatcher(block, params, embed=embed, readout=readout,
                            num_slots=2, prompt_len=4, max_decode_len=32,
                            chunk=2, eos_id=eos)
    cut = cb2.serve(prompts, 8)
    hit = 0
    for f, c in zip(full, cut):
        f, c = np.asarray(f), np.asarray(c)
        if eos in f:
            stop = int(np.flatnonzero(f == eos)[0])
            np.testing.assert_array_equal(c, f[:stop + 1])
            hit += 1
        else:
            np.testing.assert_array_equal(c, f)
    assert hit >= 1


def test_continuous_batcher_guards(key, rng):
    block, params, embed, readout, vocab = _lm(key, rng)
    mk = lambda **kw: ContinuousBatcher(
        block, params, embed=embed, readout=readout, num_slots=2,
        prompt_len=4, max_decode_len=32, **kw)
    with pytest.raises(ValueError, match="prompt_len"):
        ContinuousBatcher(block, params, embed=embed, readout=readout,
                          num_slots=2, prompt_len=1, max_decode_len=32)
    cb = mk()
    with pytest.raises(ValueError, match="non-empty"):
        cb.serve([np.zeros(0, np.int32)], 4)
    with pytest.raises(ValueError, match="overruns"):
        cb.serve([np.zeros(2, np.int32)], 40)  # budget past the page
    with pytest.raises(ValueError, match="match"):
        cb.serve([np.zeros(2, np.int32)], [1, 2])


@pytest.mark.parametrize("qdt", [None, "int8"])
def test_continuous_batcher_paged_pool_matches_generate(key, rng, qdt):
    """Paged mode: a SHARED page pool smaller than B x pages-per-seq
    (kv_num_pages=11 vs the dense-equivalent 16) serves a recycled
    workload with outputs exactly equal to per-request generate() on a
    DENSE-cache model — page allocation, scratch routing, page-granular
    merge, and table scratching of dead rows are all invisible."""
    dense_block, params, embed, readout, vocab = _lm(
        key, rng, max_decode_len=32, kv_cache_dtype=qdt)
    paged_block = ku.Transformer(2, 8, 0.0, causal=True,
                                 max_decode_len=32, kv_cache_dtype=qdt,
                                 kv_page_size=4, kv_num_pages=11)

    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 1, 4, 2, 4)]
    budgets = [6, 9, 4, 7, 5]
    cb = ContinuousBatcher(paged_block, params, embed=embed,
                           readout=readout, num_slots=2, prompt_len=4,
                           max_decode_len=32, chunk=3)
    got = cb.serve(prompts, budgets)
    for pr, budget, out in zip(prompts, budgets, got):
        want = np.asarray(generate(dense_block, params,
                                   jnp.asarray(pr)[None], budget,
                                   embed=embed, readout=readout))
        np.testing.assert_array_equal(out, want[0])
    st = cb.last_stats
    assert st["admission_events"] >= 3  # slots recycled
    assert 0 < st["peak_pages_in_use"] <= 10  # pool actually bounded


def test_continuous_batcher_paged_deferral_and_exhaustion(key, rng):
    """A pool that fits only one request at a time serializes admissions
    (requests DEFER, FIFO) but still completes correctly; a request that
    can never fit raises."""
    block, params, embed, readout, vocab = _lm(key, rng)
    paged = ku.Transformer(2, 8, 0.0, causal=True, max_decode_len=32,
                           kv_page_size=4, kv_num_pages=4)  # 3 usable
    prompts = [rng.integers(0, vocab, size=(3,)).astype(np.int32)
               for _ in range(3)]
    cb = ContinuousBatcher(paged, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3)
    got = cb.serve(prompts, 6)  # needs 3 pages/request -> serial
    for pr, out in zip(prompts, got):
        want = np.asarray(generate(block, params, jnp.asarray(pr)[None],
                                   6, embed=embed, readout=readout))
        np.testing.assert_array_equal(out, want[0])
    assert cb.last_stats["admission_events"] == 3  # one per request
    assert cb.last_stats["peak_pages_in_use"] <= 3

    with pytest.raises(ValueError, match="grow kv_num_pages"):
        cb.serve([prompts[0]], 20)  # 8 pages needed, 3 allocatable


@pytest.mark.parametrize("paged,prefix", [
    (False, None), (True, None), (True, 5),
])
def test_continuous_batcher_long_prompts(key, rng, paged, prefix):
    """Prompts LONGER than prompt_len are admitted in chunked prefill
    rounds at the fixed (B, P) shape and emit exactly the per-request
    generate() tokens — on dense and paged caches, with and without a
    shared prefix, mixed with short prompts in the same event."""
    dense_block, params, embed, readout, vocab = _lm(
        key, rng, max_decode_len=64)
    block = (ku.Transformer(2, 8, 0.0, causal=True, max_decode_len=64,
                            kv_page_size=4, kv_num_pages=40)
             if paged else dense_block)
    # P=4; prompts span <P, ==P, 2 rounds, 3 ragged rounds.
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (2, 4, 7, 11)]
    budgets = [5, 4, 6, 5]
    pre = (rng.integers(0, vocab, size=(prefix,)).astype(np.int32)
           if prefix else None)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=64,
                           chunk=3)
    got = cb.serve(prompts, budgets, shared_prefix=pre)
    for pr, b, out in zip(prompts, budgets, got):
        full = (jnp.concatenate([jnp.asarray(pre), jnp.asarray(pr)])
                if prefix else jnp.asarray(pr))
        want = np.asarray(generate(dense_block, params, full[None], b,
                                   embed=embed, readout=readout))
        np.testing.assert_array_equal(out, want[0])
    assert cb.last_stats["prefill_rounds"] > \
        cb.last_stats["admission_events"]  # multi-round admission ran


@pytest.mark.parametrize("plen_pre,qdt", [
    (5, None),    # non-aligned prefix: tail-page copy path
    (8, None),    # page-aligned prefix: pure aliasing
    (5, "int8"),  # seeded scale pages
])
def test_continuous_batcher_shared_prefix(key, rng, plen_pre, qdt):
    """Paged prefix caching: the system prompt prefills ONCE into shared
    pages aliased by every request's table; outputs equal dense
    generate() on prefix+prompt for every request."""
    dense_block, params, embed, readout, vocab = _lm(
        key, rng, max_decode_len=32, kv_cache_dtype=qdt)
    paged_block = ku.Transformer(2, 8, 0.0, causal=True,
                                 max_decode_len=32, kv_cache_dtype=qdt,
                                 kv_page_size=4, kv_num_pages=14)
    prefix = rng.integers(0, vocab, size=(plen_pre,)).astype(np.int32)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 1, 4, 2)]
    budgets = [6, 4, 5, 6]

    cb = ContinuousBatcher(paged_block, params, embed=embed,
                           readout=readout, num_slots=2, prompt_len=4,
                           max_decode_len=32, chunk=3)
    got = cb.serve(prompts, budgets, shared_prefix=prefix)
    for pr, budget, out in zip(prompts, budgets, got):
        full = jnp.concatenate([jnp.asarray(prefix), jnp.asarray(pr)])
        want = np.asarray(generate(dense_block, params, full[None],
                                   budget, embed=embed, readout=readout))
        np.testing.assert_array_equal(out, want[0])
    st = cb.last_stats
    assert st["shared_prefix_pages"] == -(-plen_pre // 4)
    assert st["admission_events"] >= 2  # recycled slots reuse the pages


def test_continuous_batcher_shared_prefix_dense_rejected(key, rng):
    block, params, embed, readout, vocab = _lm(key, rng)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32)
    with pytest.raises(ValueError, match="paged"):
        cb.serve([np.zeros(2, np.int32)], 4,
                 shared_prefix=np.zeros(4, np.int32))


def test_continuous_batcher_online_submit_step(key, rng):
    """The online API: requests submitted MID-DECODE (after earlier ones
    already started) are admitted into freed slots and still emit
    exactly the per-request generate() tokens; step() returns each
    request once, and idle flips when drained."""
    block, params, embed, readout, vocab = _lm(key, rng)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 2, 4, 1)]
    cb.reset()
    ids = [cb.submit(prompts[0], 6), cb.submit(prompts[1], 5)]
    done = {}
    done.update(cb.step())  # both decoding
    ids.append(cb.submit(prompts[2], 4))   # late arrival mid-decode
    while len(done) < 3:
        done.update(cb.step())
    ids.append(cb.submit(prompts[3], 7))   # arrives when others finished
    while not cb.idle:
        done.update(cb.step())
    assert cb.step() == {}  # idle engine no-ops
    assert set(done) == set(ids)
    for rid, pr, b in zip(ids, prompts, (6, 5, 4, 7)):
        want = np.asarray(generate(block, params, jnp.asarray(pr)[None],
                                   b, embed=embed, readout=readout))
        np.testing.assert_array_equal(done[rid], want[0])


def test_continuous_batcher_geometry_guards(key, rng):
    """Declared max_decode_len larger than the model's real cache raises
    (writes would silently clamp/drop); ring caches are rejected; a
    prefix that leaves no allocatable pages raises."""
    block, params, embed, readout, vocab = _lm(key, rng,
                                               max_decode_len=16)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=64,
                           chunk=2)
    with pytest.raises(ValueError, match="actual cache length"):
        cb.serve([np.zeros(2, np.int32)], 4)

    ring = ku.Transformer(2, 8, 0.0, causal=True, window=4,
                          global_prefix=1)
    rparams = ring.init(key, [jnp.zeros((1, 2, 8), jnp.float32)])["params"]
    cbr = ContinuousBatcher(ring, rparams, embed=embed, readout=readout,
                            num_slots=2, prompt_len=4, max_decode_len=32,
                            chunk=2)
    with pytest.raises(ValueError, match="ring"):
        cbr.serve([np.zeros(2, np.int32)], 4)

    paged = ku.Transformer(2, 8, 0.0, causal=True, max_decode_len=32,
                           kv_page_size=4, kv_num_pages=4)
    cbp = ContinuousBatcher(paged, params, embed=embed, readout=readout,
                            num_slots=2, prompt_len=4, max_decode_len=32,
                            chunk=2)
    with pytest.raises(ValueError, match="at least one request page"):
        cbp.serve([np.zeros(2, np.int32)], 4,
                  shared_prefix=np.zeros(12, np.int32))  # 3 of 3 pages


def test_paged_default_table_alias_warns(key, rng):
    """kv_num_pages below B*pages-per-seq with the DEFAULT identity
    table warns (the clamp aliases pages — scheduler required)."""
    x = jnp.asarray(rng.normal(size=(2, 1, 8)).astype(np.float32))
    layer = ku.MultiHeadAttention(2, 8, 0.0, causal=True,
                                  max_decode_len=8, kv_page_size=4,
                                  kv_num_pages=3)
    with pytest.warns(UserWarning, match="ALIASES"):
        layer.init(key, [x, x, x], decode=True)


def test_continuous_batcher_stochastic_in_vocab(key, rng):
    """Temperature sampling serves end-to-end; tokens stay in-vocab and
    per-request budgets are honored."""
    from ku.nn import make_sampler

    block, params, embed, readout, vocab = _lm(key, rng)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=3, prompt_len=3, max_decode_len=32,
                           chunk=4, sampler=make_sampler(1.0, top_k=5),
                           rng=jax.random.key(11))
    prompts = [rng.integers(0, vocab, size=(2,)).astype(np.int32)
               for _ in range(4)]
    outs = cb.serve(prompts, [5, 3, 6, 4])
    for out, b in zip(outs, [5, 3, 6, 4]):
        assert out.shape == (b,)
        assert out.min() >= 0 and out.max() < vocab


def test_generate_logprobs(key, rng):
    """generate(return_logprobs=True): ids unchanged; each emitted
    token's logprob equals the full-forward log-softmax at its
    position (teacher-forcing oracle), and greedy logprobs are the
    per-position max."""
    block, params, embed, readout, vocab = _lm(key, rng)
    p, steps = 3, 6
    ids = jnp.asarray(rng.integers(0, vocab, size=(2, p)), jnp.int32)
    plain = np.asarray(generate(block, params, ids, steps, embed=embed,
                                readout=readout))
    out, lps = generate(block, params, ids, steps, embed=embed,
                        readout=readout, return_logprobs=True)
    out, lps = np.asarray(out), np.asarray(lps)
    np.testing.assert_array_equal(out, plain)
    assert lps.shape == (2, steps) and (lps <= 0).all()

    # Oracle: full causal forward over prompt+generated, teacher-forced.
    full = jnp.concatenate([ids, jnp.asarray(out)], axis=1)
    y = block.apply({"params": params}, [embed(full)])
    logp = np.asarray(jax.nn.log_softmax(np.asarray(readout(y)), -1))
    for b in range(2):
        for t in range(steps):
            want = logp[b, p - 1 + t, out[b, t]]
            np.testing.assert_allclose(lps[b, t], want, rtol=1e-4,
                                       atol=1e-5)
    # Greedy = argmax => its logprob is the row max.
    np.testing.assert_allclose(lps, logp[:, p - 1:p - 1 + steps].max(-1),
                               rtol=1e-4, atol=1e-5)


def test_continuous_batcher_logprobs(key, rng):
    """return_logprobs=True: each finished request maps to (tokens,
    logprobs) matching generate(return_logprobs=True) exactly; progress
    streams both."""
    block, params, embed, readout, vocab = _lm(key, rng)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3, return_logprobs=True)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 1, 4)]
    outs = cb.serve(prompts, 6)
    for pr, (toks, lps) in zip(prompts, outs):
        want_ids, want_lps = generate(block, params,
                                      jnp.asarray(pr)[None], 6,
                                      embed=embed, readout=readout,
                                      return_logprobs=True)
        np.testing.assert_array_equal(toks, np.asarray(want_ids)[0])
        np.testing.assert_allclose(lps, np.asarray(want_lps)[0],
                                   rtol=1e-5, atol=1e-6)


def test_padded_prefill_window_guard(key, rng):
    """Regression (review repro): a long prompt whose FINAL fixed-P
    round would clamp past the real cache end is rejected up front —
    the clamped write would silently corrupt prompt K/V below
    cache_index. A request whose window fits serves exactly."""
    block, params, embed, readout, vocab = _lm(key, rng,
                                               max_decode_len=30)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=8, max_decode_len=30,
                           chunk=1)
    long_pr = rng.integers(0, vocab, size=(26,)).astype(np.int32)
    with pytest.raises(ValueError, match="padded prefill window"):
        cb.serve([long_pr], 3)  # 26+3+1=30 fits, but ceil(26/8)*8=32 > 30

    block2, params2, *_ = _lm(key, rng, max_decode_len=32)
    cb2 = ContinuousBatcher(block2, params2, embed=embed,
                            readout=readout, num_slots=2, prompt_len=8,
                            max_decode_len=32, chunk=1)
    out = cb2.serve([long_pr], 3)
    want = np.asarray(generate(block2, params2,
                               jnp.asarray(long_pr)[None], 3,
                               embed=embed, readout=readout))
    np.testing.assert_array_equal(out[0], want[0])


def test_online_api_guards(key, rng):
    """reset() refuses to discard in-flight work without force=True;
    duplicate request_ids are rejected; finished budgets are dropped
    (run-forever loops stay bounded)."""
    block, params, embed, readout, vocab = _lm(key, rng)
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3)
    cb.reset()
    cb.submit(np.asarray([1, 2], np.int32), 4, request_id="x")
    with pytest.raises(ValueError, match="already"):
        cb.submit(np.asarray([3], np.int32), 2, request_id="x")
    with pytest.raises(RuntimeError, match="force=True"):
        cb.reset()
    while not cb.idle:
        cb.step()
    assert cb._budgets == {}
    cb.reset()  # idle: allowed without force
    cb.submit(np.asarray([1], np.int32), 2, request_id="x")  # id reusable
    cb.reset(force=True)  # explicit discard
    assert cb.idle


def test_continuous_batcher_fuzz_configs():
    """Randomized scheduler sweep: random slot counts, chunk sizes,
    prefill widths, cache layouts, pools, prefixes, and ragged
    workloads must ALL be bit-identical to per-request generate() —
    the scheduler is pure bookkeeping. Trial structure guarantees the
    paged and paged+prefix dimensions are actually exercised."""
    compared = 0
    for trial in range(6):
        trng = np.random.default_rng(100 + trial)
        nslots = int(trng.integers(1, 4))
        chunk = int(trng.integers(1, 5))
        P = int(trng.integers(2, 6))
        paged = trial % 2 == 0          # 3 paged trials guaranteed
        prefix_len = [0, 3, 7][trial % 3] if paged else 0
        mdl = 64
        dense, params, embed, readout, vocab = _lm(
            jax.random.key(trial), trng, max_decode_len=mdl)
        kw = {}
        if paged:
            pg = int(trng.choice([2, 4, 8]))
            mp = -(-mdl // pg)
            kw = dict(kv_page_size=pg,
                      kv_num_pages=1 + max(nslots * mp // 2, mp + 1))
            block = ku.Transformer(2, 8, 0.0, causal=True,
                                   max_decode_len=mdl, **kw)
        else:
            block = dense
        n = int(trng.integers(2, 7))
        prompts = [trng.integers(0, vocab, size=(int(trng.integers(
            1, 2 * P + 1)),)).astype(np.int32) for _ in range(n)]
        budgets = [int(trng.integers(1, 9)) for _ in range(n)]
        prefix = (trng.integers(0, vocab, size=(prefix_len,)).astype(
            np.int32) if prefix_len else None)
        cb = ContinuousBatcher(block, params, embed=embed,
                               readout=readout, num_slots=nslots,
                               prompt_len=P, max_decode_len=mdl,
                               chunk=chunk)
        try:
            outs = cb.serve(prompts, budgets, shared_prefix=prefix)
        except ValueError as e:
            # Legal refusals only (tiny random pools can be too small).
            assert "kv_num_pages" in str(e) or "pages" in str(e), e
            continue
        for pr, b, out in zip(prompts, budgets, outs):
            full = (jnp.concatenate([jnp.asarray(prefix),
                                     jnp.asarray(pr)])
                    if prefix is not None else jnp.asarray(pr))
            want = np.asarray(generate(dense, params, full[None], b,
                                       embed=embed, readout=readout))
            np.testing.assert_array_equal(
                out, want[0],
                err_msg=f"trial {trial}: slots={nslots} chunk={chunk} "
                        f"P={P} paged={paged} kw={kw} "
                        f"prefix={prefix_len}")
            compared += 1
    assert compared >= 10  # the sweep must not pass vacuously


# -- top-p / repetition-penalty samplers (round-4) ----------------------


def test_top_p_distribution():
    """Nucleus sampling: only the smallest token set reaching top_p mass
    is ever drawn, with frequencies matching the renormalized
    distribution (8192 independent rows)."""
    from ku.nn import make_sampler

    probs = np.array([0.4, 0.3, 0.15, 0.08, 0.05, 0.02])
    logits = jnp.asarray(np.log(probs))[None].repeat(8192, 0)
    # exclusive cumsum: 0.0, 0.4 < 0.7 -> nucleus {0, 1}
    samp = make_sampler(temperature=1.0, top_p=0.7)
    toks = np.asarray(samp(logits, jax.random.key(3)))
    assert set(np.unique(toks)) <= {0, 1}
    freq = np.bincount(toks, minlength=6) / toks.size
    np.testing.assert_allclose(freq[:2], [4 / 7, 3 / 7], atol=0.02)

    # top_p -> 0 keeps only the argmax (greedy); top_p = 1 keeps all.
    g = np.asarray(make_sampler(1.0, top_p=1e-6)(logits,
                                                 jax.random.key(4)))
    assert (g == 0).all()
    full = np.asarray(make_sampler(1.0, top_p=1.0)(logits,
                                                   jax.random.key(5)))
    assert set(np.unique(full)) == set(range(6))

    # Composes after top-k: k=4 then p=0.999 keeps exactly those 4.
    both = np.asarray(make_sampler(1.0, top_k=4, top_p=0.999)(
        logits, jax.random.key(6)))
    assert set(np.unique(both)) == {0, 1, 2, 3}


def test_generate_repetition_penalty_oracle(key, rng):
    """generate() with a repetition-penalty sampler matches a manual
    step-by-step oracle that tracks the seen set (prompt + emitted) and
    applies the CTRL penalty before the argmax."""
    from ku.nn import generate, make_sampler

    block, params, embed, readout, vocab = _lm(key, rng)
    b, p, steps, pen = 2, 3, 7, 25.0
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    samp = make_sampler(temperature=1e-4, repetition_penalty=pen)
    got = np.asarray(generate(block, params, ids, steps, embed=embed,
                              readout=readout, sampler=samp,
                              rng=jax.random.key(0)))

    def apply_step(cache, x):
        y, mut = block.apply({"params": params, **cache}, [x],
                             decode=True, mutable=["cache"])
        return mut, y

    seen = np.zeros((b, vocab), bool)
    np.put_along_axis(seen, np.asarray(ids), True, axis=1)
    cache, y = apply_step({}, embed(ids))
    logits = np.asarray(readout(y[:, -1:])[:, 0])
    toks, plain = [], []
    pos = p
    for t in range(steps):
        plain.append(logits.argmax(-1))
        lg = np.where(seen, np.where(logits > 0, logits / pen,
                                     logits * pen), logits)
        tok = lg.argmax(-1)
        toks.append(tok)
        seen[np.arange(b), tok] = True
        if t < steps - 1:
            cache, y = apply_step(
                cache, embed(jnp.asarray(tok)[:, None],
                             jnp.asarray([pos])))
            logits = np.asarray(readout(y)[:, 0])
            pos += 1
    oracle = np.stack(toks, axis=1)
    np.testing.assert_array_equal(got, oracle)
    # Non-vacuous: the penalty changed at least one token vs greedy.
    assert (oracle != np.stack(plain, axis=1)).any()


@pytest.mark.parametrize("paged", [False, True])
def test_batcher_repetition_penalty_matches_generate(key, rng, paged):
    """The batcher threads the seen mask through admission (incl.
    chunked long prompts and recycled slots) and decode: outputs equal
    per-request generate() with the same repetition-penalty sampler
    (near-deterministic at temperature 1e-4)."""
    from ku.nn import make_sampler

    mha = dict(kv_page_size=8, kv_num_pages=24) if paged else {}
    block, params, embed, readout, vocab = _lm(key, rng, **mha)
    samp = make_sampler(temperature=1e-4, top_p=0.95,
                        repetition_penalty=1.7)
    assert samp.needs_seen
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 6, 2, 5)]  # 6 > prompt_len: chunked rounds
    budgets = [6, 4, 7, 5]
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=32,
                           chunk=3, sampler=samp, rng=jax.random.key(2))
    outs = cb.serve(prompts, budgets)
    for pr, b, out in zip(prompts, budgets, outs):
        ref = np.asarray(generate(
            block, params, jnp.asarray(pr)[None], b, embed=embed,
            readout=readout, sampler=samp, rng=jax.random.key(9)))[0]
        np.testing.assert_array_equal(out, ref)


def test_batcher_shared_prefix_repetition_penalty(key, rng):
    """Paged shared-prefix serving marks the prefix's tokens as seen for
    every request: outputs equal generate() on prefix+prompt."""
    from ku.nn import make_sampler

    block, params, embed, readout, vocab = _lm(
        key, rng, max_decode_len=64, kv_page_size=8, kv_num_pages=40)
    samp = make_sampler(temperature=1e-4, repetition_penalty=1.7)
    prefix = rng.integers(0, vocab, size=(5,)).astype(np.int32)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 2, 4)]
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=64,
                           chunk=3, sampler=samp, rng=jax.random.key(2))
    outs = cb.serve(prompts, 6, shared_prefix=prefix)
    for pr, out in zip(prompts, outs):
        full = jnp.asarray(np.concatenate([prefix, pr]))[None]
        ref = np.asarray(generate(
            block, params, full, 6, embed=embed, readout=readout,
            sampler=samp, rng=jax.random.key(9)))[0]
        np.testing.assert_array_equal(out, ref)


def test_batcher_adaptive_chunk_matches_generate(key, rng):
    """chunk=(2, 4, 8) adaptive scheduling: outputs stay bit-identical
    to per-request greedy generate() (chunk boundaries never affect
    greedy tokens), the engine drains, and more than one compiled chunk
    size is actually exercised (non-vacuous: queued rounds pick 2,
    drained full-budget rounds pick larger)."""
    block, params, embed, readout, vocab = _lm(key, rng,
                                               max_decode_len=64)
    prompts = [rng.integers(0, vocab, size=(p,)).astype(np.int32)
               for p in (3, 1, 4, 2, 4)]
    budgets = [20, 9, 16, 7, 12]
    cb = ContinuousBatcher(block, params, embed=embed, readout=readout,
                           num_slots=2, prompt_len=4, max_decode_len=64,
                           chunk=(2, 4, 8))
    assert cb.chunk == 8  # validation uses the max size
    sizes = set()
    orig = cb._pick_chunk

    def spy():
        c = orig()
        sizes.add(c)
        return c

    cb._pick_chunk = spy
    outs = cb.serve(prompts, budgets)
    assert len(sizes) > 1, sizes
    for pr, b, out in zip(prompts, budgets, outs):
        ref = np.asarray(generate(
            block, params, jnp.asarray(pr)[None], b, embed=embed,
            readout=readout))[0]
        np.testing.assert_array_equal(out, ref)
