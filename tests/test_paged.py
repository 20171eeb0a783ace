"""Paged KV cache (MultiHeadAttention kv_page_size): page-pool + block
tables must be observationally IDENTICAL to the dense cache layout.

Reference analogue: none — the reference has no serving path; the paged
layout is the TPU-native analogue of vLLM block tables, held to the
exactness bar of the rest of the serving stack. (tests/test_packed.py is
the UNRELATED StyleGAN lane-repacking suite.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _decode_all(layer, params, cache, x):
    """Per-token decode over x (B, T, D); returns (stacked y, cache)."""
    steps = []
    for i in range(x.shape[1]):
        tok = x[:, i:i + 1]
        y, cache = layer.apply({"params": params, **cache},
                               [tok, tok, tok], decode=True,
                               mutable=["cache"])
        steps.append(np.asarray(y))
    return np.concatenate(steps, axis=1), cache


@pytest.mark.parametrize("kwargs,pg", [
    (dict(), 4),
    (dict(), 3),                      # mx=10 not a page multiple (mp=4)
    (dict(num_kv_head=1), 4),         # MQA
    (dict(kv_cache_dtype="int8"), 4),
    (dict(rope=True), 2),
])
def test_paged_decode_matches_dense(key, rng, kwargs, pg):
    """Per-token decode through the page pool (identity table default)
    is bit-identical to the dense cache layout."""
    b, t, dm = 2, 10, 8
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, **kwargs)
    paged = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, kv_page_size=pg,
                                  **kwargs)
    variables = dense.init(key, [x, x, x])
    want, dcache = _decode_all(dense, variables["params"], {}, x)
    got, pcache = _decode_all(paged, variables["params"], {}, x)
    # The paged view rounds the page count up (mp·pg >= t slots), so the
    # masked-softmax reduction order can differ at the last fp bit.
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    leaves = pcache["cache"]
    mp = -(-t // pg)
    assert leaves["pages_k"].shape[0] == b * mp
    assert leaves["page_table"].shape == (b, mp)
    np.testing.assert_array_equal(np.asarray(leaves["cache_index"]), t)


@pytest.mark.parametrize("kwargs", [dict(), dict(kv_cache_dtype="int8"),
                                    dict(rope=True)])
def test_paged_decode_blocked_scan_padding(key, rng, kwargs):
    """Pools WIDER than the 8-entry scan block exercise the BLOCKED
    page-scan read (attention.py page_step gathers 8 table entries per
    lax.scan step) including its entry-0 tail padding: t=22 @ page 2 ->
    11 pages -> 2 blocked steps with 5 padded entries whose positions
    land past max_decode_len, so the liveness mask must kill them (a
    padded entry aliases page 0, which holds REAL position-0 data)."""
    b, t, dm, pg = 2, 22, 8, 2
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, **kwargs)
    paged = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, kv_page_size=pg,
                                  **kwargs)
    variables = dense.init(key, [x, x, x])
    want, _ = _decode_all(dense, variables["params"], {}, x)
    got, pcache = _decode_all(paged, variables["params"], {}, x)
    assert pcache["cache"]["page_table"].shape == (b, 11)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("flash,qdt,ragged", [
    (False, None, False), (True, None, False), (False, "int8", False),
    (False, None, True), (True, None, True),
])
def test_paged_prefill_matches_dense(key, rng, flash, qdt, ragged):
    """Prompt prefill (one chunked decode=True call, dense einsum or the
    flash q_offset kernel) through the page pool == the dense layout,
    including ragged prompt_lengths; subsequent per-token decode
    continues correctly."""
    b, t, dm, p = 2, 9, 8, 5
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    mk = lambda **kw: ku.MultiHeadAttention(
        2, dm, 0.0, causal=True, max_decode_len=16, use_flash=flash,
        kv_cache_dtype=qdt, **kw)
    dense, paged = mk(), mk(kv_page_size=4)
    variables = dense.init(key, [x, x, x])
    params = variables["params"]

    kw = {}
    if ragged:
        kw["prompt_lengths"] = jnp.asarray([3, 5], jnp.int32)
    chunk = x[:, :p]
    yw, dcache = dense.apply({"params": params}, [chunk, chunk, chunk],
                             decode=True, mutable=["cache"], **kw)
    yg, pcache = paged.apply({"params": params}, [chunk, chunk, chunk],
                             decode=True, mutable=["cache"], **kw)
    np.testing.assert_allclose(np.asarray(yg), np.asarray(yw),
                               rtol=1e-5, atol=1e-6)

    want, _ = _decode_all(dense, params, dcache, x[:, p:])
    got, _ = _decode_all(paged, params, pcache, x[:, p:])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_paged_custom_pool_and_tables(key, rng):
    """A SHARED pool smaller than B·mp with host-assigned tables (page 0
    reserved as scratch) reproduces dense outputs — the scheduler
    contract: build the cache template, overwrite page_table values,
    then prefill/decode through it."""
    b, t, dm, pg = 2, 8, 8, 4
    mp = t // pg
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    dense = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t)
    paged = ku.MultiHeadAttention(2, dm, 0.0, causal=True,
                                  max_decode_len=t, kv_page_size=pg,
                                  kv_num_pages=1 + b * mp)
    variables = dense.init(key, [x, x, x])
    params = variables["params"]

    # Template cache from a throwaway init (ZEROED — the init call
    # itself wrote one token through the default table), then assign
    # pages 1..4.
    tmpl = paged.init(key, [x[:, :1]] * 3, decode=True)["cache"]
    tmpl = dict(jax.tree.map(jnp.zeros_like, tmpl))
    tmpl["page_table"] = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    want, _ = _decode_all(dense, params, {}, x)
    got, pcache = _decode_all(paged, params, {"cache": tmpl}, x)
    # Online-softmax page scan: fp-reorder noise only.
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)
    # Scratch page 0 untouched.
    np.testing.assert_array_equal(
        np.asarray(pcache["cache"]["pages_k"][0]), 0.0)


def test_paged_generate_and_speculative(key, rng):
    """generate() and speculative_generate() (cache rollback = ci
    subtraction; stale slots masked) work unchanged over paged caches and
    match the dense-layout outputs."""
    from ku.nn import generate, speculative_generate

    vocab, dm, b, p, steps = 11, 8, 2, 4, 6
    table = jnp.asarray(rng.normal(size=(vocab, dm)).astype(np.float32))
    mk = lambda **kw: ku.Transformer(2, dm, 0.0, causal=True,
                                     max_decode_len=p + steps + 4, **kw)
    dense, paged = mk(), mk(kv_page_size=4)
    embed = lambda i, pos=None: table[i]
    readout = lambda y: y @ table.T
    ids = jnp.asarray(rng.integers(0, vocab, size=(b, p)), jnp.int32)
    params = dense.init(key, [embed(ids)])["params"]

    want = np.asarray(generate(dense, params, ids, steps, embed=embed,
                               readout=readout))
    got = np.asarray(generate(paged, params, ids, steps, embed=embed,
                              readout=readout))
    np.testing.assert_array_equal(got, want)

    spec, _ = speculative_generate(paged, params, paged, params, ids,
                                   steps, gamma=2, embed=embed,
                                   readout=readout)
    np.testing.assert_array_equal(np.asarray(spec), want)


def test_paged_guards(key, rng):
    b, dm = 2, 8
    x = jnp.asarray(rng.normal(size=(b, 4, dm)).astype(np.float32))
    with pytest.raises(ValueError, match="ring"):
        ku.MultiHeadAttention(2, dm, causal=True, window=4,
                              kv_page_size=2).init(
            jax.random.key(0), [x, x, x])
    with pytest.raises(ValueError, match="kv_num_pages"):
        ku.MultiHeadAttention(2, dm, causal=True, max_decode_len=8,
                              kv_num_pages=4).init(
            jax.random.key(0), [x, x, x])
    with pytest.raises(ValueError, match="max_decode_len"):
        ku.MultiHeadAttention(2, dm, causal=True,
                              kv_page_size=2).init(
            jax.random.key(0), [x, x, x], decode=True)

    # fork_cache / beam_search reject paged caches (pool leaves are not
    # batch-first).
    from ku.nn import beam_search, fork_cache

    paged = ku.Transformer(2, dm, 0.0, causal=True, max_decode_len=8,
                           kv_page_size=4)
    _, cache = paged.apply(
        {"params": paged.init(key, [x])["params"]}, [x], decode=True,
        mutable=["cache"])
    with pytest.raises(ValueError, match="paged"):
        fork_cache(cache, 2)
    table = jnp.asarray(rng.normal(size=(5, dm)).astype(np.float32))
    with pytest.raises(ValueError, match="paged"):
        beam_search(paged, paged.init(key, [x])["params"],
                    jnp.zeros((b, 2), jnp.int32), 3,
                    embed=lambda i, p=None: table[i],
                    readout=lambda y: y @ table.T, beam_size=2)
