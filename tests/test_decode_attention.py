"""Flash-decoding kernel exactness (ku/pallas/decode_attention.py).

Interpret-mode kernel vs a plain-jnp oracle on ragged lengths, GQA
groups, int8 scales, softcap, and paged pools with permuted block
tables — plus full-module equivalence: MultiHeadAttention per-token
decode with flash_decode=True must match the XLA paths bit-for-bit at
f32 (same scale-folded math, f32 accumulation both sides).

The kernel consumes the TRANSPOSED cache convention (key axis minor:
(B, Hkv, D, S) / (NP, Hkv, D, pg)); tests build logical (…, S, D)
arrays for the oracle and transpose at the kernel boundary.
"""

def _t(x):
    """Logical (…, S, D) -> kernel (…, D, S)."""
    import jax.numpy as _jnp
    return _jnp.asarray(x).swapaxes(-1, -2)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ku
from ku.pallas.decode_attention import (decode_attention,
                                        decode_attention_paged)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _oracle(q, k, v, lengths, k_scale=None, v_scale=None, softcap=None):
    """(B, Hkv, G, D) x (B, Hkv, S, D) -> (B, Hkv, G, Dv), f32 math."""
    if k_scale is not None:
        k = k.astype(np.float32) * k_scale[..., None]
        v = v.astype(np.float32) * v_scale[..., None]
    s = np.einsum("bhgd,bhkd->bhgk", q.astype(np.float32),
                  k.astype(np.float32)) / np.sqrt(q.shape[-1])
    if softcap is not None:
        s = softcap * np.tanh(s / softcap)
    live = np.arange(k.shape[2])[None] < lengths[:, None]  # (B, S)
    s = np.where(live[:, None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhgk,bhkd->bhgd", p, v.astype(np.float32))


@pytest.mark.parametrize("g,softcap", [(1, None), (4, None), (4, 30.0)])
def test_dense_kernel_vs_oracle(rng, g, softcap):
    b, hkv, s, d = 2, 3, 40, 8
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    lengths = np.array([1, 37], np.int32)
    got = decode_attention(jnp.asarray(q), _t(k), _t(v),
                           jnp.asarray(lengths),
                           logit_softcap=softcap, interpret=True)
    want = _oracle(q, k, v, lengths, softcap=softcap)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=1e-6)


def test_dense_kernel_multiblock(rng):
    """S spanning several key blocks (block_t < S) + ragged lengths:
    exercises the online-softmax carry AND the clamped index_map (dead
    blocks re-point at the last live slab; masking must still be
    correct)."""
    b, hkv, g, s, d = 3, 2, 4, 64, 8
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
    lengths = np.array([5, 17, 64], np.int32)
    got = decode_attention(jnp.asarray(q), _t(k), _t(v),
                           jnp.asarray(lengths),
                           block_t=16, interpret=True)
    want = _oracle(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=1e-6)


def test_dense_kernel_int8(rng):
    b, hkv, g, s, d = 2, 2, 4, 32, 8
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    k8 = rng.integers(-127, 128, size=(b, hkv, s, d)).astype(np.int8)
    v8 = rng.integers(-127, 128, size=(b, hkv, s, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.05, size=(b, hkv, s)).astype(np.float32)
    vs = rng.uniform(0.01, 0.05, size=(b, hkv, s)).astype(np.float32)
    lengths = np.array([9, 32], np.int32)
    got = decode_attention(jnp.asarray(q), _t(k8), _t(v8),
                           jnp.asarray(lengths),
                           k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
                           block_t=16, interpret=True)
    want = _oracle(q, k8, v8, lengths, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=1e-6)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("pipelined", [False, True, "v4"])
def test_paged_kernel_vs_oracle(rng, quant, pipelined):
    """Permuted (non-identity) block table: kernel must resolve logical
    pages through the table; tail entries of short rows point at a
    poisoned page that must never be dereferenced (NaN would leak)."""
    b, hkv, g, d, pg, mp = 2, 2, 4, 8, 4, 6
    np_pool = b * mp + 1
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    pool_k = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    pool_v = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    perm = rng.permutation(np_pool - 1)[:b * mp].reshape(b, mp)
    lengths = np.array([6, 21], np.int32)
    # Poison the one unused pool page AND each row's dead table tail.
    unused = [p for p in range(np_pool) if p not in perm][0]
    pool_k[unused] = np.nan
    pool_v[unused] = np.nan
    table = perm.copy()
    for row in range(b):
        table[row, (lengths[row] + pg - 1) // pg:] = unused
    ks = vs = None
    if quant:
        kq = rng.integers(-127, 128,
                          size=(np_pool, hkv, pg, d)).astype(np.int8)
        vq = rng.integers(-127, 128,
                          size=(np_pool, hkv, pg, d)).astype(np.int8)
        ks = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        vs = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        pool_k, pool_v = kq, vq
    got = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v),
        jnp.asarray(table, jnp.int32), jnp.asarray(lengths),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
        interpret=True, pipelined=pipelined)
    # Oracle on the gathered dense view (live pages only, then mask).
    gk = pool_k[table].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mp * pg, d)
    gv = pool_v[table].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mp * pg, d)
    gks = gvs = None
    if quant:
        gks = ks[table].transpose(0, 2, 1, 3).reshape(b, hkv, mp * pg)
        gvs = vs[table].transpose(0, 2, 1, 3).reshape(b, hkv, mp * pg)
    # Zero the poisoned tail before the oracle (it is masked anyway,
    # but NaN * 0 = NaN in the einsum).
    live = np.arange(mp * pg)[None] < lengths[:, None]
    gk = np.where(live[:, None, :, None], gk, 0)
    gv = np.where(live[:, None, :, None], gv, 0)
    want = _oracle(q, gk, gv, lengths, k_scale=gks, v_scale=gvs)
    out = np.asarray(got)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("pipelined", [False, True, "v4"])
def test_paged_kernel_length_overrun(rng, pipelined):
    """A caller that keeps writing past the allocated window reports
    length > mp·pg (e.g. MultiHeadAttention init performs a real decode
    write before the caller's max_decode_len steps). The kernel must
    clamp at the table width — read the whole window unmasked, never
    dereference past the table (regression: the chunked page walk
    computed its trip count from the raw length and read table column
    mp, an out-of-bounds SMEM read)."""
    b, hkv, g, d, pg, mp = 2, 2, 2, 8, 4, 3
    np_pool = b * mp
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    pool_k = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    pool_v = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    table = np.arange(np_pool, dtype=np.int32).reshape(b, mp)
    lengths = np.array([mp * pg + 1, mp * pg + 7], np.int32)
    got = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v),
        jnp.asarray(table), jnp.asarray(lengths), interpret=True,
        pipelined=pipelined)
    gk = pool_k[table].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mp * pg, d)
    gv = pool_v[table].transpose(0, 2, 1, 3, 4).reshape(b, hkv, mp * pg, d)
    want = _oracle(q, gk, gv, np.full((b,), mp * pg, np.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5,
                               atol=1e-6)


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(kv_cache_dtype="int8"),
    dict(kv_page_size=4),
    dict(kv_page_size=4, kv_cache_dtype="int8"),
    dict(num_kv_head=2),
    dict(logit_softcap=20.0, rope=True),
])
def test_module_flash_decode_matches_xla(rng, kwargs):
    """Full MultiHeadAttention per-token decode: flash_decode=True
    (interpret kernel) vs flash_decode=False (XLA paths), identical
    params and token stream — same scale-folded f32 math on both sides."""
    b, t, dm = 2, 12, 16
    key = jax.random.key(0)
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    mods = [ku.MultiHeadAttention(4, dm, 0.0, causal=True,
                                  max_decode_len=t, flash_decode=fd,
                                  **kwargs) for fd in (False, True)]
    variables = mods[0].init(key, [x, x, x])

    def run(mod):
        cache = mod.init(key, [x[:, :1]] * 3, decode=True)["cache"]
        outs = []
        for i in range(t):
            y, mut = mod.apply(
                {"params": variables["params"], "cache": cache},
                [x[:, i:i + 1]] * 3, decode=True, mutable=["cache"])
            cache = mut["cache"]
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(run(mods[1])),
                               np.asarray(run(mods[0])),
                               rtol=2e-5, atol=2e-6)


def test_transformer_forwards_flash_decode(rng):
    """Transformer plumbs flash_decode through to its attention
    sublayers: per-token decode with the kernel (interpret) matches the
    XLA path at the block level."""
    b, t, dm = 2, 8, 16
    x = jnp.asarray(rng.normal(size=(b, t, dm)).astype(np.float32))
    mods = [ku.Transformer(4, dm, 0.0, causal=True, max_decode_len=t,
                           flash_decode=fd) for fd in (False, True)]
    variables = mods[0].init(jax.random.key(0), [x])

    def run(mod):
        cache = mod.init(jax.random.key(0), [x[:, :1]],
                         decode=True)["cache"]
        outs = []
        for i in range(t):
            y, mut = mod.apply(
                {"params": variables["params"], "cache": cache},
                [x[:, i:i + 1]], decode=True, mutable=["cache"])
            cache = mut["cache"]
            outs.append(y)
        return jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(np.asarray(run(mods[1])),
                               np.asarray(run(mods[0])),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("pipelined", [True, "v4"])
def test_paged_kernel_pipelined_ragged_chunks(rng, quant, pipelined):
    """v3 cross-step pipelining with RAGGED chunk counts: rows whose
    live chunks differ (dead grid steps mid-chain must keep the
    start/wait alternation intact — every step prefetches its
    successor iff live, slot parity is positional). pages_per_block=2
    over a 6-page table gives a 3-deep chunk grid with rows at 1 and 3
    live chunks."""
    b, hkv, g, d, pg, mp = 3, 2, 2, 8, 4, 6
    np_pool = b * mp
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    pool_k = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    pool_v = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    table = rng.permutation(np_pool).reshape(b, mp).astype(np.int32)
    lengths = np.array([3, 24, 9], np.int32)  # 1, 3, 2 live chunks
    ks = vs = None
    if quant:
        pool_k = rng.integers(-127, 128, size=pool_k.shape).astype(np.int8)
        pool_v = rng.integers(-127, 128, size=pool_v.shape).astype(np.int8)
        ks = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        vs = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
    got = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
        pages_per_block=2, interpret=True, pipelined=pipelined)
    want = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths),
        k_scale=None if ks is None else jnp.asarray(ks),
        v_scale=None if vs is None else jnp.asarray(vs),
        pages_per_block=2, interpret=True, pipelined=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)

@pytest.mark.parametrize("quant", [False, True])
def test_paged_kernel_v4_mixed_contiguity(rng, quant):
    """v4's per-chunk path choice: row 0's table is a consecutive pool
    run (fused-slab fast path), row 1's is permuted (per-page fallback),
    row 2's is consecutive ending exactly at the pool's last page — its
    final full chunk has pid0 + ppb == np_total, the boundary case the
    overrun guard must still ADMIT (fast path, in-bounds). All three in
    ONE kernel launch — the prefetch/wait pair must agree on the path
    per chunk. (The chunk that genuinely overruns the pool is covered
    by test_paged_kernel_v4_pool_end_fallback.)"""
    b, hkv, g, d, pg, mp = 3, 2, 2, 8, 4, 4
    np_pool = b * mp
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    pool_k = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    pool_v = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    table = np.stack([
        np.arange(0, mp),                      # contiguous run
        np.array([7, 5, 6, 4]),                # fragmented
        np.arange(np_pool - mp, np_pool),      # run at the pool's end
    ]).astype(np.int32)
    lengths = np.array([mp * pg, 14, mp * pg - 1], np.int32)
    ks = vs = None
    if quant:
        pool_k = rng.integers(-127, 128, size=pool_k.shape).astype(np.int8)
        pool_v = rng.integers(-127, 128, size=pool_v.shape).astype(np.int8)
        ks = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        vs = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
    kw = dict(k_scale=None if ks is None else jnp.asarray(ks),
              v_scale=None if vs is None else jnp.asarray(vs),
              pages_per_block=2, interpret=True)
    got = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths), pipelined="v4", **kw)
    want = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths), pipelined=False, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("quant", [False, True])
def test_paged_kernel_v4_pool_end_fallback(rng, quant):
    """The two riskiest v4 arms, deterministically (ADVICE r4):

    - Row 0's LAST chunk has a single live entry sitting on the pool's
      FINAL page: pid0 + ppb > np_total fails the overrun guard, so v4
      must take the per-page fallback for that chunk (the fused slab
      would read past the pool). The mixed-contiguity test never
      reaches this arm — its boundary row keeps pid0 + ppb == np_total
      inside the guard.
    - Row 1 has a DEAD in-chunk entry whose stale neighbour page is
      poisoned (NaN data, or NaN scales when quant): dead entries do
      not constrain contiguity, so the fast path DOES read the stale
      page into its slab and must mask it out by position.

    Output must be finite and bit-match the non-pipelined kernel (which
    clamps dead entries to live pages and never touches the poison).
    """
    b, hkv, g, d, pg, mp = 2, 2, 2, 8, 4, 3
    np_pool = 8
    ppb = 2  # pages_per_block below
    q = rng.normal(size=(b, hkv, g, d)).astype(np.float32)
    pool_k = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    pool_v = rng.normal(size=(np_pool, hkv, pg, d)).astype(np.float32)
    table = np.stack([
        # chunk0 = {4,5}: contiguous fast path; chunk1 = {7, dead}:
        # pid0 = 7, 7 + ppb = 9 > np_pool -> fallback forced.
        np.array([4, 5, np_pool - 1]),
        # length 3 -> npages = 1 -> one chunk {0, dead}; contiguity
        # unconstrained by the dead entry -> fast path reads stale
        # page 1 (poisoned) and must position-mask it.
        np.array([0, 1, 2]),
    ]).astype(np.int32)
    lengths = np.array([mp * pg, 3], np.int32)
    ks = vs = None
    if quant:
        pool_k = rng.integers(-127, 128, size=pool_k.shape).astype(np.int8)
        pool_v = rng.integers(-127, 128, size=pool_v.shape).astype(np.int8)
        ks = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        vs = rng.uniform(0.01, 0.05,
                         size=(np_pool, hkv, pg)).astype(np.float32)
        # int8 cannot hold NaN: poison the stale page's SCALES instead.
        for poisoned in (1, 2, 3, 6):
            ks[poisoned] = np.nan
            vs[poisoned] = np.nan
    else:
        for poisoned in (1, 2, 3, 6):  # every page no row may read
            pool_k[poisoned] = np.nan
            pool_v[poisoned] = np.nan
    kw = dict(k_scale=None if ks is None else jnp.asarray(ks),
              v_scale=None if vs is None else jnp.asarray(vs),
              pages_per_block=ppb, interpret=True)
    got = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths), pipelined="v4", **kw)
    want = decode_attention_paged(
        jnp.asarray(q), _t(pool_k), _t(pool_v), jnp.asarray(table),
        jnp.asarray(lengths), pipelined=False, **kw)
    out = np.asarray(got)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.asarray(want), rtol=2e-5,
                               atol=1e-6)
