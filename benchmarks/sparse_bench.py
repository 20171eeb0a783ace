"""Block-sparse attention bench: sink+window patterns at 64k, amortized.

Timing methodology: S data-chained calls per dispatch, per-call slope
(see benchmarks/flash_amortized.py — single-dispatch numbers measure the
~25-30 ms axon tunnel, not the kernel).

Rows (bf16, B=1, H=4, N=64k, D=64, blocks 512x512):
- full causal flash (dense streaming kernel) — the baseline
- banded window-4096 flash (dense kernel's banded grid)
- sparse causal+window4096+sink128 — the StreamingLLM pattern the banded
  kernel CANNOT express (sinks escape the band); should cost ~the window
  row + one extra block column per query block.
- sparse backward at the same pattern.

Usage: python benchmarks/sparse_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from ku.pallas.flash_attention import _fwd_pallas
from ku.pallas.sparse_attention import (_sparse_bwd, _sparse_fwd,
                                        make_block_mask)


def timed(f, *arrays, n=4):
    _ = np.asarray(f(jnp.float32(1), *arrays))
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.float32(1 + 1e-6 * (i + 1)), *arrays))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def chain(call, steps):
    @jax.jit
    def f(salt, *arrays):
        def body(_, carry):
            salt, acc = carry
            out = call(salt, *arrays)
            s = jax.tree.reduce(
                lambda x, y: x + y,
                jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out),
            )
            return (salt + s * 1e-30, acc + s)

        _, acc = jax.lax.fori_loop(0, steps, body, (salt, jnp.float32(0.0)))
        return acc

    return f


def measure(name, call, *arrays, s_hi=16, out=None):
    t1 = timed(chain(call, 1), *arrays)
    th = timed(chain(call, s_hi), *arrays)
    per_call = (th - t1) / (s_hi - 1)
    print(f"{name}: per-call {per_call:.2f} ms (S=1 {t1:.1f}, "
          f"S={s_hi} {th:.1f})", file=sys.stderr, flush=True)
    if out is not None:
        out[f"{name}_ms"] = round(per_call, 3)
    return per_call


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    B, H, N, D = 1, 4, 65536, 64
    BQ = BK = 512
    W, SINK = 4096, 128
    q = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    causal_ms = measure(
        "causal_fwd", lambda s, q, k, v: _fwd_pallas(
            q * (1 + s * 1e-20), k, v, scale, None, None, True, False)[0],
        q, k, v, s_hi=8, out=out)

    measure(
        f"window{W}_fwd", lambda s, q, k, v: _fwd_pallas(
            q * (1 + s * 1e-20), k, v, scale, None, None, True, False,
            window=W)[0],
        q, k, v, out=out)

    mask = make_block_mask(N, block_q=BQ, block_k=BK, causal=True,
                           window=W, global_prefix=SINK)
    fmap, tmap = mask.arrays()
    print(f"sparse pattern: {1 - mask.sparsity:.4f} of blocks visited "
          f"(E={mask.fmap.shape[0]} flat entries)", file=sys.stderr)
    out["visited_block_frac"] = round(1 - mask.sparsity, 4)

    sparse_ms = measure(
        "sparse_sink_fwd", lambda s, q, k, v: _sparse_fwd(
            q * (1 + s * 1e-20), k, v, fmap, scale, BQ, BK,
            mask.meta, False)[0],
        q, k, v, out=out)
    # Kernel throughput on the work it actually visits.
    visited = float(mask.fmap.shape[0]) * BQ * BK
    out["sparse_fwd_visited_tflops"] = round(
        B * H * 4 * visited * D / (sparse_ms / 1e3) / 1e12, 2)
    out["sparse_vs_causal_speedup"] = round(causal_ms / sparse_ms, 2)

    o, lse = jax.jit(lambda q, k, v: _sparse_fwd(
        q, k, v, fmap, scale, BQ, BK, mask.meta, False)
    )(q, k, v)
    do = jnp.asarray(rng.normal(size=(B, H, N, D)) * 0.1, jnp.bfloat16)
    sparse_bwd_ms = measure(
        "sparse_sink_bwd",
        lambda s, q, k, v, o, lse, do: _sparse_bwd(
            q * (1 + s * 1e-20), k, v, o, lse, do, fmap, tmap,
            scale, BQ, BK, mask.meta, False),
        q, k, v, o, lse, do, s_hi=8, out=out)
    out["sparse_bwd_visited_tflops"] = round(
        2.5 * B * H * 4 * visited * D / (sparse_bwd_ms / 1e3) / 1e12, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
