"""Flash attention benchmark: 64k causal, D=64, one head (BASELINE.md row).

Times the streaming Pallas forward and backward at explicit block sizes.
Each timed call is salted (fresh q scale) so the tunnel cannot dedupe, and
fenced by scalar readback.
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

from ku.pallas.flash_attention import _bwd_pallas, _fwd_pallas

N = 65536
D = 64


def bench(fn, n=4):
    def salted(salt):
        out = fn(salt)
        return jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)), out),
        )

    f = jax.jit(salted)
    _ = np.asarray(f(jnp.float32(1)))
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        _ = np.asarray(f(jnp.float32(1 + 1e-6 * i)))
        best = min(best, time.perf_counter() - t0)
    return round(best * 1e3, 2)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        q = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        k = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        v = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        flops_fwd = 2 * 2 * N * N * D * 0.5  # causal
        for bq, bk in ((128, 128), (512, 512), (1024, 512)):
            ms = bench(
                lambda s, bq=bq, bk=bk: _fwd_pallas(
                    q * s, k, v, 0.125, bq, bk, True, False
                )[0]
            )
            out[f"fwd_{tag}_b{bq}x{bk}_ms"] = ms
            out[f"fwd_{tag}_b{bq}x{bk}_tflops"] = round(
                flops_fwd / (ms / 1e3) / 1e12, 2
            )
            print(tag, bq, bk, ms, file=sys.stderr, flush=True)
        # backward at the auto blocks
        o, lse = jax.jit(
            lambda q, k, v: _fwd_pallas(q, k, v, 0.125, None, None, True,
                                        False)
        )(q, k, v)
        do = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        for bq, bk in ((128, 128), (512, 512)):
            ms = bench(
                lambda s, bq=bq, bk=bk: _bwd_pallas(
                    q * s, k, v, o, lse, do, 0.125, bq, bk, True, False
                )
            )
            out[f"bwd_{tag}_b{bq}x{bk}_ms"] = ms
            out[f"bwd_{tag}_b{bq}x{bk}_tflops"] = round(
                2.5 * flops_fwd / (ms / 1e3) / 1e12, 2
            )
            print("bwd", tag, bq, bk, ms, file=sys.stderr, flush=True)
    out.update(multihead())
    print(json.dumps(out, indent=1))


def multihead():
    """MXU-bound regime: B=4, H=8, N=8192, D=64 — validates the
    native-dtype matmul path (bf16 should clearly beat f32 here)."""
    rng = np.random.default_rng(1)
    B, H, NN = 4, 8, 8192
    out = {}
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        q = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, dtype)
        k = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, dtype)
        v = jnp.asarray(rng.normal(size=(B, H, NN, D)) * 0.1, dtype)
        flops = B * H * 2 * 2 * NN * NN * D * 0.5
        ms = bench(lambda s: _fwd_pallas(q * s, k, v, 0.125, None, None,
                                         True, False)[0])
        out[f"mh_fwd_{tag}_ms"] = ms
        out[f"mh_fwd_{tag}_tflops"] = round(flops / (ms / 1e3) / 1e12, 2)
        print("mh", tag, ms, file=sys.stderr, flush=True)
    return out


if __name__ == "__main__":
    main()
