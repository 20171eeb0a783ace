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


def bench(fn, *arrays, n=4, s_hi=8):
    """Times ``fn(salt, *arrays)`` AMORTIZED: S chained calls per dispatch
    (S=1 vs S=s_hi, slope reported). A single dispatch over the axon
    tunnel pays a flat ~25 ms round trip — the same order as these
    kernels — so single-dispatch timing measures the tunnel, not the
    kernel (this distorted every recorded flash number before the round-3
    correction; see benchmarks/flash_amortized.py). Arrays MUST be passed
    here, not closed over: closure constants get embedded in the
    serialized HLO and large ones blow the axon tunnel's remote-compile
    body limit (HTTP 413 at ~hundreds of MB — hit at D=128 f32,
    134 MB/tensor)."""
    def chained(steps):
        @jax.jit
        def f(salt, *a):
            def body(_, carry):
                salt, acc = carry
                out = fn(salt, *a)
                s = jax.tree.reduce(
                    lambda x, y: x + y,
                    jax.tree.map(lambda t: jnp.sum(t.astype(jnp.float32)),
                                 out),
                )
                return (salt + s * 1e-30, acc + s)
            return jax.lax.fori_loop(0, steps, body,
                                     (salt, jnp.float32(0)))[1]
        return f

    def timed(f):
        _ = np.asarray(f(jnp.float32(1), *arrays))
        best = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(f(jnp.float32(1 + 1e-6 * (i + 1)), *arrays))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    t1, th = timed(chained(1)), timed(chained(s_hi))
    return round((th - t1) / (s_hi - 1), 2)


def _want(section: str) -> bool:
    only = os.environ.get("KU_ONLY")
    return only is None or section in only.split(",")


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    if not _want("d64"):
        out.update(multihead() if _want("mh") else {})
        out.update(mxu_regime() if _want("mxu") else {})
        out.update(ring_local() if _want("ring") else {})
        print(json.dumps(out, indent=1))
        return
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        q = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        k = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        v = jnp.asarray(rng.normal(size=(1, 1, N, D)) * 0.1, dtype)
        flops_fwd = 2 * 2 * N * N * D * 0.5  # causal
        for bq, bk in ((128, 128), (512, 512), (1024, 512)):
            ms = bench(
                lambda s, q, k, v, bq=bq, bk=bk: _fwd_pallas(
                    q * s, k, v, 0.125, bq, bk, True, False
                )[0],
                q, k, v,
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
                lambda s, q, k, v, o, lse, do, bq=bq, bk=bk: _bwd_pallas(
                    q * s, k, v, o, lse, do, 0.125, bq, bk, True, False
                ),
                q, k, v, o, lse, do,
            )
            out[f"bwd_{tag}_b{bq}x{bk}_ms"] = ms
            out[f"bwd_{tag}_b{bq}x{bk}_tflops"] = round(
                2.5 * flops_fwd / (ms / 1e3) / 1e12, 2
            )
            print("bwd", tag, bq, bk, ms, file=sys.stderr, flush=True)
    if _want("mh"):
        out.update(multihead())
    if _want("mxu"):
        out.update(mxu_regime())
    if _want("ring"):
        out.update(ring_local())
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
        ms = bench(lambda s, q, k, v: _fwd_pallas(
            q * s, k, v, 0.125, None, None, True, False)[0], q, k, v)
        out[f"mh_fwd_{tag}_ms"] = ms
        out[f"mh_fwd_{tag}_tflops"] = round(flops / (ms / 1e3) / 1e12, 2)
        print("mh", tag, ms, file=sys.stderr, flush=True)
    return out


def ring_local():
    """Ring-attention local step vs the plain single-chip kernel
    (VERDICT r3 item 3 'done' criterion): the per-hop kernel call is the
    SAME streaming kernel plus two SMEM offset scalars and a dynamic
    causal-liveness check — this measures that the offset variant costs
    nothing. One 8k-query x 8k-key hop, causal, D=64, bf16."""
    rng = np.random.default_rng(3)
    B, H, NN, D_ = 1, 8, 8192, 64
    q = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, jnp.bfloat16)
    out = {}
    flops = B * H * 2 * 2 * NN * NN * D_ * 0.5
    ms_plain = bench(lambda s, q, k, v: _fwd_pallas(
        q * s, k, v, 0.125, None, None, True, False)[0], q, k, v)
    # The ring's per-hop call: same shapes, offsets threaded (diagonal
    # hop: q_off == k_off -> identical masking work to the plain kernel).
    ms_ring = bench(lambda s, q, k, v: _fwd_pallas(
        q * s, k, v, 0.125, None, None, True, False,
        q_offset=jnp.int32(8192), k_offset=jnp.int32(8192))[0], q, k, v)
    out["ring_local_plain_ms"] = ms_plain
    out["ring_local_offsets_ms"] = ms_ring
    out["ring_local_overhead_pct"] = round(
        (ms_ring - ms_plain) / ms_plain * 100, 1)
    out["ring_local_tflops"] = round(flops / (ms_ring / 1e3) / 1e12, 2)
    print("ring_local", ms_plain, ms_ring, file=sys.stderr, flush=True)
    return out


def mxu_regime():
    """Head dims >= 128 (VERDICT r3 item 2): the MXU-bound regime where
    the matmul path dominates the VPU exp/reduction work — bf16 operands
    should pull well clear of f32 here, unlike at D=64. Sweeps block
    sizes; includes the backward at the best-known blocks."""
    rng = np.random.default_rng(2)
    B, H, NN = 4, 8, 8192
    out = {}
    for D_ in (128, 256):
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            q = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, dtype)
            k = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, dtype)
            v = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, dtype)
            scale = 1.0 / np.sqrt(D_)
            flops = B * H * 2 * 2 * NN * NN * D_ * 0.5  # causal
            blocks = ((None, None), (256, 512), (512, 512), (1024, 512),
                      (512, 1024))
            if D_ == 256 and dtype == jnp.float32:
                blocks = ((None, None), (256, 512), (512, 512))  # VMEM
            for bq, bk in blocks:
                label = "auto" if bq is None else f"b{bq}x{bk}"
                try:
                    ms = bench(
                        lambda s, q, k, v, bq=bq, bk=bk: _fwd_pallas(
                            q * s, k, v, scale, bq, bk, True, False)[0],
                        q, k, v,
                    )
                except Exception as e:
                    print(f"D{D_} {tag} {label} FAILED {e}"[:200],
                          file=sys.stderr, flush=True)
                    continue
                out[f"d{D_}_fwd_{tag}_{label}_ms"] = ms
                out[f"d{D_}_fwd_{tag}_{label}_tflops"] = round(
                    flops / (ms / 1e3) / 1e12, 2)
                print(f"D{D_}", tag, label, ms, file=sys.stderr, flush=True)
            o, lse = jax.jit(
                lambda q, k, v: _fwd_pallas(q, k, v, scale, None, None,
                                            True, False)
            )(q, k, v)
            do = jnp.asarray(rng.normal(size=(B, H, NN, D_)) * 0.1, dtype)
            ms = bench(
                lambda s, q, k, v, o, lse, do: _bwd_pallas(
                    q * s, k, v, o, lse, do, scale, None, None, True,
                    False),
                q, k, v, o, lse, do,
            )
            out[f"d{D_}_bwd_{tag}_auto_ms"] = ms
            out[f"d{D_}_bwd_{tag}_auto_tflops"] = round(
                2.5 * flops / (ms / 1e3) / 1e12, 2)
            print(f"D{D_} bwd", tag, ms, file=sys.stderr, flush=True)
    return out


if __name__ == "__main__":
    main()
