"""Flash-forward cost decomposition probe (diagnostic, NOT semantics).

The D=128 forward runs at ~16 TFLOP/s while D=256 reaches ~27 — and
f32 ≈ bf16 at D=128, so the matmuls are not the bound. This probe times
STRIPPED variants of the forward kernel at the same grid/blocks to
attribute the per-score-element cost:

- ``full``     — the real kernel math (matmul + mask-elided softmax
                 update + PV matmul).
- ``noexp``    — exp replaced by identity (isolates transcendental cost).
- ``nosoftmax``— QK + PV matmuls and accumulator only (no max/exp/sum):
                 the MXU + traffic floor of this blocking.

Outputs are WRONG for every variant except ``full`` — this is a
microarchitecture probe, never a compute path.

Round-3 result (one v5e, B4·H8·N8192 causal bf16, blocks 1024x512,
best-of-4): see BASELINE.md "flash attention round 3" — used to decide
whether a bf16-exp or fewer-pass softmax rewrite is worth pursuing.

NOTE (round-3 correction): the original run timed single dispatches and
its numbers were dominated by the ~25 ms axon-tunnel round trip (the
"D-independent 29.5 ms matmul floor" conclusion was an artifact). Timing
is now amortized (S chained calls/dispatch, slope reported) like
benchmarks/flash_amortized.py.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
            variant, block_q, block_k):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    start = kb * block_k
    q_start = pl.program_id(1) * block_q
    live = start <= q_start + block_q - 1  # causal block elision

    @pl.when(live)
    def _():
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if variant == "nosoftmax":
            acc_scr[:] = acc_scr[:] + jnp.dot(
                s.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32,
            )
            return
        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        if variant == "noexp":
            p = s - m_new          # identity in place of exp
            corr = m_prev - m_new  # and of the correction factor
        else:
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
        m_scr[:] = m_new
        l_scr[:] = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * corr + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )

    @pl.when(kb == num_kb - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def run_variant(q, k, v, scale, variant, block_q=1024, block_k=512, n=4):
    b, h, nn, d = q.shape
    qf = q.reshape(b * h, nn, d)
    kf = k.reshape(b * h, nn, d)
    vf = v.reshape(b * h, nn, d)
    grid = (b * h, nn // block_q, nn // block_k)

    call = pl.pallas_call(
        functools.partial(_kernel, scale=scale, variant=variant,
                          block_q=block_q, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, kb: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, kb: (bh, kb, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d),
                               lambda bh, qi, kb: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nn, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )

    # Amortized: S chained calls per dispatch — a single dispatch over the
    # axon tunnel pays a flat ~25 ms round trip that DOMINATED the original
    # round-3 numbers (the "29.5 ms D-independent matmul floor" was the
    # tunnel, see benchmarks/flash_amortized.py). Slope = true device time.
    def chained(steps):
        @jax.jit
        def f(salt, qf, kf, vf):
            def body(_, carry):
                salt, acc = carry
                s = jnp.sum(call(qf * (1 + salt * 1e-20), kf, vf)
                            .astype(jnp.float32))
                return (salt + s * 1e-30, acc + s)
            return jax.lax.fori_loop(0, steps, body,
                                     (salt, jnp.float32(0)))[1]
        return f

    def timed(f):
        _ = np.asarray(f(jnp.float32(1), qf, kf, vf))
        best = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(f(jnp.float32(1 + 1e-6 * (i + 1)), qf, kf, vf))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    s_hi = 8
    t1, th = timed(chained(1)), timed(chained(s_hi))
    return round((th - t1) / (s_hi - 1), 2)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    for d in (64, 128):
        B, H, NN = 4, 8, 8192
        q = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        for variant in ("full", "noexp", "nosoftmax"):
            ms = run_variant(q, k, v, 1.0 / np.sqrt(d), variant)
            out[f"d{d}_{variant}_ms"] = ms
            print(f"d{d} {variant} {ms} ms", file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
