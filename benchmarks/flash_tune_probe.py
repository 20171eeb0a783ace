"""Flash forward tuning probe — EXACT-output variants, amortized timing.

The corrected cost split (flash_vpu_probe.py, amortized): at D=128 the
9.95 ms forward is ~5.0 ms matmul+scale+cast floor + ~4.5 ms softmax
reductions/updates + ~0.5 ms exp — and the full time is the SUM of the
parts, i.e. MXU and VPU phases are serialized within each grid step.

Variants (all compute the exact same attention output, unlike
flash_vpu_probe's stripped kernels):

- ``base``    — the production kernel math.
- ``qscale``  — scale folded into the q block before the QK matmul
                (a (bq,d) pass replaces the (bq,bk) f32 slab scale pass).
- ``subk<n>`` — the fetched K/V block is processed in n unrolled
                sub-blocks; the online-softmax chain serializes on
                m/l/acc but sub-block i+1's QK matmul is independent of
                sub-block i's softmax, so Mosaic's scheduler can overlap
                MXU and VPU phases (upstream jax flash's
                block_k / block_k_major split).
- ``qscale_subk<n>`` — both.

Prints per-variant amortized ms and the |sum - base_sum| drift as a
cheap exactness check (qscale rounds q·scale once in bf16 — same order
as the bf16 matmul rounding itself).
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


def _kernel_t(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
              block_q, block_k):
    """Transposed-slab variant: scores live as (block_k, block_q) so the
    softmax max/sum are SUBLANE reductions (cheap) instead of cross-lane
    reduction trees over the 512-wide minor axis; the accumulator stays
    transposed (dv, block_q) so the correction broadcast is also
    sublane-wise; one (dv, bq) -> (bq, dv) transpose per q block at the
    last grid step."""
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    start = kb * block_k
    q_start = pl.program_id(1) * block_q
    live = start <= q_start + block_q - 1

    @pl.when(live)
    def _():
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        s = jax.lax.dot_general(
            k_blk, q, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BLOCK_K, BLOCK_Q) f32

        def tri(s):
            k_idx = start + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 0)
            q_idx = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, block_q), 1)
            return jnp.where(k_idx <= q_idx, s, _NEG_INF)
        s = jax.lax.cond(start + block_k - 1 > q_start, tri, lambda s: s, s)

        m_prev = m_scr[:]
        l_prev = l_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=0, keepdims=True))
        p = jnp.exp(s - m_new)          # (BLOCK_K, BLOCK_Q)
        corr = jnp.exp(m_prev - m_new)  # (1, BLOCK_Q)
        m_scr[:] = m_new
        l_scr[:] = l_prev * corr + jnp.sum(p, axis=0, keepdims=True)
        # acc stays (dv, BLOCK_Q): PV computed transposed as v^T p.
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            v_blk, p.astype(v_blk.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(kb == num_kb - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale,
            qscale, n_sub, block_q, block_k):
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
        if qscale:
            q = q * jnp.asarray(scale, q.dtype)
        sub = block_k // n_sub
        for i in range(n_sub):
            k_blk = k_ref[0, i * sub:(i + 1) * sub, :]
            v_blk = v_ref[0, i * sub:(i + 1) * sub, :]
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if not qscale:
                s = s * scale
            # causal triangle on diagonal-crossing sub-blocks only
            s_start = start + i * sub
            if True:
                def tri(s):
                    q_idx = q_start + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, sub), 0)
                    k_idx = s_start + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, sub), 1)
                    return jnp.where(k_idx <= q_idx, s, _NEG_INF)
                s = jax.lax.cond(s_start + sub - 1 > q_start, tri,
                                 lambda s: s, s)
            m_prev = m_scr[:]
            l_prev = l_scr[:]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            m_scr[:] = m_new
            l_scr[:] = l_prev * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_scr[:] = acc_scr[:] * corr + jnp.dot(
                p.astype(v_blk.dtype), v_blk,
                preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def build(q, k, v, scale, qscale, n_sub, block_q=1024, block_k=512,
          transposed=False):
    b, h, nn, d = q.shape
    grid = (b * h, nn // block_q, nn // block_k)
    if transposed:
        kern = functools.partial(_kernel_t, scale=scale, block_q=block_q,
                                 block_k=block_k)
        scratch = [
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((1, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ]
    else:
        kern = functools.partial(_kernel, scale=scale, qscale=qscale,
                                 n_sub=n_sub, block_q=block_q,
                                 block_k=block_k)
        scratch = [
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    return pl.pallas_call(
        kern,
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
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )


def run(call, qf, kf, vf, n=4, s_hi=8):
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
        vals = []
        _ = np.asarray(f(jnp.float32(1), qf, kf, vf))
        best = float("inf")
        for i in range(n):
            t0 = time.perf_counter()
            vals.append(np.asarray(f(jnp.float32(1), qf, kf, vf)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3, float(vals[0])

    t1, val = timed(chained(1))
    th, _ = timed(chained(s_hi))
    return round((th - t1) / (s_hi - 1), 2), val


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    out = {}
    for d in (64, 128, 256):
        B, H, NN = 4, 8, 8192
        q = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, H, NN, d)) * 0.1, jnp.bfloat16)
        qf = q.reshape(B * H, NN, d)
        kf = k.reshape(B * H, NN, d)
        vf = v.reshape(B * H, NN, d)
        scale = 1.0 / np.sqrt(d)
        base_val = None
        configs = [("subk1", dict(qscale=False, n_sub=1)),
                   ("transposed", dict(qscale=False, n_sub=1,
                                       transposed=True)),
                   ("transposed_bk1024", dict(qscale=False, n_sub=1,
                                              transposed=True,
                                              block_k=1024)),
                   ("transposed_bq512_bk1024", dict(qscale=False, n_sub=1,
                                                    transposed=True,
                                                    block_q=512,
                                                    block_k=1024))]
        if os.environ.get("KU_TUNE_ALL"):
            configs += [(f"{'qscale_' if qs else ''}subk{ns}",
                         dict(qscale=qs, n_sub=ns))
                        for qs in (False, True) for ns in (1, 2, 4)
                        if not (not qs and ns == 1)]
        for cfg_name, kw in configs:
            name = f"d{d}_{cfg_name}"
            call = build(q, k, v, scale, **kw)
            try:
                ms, val = run(call, qf, kf, vf)
            except Exception as e:
                print(f"{name} FAILED: {e}"[:300], file=sys.stderr,
                      flush=True)
                continue
            if base_val is None:
                base_val = val
            drift = abs(val - base_val) / max(abs(base_val), 1e-9)
            out[f"{name}_ms"] = ms
            print(f"{name}: {ms} ms  (rel drift vs base {drift:.2e})",
                  file=sys.stderr, flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
