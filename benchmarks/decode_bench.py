"""Autoregressive serving micro-bench: KV-cache decode tokens/sec.

A small transformer LM stack (2 blocks, d_model 512, 8 query heads, GQA
2 KV heads) decodes T tokens with the MultiHeadAttention KV cache. The
WHOLE decode loop runs as ONE dispatch (lax.scan with the functional
cache dict as carry), so the ~25-30 ms axon-tunnel round trip amortizes
across T steps (BASELINE.md methodology); scalar-readback fencing.

Usage: python benchmarks/decode_bench.py [T] [ring|prefill|paged|...] [toy|big]

Confs: ``toy`` (2 blocks × d_model 512, ~8M params — the fast gate; NB
launch/HBM-latency-bound, it cannot see bandwidth regressions) and
``big`` (16 blocks × d_model 2048, GQA 16/4, bf16, ~0.9B params — a
real serving size whose decode step IS bandwidth-bound). For big confs
the record adds the ROOFLINE: every decode step must read all weights
plus the whole allocated KV page per layer (the dense masked read), so
model_bytes_per_step = params + cache and
``achieved_gbps = model_bytes_per_step × T / elapsed`` is compared to
the v5e's ~819 GB/s HBM peak (``hbm_frac``). int8 halves the cache
term; at T where cache >> params the A/B should approach 2×.

``ring``    — StreamingLLM serving: window 512 + 32 sinks ring cache.
``paged``   — page-pool KV cache (page 256, identity tables): A/B of
              the flash-decoding-style page-scan read vs the dense
              contiguous read at the same T.
``prefill`` — one-dispatch prompt prefill of T tokens (chunked cache
              fill) instead of T per-token steps; reports prompt
              tokens/sec (S=16 chained prompt passes per dispatch).
``prefill_flash`` — same, through the streaming flash kernel (traced
              q_offset over the cache page) instead of the dense einsum.
``int8``    — dense cache quantized to int8 (kv_cache_dtype): halves the
              per-step cache read; run at large T where the decode step
              is cache-read-bound.
``ragged``  — MIXED-LENGTH batch (the serving norm): rows prefilled to
              a 1/8..8/8 spread of (T - 256), then 256 decode steps. The
              flash-decoding kernel reads each row's live prefix only
              (clamped index_map); the XLA einsum always reads all
              allocated slots — this row measures that structural win
              at mean fill ~0.5. hbm_frac is reported on FULL-cache
              bytes, so the kernel can legitimately exceed the dense
              full-batch fraction here.

Any mode takes an ``_xla`` suffix (e.g. ``dense_xla``) to force the XLA
per-token read paths instead of the flash-decoding Pallas kernel.

At T > 2048, non-ring decode modes run STEADY-STATE: rows prefill to
T-1024 and 1024 decode steps are timed at ~full cache (see the inline
comment in ``run`` — the T-step single-dispatch scan both tripped the
tunnel's program deadline at the big conf and under-read the cache from
an empty start).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

if os.environ.get("KU_BENCH_CPU"):
    # Validation runs: the env var JAX_PLATFORMS alone is ignored when
    # the axon plugin is on PYTHONPATH — the config update is required.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ku.nn import Transformer

D_MODEL, HEADS, KV_HEADS, BLOCKS, BATCH = 512, 8, 2, 2, 8

# Each ku Transformer block holds TWO attention sublayers (reference
# transformer.py parity), so "blocks" here = 2× that many KV caches.
CONFS = {
    "toy": dict(d_model=512, heads=8, kv_heads=2, blocks=2, batch=8,
                dtype="float32"),
    # ~0.87B params (per block ≈ 12·d² + 4·d²/(heads/kv) with the double
    # attention + 4× MLP), bf16 → ~1.75 GB weights; at T=8192 the 32 KV
    # caches hold 4.3 GB — decode is genuinely HBM-read-bound.
    "big": dict(d_model=2048, heads=16, kv_heads=4, blocks=16, batch=8,
                dtype="bfloat16"),
}

HBM_PEAK_GBPS = 819.0  # TPU v5e


def build(max_len, conf, window=None, global_prefix=0,
          kv_cache_dtype=None, use_flash=False, kv_page_size=None,
          flash_decode=None, quant_weights=False):
    import flax.linen as nn

    class LM(nn.Module):
        @nn.compact
        def __call__(self, x, decode: bool = False, prompt_lengths=None):
            for i in range(conf["blocks"]):
                x = Transformer(conf["heads"], conf["d_model"], 0.0,
                                causal=True,
                                num_kv_head=conf["kv_heads"],
                                max_decode_len=max_len,
                                window=window, global_prefix=global_prefix,
                                kv_cache_dtype=kv_cache_dtype,
                                use_flash=use_flash,
                                kv_page_size=kv_page_size,
                                flash_decode=flash_decode,
                                quant_weights=quant_weights,
                                name=f"block{i}")([x], decode=decode,
                                                  prompt_lengths=prompt_lengths)
            return x

    return LM()


def main():
    t_tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    # "ring": StreamingLLM serving — sliding window 512 + 32 sinks; the
    # KV cache is a 544-slot ring buffer PER LAYER regardless of
    # t_tokens (unbounded decode at constant memory), vs the dense
    # cache's t_tokens slots.
    mode = sys.argv[2] if len(sys.argv) > 2 else "dense"
    conf = sys.argv[3] if len(sys.argv) > 3 else "toy"
    print(f"devices: {jax.devices()}", file=sys.stderr)
    print(json.dumps(run(t_tokens, mode, conf)))


def run(t_tokens: int, mode: str = "dense", conf: str = "toy") -> dict:
    """Measure one decode/prefill configuration; returns the record dict
    (importable — bench.py's serving gate reuses this)."""
    # "_xla" suffix: force the XLA per-token decode paths instead of the
    # flash-decoding Pallas kernel (the kernel auto-selects on TPU) —
    # the kernel-vs-XLA A/B at identical shapes.
    flash_decode = False if mode.endswith("_xla") else None
    mode = mode.removesuffix("_xla")
    ring = mode == "ring"
    c = CONFS[conf]
    batch, d_model = c["batch"], c["d_model"]
    dtype = jnp.dtype(c["dtype"])
    rng = np.random.default_rng(0)
    # "paged": dense-layout A/B for the page-pool cache (page 256,
    # identity tables) — measures the flash-decoding-style page-scan
    # read against the contiguous dense read at the same T.
    # ragged also prefills with flash (q_offset streaming) ON TPU: its
    # mixed-length prompts at large T would otherwise materialize an
    # O(L·S) masked score tensor in the one-shot prefill (HTTP 500 /
    # compiler OOM at T=8192). Decode steps are unaffected by use_flash.
    # (CPU validation keeps the einsum prefill — interpret-mode flash
    # over a whole prompt takes tens of minutes.)
    on_tpu = jax.default_backend() == "tpu"
    # STEADY-STATE rule (T > 2048, non-ring decode modes): prefill every
    # row to T-1024 and time 1024 decode steps at ~full cache. Two
    # reasons, both measured on 2026-08-20: (a) a T-step scan at the big
    # conf is a single ~57 s device program, which crashed the tunnel's
    # TPU worker ("kernel fault" = the RPC deadline, not the kernel —
    # ragged's 256-step scan at the same shapes ran fine); (b) from an
    # empty cache the flash-decoding kernel reads only the written
    # prefix (mean fill 1/2), so the roofline row under-read the cache
    # it claims to measure. T <= 2048 keeps the historical
    # empty-cache-full-scan semantics (bench.py gate stability).
    steady = (t_tokens > 2048 and not ring
              and not mode.startswith("prefill") and mode != "ragged")
    # "w8" = weight-only int8 (ku/nn/quant.py): int8 projections/FFN
    # kernels + f32 column scales — halves the params term of the
    # per-step HBM read. "w8kv8" composes it with the int8 KV cache.
    # "w8a8" = W8A8 dynamic (int8 activations too — int8 MXU matmuls,
    # no weight convert on the hot path; lossy, quality-gated).
    known = {"dense", "int8", "ring", "paged", "ragged", "prefill",
             "prefill_flash", "w8", "w8kv8", "w8a8", "w8a8kv8"}
    if mode not in known:
        raise ValueError(f"unknown decode_bench mode {mode!r}; "
                         f"known: {sorted(known)} (+ optional _xla suffix)")
    wq = {"w8": True, "w8kv8": True,
          "w8a8": "w8a8", "w8a8kv8": "w8a8"}.get(mode, False)
    model = build(t_tokens, c, window=512 if ring else None,
                  global_prefix=32 if ring else 0,
                  kv_cache_dtype=("int8"
                                  if mode in ("int8", "w8kv8", "w8a8kv8")
                                  else None),
                  use_flash=(mode == "prefill_flash"
                             or ((mode == "ragged" or steady) and on_tpu)),
                  kv_page_size=256 if mode == "paged" else None,
                  flash_decode=flash_decode, quant_weights=wq)
    x0 = jnp.asarray(rng.normal(size=(batch, 1, d_model)), dtype)
    # MEMORY HYGIENE (the big conf at T=8192 OOMed the 16 GB v5e): init
    # WITHOUT decode so no f32 cache is ever allocated (init params are
    # f32, so its cache pages would be too — 8.6 GB at the big conf),
    # free the f32 params as soon as they are cast, and build the cache
    # template from ONE decode apply under the cast params, freeing the
    # throwaway-written copy after the reset. Peak live set: cast params
    # + 2× cache instead of f32 params + f32 cache + cast params +
    # 2× cache.
    variables = model.init(jax.random.key(0), x0, decode=False)
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        variables["params"])
    if wq:
        # params above is the quant TEMPLATE (int8 zeros + unit scales);
        # quantize a float model's random weights into it so the timed
        # matmuls see realistic operands. The cast above left int8
        # leaves and f32 scales alone; copied-through leaves (biases,
        # LayerNorm) arrive in the serve dtype from the float cast.
        from ku.nn import quantize_weights

        fmodel = build(t_tokens, c, flash_decode=flash_decode)
        fvars = fmodel.init(jax.random.key(0), x0, decode=False)
        fparams = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            fvars["params"])
        del fvars
        params = quantize_weights(fparams, params)
        del fparams
    del variables
    # Allocate the cache in the compute dtype, then zero ONLY the data
    # leaves the throwaway token wrote: a blanket zeros_like would also
    # destroy structural defaults — the identity page_table (every row
    # would alias page 0) and the ring cache_pos whose empty value is -1
    # (every slot would read as occupied-at-position-0).
    _, mut = model.apply({"params": params}, x0, decode=True,
                         mutable=["cache"])

    def reset_leaf(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name == "page_table":
            return leaf
        if name == "cache_pos":
            return jnp.full_like(leaf, -1)
        return jnp.zeros_like(leaf)  # K/V data, scales, cache_index

    cache0 = jax.tree_util.tree_map_with_path(reset_leaf, mut["cache"])
    del mut

    ragged = mode == "ragged"
    decode_steps = t_tokens
    mean_fill = 1.0
    if steady:
        decode_steps = 1024
        fill0 = t_tokens - decode_steps
        xp = jnp.asarray(rng.normal(size=(batch, fill0, d_model)), dtype)
        _, mut = model.apply({"params": params, "cache": cache0}, xp,
                             decode=True, mutable=["cache"],
                             prompt_lengths=jnp.full((batch,), fill0,
                                                     jnp.int32))
        cache0 = mut["cache"]
        del mut, xp
        mean_fill = float((fill0 + decode_steps / 2) / t_tokens)
    if ragged:
        # Prefill rows to a 1/8..8/8 spread of the cache (the serving
        # norm: admissions at different progress), then time 256 decode
        # steps on the mixed-length batch.
        decode_steps = 256
        fracs = (np.arange(batch) % 8 + 1) / 8.0
        lengths = np.maximum(
            1, ((t_tokens - decode_steps) * fracs)).astype(np.int32)
        xp = jnp.asarray(
            rng.normal(size=(batch, int(lengths.max()), d_model)), dtype)
        _, mut = model.apply({"params": params, "cache": cache0}, xp,
                             decode=True, mutable=["cache"],
                             prompt_lengths=jnp.asarray(lengths))
        cache0 = mut["cache"]
        del mut, xp
        mean_fill = float(
            (lengths.mean() + decode_steps / 2) / t_tokens)

    if mode.startswith("prefill"):
        S = 16
        xp = jnp.asarray(rng.normal(size=(batch, t_tokens, d_model)),
                         dtype)

        @jax.jit
        def prefill_chain(params, cache0, xp, salt):
            def step(x, _):
                y, _ = model.apply({"params": params, "cache": cache0},
                                   x, decode=True, mutable=["cache"])
                # astype: the f32 salt would promote a bf16 carry.
                return (y * (1 + salt * 1e-30)).astype(y.dtype), jnp.sum(y)

            _, sums = jax.lax.scan(step, xp, None, length=S)
            return jnp.sum(sums)

        _ = np.asarray(prefill_chain(params, cache0, xp, jnp.float32(0)))
        best = float("inf")
        for i in range(4):
            t0 = time.perf_counter()
            # i+1: a salt of 0 would duplicate the warmup dispatch and
            # the tunnel may dedupe identical dispatches (CLAUDE.md).
            _ = np.asarray(prefill_chain(params, cache0, xp,
                                         jnp.float32(1e-6 * (i + 1))))
            best = min(best, time.perf_counter() - t0)
        return {
            "prefill_tokens_per_sec": round(batch * t_tokens * S / best, 1),
            "ms_per_prompt": round(best * 1e3 / S, 4), "mode": mode,
            "batch": batch, "t": t_tokens, "d_model": d_model,
            "heads": c["heads"], "kv_heads": c["kv_heads"],
            "blocks": c["blocks"], "conf": conf,
        }

    @jax.jit
    def decode_chain(params, cache0, x0, salt):
        def step(carry, _):
            x, cache = carry
            y, mut = model.apply({"params": params, "cache": cache}, x,
                                 decode=True, mutable=["cache"])
            # Feed the output back (greedy-decode shape without a vocab);
            # astype: the f32 salt would promote a bf16 carry.
            return ((y * (1 + salt * 1e-30)).astype(y.dtype),
                    mut["cache"]), jnp.sum(y)

        (_, _), sums = jax.lax.scan(step, (x0, cache0), None,
                                    length=decode_steps)
        return jnp.sum(sums)

    _ = np.asarray(decode_chain(params, cache0, x0, jnp.float32(0)))  # compile
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        _ = np.asarray(decode_chain(params, cache0, x0,
                                    jnp.float32(1e-6 * (i + 1))))
        best = min(best, time.perf_counter() - t0)
    toks = batch * decode_steps
    out = {
        "decode_tokens_per_sec": round(toks / best, 1),
        "ms_per_token_batch": round(best * 1e3 / decode_steps, 4),
        "batch": batch, "t": t_tokens, "d_model": d_model,
        "heads": c["heads"], "kv_heads": c["kv_heads"],
        "blocks": c["blocks"], "conf": conf,
    }
    # HBM roofline (dense/int8/paged full-page reads; a ring cache reads
    # its fixed window instead — the same leaf-size accounting covers it
    # since its pages ARE window-sized): each decode step reads every
    # weight once plus every allocated KV page (the masked dense read
    # touches the whole page; int8 leaf sizes halve the cache term
    # automatically, and its f32 scales are counted too).
    param_bytes = sum(a.nbytes for a in jax.tree.leaves(params))
    cache_bytes = sum(a.nbytes for a in jax.tree.leaves(cache0))
    step_bytes = param_bytes + cache_bytes
    achieved = step_bytes * decode_steps / best / 1e9
    out.update(
        params_gb=round(param_bytes / 1e9, 3),
        kv_cache_gb=round(cache_bytes / 1e9, 3),
        model_read_gb_per_step=round(step_bytes / 1e9, 3),
        achieved_gbps=round(achieved, 1),
        hbm_frac=round(achieved / HBM_PEAK_GBPS, 3),
    )
    if ring:
        out["cache_slots_per_layer"] = 512 + 32
    if ragged or steady:
        out["mean_fill"] = round(mean_fill, 3)
        out["decode_steps"] = decode_steps
    if steady:
        out["steady_state"] = True
    if mode != "dense":
        out["mode"] = mode
    # Resolved per-token read path (mirrors MultiHeadAttention's auto
    # rule: on TPU, kernel for paged pools and caches >= 1024 slots;
    # ring always XLA).
    out["flash_decode"] = bool(
        (flash_decode if flash_decode is not None
         else jax.default_backend() == "tpu"
         and (mode == "paged" or t_tokens >= 1024)) and not ring)
    return out


if __name__ == "__main__":
    main()
