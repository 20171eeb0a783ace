#!/bin/bash
# One-shot TPU measurement batch for the round-3 serving stack.
# Run from the repo root when the axon tunnel is up:
#   bash benchmarks/tpu_serving_suite.sh 2>&1 | tee /tmp/tpu_serving.log
# Covers: the real-TPU regression lane, the decode benches
# (dense / ring / prefill / int8, short + long context), and bench.py.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== devices =="
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

echo "== tests_tpu =="
timeout 3600 python -m pytest tests_tpu/ -q

echo "== decode dense T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512
echo "== decode ring T=512 (window 512 + 32 sinks) =="
timeout 1800 python benchmarks/decode_bench.py 512 ring
echo "== prefill T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512 prefill
echo "== prefill_flash T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512 prefill_flash
echo "== decode dense T=8192 (cache-read-bound regime) =="
timeout 2400 python benchmarks/decode_bench.py 8192
echo "== decode int8 T=8192 =="
timeout 2400 python benchmarks/decode_bench.py 8192 int8
echo "== decode ring T=8192 (constant 544-slot cache) =="
timeout 2400 python benchmarks/decode_bench.py 8192 ring
echo "== decode paged T=8192 (page-scan read A/B vs dense) =="
timeout 2400 python benchmarks/decode_bench.py 8192 paged
echo "== decode paged T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512 paged

echo "== decode BIG (0.9B bf16) dense T=2048 — HBM roofline =="
timeout 3600 python benchmarks/decode_bench.py 2048 dense big
echo "== decode BIG int8 T=2048 (A/B: cache term halves) =="
timeout 3600 python benchmarks/decode_bench.py 2048 int8 big
echo "== decode BIG dense T=8192 (cache >> params regime) =="
timeout 3600 python benchmarks/decode_bench.py 8192 dense big
echo "== decode BIG int8 T=8192 =="
timeout 3600 python benchmarks/decode_bench.py 8192 int8 big
echo "== decode BIG paged T=8192 =="
timeout 3600 python benchmarks/decode_bench.py 8192 paged big

echo "== speculative decoding: real d32 draft vs dense =="
timeout 3600 python benchmarks/spec_decode_bench.py 256 8

echo "== ContinuousBatcher vs raw loop (big conf, chunk sweep + adaptive) =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128

echo "== int8 KV quality (logprob/ppl delta, T=512/2048) =="
timeout 3600 python benchmarks/int8_kv_quality.py 512 2048

echo "== bench.py (driver gate) =="
timeout 3600 python bench.py
echo "== DONE =="
