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

echo "== bench.py (driver gate) =="
timeout 3600 python bench.py
echo "== DONE =="
