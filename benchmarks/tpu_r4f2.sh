#!/bin/bash
# Round-4 session-5 hardware batch #2 — reprioritized remainder of
# tpu_r4f.sh after its w8kv8 T=2048 row hung on a tunnel stall (23 s of
# CPU in 25 min; compile cache written at 10:16 then silence). Order by
# value-per-minute: the paged-kernel micro A/B first (now including the
# v4 fused-slab contiguity kernel — the open big-T paged regression),
# then the w8/w8kv8 rows, then the r4e casualties.
#   bash benchmarks/tpu_r4f2.sh 2>&1 | tee -a benchmarks/results/tpu_r4f2.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== paged kernel micro v2/v3/v4/frag vs dense (big-conf shapes, pg=256) =="
timeout 2700 python benchmarks/paged_kernel_micro.py 8192 128 bfloat16 256 \
  || echo "ROW FAILED: paged micro"
echo "== decode 2048 w8kv8 big (retry) =="
timeout 1800 python benchmarks/decode_bench.py 2048 w8kv8 big \
  || echo "ROW FAILED: 2048 w8kv8 big"
echo "== decode 8192 w8kv8 big (steady) =="
timeout 1800 python benchmarks/decode_bench.py 8192 w8kv8 big \
  || echo "ROW FAILED: 8192 w8kv8 big"
echo "== decode 8192 w8 big (steady) =="
timeout 1800 python benchmarks/decode_bench.py 8192 w8 big \
  || echo "ROW FAILED: 8192 w8 big"
echo "== spec decode BIG (self-healing draft lr) =="
timeout 3600 python benchmarks/spec_decode_bench.py 256 8 big \
  || echo "ROW FAILED: spec big"
echo "== batcher chunk sweep BIG (retry) =="
timeout 3600 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big"
echo "== profile decode int8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py int8 big 2048 32 \
  || echo "ROW FAILED: profile int8 big"
echo "== int8 weight quality (hardware confirm) =="
timeout 3600 python benchmarks/int8_kv_quality.py 512 2048 w8 w8kv8 \
  || echo "ROW FAILED: w8 quality"
echo "== DONE r4f2 =="
