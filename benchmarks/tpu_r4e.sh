#!/bin/bash
# Round-4 session-4 hardware batch #2 — after tpu_r4d.sh:
#   - the big-conf T=8192 rows that crashed the tunnel's TPU worker on
#     2026-08-20 (single ~57 s scan dispatch tripped the program
#     deadline) — now STEADY-STATE: prefill to T-1024, time 1024 steps
#     at ~full cache. Full kernel-vs-XLA A/B at the cache-dominant size
#     (int8 should approach 2x dense here; paged kernel v2's first
#     8192 row).
#   - toy T=8192 steady A/Bs (the auto-rule record at full fill).
#   - spec-decode big retry (target now trains under adafactor — adam's
#     two f32 moment trees OOMed the 16 GB HBM).
#   - decode profile of the int8 big-conf slowdown (int8 lost to dense
#     at T=2048: 1,168 vs 1,434 tok/s — dequant/cast cost, where?).
#   bash benchmarks/tpu_r4e.sh 2>&1 | tee -a benchmarks/results/tpu_r4e.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

for mode in dense dense_xla int8 int8_xla paged paged_xla; do
  echo "== decode big 8192 $mode (steady) =="
  timeout 3600 python benchmarks/decode_bench.py 8192 "$mode" big \
    || echo "ROW FAILED: big 8192 $mode"
done
for mode in dense dense_xla int8 int8_xla paged paged_xla; do
  echo "== decode toy 8192 $mode (steady) =="
  timeout 2400 python benchmarks/decode_bench.py 8192 "$mode" toy \
    || echo "ROW FAILED: toy 8192 $mode"
done
echo "== tests_tpu paged-kernel fixes (aligned pages + XLA fallback) =="
timeout 3600 python -m pytest tests_tpu/test_tpu_regression.py -q \
  -k "flash_decode_kernel_compiled or paged_serving" \
  || echo "ROW FAILED: tests_tpu paged fixes"
echo "== spec decode BIG (adafactor target) =="
timeout 7200 python benchmarks/spec_decode_bench.py 256 8 big \
  || echo "ROW FAILED: spec big"
echo "== profile decode int8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py int8 big 2048 32 \
  || echo "ROW FAILED: profile int8 big"
echo "== profile decode dense big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py dense big 2048 32 \
  || echo "ROW FAILED: profile dense big"
echo "== batcher chunk sweep BIG (retry — r4d flap casualty) =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big"
echo "== DONE r4e =="
