#!/bin/bash
# Serial (ONE process at a time) round-4 decode measurement queue:
# every row via the NEW flash-decoding Pallas kernel (auto on TPU)
# plus *_xla A/B rows through the old XLA per-token paths. The prior
# sweep's rerun numbers were contention-contaminated (two concurrent
# reruns on the one chip) — this is the clean record.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"
for row in \
  "512 dense toy" "512 dense_xla toy" \
  "512 int8 toy" "512 int8_xla toy" \
  "512 paged toy" "512 paged_xla toy" \
  "8192 dense toy" "8192 dense_xla toy" \
  "8192 int8 toy" "8192 int8_xla toy" \
  "8192 paged toy" "8192 paged_xla toy" \
  "512 prefill_flash toy" \
  "2048 dense big" "2048 dense_xla big" \
  "2048 int8 big" "2048 int8_xla big" \
  "2048 paged big" \
  "8192 dense big" "8192 int8 big" "8192 paged big" \
  ; do
  echo "== decode $row =="
  timeout 3600 python benchmarks/decode_bench.py $row || echo "ROW FAILED: $row"
done
echo "== DONE serial decode =="
