#!/bin/bash
# Round-4 session-4 hardware batch #3 — the weight-only int8 rows
# (ku/nn/quant.py landed after tpu_r4e.sh started): the params term
# dominates the big-conf step at T=2048 (1.75 GB weights vs 0.55-1.07 GB
# cache), so w8 should approach 1.45x dense and w8kv8 ~1.9x when both
# terms halve. Toy rows sanity-check the small regime.
#   bash benchmarks/tpu_r4f.sh 2>&1 | tee -a benchmarks/results/tpu_r4f.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

for row in "2048 w8 big" "2048 w8kv8 big" "8192 w8 big" "8192 w8kv8 big" \
           "512 w8 toy" "8192 w8kv8 toy" "2048 int8_xla big"; do
  echo "== decode $row =="
  timeout 3600 python benchmarks/decode_bench.py $row \
    || echo "ROW FAILED: $row"
done
echo "== paged kernel micro: v2 vs v3 vs dense (big-conf shapes) =="
timeout 3600 python benchmarks/paged_kernel_micro.py 8192 128 bfloat16 256 \
  || echo "ROW FAILED: paged micro"
echo "== paged kernel micro at pg=128 (finer pages = worse DMA issue ratio) =="
timeout 2400 python benchmarks/paged_kernel_micro.py 8192 128 bfloat16 128 \
  || echo "ROW FAILED: paged micro 128"
echo "== int8 weight quality (hardware confirm) =="
timeout 3600 python benchmarks/int8_kv_quality.py 512 2048 w8 w8kv8 \
  || echo "ROW FAILED: w8 quality"
echo "== DONE r4f =="
