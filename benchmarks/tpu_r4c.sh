#!/bin/bash
# Round-4 session-3 hardware batch: the rows that remained after the
# transposed-cache (kernel v3) surgery landed — spec-decode at the
# bandwidth-bound big conf, the ContinuousBatcher chunk sweep (flap
# casualty of the 2026-08-19 sweep), the prefill_flash retry (per-seq
# offset SMEM fix), the full tests_tpu lane on the new layout, and the
# driver gate.
#   bash benchmarks/tpu_r4c.sh 2>&1 | tee -a benchmarks/results/tpu_r4c.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== prefill_flash T=512 (retry post per-seq-offset SMEM fix) =="
timeout 2400 python benchmarks/decode_bench.py 512 prefill_flash \
  || echo "ROW FAILED: prefill_flash"
echo "== dense T=512 (kernel v3 record) =="
timeout 1800 python benchmarks/decode_bench.py 512 dense \
  || echo "ROW FAILED: dense 512"
echo "== dense_xla T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512 dense_xla \
  || echo "ROW FAILED: dense_xla 512"
echo "== paged T=512 =="
timeout 1800 python benchmarks/decode_bench.py 512 paged \
  || echo "ROW FAILED: paged 512"
echo "== paged_xla T=8192 (blocked page-scan A/B) =="
timeout 2400 python benchmarks/decode_bench.py 8192 paged_xla \
  || echo "ROW FAILED: paged_xla 8192"
echo "== dense BIG T=2048 (kernel v3) =="
timeout 3600 python benchmarks/decode_bench.py 2048 dense big \
  || echo "ROW FAILED: dense big 2048"
echo "== spec decode BIG (0.87B target, d512 draft) =="
timeout 5400 python benchmarks/spec_decode_bench.py 256 8 big \
  || echo "ROW FAILED: spec big"
echo "== batcher chunk sweep BIG =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big"
echo "== tests_tpu (full lane on the transposed layout) =="
timeout 3600 python -m pytest tests_tpu/ -q
echo "== bench.py (driver gate) =="
timeout 3600 python bench.py
echo "== DONE r4c =="
