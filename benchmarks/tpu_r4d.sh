#!/bin/bash
# Round-4 session-4 hardware batch: the rows the interrupted r4c run
# never reached — driver-gate bench.py on the kernel-v3 layout, the full
# tests_tpu lane (incl. the per-seq-offset prefill test that failed
# pre-fix on 08-19), and the ContinuousBatcher chunk sweep at the big
# conf. Ordered most-important-first in case the tunnel flaps.
#   bash benchmarks/tpu_r4d.sh 2>&1 | tee -a benchmarks/results/tpu_r4d.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== bench.py (driver gate, kernel v3) =="
timeout 3600 python bench.py || echo "ROW FAILED: bench.py"
echo "== tests_tpu (full lane on the transposed layout) =="
timeout 3600 python -m pytest tests_tpu/ -q || echo "ROW FAILED: tests_tpu"
echo "== batcher chunk sweep BIG =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big"
echo "== DONE r4d =="
