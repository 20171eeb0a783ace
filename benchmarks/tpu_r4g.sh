#!/bin/bash
# Round-4 session-5 hardware batch #1 — the r4e casualties (that batch
# died after its spec rows: the profile + batcher sections never ran)
# plus the spec-decode big retry with the re-tuned draft lr (the r4e
# draft diverged at adam 3e-3 — d512 needs 1e-3-class steps; rows with
# a random draft measure only the free bonus token).
#   bash benchmarks/tpu_r4g.sh 2>&1 | tee -a benchmarks/results/tpu_r4g.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== profile decode int8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py int8 big 2048 32 \
  || echo "ROW FAILED: profile int8 big"
echo "== profile decode dense big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py dense big 2048 32 \
  || echo "ROW FAILED: profile dense big"
echo "== batcher chunk sweep BIG (retry — r4d/r4e flap casualties) =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big"
echo "== spec decode BIG (draft lr fixed) =="
timeout 7200 python benchmarks/spec_decode_bench.py 256 8 big \
  || echo "ROW FAILED: spec big"
echo "== DONE r4g =="
