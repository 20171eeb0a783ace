#!/bin/bash
# Round-4 session-2 hardware batch: the flash-decoding kernel A/B rows
# that the 2026-08-19 sweep left broken or unexplained, after the v2
# layout flip ((G, bt) scores; (…, 1, S) scale views).
#   bash benchmarks/tpu_decode_r4b.sh 2>&1 | tee -a benchmarks/results/serial_decode_r4b.log
# Each row is its own python process: a TPU-worker crash poisons only
# that row.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

row() {
  echo "== decode $1 $2 $3 =="
  timeout "${4:-2400}" python benchmarks/decode_bench.py "$1" "$2" "$3" \
    || echo "ROW FAILED: $1 $2 $3"
}

# -- toy: kernel-vs-XLA A/B where the v1 kernel lost or broke --
row 8192 int8 toy            # v1: 0.08x (scale DMA lane-padded)
row 8192 int8_xla toy
row 8192 paged toy           # v1: 0.14x — diagnose vs profile
row 512 int8 toy
row 8192 dense toy           # v1 kernel: 0.49x vs XLA 0.80x
row 8192 ragged toy          # NEW: mixed-length batch, kernel prefix reads
row 8192 ragged_xla toy
# -- big (0.9B bf16): the rows the sweep could not produce --
row 2048 int8 big 3600       # v1: Mosaic ValueError
row 2048 paged big 3600
row 8192 dense big 3600      # v1: bench-side OOM (hygiene fix landed)
row 8192 int8 big 3600
row 8192 paged big 3600
row 8192 ragged big 3600
echo "== DONE r4b =="
