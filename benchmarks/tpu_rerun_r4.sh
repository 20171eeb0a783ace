#!/bin/bash
# Targeted re-run of the rows that failed or regressed in the round-4
# hardware sweep (benchmarks/results/tpu_suite_r4_20260819.log), after
# the fixes landed:
#   - per-seq offset SMEM BlockSpec (flash_attention.py per_seq_off)
#     -> test_flash_prefill_offsets_compiled + prefill_flash bench row
#   - scale-folded int8 KV reads (attention.py dense + paged decode)
#     -> int8 rows at every T/conf
#   - blocked page-scan read (attention.py page_step, 8 entries/step)
#     -> paged rows at T=8192
#   - decode_bench memory hygiene (no f32 init cache, eager del)
#     -> ALL big-conf T=8192 rows (OOMed before)
#   - batcher_bench (tunnel-flap casualty, never completed)
# Run from the repo root when the axon tunnel is up:
#   bash benchmarks/tpu_rerun_r4.sh 2>&1 | tee /tmp/tpu_rerun_r4.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== devices =="
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

echo "== tests_tpu: per-seq offset prefill (the round-4 Mosaic failure) =="
timeout 1800 python -m pytest tests_tpu/ -q -k "offsets or paged or serving"

echo "== decode int8 T=8192 (scale-folded read) =="
timeout 2400 python benchmarks/decode_bench.py 8192 int8
echo "== decode paged T=8192 (blocked page scan) =="
timeout 2400 python benchmarks/decode_bench.py 8192 paged
echo "== decode paged T=512 (blocked scan, short-T check) =="
timeout 1800 python benchmarks/decode_bench.py 512 paged
echo "== prefill_flash T=512 (per-seq offset fix) =="
timeout 1800 python benchmarks/decode_bench.py 512 prefill_flash

echo "== decode BIG int8 T=2048 (A/B vs dense 1284 tok/s) =="
timeout 3600 python benchmarks/decode_bench.py 2048 int8 big
echo "== decode BIG dense T=8192 (memory hygiene fix) =="
timeout 3600 python benchmarks/decode_bench.py 8192 dense big
echo "== decode BIG int8 T=8192 =="
timeout 3600 python benchmarks/decode_bench.py 8192 int8 big
echo "== decode BIG paged T=8192 =="
timeout 3600 python benchmarks/decode_bench.py 8192 paged big

echo "== ContinuousBatcher vs raw loop (big conf, chunk sweep + adaptive) =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128

echo "== bench.py (full driver gate, post-fix record) =="
timeout 3600 python bench.py
echo "== DONE =="
