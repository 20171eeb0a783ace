#!/bin/bash
# Round-5 hardware batch — the VERDICT r4 measurement queue, ordered by
# value per minute of tunnel uptime. Every section is independently
# timeout-bounded and failure-labeled; batcher_bench additionally
# resumes from its checkpoint if the tunnel flaps mid-sweep.
#   bash benchmarks/tpu_r5b.sh 2>&1 | tee -a benchmarks/results/tpu_r5b.log
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.jax_cache}"

echo "== devices =="
timeout 600 python -c "import jax; print(jax.devices())" || exit 1

# VERDICT item 2: the paged big-T regression A/B — v2 (current module
# default) / v3 / v4 / v4-fragmented vs the dense kernel at the big-conf
# attention shapes, with the fixed (negative-slope-guarded) harness.
echo "== paged kernel micro A/B (S=8192 D=128 bf16 pg=256) =="
timeout 2400 python benchmarks/paged_kernel_micro.py 8192 128 bfloat16 256 \
  || echo "ROW FAILED: paged micro"

# VERDICT item 8: big-conf ring (StreamingLLM) row — constant 544-slot
# cache vs dense's 8192 slots at the conf where memory pressure is real.
echo "== decode BIG ring T=8192 =="
timeout 2400 python benchmarks/decode_bench.py 8192 ring big \
  || echo "ROW FAILED: ring big"

# VERDICT item 3: W8A8 at the cache-dominated T, and the w8kv8 row that
# inverted (slower than w8) at T=2048 in r4.
echo "== decode BIG w8a8 T=8192 =="
timeout 2400 python benchmarks/decode_bench.py 8192 w8a8 big \
  || echo "ROW FAILED: w8a8 big 8192"
echo "== decode BIG w8a8kv8 T=8192 =="
timeout 2400 python benchmarks/decode_bench.py 8192 w8a8kv8 big \
  || echo "ROW FAILED: w8a8kv8 big 8192"
echo "== decode BIG w8kv8 T=8192 =="
timeout 2400 python benchmarks/decode_bench.py 8192 w8kv8 big \
  || echo "ROW FAILED: w8kv8 big 8192"
echo "== decode BIG paged T=8192 (regression reference, module default) =="
timeout 2400 python benchmarks/decode_bench.py 8192 paged big \
  || echo "ROW FAILED: paged big 8192"

# VERDICT item 3: where did 506->399 GB/s go — per-fusion profile of the
# quantized decode steps (convert cost made visible).
echo "== profile decode w8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py w8 big 2048 32 \
  || echo "ROW FAILED: profile w8 big"
echo "== profile decode w8a8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py w8a8 big 2048 32 \
  || echo "ROW FAILED: profile w8a8 big"
echo "== profile decode w8kv8 big T=2048 =="
timeout 2400 python benchmarks/profile_decode.py w8kv8 big 2048 32 \
  || echo "ROW FAILED: profile w8kv8 big"

# VERDICT item 4: the batcher sweep, fifth attempt — now checkpointed.
echo "== batcher chunk sweep BIG =="
timeout 5400 python benchmarks/batcher_bench.py big 256 8 32 128 \
  || echo "ROW FAILED: batcher big (resume: rerun this section)"

# VERDICT item 3: W8A8 quality on a TRAINED LM.
echo "== int8/w8a8 quality (trained LM, T=512/2048) =="
timeout 3600 python benchmarks/int8_kv_quality.py 512 2048 w8a8 w8a8kv8 \
  || echo "ROW FAILED: w8a8 quality"

# VERDICT item 5: speedup vs acceptance BELOW saturation (degraded-draft
# sweep), gamma=3/7, big conf.
echo "== spec decode BIG acceptance curve =="
timeout 7200 python benchmarks/spec_decode_bench.py 256 8 big curve \
  || echo "ROW FAILED: spec big curve"

echo "== DONE r5b =="
