"""Per-fusion device-time profile of the packed StyleGAN train step.

jax.profiler DOES capture device-side TPU events over the axon tunnel
(/device:TPU:0 plane with per-fusion durations). This script traces one
4-step fused dispatch and prints the top fusions; see
/tmp/agg_trace-style aggregation in the round-2 notes.

Round-2 finding (BASELINE.md): the 15.8 ms loop body is traffic-bound —
673 fusions/step averaging ~14 us (~= one HBM pass over a packed
12.6 MB activation each), ~1.5-2 ms of copies/reshapes, ~1.2 ms conv
MXU. No single hotspot; the next lever is reducing backward-pass
traffic (analytic-VJP fused kernels), not scheduling.
"""

import os, sys, glob, gzip, json, collections
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["KU_SCAN_S"] = "4"
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo/benchmarks")
import stylegan_lane_packing as ab

engine = ab.build_engine(True, 1)
rng = np.random.default_rng(0)
batches = ab.batches_stacked(rng)
engine.init_state(jax.tree.map(lambda t: t[0, 0], batches), seed=0)
st, d, g = engine._train_multi_step(engine.state, batches, ab.K, jax.random.key(9))
_ = np.asarray(g)
jax.profiler.start_trace("/tmp/steptrace")
st, d, g = engine._train_multi_step(st, batches, ab.K, jax.random.key(10))
_ = np.asarray(g)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/steptrace/plugins/profile/*/*.trace.json.gz"))[-1]
d = json.load(gzip.open(f))
ev = d["traceEvents"]
pids = {e["pid"]: e["args"].get("name") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
tot = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
        if e["name"].startswith("jit_"):   # outer program envelope
            continue
        tot[e["name"]] += e.get("dur", 0); cnt[e["name"]] += 1
total = sum(tot.values())
print(f"device total: {total/1e3:.2f} ms over 4 steps -> {total/4e3:.2f} ms/step")
for name, us in tot.most_common(30):
    print(f"{us/4e3:7.3f} ms/step  x{cnt[name]//4:<4d} {name[:90]}")
