"""Categorized device-time profile of the packed StyleGAN train step.

Round-3 result (BASELINE.md "backward-traffic levers" section): loop
body 15.8 ms/step = ~10.7 ms across ~270 elementwise/mixed fusions
(largest single fusion 0.154 ms = <1% of the step) + 1.28 ms conv MXU +
1.31 ms dtype converts + 1.15 ms in ~814 sub-2 µs scan-state copies +
0.4 ms reduces. Together
with the all-negative remat/vjp A/B (stylegan_backward_ab.py) this is
the committed evidence that <10% headroom remains at exact reference
semantics on this conf.
"""
import os, sys, glob, gzip, json, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["KU_SCAN_S"] = "4"
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import stylegan_lane_packing as ab

engine = ab.build_engine(True, 1)
rng = np.random.default_rng(0)
batches = ab.batches_stacked(rng)
engine.init_state(jax.tree.map(lambda t: t[0, 0], batches), seed=0)
st, d, g = engine._train_multi_step(engine.state, batches, ab.K, jax.random.key(9))
_ = np.asarray(g)
jax.profiler.start_trace("/tmp/steptrace2")
st, d, g = engine._train_multi_step(st, batches, ab.K, jax.random.key(10))
_ = np.asarray(g)
jax.profiler.stop_trace()

f = sorted(glob.glob("/tmp/steptrace2/plugins/profile/*/*.trace.json.gz"))[-1]
d = json.load(gzip.open(f))
ev = d["traceEvents"]
pids = {e["pid"]: e["args"].get("name") for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"}
cat = collections.Counter(); catn = collections.Counter()
tot = collections.Counter(); cnt = collections.Counter()
def classify(n):
    n = n.lower()
    # NB: "convert" (dtype casts) must NOT count as conv.
    if "convolution" in n or ("conv" in n and "convert" not in n):
        return "conv"
    if "convert" in n: return "convert"
    if n.startswith(("copy", "copy-start", "copy-done")) or "copy" in n: return "copy"
    if "transpose" in n: return "transpose"
    if n.startswith("dot") or "dot" in n: return "dot"
    if "reduce" in n: return "reduce"
    if n.startswith(("fusion", "loop_fusion", "input_fusion")) or "fusion" in n: return "fusion"
    if "rng" in n or "threefry" in n: return "rng"
    if "dynamic" in n: return "dynamic-slice"
    return "other"
for e in ev:
    if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
        if e["name"].startswith("jit_"):
            continue
        tot[e["name"]] += e.get("dur", 0); cnt[e["name"]] += 1
        c = classify(e["name"])
        cat[c] += e.get("dur", 0); catn[c] += 1
total = sum(tot.values())
print(f"device total: {total/1e3:.2f} ms over 4 steps -> {total/4e3:.2f} ms/step")
for c, us in cat.most_common():
    print(f"CAT {c:14s} {us/4e3:7.3f} ms/step  x{catn[c]//4}")
print("---- top 25 ----")
for name, us in tot.most_common(25):
    print(f"{us/4e3:7.3f} ms/step  x{cnt[name]//4:<4d} {name[:100]}")
