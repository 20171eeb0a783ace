"""Categorized device-time profile of the per-token decode step.

Usage: python benchmarks/profile_decode.py [mode] [conf] [T_alloc] [steps]

Builds the same LM stack as decode_bench (mode supports the *_xla
suffix), allocates the cache at T_alloc, traces `steps` scanned decode
steps, and buckets device ops — the tool that answers "where does the
decode step's time actually go" (pallas kernel vs layout copies vs
fusions). Round-4 motivation: the flash-decoding kernel measured 0.49x
roofline where the XLA dense read hit 0.80x at toy T=8192, and int8
through the kernel collapsed to 0.08x — is it grid-step overhead, a
pre-kernel layout-conversion copy of the cache, or in-kernel cast cost?
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import decode_bench as db


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "dense"
    conf = sys.argv[2] if len(sys.argv) > 2 else "toy"
    t_alloc = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    flash_decode = False if mode.endswith("_xla") else None
    m = mode.removesuffix("_xla")
    c = db.CONFS[conf]
    dtype = jnp.dtype(c["dtype"])
    rng = np.random.default_rng(0)
    # Quant modes mirror decode_bench. The profile runs on the init
    # TEMPLATE weights (int8 zeros + unit scales) — device timing is
    # value-independent, so no quantize_weights pass is needed here.
    wq = {"w8": True, "w8kv8": True,
          "w8a8": "w8a8", "w8a8kv8": "w8a8"}.get(m, False)
    model = db.build(t_alloc, c,
                     kv_cache_dtype=("int8"
                                     if m in ("int8", "w8kv8", "w8a8kv8")
                                     else None),
                     kv_page_size=256 if m == "paged" else None,
                     flash_decode=flash_decode, quant_weights=wq)
    x0 = jnp.asarray(rng.normal(size=(c["batch"], 1, c["d_model"])), dtype)
    variables = model.init(jax.random.key(0), x0, decode=False)
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        variables["params"])
    del variables
    _, mut = model.apply({"params": params}, x0, decode=True,
                         mutable=["cache"])
    cache0 = mut["cache"]
    del mut

    @jax.jit
    def chain(params, cache0, x0, salt):
        def step(carry, _):
            x, cache = carry
            y, mt = model.apply({"params": params, "cache": cache}, x,
                                decode=True, mutable=["cache"])
            return ((y * (1 + salt * 1e-30)).astype(y.dtype),
                    mt["cache"]), jnp.sum(y)

        (_, _), sums = jax.lax.scan(step, (x0, cache0), None, length=steps)
        return jnp.sum(sums)

    _ = np.asarray(chain(params, cache0, x0, jnp.float32(0)))  # compile
    t0 = time.perf_counter()
    _ = np.asarray(chain(params, cache0, x0, jnp.float32(1e-6)))
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1e3:.2f} ms for {steps} steps -> "
          f"{wall*1e3/steps:.4f} ms/token-batch")

    trace_dir = f"/tmp/decode_trace_{mode}_{conf}"
    jax.profiler.start_trace(trace_dir)
    _ = np.asarray(chain(params, cache0, x0, jnp.float32(2e-6)))
    jax.profiler.stop_trace()

    f = sorted(glob.glob(
        trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(f))
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    def classify(n):
        n = n.lower()
        if "pallas" in n or "custom-call" in n or "mosaic" in n:
            return "pallas"
        if "convert" in n:
            return "convert"
        if "copy" in n:
            return "copy"
        if "transpose" in n:
            return "transpose"
        if "dot" in n:
            return "dot"
        if "reduce" in n:
            return "reduce"
        if "fusion" in n:
            return "fusion"
        if "dynamic" in n:
            return "dynamic-slice"
        return "other"

    cat = collections.Counter()
    catn = collections.Counter()
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            if e["name"].startswith("jit_"):
                continue
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            ccat = classify(e["name"])
            cat[ccat] += e.get("dur", 0)
            catn[ccat] += 1
    total = sum(tot.values())
    print(f"device total: {total/1e3:.2f} ms over {steps} steps -> "
          f"{total/steps/1e3:.4f} ms/token-batch")
    for ccat, us in cat.most_common():
        print(f"CAT {ccat:14s} {us/steps:8.2f} us/step  x{catn[ccat]//steps}")
    print("---- top 20 ----")
    for name, us in tot.most_common(20):
        print(f"{us/steps:8.2f} us/step  x{cnt[name]//steps:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
