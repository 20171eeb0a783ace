"""ContinuousBatcher ON-HARDWARE efficiency vs the raw decode loop.

VERDICT r3 weak-4: the batcher's steady-state throughput had only CPU
numbers and its per-``step()`` host overhead on TPU was unquantified.
This measures, at the real-sized serving conf (decode_bench CONFS
['big']: 16 blocks x d_model 2048, GQA 16/4, bf16, ~0.9B params):

1. ``generate()`` tokens/sec — the strongest baseline: same model, same
   batch width, whole decode as ONE lax.scan dispatch (no scheduler).
2. Batcher steady tokens/sec at chunk 8/32/128 (closed-loop: pool kept
   full; round-0 compile excluded), its efficiency vs (1), and the mean
   host+dispatch wall per ``step()`` vs the pure device time the chunk's
   tokens cost in (1) — the difference IS the scheduler+tunnel tax per
   scheduling round.

Target from the VERDICT: >= 80% of the raw loop at the production chunk.
A dispatch costs ~28 ms over the axon tunnel, so small chunks are
expected to lose: chunk 8 = 8 slots x 8 tokens per dispatch round trip.

Usage: python benchmarks/batcher_bench.py [conf] [budget] [chunks...]
       (defaults: big 256 8 32 128; 'toy' for a CPU-speed smoke)

KU_BENCH_MESH="data,model" (e.g. "2,4"): place the serving replica on a
2-D jax mesh via ContinuousBatcher(mesh=...) — request-DP x head-TP,
exactly the dryrun's continuous-batching leg but measured. Degrades
gracefully: if the host has fewer devices than data*model, the flag is
ignored with a warning (single-chip numbers stay comparable). The day
real multi-chip hardware exists the measurement is one env var
(VERDICT r4 item 9).

FLAP RESILIENCE (VERDICT r4 weak-5: this bench died on hardware four
times, losing everything each time): every row is flushed as it
completes AND checkpointed to
``results/batcher_bench_ckpt_<conf>_<budget>.json``; a re-run resumes
from the completed rows (delete the file or set KU_BENCH_FRESH=1 for a
cold run). A row that crashes records an error row and the bench moves
on to the next chunk size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from decode_bench import CONFS  # noqa: E402  (same dir at runtime)

VOCAB = 1024


def build_lm(conf, max_len):
    import flax.linen as nn

    from ku.nn import Transformer

    class LM(nn.Module):
        @nn.compact
        def __call__(self, xs, decode=False, prompt_lengths=None):
            x = xs[0]
            for i in range(conf["blocks"]):
                x = Transformer(conf["heads"], conf["d_model"], 0.0,
                                causal=True, rope=True,
                                num_kv_head=conf["kv_heads"],
                                max_decode_len=max_len,
                                name=f"block{i}")(
                    [x], decode=decode, prompt_lengths=prompt_lengths)
            return x

    return LM()


def _ckpt_path(conf_name, budget):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results",
                        f"batcher_bench_ckpt_{conf_name}_{budget}.json")


def _ckpt_load(path):
    if os.environ.get("KU_BENCH_FRESH"):
        return {}
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _ckpt_save(path, ckpt):
    try:
        with open(path + ".tmp", "w") as f:
            json.dump(ckpt, f)
        os.replace(path + ".tmp", path)
    except OSError:
        pass


def main():
    conf_name = sys.argv[1] if len(sys.argv) > 1 else "big"
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    chunks = [int(a) for a in sys.argv[3:]] or [8, 32, 128]
    conf = CONFS[conf_name]
    dtype = jnp.dtype(conf["dtype"])
    slots = conf["batch"]
    prompt_len = 64
    max_len = prompt_len + budget + max(chunks)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    mesh = None
    mesh_spec = os.environ.get("KU_BENCH_MESH")
    if mesh_spec:
        d_sz, m_sz = (int(x) for x in mesh_spec.split(","))
        devs = jax.devices()
        if len(devs) >= d_sz * m_sz:
            mesh = jax.sharding.Mesh(
                np.asarray(devs[:d_sz * m_sz]).reshape(d_sz, m_sz),
                ("data", "model"))
            print(f"mesh: data={d_sz} x model={m_sz}", file=sys.stderr)
        else:
            print(f"KU_BENCH_MESH={mesh_spec} ignored: only "
                  f"{len(devs)} device(s)", file=sys.stderr)

    from ku.nn import ContinuousBatcher, generate

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(VOCAB, conf["d_model"])) * 0.05,
                        dtype)
    embed = lambda i, p=None: table[i]  # noqa: E731 (RoPE: no PE table)
    readout = lambda y: y @ table.T  # noqa: E731
    model = build_lm(conf, max_len)
    params0 = model.init(jax.random.key(0),
                         [embed(jnp.zeros((1, 2), jnp.int32))],
                         decode=True)["params"]
    params = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
        params0)

    prompts = rng.integers(0, VOCAB, size=(slots, prompt_len))

    # 1. Raw loop: generate() at the pool width, whole decode one scan.
    # Jitted ONCE with params/table as ARGUMENTS: an unjitted call
    # re-traces the whole stack every invocation (seconds of host time
    # at 16 blocks), and closure arrays would embed in the HLO and blow
    # the tunnel's upload limit (CLAUDE.md HTTP 413 gotcha).
    def make_gen(steps):
        @jax.jit
        def gen_jit(params, table, ids, key):
            return generate(model, params, ids, steps,
                            embed=lambda i, p=None: table[i],
                            readout=lambda y: y @ table.T, rng=key)

        def run(salt):
            return np.asarray(gen_jit(params, table,
                                      jnp.asarray(prompts, jnp.int32),
                                      jax.random.key(salt)))

        run(0)  # compile
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 1)  # fresh key: the tunnel may dedupe
            best = min(best, time.perf_counter() - t0)
        return best

    # Two budgets isolate the per-decode-step price as a SLOPE — a
    # single measurement would fold the 64-token prompt prefill into
    # per_token_ms and understate the scheduler overhead split below.
    if budget < 4:
        raise SystemExit("budget must be >= 4 (the two-budget slope "
                         "needs distinct, non-trivial step counts)")
    ckpt_file = _ckpt_path(
        conf_name + (f"_mesh{mesh_spec.replace(',', 'x')}" if mesh is not None
                     else ""), budget)
    ckpt = _ckpt_load(ckpt_file)
    if "baseline" in ckpt:
        gen_tps = ckpt["baseline"]["tokens_per_sec"]
        per_token_ms = ckpt["baseline"]["ms_per_token_batch"]
        print(json.dumps(dict(ckpt["baseline"], resumed=True)), flush=True)
    else:
        t_gen = make_gen(budget)
        t_half = make_gen(budget // 2)
        gen_tps = slots * budget / t_gen
        # max(0): on fast/noisy hosts (CPU smoke, flapping tunnel) the
        # two best-of-3 timings are independent and the difference can
        # come out negative — clamp rather than archive nonsense
        # overhead splits.
        per_token_ms = max(
            ((t_gen - t_half) * 1e3) / (budget - budget // 2), 0.0)
        ckpt["baseline"] = {"baseline": "generate", "conf": conf_name,
                            "slots": slots, "budget": budget,
                            "tokens_per_sec": round(gen_tps, 1),
                            "ms_per_token_batch": round(per_token_ms, 3)}
        _ckpt_save(ckpt_file, ckpt)
        print(json.dumps(ckpt["baseline"]), flush=True)

    rows = []
    done = ckpt.setdefault("rows", {})
    for chunk in chunks + [tuple(chunks)]:  # fixed sizes + adaptive
        chunk_key = str(chunk if isinstance(chunk, int) else list(chunk))
        if chunk_key in done and "error" not in done[chunk_key]:
            rows.append(done[chunk_key])
            print(json.dumps(dict(done[chunk_key], resumed=True)),
                  flush=True)
            continue
        try:
            cb = ContinuousBatcher(model, params, embed=embed,
                                   readout=readout, num_slots=slots,
                                   prompt_len=prompt_len,
                                   max_decode_len=max_len, chunk=chunk,
                                   mesh=mesh,
                                   data_axis="data" if mesh is not None
                                   else None,
                                   num_head=conf["heads"],
                                   num_kv_head=conf["kv_heads"],
                                   rng=jax.random.key(7))
            # Closed-loop: 2x slots requests so every slot recycles once.
            reqs = [rng.integers(0, VOCAB, size=(prompt_len,))
                    .astype(np.int32) for _ in range(2 * slots)]

            def run_once():
                cb.reset(force=True)
                for r in reqs:
                    cb.submit(r, budget)
                walls = []
                t0_all = time.perf_counter()
                while not cb.idle:
                    t0 = time.perf_counter()
                    cb.step()
                    walls.append(time.perf_counter() - t0)
                return walls, time.perf_counter() - t0_all

            # Pass 1 warms EVERY compiled shape this config can reach
            # (adaptive chunking compiles one scan per size, and sizes
            # first appear mid-run — timing pass 1 would charge compiles
            # to steady state); pass 2 is the measurement.
            run_once()
            step_walls, wall = run_once()
            steady = cb.last_stats["decoded_tokens"] / wall
            st = cb.last_stats
            mean_step_ms = float(np.mean(step_walls)) * 1e3
            # Mean realized chunk (adaptive varies per round): every
            # scanned slot-step is either a decoded or a wasted token.
            mean_chunk = ((st["decoded_tokens"] + st["wasted_slot_steps"])
                          / (st["chunks"] * slots))
            device_ms = mean_chunk * per_token_ms  # raw token cost
            row = {
                "chunk": chunk if isinstance(chunk, int) else list(chunk),
                "mean_realized_chunk": round(mean_chunk, 1),
                "steady_tokens_per_sec": round(steady, 1),
                "efficiency_vs_generate": round(steady / gen_tps, 3),
                "mean_step_ms": round(mean_step_ms, 2),
                "device_equiv_ms": round(device_ms, 2),
                "sched_overhead_ms_per_step": round(
                    mean_step_ms - device_ms, 2),
                "chunks": st["chunks"],
                "wasted_slot_steps": st["wasted_slot_steps"],
            }
        except Exception as e:  # record and move on — never lose rows
            row = {"chunk": chunk if isinstance(chunk, int)
                   else list(chunk), "error": repr(e)[:300]}
        rows.append(row)
        done[chunk_key] = row
        _ckpt_save(ckpt_file, ckpt)
        print(json.dumps(row), flush=True)

    print(json.dumps({"conf": conf_name, "slots": slots,
                      "budget": budget,
                      "generate_tokens_per_sec": round(gen_tps, 1),
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
