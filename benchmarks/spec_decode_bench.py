"""Speculative decoding END-TO-END speedup: real draft vs plain decode.

VERDICT r3 weak-5: the implementation is exactness/distribution-tested
but the only throughput diagnostic ran draft==target. This measures the
actual point of the feature — wall-clock tokens/sec of
``speculative_generate`` with a genuinely smaller trained draft vs plain
``generate`` at equal outputs (greedy: bit-identical; temperature T:
equal distribution), plus acceptance rates.

Setup: the transformer example's induction task (period-P copy); both
target and draft TRAIN to (near-)perfect next-token accuracy, so the
draft proposes near-perfect continuations (acceptance → gamma), the
regime speculative decoding is built for. Two confs:

``toy`` — target 2 blocks × d_model 64, draft 2 × d32 (~1/4 the
    per-token cost; induction needs two attention layers — the
    previous-token head feeding the induction head — so the draft
    shrinks in WIDTH, not depth; a 1-block draft measured near-random
    acceptance). At this scale every decode step is LAUNCH-bound
    (~41 µs), so the spec while_loop's per-round overhead dominates and
    the measured speedup < 1 is the honest result (BASELINE.md round 4);
    the acceptance column says what a bandwidth-bound model would gain.
``big`` — target 16 blocks × d_model 2048 GQA 16/4 served in bf16
    (~0.87B params, the decode_bench 'big' conf: its per-token step is
    HBM-read-bound at 0.55× the v5e roofline), draft 2 blocks × d512
    GQA 8/2 (~1/130 the weight traffic). This is the regime the
    technique exists for: one gamma+1-wide verify pass reads the 1.75 GB
    of weights ONCE per round instead of once per token.

Both loops run device-side (generate: one prefill + one scan dispatch;
speculative: prefill + one while_loop program), so the tunnel round
trip amortizes; timing is best-of-N wall-clock with full host readback,
fresh rng/prompt salts per run so the tunnel cannot dedupe.

Usage: python benchmarks/spec_decode_bench.py [steps] [batch] [toy|big]
       python benchmarks/spec_decode_bench.py [steps] [batch] big curve

``curve`` (VERDICT r4 item 5): the standard rows measure acceptance at
SATURATION (the induction task is deterministic and both models learn
it to acc 1.0, so the draft never misses — an upper bound, not a
serving claim). The curve mode instead sweeps DEGRADED drafts —
params interpolated toward a random init (theta_mix = alpha*trained +
(1-alpha)*random) — and records measured acceptance vs speedup at
gamma=3/7, greedy. Speculative decoding's output is target-exact
regardless of draft quality, so every point is also a correctness
check; the draft only controls how many proposals survive. The rows
(streamed as they complete) give the speedup-vs-acceptance curve and
its break-even point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

if os.environ.get("KU_BENCH_CPU"):
    # Validation runs: the env var JAX_PLATFORMS alone is ignored when
    # the axon plugin is on PYTHONPATH — the config update is required.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

VOCAB, PERIOD, SEQ = 16, 8, 24

CONFS = {
    "toy": dict(
        target=dict(blocks=2, d_model=64, heads=4, kv=None,
                    epochs=15, lr=3e-3),
        draft=dict(blocks=2, d_model=32, heads=2, kv=None,
                   epochs=15, lr=3e-3),
        serve_dtype="float32",
    ),
    # Matches benchmarks/decode_bench.py CONFS['big'] (16 blocks of the
    # double-attention ku Transformer × d2048 GQA 16/4, bf16 serving).
    # The induction task is easy, so the 0.87B target needs only a few
    # epochs; training runs f32 with ADAFACTOR (adam's two f32 moments =
    # 7 GB, which pushed params 3.5 + grads 3.5 + activations past the
    # 16 GB v5e — measured RESOURCE_EXHAUSTED on 2026-08-20; factored
    # second moments cost ~MBs) and batch 32; serving casts to bf16.
    "big": dict(
        target=dict(blocks=16, d_model=2048, heads=16, kv=4,
                    epochs=3, lr=1e-3, optimizer="adafactor",
                    train_batch=32),
        draft=dict(blocks=2, d_model=512, heads=8, kv=2,
                   epochs=15, lr=1e-3),
        serve_dtype="bfloat16",
    ),
}


def _core(mc, max_len, quant=False):
    import flax.linen as nn

    from ku.nn import Transformer

    class Core(nn.Module):
        @nn.compact
        def __call__(self, xs, decode=False, prompt_lengths=None):
            x = xs[0]
            for i in range(mc["blocks"]):
                x = Transformer(mc["heads"], mc["d_model"], 0.0,
                                causal=True, rope=True,
                                num_kv_head=mc["kv"],
                                max_decode_len=max_len,
                                quant_weights=quant,
                                name=f"block_{i}")(
                    [x], decode=decode,
                    prompt_lengths=prompt_lengths)
            return x

    return Core()


def train(mc, seed):
    """Train an LM of conf ``mc`` on the induction task; returns
    (embedding_table, core_params) in f32."""
    import flax.linen as nn
    import optax

    from ku.engine_ext import Trainer
    from ku.nn import Transformer

    class LM(nn.Module):
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            tok = nn.Embed(VOCAB, mc["d_model"], name="tok")
            x = tok(jnp.asarray(tokens, jnp.int32))
            for i in range(mc["blocks"]):
                x = Transformer(mc["heads"], mc["d_model"], 0.0,
                                causal=True, rope=True,
                                num_kv_head=mc["kv"],
                                max_decode_len=SEQ,
                                name=f"core_block_{i}")([x])
            return x @ tok.embedding.T

    rng = np.random.default_rng(0)
    pat = rng.integers(0, VOCAB, size=(8192, PERIOD))
    seqs = np.tile(pat, (1, -(-(SEQ + 1) // PERIOD)))[:, :SEQ + 1]
    x_train, y_train = seqs[:, :-1], seqs[:, 1:]

    def masked_xent(y_true, logits):
        oh = jax.nn.one_hot(jnp.asarray(y_true, jnp.int32), VOCAB)
        ce = optax.softmax_cross_entropy(logits, oh)
        mask = (jnp.arange(ce.shape[1]) >= PERIOD - 1)[None, :]
        return (ce * mask).sum(1) / mask.sum()

    model = LM()
    # Self-healing lr: adam 3e-3 converges at d_model 32-64 but DIVERGES
    # at d512 (r4e measured train acc 0.0586 ≈ random — the spec rows
    # with that draft only measured the free bonus token). Train, check
    # accuracy, and retry at lr/3 until the model actually learned the
    # task; acceptance is meaningless otherwise.
    lr, acc, p = mc["lr"], 0.0, None
    for attempt in range(3):
        if mc.get("optimizer") == "adafactor":
            opt = optax.adafactor(lr)
        else:
            opt = optax.adam(lr)
        tr = Trainer(model, masked_xent, optimizer=opt, seed=seed)
        tr.fit(x_train, y_train, batch_size=mc.get("train_batch", 64),
               epochs=mc["epochs"], verbose=0)
        p = tr.state["params"]
        # Post-warmup next-token accuracy on a held-out slice — make a
        # weak fit visible in the bench log.
        logits = jax.jit(model.apply)({"params": p}, x_train[:256])
        pred = np.asarray(jnp.argmax(logits[:, PERIOD - 1:], -1))
        acc = float((pred == y_train[:256, PERIOD - 1:]).mean())
        print(f"train acc (post-warmup positions): {acc:.4f} "
              f"(lr {lr:g})", file=sys.stderr)
        if acc >= 0.9:
            break
        lr /= 3.0
        print(f"model failed to learn — retrying at lr {lr:g}",
              file=sys.stderr)
    # Repack: core blocks under a 'core'-shaped dict for the Core module.
    core_params = {f"block_{i}": p[f"core_block_{i}"]
                   for i in range(mc["blocks"])}
    emb = p["tok"]["embedding"]
    tr.state = None  # free the adam moments before the next model trains
    return emb, core_params, acc


def timed(fn, n=3):
    _ = fn(0)  # compile
    best = float("inf")
    for i in range(n):
        t0 = time.perf_counter()
        _ = fn(i + 1)  # fresh salt: the tunnel may dedupe identical runs
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    conf = sys.argv[3] if len(sys.argv) > 3 else "toy"
    curve = len(sys.argv) > 4 and sys.argv[4] == "curve"
    c = CONFS[conf]
    serve_dt = jnp.dtype(c["serve_dtype"])
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ku.nn import generate, make_sampler, speculative_generate

    def cast(tree):
        return jax.tree.map(
            lambda a: a.astype(serve_dt) if a.dtype == jnp.float32 else a,
            tree)

    t0 = time.perf_counter()
    table, tparams, target_acc = train(c["target"], seed=0)
    table, tparams = cast(table), cast(tparams)
    print(f"target trained in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    dtable, dparams, draft_acc = train(c["draft"], seed=1)
    dtable, dparams = cast(dtable), cast(dparams)
    print(f"draft trained in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    max_len = PERIOD + steps + 8  # prompt + steps + gamma+1 overshoot
    # KU_SPEC_W8=1: serve the TARGET weight-only int8 (ku/nn/quant.py) —
    # the spec x quant compose row. The verify pass and the dense
    # baseline both read int8 weights, so the reported speedup is spec's
    # contribution ON TOP of w8 serving. The draft stays float (its
    # weight traffic is ~1/130 of the target's — nothing to save).
    w8 = bool(os.environ.get("KU_SPEC_W8"))
    target = _core(c["target"], max_len, quant=w8)
    draft = _core(c["draft"], max_len)
    if w8:
        from ku.nn import quantize_weights

        x0q = jnp.zeros((1, 2, c["target"]["d_model"]), serve_dt)
        template = target.init(jax.random.key(1), [x0q])["params"]
        tparams = quantize_weights(tparams, template)
        print("target quantized to w8", file=sys.stderr)

    def emb(tab):
        def f(i, p):
            del p  # RoPE positions live in the attention layers
            return tab[i]

        return f

    t_emb, t_read = emb(table), (lambda y: y @ table.T)
    d_emb, d_read = emb(dtable), (lambda y: y @ dtable.T)

    rngp = np.random.default_rng(5)
    prompts = np.tile(rngp.integers(0, VOCAB, size=(batch, PERIOD)),
                      (1, 1))

    rows = []
    if curve:
        # Degraded-draft sweep (see module docstring): a random init of
        # the SAME tree structure is the alpha=0 endpoint.
        x0d = jnp.zeros((1, 2, c["draft"]["d_model"]), serve_dt)
        rnd = cast(draft.init(jax.random.key(4242), [x0d])["params"])
        rnd_table = cast(
            jax.random.normal(jax.random.key(4243), dtable.shape,
                              jnp.float32)
            * float(jnp.std(dtable.astype(jnp.float32))))

        def mixed(al, a, b):
            return (al * a.astype(jnp.float32)
                    + (1 - al) * b.astype(jnp.float32)).astype(a.dtype)

        dense_jit = jax.jit(lambda tp, ids, key: generate(
            target, tp, ids, steps, embed=t_emb, readout=t_read, rng=key))
        t_dense = timed(lambda s: np.asarray(dense_jit(
            tparams, jnp.asarray(prompts, jnp.int32),
            jax.random.key(100 + s))))
        out_d = np.asarray(dense_jit(tparams,
                                     jnp.asarray(prompts, jnp.int32),
                                     jax.random.key(100)))
        dense_tps = batch * steps / t_dense
        for gamma in (3, 7):
            # dtable/dparams are ARGUMENTS: the alpha sweep reuses ONE
            # compiled program per gamma (and no closure arrays in the
            # HLO — the tunnel-upload gotcha).
            spec_jit = jax.jit(
                lambda tp, dtab, dp, ids, key, gamma=gamma:
                speculative_generate(
                    target, tp, draft, dp, ids, steps, gamma=gamma,
                    temperature=None, embed=t_emb, readout=t_read,
                    draft_embed=emb(dtab),
                    draft_readout=lambda y: y @ dtab.T, rng=key))
            for al in (1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.3, 0.0):
                dmix = jax.tree.map(lambda a, b: mixed(al, a, b),
                                    dparams, rnd)
                tabmix = mixed(al, dtable, rnd_table)

                def run_spec(s):
                    out, acc = spec_jit(tparams, tabmix, dmix,
                                        jnp.asarray(prompts, jnp.int32),
                                        jax.random.key(100 + s))
                    return np.asarray(out), np.asarray(acc)

                t_spec = timed(lambda s: run_spec(s)[0])
                out_s, acc = run_spec(0)
                seq_eq = (out_s == out_d).all(axis=-1)
                rows.append({
                    "alpha": al, "gamma": gamma,
                    "accepted_per_round": round(float(acc.mean()), 3),
                    # accepted_per_round INCLUDES the free bonus token
                    # (verify emits gamma+1 on full acceptance), so the
                    # draft's true hit rate excludes it.
                    "acceptance_rate": round(
                        max(0.0, float(acc.mean()) - 1.0) / gamma, 3),
                    "spec_tokens_per_sec": round(batch * steps / t_spec, 1),
                    "dense_tokens_per_sec": round(dense_tps, 1),
                    "speedup": round(t_dense / t_spec, 3),
                    "greedy_exact_frac": round(float(seq_eq.mean()), 3),
                })
                print(json.dumps(rows[-1]), flush=True)
        print(json.dumps({
            "steps": steps, "batch": batch, "conf_name": conf,
            "mode": "acceptance_curve",
            "target_train_acc": round(target_acc, 4),
            "draft_train_acc": round(draft_acc, 4),
            "conf": dict(vocab=VOCAB, period=PERIOD,
                         serve_dtype=c["serve_dtype"],
                         target=c["target"], draft=c["draft"]),
            "rows": rows}), flush=True)
        return

    for gamma in (3, 7):
        for temp in (None, 0.7):
            label = f"gamma{gamma}_" + ("greedy" if temp is None
                                        else f"T{temp}")

            # Jit ONCE per config (an unjitted call re-traces the whole
            # loop program every invocation — host seconds that would
            # drown the comparison; rng passed as an arg so fresh keys
            # don't retrigger compilation or tunnel dedupe).
            spec_jit = jax.jit(lambda tp, dp, ids, key: speculative_generate(
                target, tp, draft, dp, ids, steps, gamma=gamma,
                temperature=temp, embed=t_emb, readout=t_read,
                draft_embed=d_emb, draft_readout=d_read, rng=key))
            sampler = make_sampler(temp) if temp is not None else None
            kw = dict(sampler=sampler) if sampler else {}
            dense_jit = jax.jit(lambda tp, ids, key: generate(
                target, tp, ids, steps, embed=t_emb, readout=t_read,
                rng=key, **kw))

            def run_spec(salt):
                out, acc = spec_jit(tparams, dparams,
                                    jnp.asarray(prompts, jnp.int32),
                                    jax.random.key(100 + salt))
                return np.asarray(out), np.asarray(acc)

            def run_dense(salt):
                return np.asarray(dense_jit(
                    tparams, jnp.asarray(prompts, jnp.int32),
                    jax.random.key(100 + salt)))

            t_spec = timed(lambda s: run_spec(s)[0])
            t_dense = timed(run_dense)
            out_s, acc = run_spec(0)
            out_d = run_dense(0)
            # Greedy spec decode is bit-exact vs generate() given identical
            # target logits (proven on the CPU suite). On TPU the verify
            # pass (gamma+1 positions batched) and the one-token decode
            # step are DIFFERENT XLA programs running bf16-precision
            # matmuls, so a near-tie argmax can flip — and one flip
            # cascades autoregressively. Report per-sequence exactness +
            # first divergence position so a single mid-sequence tie flip
            # is distinguishable from broken logic.
            exact = exact_frac = first_div = None
            if temp is None:
                seq_eq = (out_s == out_d).all(axis=-1)
                exact = bool(seq_eq.all())
                exact_frac = round(float(seq_eq.mean()), 3)
                if not exact:
                    div = (out_s != out_d).argmax(axis=-1)[~seq_eq]
                    first_div = int(div.min())
            rows.append({
                "mode": label, "gamma": gamma, "temperature": temp,
                "target_train_acc": round(target_acc, 4),
                "draft_train_acc": round(draft_acc, 4),
                "accepted_per_round": round(float(acc.mean()), 3),
                "spec_tokens_per_sec": round(batch * steps / t_spec, 1),
                "dense_tokens_per_sec": round(batch * steps / t_dense, 1),
                "speedup": round(t_dense / t_spec, 3),
                "greedy_exact": exact,
                "greedy_exact_frac": exact_frac,
                "first_divergence_pos": first_div,
            })
            print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps({"steps": steps, "batch": batch, "conf_name": conf,
                      "target_w8": w8,
                      "target_train_acc": round(target_acc, 4),
                      "draft_train_acc": round(draft_acc, 4),
                      "conf": dict(vocab=VOCAB, period=PERIOD,
                                   serve_dtype=c["serve_dtype"],
                                   target=c["target"], draft=c["draft"]),
                      "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
