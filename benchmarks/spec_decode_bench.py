"""Speculative decoding END-TO-END speedup: real draft vs plain decode.

VERDICT r3 weak-5: the implementation is exactness/distribution-tested
but the only throughput diagnostic ran draft==target. This measures the
actual point of the feature — wall-clock tokens/sec of
``speculative_generate`` with a genuinely smaller trained draft vs plain
``generate`` at equal outputs (greedy: bit-identical; temperature T:
equal distribution), plus acceptance rates.

Setup: the transformer example's induction task (period-P copy), target
= 2 blocks at d_model 64, draft = 2 blocks at d_model 32 (~1/4 the
per-token cost; induction needs two attention layers, so the draft
shrinks in WIDTH, not depth — a 1-block draft measured near-random
acceptance). A trained draft proposes near-perfect continuations
(acceptance → gamma), the regime speculative decoding is built for.
Both loops run device-side (generate: one prefill + one scan dispatch;
speculative: prefill + one while_loop program), so the tunnel round
trip amortizes; timing is best-of-N wall-clock with full host readback,
fresh rng/prompt salts per run so the tunnel cannot dedupe.

Honest-negative note: at this toy scale every step is launch-bound, not
FLOP-bound — if the while_loop's per-round overhead eats the saved
target steps, the JSON will show speedup < 1 and that IS the result at
this scale; the acceptance rate column says what a FLOP-bound model
would gain (ideal_speedup ≈ (accepted+1) / (1 + (gamma+1)·c_draft)).

Usage: python benchmarks/spec_decode_bench.py [steps] [batch]
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

VOCAB, PERIOD, D_MODEL, HEADS, SEQ = 16, 8, 64, 4, 24
D_DRAFT = 32


def _models(max_len):
    import flax.linen as nn

    from ku.nn import Transformer

    def core(blocks, d_model, heads):
        class Core(nn.Module):
            @nn.compact
            def __call__(self, xs, decode=False, prompt_lengths=None):
                x = xs[0]
                for i in range(blocks):
                    x = Transformer(heads, d_model, 0.0, causal=True,
                                    rope=True, max_decode_len=max_len,
                                    name=f"block_{i}")(
                        [x], decode=decode,
                        prompt_lengths=prompt_lengths)
                return x

        return Core()

    # Draft: induction needs TWO attention layers (previous-token head
    # feeding the induction head) — a 1-block draft tops out near-random
    # on this task. Shrink WIDTH instead: d32 is ~1/4 the per-token
    # cost and still learns the task to ~perfect acceptance.
    return core(2, D_MODEL, HEADS), core(2, D_DRAFT, 2)


def train(model_blocks, epochs, seed, d_model=None, heads=None):
    import flax.linen as nn
    import optax

    from ku.engine_ext import Trainer
    from ku.nn import Transformer

    dm = D_MODEL if d_model is None else d_model
    hh = HEADS if heads is None else heads

    class LM(nn.Module):
        @nn.compact
        def __call__(self, tokens, deterministic=True):
            tok = nn.Embed(VOCAB, dm, name="tok")
            x = tok(jnp.asarray(tokens, jnp.int32))
            for i in range(model_blocks):
                x = Transformer(hh, dm, 0.0, causal=True,
                                rope=True, max_decode_len=SEQ,
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
    tr = Trainer(model, masked_xent, optimizer=optax.adam(3e-3), seed=seed)
    tr.fit(x_train, y_train, batch_size=64, epochs=epochs, verbose=0)
    p = tr.state["params"]
    # Repack: core blocks under a 'core'-shaped dict for the Core module.
    core_params = {f"block_{i}": p[f"core_block_{i}"]
                   for i in range(model_blocks)}
    return p["tok"]["embedding"], core_params


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
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ku.nn import generate, make_sampler, speculative_generate

    table, tparams = train(2, epochs=15, seed=0)
    dtable, dparams = train(2, epochs=15, seed=1, d_model=D_DRAFT, heads=2)
    max_len = PERIOD + steps + 8  # prompt + steps + gamma+1 overshoot
    target, draft = _models(max_len)

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
            exact = bool((out_s == out_d).all()) if temp is None else None
            rows.append({
                "mode": label, "gamma": gamma, "temperature": temp,
                "accepted_per_round": round(float(acc.mean()), 3),
                "spec_tokens_per_sec": round(batch * steps / t_spec, 1),
                "dense_tokens_per_sec": round(batch * steps / t_dense, 1),
                "speedup": round(t_dense / t_spec, 3),
                "greedy_exact": exact,
            })
            print(json.dumps(rows[-1]), file=sys.stderr)

    print(json.dumps({"steps": steps, "batch": batch,
                      "conf": dict(vocab=VOCAB, period=PERIOD,
                                   d_model=D_MODEL, target_blocks=2,
                                   draft_d_model=D_DRAFT),
                      "rows": rows}))


if __name__ == "__main__":
    main()
