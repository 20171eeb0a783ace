"""Autoregressive LM + serving example — periodic-copy task.

Trains a small causal transformer LM on period-P token sequences (the
next token equals the token P positions back — the classic induction
task: the model must ATTEND at lag P, a closed-book MLP cannot solve it),
then serves it with :func:`ku.nn.generate`: the prompt PREFILLS the KV
caches in one dispatch and the whole generation loop runs as one
``lax.scan`` (BASELINE.md serving methodology). Generation quality is
exactly measurable: every generated token has one correct value (the
cyclic continuation), so we report generation accuracy.

The reference (tonandr/keras_unsupervised) ships transformer layers but
no autoregressive example or serving path; this demonstrates the ku
serving stack end-to-end — set ``nn_arch.kv_cache_dtype`` to "int8" for
the quantized cache and ``nn_arch.use_flash`` for flash-kernel prefill.

Config contract (reference style): transformer_generate_conf.json with
``{mode, hps{lr, batch_size, epochs, num_train}, nn_arch{...}}``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import common  # noqa: E402  (bootstraps repo root + compile cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import flax.linen as nn  # noqa: E402
import optax  # noqa: E402

from ku.core.config import load_config  # noqa: E402
from ku.engine_ext import Trainer  # noqa: E402
from ku.nn import (Transformer, beam_search, generate,  # noqa: E402
                   speculative_generate)


def make_dataset(n: int, seq_len: int, period: int, vocab: int,
                 seed: int = 0):
    """Period-``period`` sequences: x[t] = x[t - period] for t >= period."""
    rng = np.random.default_rng(seed)
    pat = rng.integers(0, vocab, size=(n, period))
    reps = -(-seq_len // period)
    return np.tile(pat, (1, reps))[:, :seq_len]


class LMCore(nn.Module):
    """The decode-capable stack (embedding-in/embedding-out) — shared by
    training (full causal forward) and serving (KV-cache decode)."""

    d_model: int = 64
    num_head: int = 4
    num_blocks: int = 2
    max_decode_len: int = 32
    use_flash: bool = False
    kv_cache_dtype: str | None = None
    kv_page_size: int | None = None
    kv_num_pages: int | None = None

    @nn.compact
    def __call__(self, xs, decode: bool = False, prompt_lengths=None):
        x = xs[0]
        for i in range(self.num_blocks):
            x = Transformer(
                num_head=self.num_head, d_output=self.d_model,
                dropout_rate=0.0, causal=True, use_flash=self.use_flash,
                max_decode_len=self.max_decode_len,
                kv_cache_dtype=self.kv_cache_dtype,
                kv_page_size=self.kv_page_size,
                kv_num_pages=self.kv_num_pages, name=f"block_{i}",
            )([x], decode=decode, prompt_lengths=prompt_lengths)
        return x


class LM(nn.Module):
    """Training wrapper: token + learned position embeddings, tied
    readout (logits = core output @ embeddingᵀ)."""

    vocab: int = 16
    seq_len: int = 24
    d_model: int = 64
    num_head: int = 4
    num_blocks: int = 2
    use_flash: bool = False
    kv_cache_dtype: str | None = None

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        tok = nn.Embed(self.vocab, self.d_model, name="tok")
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (self.seq_len, self.d_model))
        t = tokens.shape[1]
        x = tok(jnp.asarray(tokens, jnp.int32)) + pos[None, :t]
        y = LMCore(self.d_model, self.num_head, self.num_blocks,
                   max_decode_len=self.seq_len,
                   use_flash=self.use_flash,
                   kv_cache_dtype=self.kv_cache_dtype,
                   name="core")([x])
        return y @ tok.embedding.T


def main():
    conf_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "transformer_generate_conf.json",
    )
    conf = load_config(conf_path)
    hps, arch = conf["hps"], conf["nn_arch"]
    vocab, seq_len = int(arch["vocab"]), int(arch["seq_len"])
    period = int(arch["period"])

    seqs = make_dataset(int(hps.get("num_train", 8192)), seq_len + 1,
                        period, vocab, seed=0)
    x_train, y_train = seqs[:, :-1], seqs[:, 1:]

    model = LM(vocab=vocab, seq_len=seq_len,
               d_model=int(arch["d_model"]),
               num_head=int(arch["num_head"]),
               num_blocks=int(arch.get("num_blocks", 2)),
               use_flash=bool(arch.get("use_flash", False)),
               kv_cache_dtype=arch.get("kv_cache_dtype"))

    def masked_xent(y_true, logits):
        # Targets are only determined once a full period is visible.
        oh = jax.nn.one_hot(jnp.asarray(y_true, jnp.int32), vocab)
        ce = optax.softmax_cross_entropy(logits, oh)
        mask = (jnp.arange(ce.shape[1]) >= period - 1)[None, :]
        return (ce * mask).sum(1) / mask.sum()

    trainer = Trainer(model, masked_xent,
                      optimizer=optax.adam(float(hps["lr"])))
    start = time.time()
    trainer.fit(x_train, y_train, batch_size=int(hps["batch_size"]),
                epochs=int(hps["epochs"]), verbose=1)
    print(f"train time: {time.time() - start:.1f}s")

    # ---- Serving: prefill + scanned decode via ku.nn.generate ----
    params = trainer.state["params"]
    table = params["tok"]["embedding"]
    pos_table = params["pos"]
    core = LMCore(int(arch["d_model"]), int(arch["num_head"]),
                  int(arch.get("num_blocks", 2)), max_decode_len=seq_len,
                  use_flash=bool(arch.get("use_flash", False)),
                  kv_cache_dtype=arch.get("kv_cache_dtype"))

    test = make_dataset(256, seq_len, period, vocab, seed=1)
    prompt_len = seq_len // 2
    steps = seq_len - prompt_len
    ids = jnp.asarray(test[:, :prompt_len], jnp.int32)

    t0 = time.time()
    gen = np.asarray(generate(
        core, params["core"], ids, steps,
        embed=lambda i, p: table[i] + pos_table[p][None],
        readout=lambda y: y @ table.T,
    ))
    dt = time.time() - t0
    acc = float((gen == test[:, prompt_len:]).mean())
    print(f"generation accuracy (greedy, {steps} tokens after a "
          f"{prompt_len}-token prompt): {acc:.4f}")
    print(f"serving: {gen.size / dt:.0f} tokens/sec "
          f"(batch {test.shape[0]}, prefill + one-scan decode)")

    # ---- Beam search: top beam must agree with greedy on this task ----
    beams, _ = beam_search(core, params["core"], ids[:32], steps,
                           embed=lambda i, p: table[i] + pos_table[p][None],
                           readout=lambda y: y @ table.T, beam_size=4)
    beam_acc = float((np.asarray(beams)[:, 0]
                      == test[:32, prompt_len:]).mean())
    print(f"beam search (beam 4) top-beam accuracy: {beam_acc:.4f}")

    # ---- Speculative decoding: a 1-block draft accelerates the target
    # with BIT-IDENTICAL greedy output (acceptance rate reported) ----
    draft = LM(vocab=vocab, seq_len=seq_len, d_model=int(arch["d_model"]),
               num_head=int(arch["num_head"]), num_blocks=1)
    dtrainer = Trainer(draft, masked_xent,
                       optimizer=optax.adam(float(hps["lr"])), seed=1)
    dtrainer.fit(x_train, y_train, batch_size=int(hps["batch_size"]),
                 epochs=max(2, int(hps["epochs"]) // 3), verbose=0)
    dparams = dtrainer.state["params"]
    dcore = LMCore(int(arch["d_model"]), int(arch["num_head"]), 1,
                   max_decode_len=seq_len + 8)
    core_sp = LMCore(int(arch["d_model"]), int(arch["num_head"]),
                     int(arch.get("num_blocks", 2)),
                     max_decode_len=seq_len + 8,
                     use_flash=bool(arch.get("use_flash", False)),
                     kv_cache_dtype=arch.get("kv_cache_dtype"))
    def hooks(tab, pos_tab):
        # Positions arrive as (L,) for prefill and (B, L) for per-row
        # feeds; speculative rounds can overshoot `steps`, so clip the
        # PE index (overshoot tokens are truncated from the output).
        def emb(i, p):
            pe = pos_tab[jnp.clip(p, 0, seq_len - 1)]
            return tab[i] + (pe[None] if jnp.ndim(p) == 1 else pe)

        return emb, (lambda y: y @ tab.T)

    t_emb, t_read = hooks(table, pos_table)
    d_emb, d_read = hooks(dparams["tok"]["embedding"], dparams["pos"])
    spec, accepted = speculative_generate(
        core_sp, params["core"], dcore, dparams["core"], ids, steps,
        gamma=3, embed=t_emb, readout=t_read,
        draft_embed=d_emb, draft_readout=d_read)
    spec = np.asarray(spec)
    exact = bool((spec == gen).all())
    print(f"speculative decoding: greedy-exact={exact}, mean accepted "
          f"{float(np.asarray(accepted).mean()):.2f}/gamma+1=4 per round")

    # ---- Continuous batching: a ragged request stream served through a
    # fixed slot pool (slots recycle as sequences finish) ----
    from ku.nn import ContinuousBatcher

    chunk = 8
    cb_core = LMCore(int(arch["d_model"]), int(arch["num_head"]),
                     int(arch.get("num_blocks", 2)),
                     max_decode_len=seq_len + chunk,
                     kv_cache_dtype=arch.get("kv_cache_dtype"))
    nreq = 64
    plens = np.random.default_rng(3).integers(period, prompt_len + 1,
                                              size=nreq)
    reqs = [test[i, :p].astype(np.int32) for i, p in enumerate(plens)]
    buds = [int(seq_len - p) for p in plens]
    cb = ContinuousBatcher(cb_core, params["core"], embed=t_emb,
                           readout=t_read, num_slots=8,
                           prompt_len=prompt_len, chunk=chunk,
                           max_decode_len=seq_len + chunk)
    t0 = time.time()
    outs = cb.serve(reqs, buds)
    dt = time.time() - t0
    ok = sum((out == test[i, p:p + b]).sum()
             for i, (out, p, b) in enumerate(zip(outs, plens, buds)))
    tot = sum(buds)
    st = cb.last_stats
    print(f"continuous batching: {nreq} ragged requests / 8 slots, "
          f"accuracy {ok / tot:.4f}, {tot / dt:.0f} tokens/sec "
          f"({st['admission_events']} admissions, {st['chunks']} chunks, "
          f"{st['wasted_slot_steps']} wasted slot-steps)")

    # ---- Paged KV cache: same workload, KV memory as a page POOL at
    # ~60% of the dense-equivalent footprint (vLLM-style block tables;
    # admission defers when the pool is exhausted, pages recycle) ----
    mdl = seq_len + chunk
    pg = 8
    mp = -(-mdl // pg)
    pool = 1 + int(0.6 * 8 * mp)
    paged_core = LMCore(int(arch["d_model"]), int(arch["num_head"]),
                        int(arch.get("num_blocks", 2)),
                        max_decode_len=mdl, kv_page_size=pg,
                        kv_num_pages=pool)
    cbp = ContinuousBatcher(paged_core, params["core"], embed=t_emb,
                            readout=t_read, num_slots=8,
                            prompt_len=prompt_len, chunk=chunk,
                            max_decode_len=mdl)
    outs_p = cbp.serve(reqs, buds)
    ok_p = sum((out == test[i, p:p + b]).sum()
               for i, (out, p, b) in enumerate(zip(outs_p, plens, buds)))
    stp = cbp.last_stats
    print(f"paged continuous batching: pool {pool - 1}/{8 * mp} pages "
          f"(page {pg}), accuracy {ok_p / tot:.4f}, peak in use "
          f"{stp['peak_pages_in_use']}, {stp['admission_events']} "
          f"admissions")
    return acc


if __name__ == "__main__":
    main()
