"""Autoregressive generation loop for KV-cache serving.

Reference analogue: none — the reference (tonandr/keras_unsupervised) has
no autoregressive serving; this completes the transformer stack
(ku/nn/transformer.py, ku/nn/attention.py decode path) into a usable LM
serving API the TPU way: prompt PREFILL in one dispatch, then the whole
token-by-token loop as ONE ``lax.scan`` dispatch (the ~ms-scale dispatch
round trip amortizes across all generated tokens), with the functional
cache dict as the scan carry.

The model contract is embedding-in/embedding-out (the layer zoo has no
vocab conventions): the caller supplies ``embed`` (token ids → embeddings)
and ``readout`` (model output → vocab logits). Works with any flax module
whose ``__call__(xs, decode=...)`` follows the MultiHeadAttention cache
protocol — including ring-buffer (StreamingLLM), int8-quantized, and
tensor-parallel-sharded caches.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def _stepper(model, params, kw):
    """Closure over the cache-protocol apply: (cache, x) → (cache', y)."""

    def apply_step(cache, x, **extra):
        variables = {"params": params, **cache}
        y, mut = model.apply(variables, [x], decode=True,
                             mutable=["cache"], **kw, **extra)
        return mut, y

    return apply_step


def chosen_logprob(logits, tok):
    """Raw-model log-softmax probability of each chosen token
    ((B, V) logits, (B,) ids -> (B,) f32) — the sampler-independent
    convention generate() and ContinuousBatcher both report."""
    return jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                               tok[:, None], axis=1)[:, 0]


def greedy(logits, key):
    """argmax sampler (key unused; kept for a uniform signature)."""
    del key
    return jnp.argmax(logits, axis=-1)


def make_sampler(temperature: float = 1.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None,
                 repetition_penalty: Optional[float] = None) -> Callable:
    """Build a stochastic sampler: softmax at ``temperature`` after
    optional cuts, applied in the standard serving order —
    repetition penalty (raw logits) → temperature → top-k → top-p.

    ``top_p`` (nucleus): keep the smallest set of tokens whose
    probability mass reaches ``top_p`` (ties at the cutoff all kept);
    the rest mask to -inf. Computed on the post-top-k distribution.

    ``repetition_penalty`` (CTRL convention): for every token already
    seen in the sequence, divide a positive logit by the penalty and
    multiply a negative one by it (>1 discourages repeats). Seen-token
    state lives with the CALLER: the sampler is marked
    ``needs_seen=True`` and must be called ``sampler(logits, key,
    seen)`` with a (B, V) bool mask of seen tokens — :func:`generate`
    and ``ContinuousBatcher`` thread this automatically (prompt tokens
    + every emitted token)."""

    if top_p is not None and not 0.0 < top_p <= 1.0:
        # top_p <= 0 would mask EVERY logit to -inf and categorical
        # would silently emit token 0; surface the misuse instead.
        raise ValueError(f"top_p must be in (0, 1], got {top_p}")
    if top_k is not None and top_k < 1:
        # top_k=0 fails much later inside the jitted decode scan with a
        # shape error that names no user parameter.
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if repetition_penalty is not None and repetition_penalty <= 0:
        # penalty 0 would divide positive logits to +inf — categorical
        # then deterministically re-emits seen tokens, silently.
        raise ValueError("repetition_penalty must be > 0, got "
                         f"{repetition_penalty}")

    def sampler(logits, key, seen=None):
        lg = logits
        if repetition_penalty is not None:
            if seen is None:
                raise ValueError(
                    "repetition_penalty sampler called without the seen "
                    "mask; call sampler(logits, key, seen)")
            pen = jnp.where(lg > 0, lg / repetition_penalty,
                            lg * repetition_penalty)
            lg = jnp.where(seen, pen, lg)
        lg = lg / jnp.maximum(temperature, 1e-6)
        if top_k is not None:
            kth = jax.lax.top_k(lg, top_k)[0][..., -1:]
            lg = jnp.where(lg < kth, -jnp.inf, lg)
        if top_p is not None:
            probs = jax.nn.softmax(lg, axis=-1)
            srt = jnp.sort(probs, axis=-1)[..., ::-1]  # descending
            exclusive = jnp.cumsum(srt, axis=-1) - srt
            keep = exclusive < top_p  # smallest set reaching top_p
            cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1,
                             keepdims=True)
            lg = jnp.where(probs >= cutoff, lg, -jnp.inf)
        return jax.random.categorical(key, lg, axis=-1)

    sampler.needs_seen = repetition_penalty is not None
    return sampler


def _seen_from_prompt(prompt_ids, vocab: int, lens=None):
    """(B, V) bool mask of tokens present in each (right-padded) prompt;
    with ``lens`` given, padding positions j >= len_b do not count."""
    bsz, p = prompt_ids.shape
    valid = (jnp.ones((bsz, p), jnp.bool_) if lens is None else
             jnp.arange(p)[None] < lens[:, None])
    rows = jnp.arange(bsz)[:, None]
    return jnp.zeros((bsz, vocab), jnp.bool_).at[rows, prompt_ids].max(valid)


def _mark_seen(seen, tok):
    return seen.at[jnp.arange(seen.shape[0]), tok].set(True)


def generate(model, params, prompt_ids, steps: int, *,
             embed: Callable, readout: Callable,
             sampler: Callable = greedy,
             rng: Optional[jax.Array] = None,
             prompt_lengths=None,
             return_logprobs: bool = False,
             model_kwargs: Optional[dict] = None) -> Any:
    """Generate ``steps`` tokens after a prompt, all in TWO dispatches.

    1. PREFILL: ``model.apply`` over the embedded prompt with
       ``decode=True`` fills the KV caches in one dispatch; the last
       position's readout samples the first new token.
    2. DECODE: one ``lax.scan`` runs the remaining ``steps - 1``
       single-token steps device-side.

    Args:
      model: flax module; ``__call__([x], decode=...)`` → (B, L, D).
      params: the model's 'params' collection.
      prompt_ids: (B, P) int32 token ids.
      steps: number of tokens to generate.
      embed: (ids (B, L), positions) → (B, L, D) embeddings. Positions
        are the GLOBAL sequence indices of the ids (prompt: 0..P-1;
        then one per generated token) so absolute position encodings
        stay correct through the scan; table-only models ignore the
        second argument. Positions may be (L,) — shared across the
        batch — OR (B, L) when rows diverge (ragged prompts here;
        always possible in :func:`speculative_generate`): an
        absolute-PE embed hook must handle both ranks.
      readout: (B, 1, D) model output → (B, 1, V) logits (e.g. the tied
        transpose of the embedding).
      sampler: (logits (B, V), key) → (B,) ids. :func:`greedy` (default)
        or :func:`make_sampler` for temperature / top-k.
      rng: PRNG key for stochastic samplers (defaults to key 0).
      prompt_lengths: optional (B,) true lengths of right-padded prompts
        (ragged/continuous batching, dense or paged caches — not ring):
        each sequence's
        first sampled token reads position ``len_b - 1`` and its cache
        resumes at ``len_b``; generated positions are then per-sequence,
        so ``embed`` receives (B, 1) positions in the scan.
      model_kwargs: extra kwargs for ``model.apply`` (e.g. nothing for
        Transformer stacks; deterministic=True is implied by serving).

    Returns:
      (B, steps) int32 generated ids (prompt not included); with
      ``return_logprobs=True``, a tuple of that and the (B, steps) f32
      per-token log-probabilities of the EMITTED tokens under the
      model's raw distribution (log-softmax of the logits — independent
      of the sampler's temperature/top-k reshaping, the convention
      serving APIs report).
    """
    kw = model_kwargs or {}
    if rng is None:
        rng = jax.random.key(0)
    apply_step = _stepper(model, params, kw)

    # Prefill (one dispatch).
    p = prompt_ids.shape[1]
    ragged = prompt_lengths is not None
    if ragged:
        lens = jnp.asarray(prompt_lengths, jnp.int32)
        cache, y = apply_step({}, embed(prompt_ids, jnp.arange(p)),
                              prompt_lengths=lens)
        y_last = jnp.take_along_axis(y, (lens - 1)[:, None, None], axis=1)
    else:
        cache, y = apply_step({}, embed(prompt_ids, jnp.arange(p)))
        y_last = y[:, -1:]
    key0, key_scan = jax.random.split(rng)
    logits0 = readout(y_last)[:, 0]
    needs_seen = getattr(sampler, "needs_seen", False)
    if needs_seen:
        seen = _seen_from_prompt(prompt_ids, logits0.shape[-1],
                                 lens if ragged else None)
        tok = sampler(logits0, key0, seen)
        seen = _mark_seen(seen, tok)
    else:
        seen = None
        tok = sampler(logits0, key0)
    lp = (chosen_logprob(logits0, tok)
          if return_logprobs else None)

    def step(carry, xs):
        cache, tok, lp, seen = carry
        key, i = xs
        pos = (lens + i)[:, None] if ragged else (p + i)[None]
        cache, y = apply_step(cache, embed(tok[:, None], pos))
        logits = readout(y)[:, 0]
        if needs_seen:
            nxt = sampler(logits, key, seen)
            seen = _mark_seen(seen, nxt)
        else:
            nxt = sampler(logits, key)
        nlp = (chosen_logprob(logits, nxt)
               if return_logprobs else None)
        return (cache, nxt, nlp, seen), (tok, lp)

    (_, last, last_lp, _), (toks, lps) = jax.lax.scan(
        step, (cache, tok, lp, seen),
        (jax.random.split(key_scan, steps - 1),
         jnp.arange(steps - 1)))
    out = jnp.moveaxis(toks, 0, 1)  # (B, steps-1)
    ids = jnp.concatenate([out, last[:, None]], axis=1)
    if not return_logprobs:
        return ids
    lps = jnp.concatenate([jnp.moveaxis(lps, 0, 1), last_lp[:, None]],
                          axis=1)
    return ids, lps


def mask_after_eos(ids, eos_id: int, pad_id: int = 0):
    """Post-process fixed-length generations: keep everything up to and
    including each row's first ``eos_id``, replace the rest with
    ``pad_id``, and return (masked ids, lengths incl. the EOS token).
    Fixed-``steps`` scans can't early-exit per row (SPMD), so EOS is a
    masking contract: rows that never emit EOS keep full length."""
    ids = jnp.asarray(ids)
    is_eos = (ids == eos_id).astype(jnp.int32)
    seen = jnp.cumsum(is_eos, axis=1) - is_eos  # EOS itself not masked
    lengths = jnp.where(is_eos.any(axis=1),
                        jnp.argmax(is_eos, axis=1) + 1, ids.shape[1])
    return jnp.where(seen > 0, pad_id, ids), lengths


def _reject_paged(cache, what: str):
    """Batch-axis cache surgery assumes every leaf is batch-first; a
    paged cache's pool leaves (pages_k/pages_v) are page-major and its
    tables alias pool pages, so replicating/gathering rows would make
    forked rows WRITE into shared pages. Serve paged caches through
    generate()/ContinuousBatcher instead."""
    names = {str(getattr(p[-1], "key", p[-1]))
             for p, _ in jax.tree_util.tree_leaves_with_path(cache)}
    if "pages_k" in names:
        raise ValueError(f"{what} does not support paged KV caches "
                         "(pool leaves are not batch-first)")


def fork_cache(cache, n: int):
    """Prefix caching: replicate a prefilled cache ``n``× along the
    batch axis (every leaf is batch-first, including the per-sequence
    cache_index), so a shared prefix — a system prompt — prefills ONCE
    at batch B and then serves B·n divergent continuations. Combine with
    ``generate``'s per-token path or another (chunked) prefill for the
    per-request suffixes. Dense/ring caches only (paged pools are not
    batch-first; sharing prefix PAGES is the paged analogue)."""
    _reject_paged(cache, "fork_cache")
    return jax.tree.map(lambda c: jnp.repeat(c, n, axis=0), cache)


def _rewind(cache, delta):
    """Roll every layer's cache_index back by ``delta`` ((B,) int32).
    Rollback is FREE on dense caches: masks admit only slots below the
    per-sequence index, so stale K/V past the rewound index are invisible
    until overwritten."""

    def fix(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        return leaf - delta if name == "cache_index" else leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


def speculative_generate(model, params, draft_model, draft_params,
                         prompt_ids, steps: int, *,
                         embed: Callable, readout: Callable,
                         draft_embed: Optional[Callable] = None,
                         draft_readout: Optional[Callable] = None,
                         gamma: int = 4,
                         temperature: Optional[float] = None,
                         rng: Optional[jax.Array] = None,
                         model_kwargs: Optional[dict] = None,
                         draft_model_kwargs: Optional[dict] = None):
    """Speculative decoding: a cheap draft model proposes ``gamma``
    tokens per round, the target verifies them in ONE chunked KV-cache
    call, and both caches roll back by the per-sequence rejection count
    (per-batch ``cache_index`` + masked stale slots make rollback a
    subtraction). The draft only changes how many target dispatches it
    takes (1 + steps/(accepted+1) instead of steps), so a well-matched
    draft turns decode latency into prompt-prefill-shaped chunk passes.

    ``temperature=None`` (default): GREEDY — output is bit-identical to
    the target model's greedy continuation (acceptance = prefix match of
    argmaxes). ``temperature=T``: SPECULATIVE SAMPLING — the draft
    samples at T, each proposal is accepted with probability
    min(1, p(x)/q(x)), and a rejection resamples from the normalized
    residual max(p-q, 0) (the bonus token after a fully-accepted round
    samples from p directly), which makes the OUTPUT DISTRIBUTION
    exactly the target model's temperature-T sampling distribution
    (Leviathan et al.; distribution-tested).

    Uniform prompt lengths; dense or paged caches (ring caches can't
    rewind — overwritten slots are gone). Allocate ``max_decode_len >=
    prompt + steps + gamma + 1`` on BOTH models (a round can overshoot
    by up to gamma before truncation). ``readout`` must accept (B, L, D)
    for chunk verification, and ``embed`` receives (B, L) position
    arrays (rows diverge by acceptance) as well as the prompt's (L,) —
    absolute-PE hooks must handle both ranks (see the transformer
    example's ``hooks``).

    Returns ((B, steps) ids, mean accepted-per-round diagnostics (B,)).
    """
    kw = model_kwargs or {}
    dkw = draft_model_kwargs or {}
    d_embed = draft_embed if draft_embed is not None else embed
    d_readout = draft_readout if draft_readout is not None else readout
    t_step = _stepper(model, params, kw)
    d_step = _stepper(draft_model, draft_params, dkw)
    stochastic = temperature is not None
    temp = max(temperature, 1e-6) if stochastic else 1.0
    if rng is None:
        rng = jax.random.key(0)

    bsz, p = prompt_ids.shape
    cap = steps + gamma + 1
    eps = 1e-9

    # Prompt prefill on both models; the first generated token becomes
    # the shared pending token.
    tcache, y = t_step({}, embed(prompt_ids, jnp.arange(p)))
    dcache, _ = d_step({}, d_embed(prompt_ids, jnp.arange(p)))
    logits0 = readout(y[:, -1:])[:, 0]
    key, k0 = jax.random.split(rng)
    if stochastic:
        pending = jax.random.categorical(k0, logits0 / temp, axis=-1)
    else:
        pending = jnp.argmax(logits0, axis=-1)  # (B,)
    buf = jnp.zeros((bsz, cap), jnp.int32).at[:, 0].set(pending)
    count = jnp.ones((bsz,), jnp.int32)  # generated tokens committed
    rounds = jnp.zeros((), jnp.int32)

    def cond(carry):
        return jnp.min(carry[3]) < steps

    def body(carry):
        tcache, dcache, buf, count, pending, rounds, key = carry
        base = p + count - 1  # (B,) global position of the pending token
        key, kd, ka, kb = jax.random.split(key, 4)

        # Draft phase: gamma proposals, plus one extra feed so the draft
        # cache also holds the last proposal (uniform rewind later).
        # Emits each step's draft distribution (stochastic acceptance
        # needs q); categorical draws are row-independent under one key.
        def draft_one(carry, xs):
            i, ki = xs
            dcache, tok = carry
            dcache, y = d_step(dcache,
                               d_embed(tok[:, None], (base + i)[:, None]))
            lg = d_readout(y)[:, 0] / temp
            if stochastic:
                nxt = jax.random.categorical(ki, lg, axis=-1)
            else:
                nxt = jnp.argmax(lg, axis=-1)
            return (dcache, nxt), (tok, jax.nn.softmax(lg, axis=-1))

        (dcache, _), (toks, qdist) = jax.lax.scan(
            draft_one, (dcache, pending),
            (jnp.arange(gamma + 1), jax.random.split(kd, gamma + 1)))
        chunk = jnp.moveaxis(toks, 0, 1)  # (B, gamma+1): pending, d1..dg
        qdist = jnp.moveaxis(qdist, 0, 1)  # (B, gamma+1, V)

        # Target verification: one chunked cache call over the proposals.
        pos = base[:, None] + jnp.arange(gamma + 1)[None]
        tcache, y = t_step(tcache, embed(chunk, pos))
        t_logits = readout(y) / temp  # (B, gamma+1, V)

        d = chunk[:, 1:]  # proposals d_1..d_gamma (B, gamma)
        if stochastic:
            pdist = jax.nn.softmax(t_logits, axis=-1)
            p_d = jnp.take_along_axis(pdist[:, :gamma], d[..., None],
                                      axis=-1)[..., 0]
            q_d = jnp.take_along_axis(qdist[:, :gamma], d[..., None],
                                      axis=-1)[..., 0]
            u = jax.random.uniform(ka, d.shape)
            ok = (u * jnp.maximum(q_d, eps) < p_d).astype(jnp.int32)
            acc = jnp.cumprod(ok, axis=1).sum(axis=1)  # (B,) in [0,gamma]
            # Bonus: residual max(p-q, 0) at the rejection position, or
            # p itself after a fully-accepted round (q at index gamma
            # proposed nothing). Degenerate residual (p==q) falls back
            # to p — rejection there had probability 0 anyway.
            p_acc = jnp.take_along_axis(
                pdist, acc[:, None, None], axis=1)[:, 0]  # (B, V)
            q_acc = jnp.take_along_axis(
                qdist, acc[:, None, None], axis=1)[:, 0]
            resid = jnp.maximum(p_acc - q_acc, 0.0)
            rsum = resid.sum(-1, keepdims=True)
            use_p = (acc[:, None] == gamma) | (rsum <= eps)
            dist = jnp.where(use_p, p_acc, resid / jnp.maximum(rsum, eps))
            bonus = jax.random.categorical(
                kb, jnp.log(jnp.maximum(dist, 1e-30)), axis=-1)[:, None]
        else:
            g = jnp.argmax(t_logits, axis=-1)  # (B, gamma+1) greedy
            # Longest accepted prefix: d_{j+1} == g_j for j < gamma.
            match = (d == g[:, :-1]).astype(jnp.int32)
            acc = jnp.cumprod(match, axis=1).sum(axis=1)
            bonus = jnp.take_along_axis(g, acc[:, None], axis=1)

        # Commit d_1..d_acc then the bonus token; tail values past acc
        # are placeholders overwritten by later rounds.
        j = jnp.arange(gamma + 1)[None]
        w = jnp.where(j < acc[:, None], jnp.pad(d, ((0, 0), (0, 1))),
                      bonus)
        buf2 = jax.vmap(
            lambda b, ww, c: jax.lax.dynamic_update_slice(b, ww, (c,)))(
                buf, w.astype(buf.dtype), count)

        delta = gamma - acc
        return (_rewind(tcache, delta), _rewind(dcache, delta), buf2,
                count + acc + 1, bonus[:, 0], rounds + 1, key)

    tcache, dcache, buf, count, pending, rounds, key = jax.lax.while_loop(
        cond, body, (tcache, dcache, buf, count, pending, rounds, key))
    mean_accepted = (count - 1).astype(jnp.float32) / jnp.maximum(
        rounds, 1).astype(jnp.float32)
    return buf[:, :steps], mean_accepted


def beam_search(model, params, prompt_ids, steps: int, *,
                embed: Callable, readout: Callable, beam_size: int,
                model_kwargs: Optional[dict] = None):
    """Fixed-length beam search over the KV-cache serving protocol.

    The prompt prefills ONCE at batch B; the cache then expands to
    B·beam_size rows (one per live hypothesis) and every scan step
    re-gathers the whole cache pytree by the surviving beams' parent
    indices — hypothesis switching is a batch-axis gather, never a
    recompute. Beams score by total token log-probability; no EOS
    contract (fixed ``steps``), uniform prompt lengths.

    ``beam_size`` may exceed the vocab; expansion is capped at what
    exists (V hypotheses after the first token, V² after the second, …),
    so e.g. ``beam_size >= V**(steps-1)`` makes the search exhaustive.

    Returns ``(ids (B, beam_size, steps), scores (B, beam_size))``,
    best-first. Rows beyond the number of expressible hypotheses (fewer
    than beam_size at small V) are duplicates of live beams with -inf
    padding never selected — with beam_size <= V they do not occur.
    """
    kw = model_kwargs or {}
    K = beam_size
    apply_step = _stepper(model, params, kw)

    bsz, p = prompt_ids.shape
    cache, y = apply_step({}, embed(prompt_ids, jnp.arange(p)))
    logp = jax.nn.log_softmax(readout(y[:, -1:])[:, 0], axis=-1)  # (B, V)
    vocab = logp.shape[-1]

    # First expansion: top-K of V (padded with -inf when K > V, so the
    # pad hypotheses are never preferred; their token 0 rows duplicate
    # beam 0's cache and are simply never selected upward).
    if K > vocab:
        pad = jnp.full((bsz, K - vocab), -jnp.inf, logp.dtype)
        scores, tok0 = jax.lax.top_k(jnp.concatenate([logp, pad], -1), K)
        tok0 = jnp.where(tok0 < vocab, tok0, 0)
    else:
        scores, tok0 = jax.lax.top_k(logp, K)  # (B, K)

    # One cache row per hypothesis: (B, ...) -> (B*K, ...).
    cache = fork_cache(cache, K)

    def step(carry, i):
        cache, tok, scores = carry  # tok/scores: (B, K)
        pos = (p + i)[None]
        cache, y = apply_step(cache, embed(tok.reshape(-1, 1), pos))
        logp = jax.nn.log_softmax(readout(y)[:, 0], -1)  # (B*K, V)
        cand = scores[..., None] + logp.reshape(bsz, K, vocab)
        scores, flat = jax.lax.top_k(cand.reshape(bsz, K * vocab), K)
        parent, nxt = flat // vocab, flat % vocab  # (B, K)
        gidx = (jnp.arange(bsz)[:, None] * K + parent).reshape(-1)
        cache = jax.tree.map(lambda c: c[gidx], cache)
        return (cache, nxt, scores), (tok, parent)

    (_, last, scores), (toks, parents) = jax.lax.scan(
        step, (cache, tok0, scores), jnp.arange(steps - 1))

    # Backtrack: walk parent pointers from the final (sorted) beams.
    def back(ptr, xs):
        tok_t, parent_t = xs
        # ptr indexes beams in post-top-k order at step t; parent maps
        # to the pre-step order in which tok_t was emitted.
        ptr = jnp.take_along_axis(parent_t, ptr, axis=1)
        tok = jnp.take_along_axis(tok_t, ptr, axis=1)
        return ptr, tok

    ptr0 = jnp.broadcast_to(jnp.arange(K)[None], (bsz, K))
    _, rev = jax.lax.scan(back, ptr0, (toks, parents), reverse=True)
    ids = jnp.concatenate([jnp.moveaxis(rev, 0, 2), last[..., None]],
                          axis=2)  # (B, K, steps)
    return ids, scores
