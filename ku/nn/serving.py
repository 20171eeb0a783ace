"""Continuous batching: iteration-level scheduling over the KV-cache
serving protocol.

Reference analogue: none — the reference (tonandr/keras_unsupervised) has
no serving path at all; this completes ku's serving stack (ku/nn/
decoding.py loops, ku/nn/attention.py ragged per-sequence ``cache_index``)
with the scheduler that makes those primitives a *service*: a fixed pool
of batch SLOTS decodes continuously, and whenever a sequence finishes its
slot is recycled to the next queued request without stalling the others
(Orca-style iteration-level scheduling, here at chunk granularity — the
TPU-friendly quantum, since every decode chunk is ONE ``lax.scan``
dispatch).

Design (everything device-side runs at exactly TWO compiled shapes):

- **Admission** (``_prefill`` + ``_merge``): new prompts prefill from an
  EMPTY cache at the full slot-pool width (freed slots carry the new
  right-padded prompts via ``prompt_lengths``; occupied slots carry a
  dummy row whose work is discarded), then a per-row ``where`` selects,
  leaf-by-leaf over the cache pytree, the fresh rows for admitted slots
  and the live rows for continuing ones. Prefilling into the live cache
  in place would be unsafe: the dense-cache chunk write lands at each
  row's own ``cache_index`` and ``dynamic_update_slice`` CLAMPS at the
  page boundary, so a continuing row near the end of its page would have
  live slots overwritten. The empty-cache + merge route never touches a
  continuing row.
- **Decode** (``_chunk``): ``chunk`` single-token steps as one
  ``lax.scan`` dispatch over all slots, each slot at its own global
  position (per-sequence ``cache_index`` keeps rows independent). The
  host then checks EOS / budget per slot, collects finished sequences,
  and frees their slots.

Slots whose sequence finished mid-chunk keep decoding garbage until the
chunk ends (SPMD can't early-exit one row); the host discards it and the
``wasted_slot_steps`` stat reports the overhead — shrink ``chunk`` to
trade dispatch count for tail waste. Dense caches only (ring caches
can't be row-merged: slot contents depend on global position history).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ku.nn.decoding import _stepper, greedy


class ContinuousBatcher:
    """A slot-pool serving scheduler over the KV-cache protocol.

    Args:
      model: flax module following the MultiHeadAttention cache protocol
        (``__call__([x], decode=True, prompt_lengths=...)``); dense
        caches only — no ``window``/ring. ``max_decode_len`` must cover
        ``prompt_len + max_new_tokens + chunk`` (the pending token of a
        just-finished row may run one chunk past its budget before the
        slot is recycled).
      params: the model's 'params' collection.
      embed: (ids (B, L), positions) → (B, L, D); positions arrive as
        (B, 1) per-row global indices during decode and (P,) during
        prefill — same contract as :func:`ku.nn.generate` with
        ``prompt_lengths``.
      readout: (B, 1, D) → (B, 1, V) logits.
      num_slots: B, the fixed decode batch width (the compiled shape).
      prompt_len: P, the fixed right-padded prompt width (≥ 2; prompts
        longer than P are rejected — chunked prefill composes on dense
        caches, but admission keeps one compiled shape).
      max_decode_len: the model's cache page length (for budget checks).
      chunk: decode quantum — tokens generated per dispatch between
        scheduling points.
      sampler: (logits (B, V), key) → (B,) ids; greedy by default.
      eos_id: optional end-of-sequence token id; a slot frees as soon as
        its sequence emits it (the EOS itself is returned).
      rng: PRNG key for stochastic samplers.
      model_kwargs: extra kwargs for ``model.apply``.
    """

    def __init__(self, model, params, *, embed: Callable,
                 readout: Callable, num_slots: int, prompt_len: int,
                 max_decode_len: int, chunk: int = 8,
                 sampler: Callable = greedy, eos_id: Optional[int] = None,
                 rng: Optional[jax.Array] = None,
                 model_kwargs: Optional[dict] = None):
        if prompt_len < 2:
            # prompt_lengths needs a >1-wide chunk (attention.py guard).
            raise ValueError("prompt_len must be >= 2")
        if chunk < 1:
            raise ValueError("chunk must be >= 1")
        self.num_slots = num_slots
        self.prompt_len = prompt_len
        self.max_decode_len = max_decode_len
        self.chunk = chunk
        self.eos_id = eos_id
        self._key = rng if rng is not None else jax.random.key(0)
        apply_step = _stepper(model, params, model_kwargs or {})

        def _prefill(prompts, lengths, key):
            cache, y = apply_step({}, embed(prompts,
                                            jnp.arange(prompt_len)),
                                  prompt_lengths=lengths)
            y_last = jnp.take_along_axis(y, (lengths - 1)[:, None, None],
                                         axis=1)
            tok = sampler(readout(y_last)[:, 0], key)
            return cache, tok

        def _merge(live, fresh, admit):
            # live/fresh: (cache, pending) pytrees; every leaf is
            # batch-first (incl. the (B,) cache_index and pending).
            def sel(o, n):
                m = admit.reshape((-1,) + (1,) * (o.ndim - 1))
                return jnp.where(m, n, o)

            return jax.tree.map(sel, live, fresh)

        def _chunk_fn(cache, pending, lengths, keys):
            def step(carry, key):
                cache, tok, lens = carry
                cache, y = apply_step(cache, embed(tok[:, None],
                                                   lens[:, None]))
                nxt = sampler(readout(y)[:, 0], key)
                return (cache, nxt, lens + 1), tok

            (cache, pending, _), toks = jax.lax.scan(
                step, (cache, pending, lengths), keys)
            return cache, pending, jnp.moveaxis(toks, 0, 1)

        self._prefill = jax.jit(_prefill)
        self._merge = jax.jit(_merge)
        self._chunk = jax.jit(_chunk_fn)

    def serve(self, prompts: Sequence[Any], max_new_tokens) -> list:
        """Serve a workload of prompts through the slot pool.

        Args:
          prompts: sequence of 1-D int token arrays (ragged lengths in
            [1, prompt_len]).
          max_new_tokens: per-request generation budget — an int shared
            by all requests or a sequence matching ``prompts``.

        Returns:
          List of 1-D ``np.int32`` arrays in submission order: each
          request's generated tokens (EOS included when emitted; length
          ≤ its budget). ``self.last_stats`` holds scheduler counters
          for the run (admission_events, chunks, wasted_slot_steps,
          decoded_tokens).
        """
        n = len(prompts)
        budgets = ([int(max_new_tokens)] * n
                   if np.ndim(max_new_tokens) == 0
                   else [int(b) for b in max_new_tokens])
        if len(budgets) != n:
            raise ValueError("max_new_tokens must be scalar or match "
                             "len(prompts)")
        B, P, chunk = self.num_slots, self.prompt_len, self.chunk
        if any(b < 1 for b in budgets):
            raise ValueError("max_new_tokens must be >= 1 per request")
        for i, pr in enumerate(prompts):
            if not 1 <= len(pr) <= P:
                raise ValueError(f"prompt {i} length {len(pr)} outside "
                                 f"[1, {P}]")
            if len(pr) + budgets[i] + chunk > self.max_decode_len:
                raise ValueError(
                    f"request {i}: prompt {len(pr)} + budget "
                    f"{budgets[i]} + chunk {chunk} overruns "
                    f"max_decode_len {self.max_decode_len}")

        queue = deque(enumerate(prompts))
        results: list = [None] * n
        active = np.zeros(B, bool)
        slot_req = np.full(B, -1)
        slot_toks: list = [[] for _ in range(B)]
        lengths = np.zeros(B, np.int64)  # global index of pending token
        cache = pending = None
        stats = {"admission_events": 0, "chunks": 0,
                 "wasted_slot_steps": 0, "decoded_tokens": 0}

        while queue or active.any():
            free = np.flatnonzero(~active)
            if queue and free.size:
                pr = np.zeros((B, P), np.int32)
                ln = np.ones(B, np.int32)
                admit = np.zeros(B, bool)
                for s in free:
                    if not queue:
                        break
                    i, prompt = queue.popleft()
                    pr[s, :len(prompt)] = np.asarray(prompt, np.int32)
                    ln[s] = len(prompt)
                    admit[s] = True
                    slot_req[s] = i
                    slot_toks[s] = []
                    active[s] = True
                self._key, kp = jax.random.split(self._key)
                fresh_cache, fresh_pending = self._prefill(
                    jnp.asarray(pr), jnp.asarray(ln), kp)
                if cache is None:
                    cache, pending = fresh_cache, fresh_pending
                else:
                    cache, pending = self._merge(
                        (cache, pending), (fresh_cache, fresh_pending),
                        jnp.asarray(admit))
                lengths[admit] = ln[admit]
                stats["admission_events"] += 1

            self._key, kc = jax.random.split(self._key)
            cache, pending, toks = self._chunk(
                cache, pending, jnp.asarray(lengths, jnp.int32),
                jax.random.split(kc, chunk))
            toks = np.asarray(toks)
            lengths += chunk
            stats["chunks"] += 1
            for s in range(B):
                if not active[s]:
                    stats["wasted_slot_steps"] += chunk
                    continue
                for j in range(chunk):
                    t = int(toks[s, j])
                    slot_toks[s].append(t)
                    stats["decoded_tokens"] += 1
                    i = slot_req[s]
                    if ((self.eos_id is not None and t == self.eos_id)
                            or len(slot_toks[s]) >= budgets[i]):
                        results[i] = np.asarray(slot_toks[s], np.int32)
                        active[s] = False
                        stats["wasted_slot_steps"] += chunk - 1 - j
                        break
            # Dead rows keep decoding until recycled; clamp their
            # positions so absolute-PE embed hooks never see indices
            # past the cache page (JAX clamps gathers, but don't rely
            # on it).
            lengths = np.where(active, lengths,
                               np.minimum(lengths, self.max_decode_len - 1))

        self.last_stats = stats
        return results
