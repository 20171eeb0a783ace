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

- **Admission** (``_prefill`` + merge): new prompts prefill from a
  ZEROED cache at the full slot-pool width (freed slots carry the new
  right-padded prompts via ``prompt_lengths``; occupied slots carry a
  dummy row whose work is discarded), then a per-row ``where`` selects,
  leaf-by-leaf over the cache pytree, the fresh rows for admitted slots
  and the live rows for continuing ones. Prefilling into the live cache
  in place would be unsafe: the dense-cache chunk write lands at each
  row's own ``cache_index`` and ``dynamic_update_slice`` CLAMPS at the
  page boundary, so a continuing row near the end of its page would have
  live slots overwritten. The zeroed-cache + merge route never touches a
  continuing row.
- **Decode** (``_chunk``): ``chunk`` single-token steps as one
  ``lax.scan`` dispatch over all slots, each slot at its own global
  position (per-sequence ``cache_index`` keeps rows independent). The
  host then checks EOS / budget per slot, collects finished sequences,
  and frees their slots.

**Paged mode** (models built with ``kv_page_size``; detected from the
cache template): the KV memory is a POOL of pages smaller than
B x pages-per-sequence, and the scheduler allocates each request only
ceil(need/page) pages from a host-side free list — admission defers when
the pool is exhausted, pages recycle on completion. Page 0 is reserved
as a scratch target: rows whose writes must be discarded (idle slots,
the dummy rows of an admission prefill) point every table entry at it.
The admission merge becomes two-granularity: pool leaves (pages_k/v and
their int8 scales) merge per PAGE (this event's allocations take the
fresh data), while ``page_table`` is replaced wholesale with the host's
truth — which also retargets DEAD rows to scratch, closing the hazard
where a finished slot's stale table would let its garbage decode
scribble into pages reallocated to a newer request.

Slots whose sequence finished mid-chunk keep decoding garbage until the
chunk ends (SPMD can't early-exit one row); the host discards it and the
``wasted_slot_steps`` stat reports the overhead — shrink ``chunk`` to
trade dispatch count for tail waste. Dense or paged caches (ring caches
can't be row-merged: slot contents depend on global position history).
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ku.nn.decoding import _stepper, greedy

_POOL_LEAVES = ("pages_k", "pages_v", "key_scale_pages",
                "value_scale_pages")


def _leaf_name(path):
    return str(getattr(path[-1], "key", path[-1]))


class ContinuousBatcher:
    """A slot-pool serving scheduler over the KV-cache protocol.

    Args:
      model: flax module following the MultiHeadAttention cache protocol
        (``__call__([x], decode=True, prompt_lengths=...)``); dense or
        paged (``kv_page_size``) caches — no ``window``/ring.
        ``max_decode_len`` must cover ``prompt_len + max_new_tokens +
        chunk`` (the pending token of a just-finished row may run one
        chunk past its budget before the slot is recycled).
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
        self._embed = embed
        self._template = None  # zeroed cache pytree, built lazily
        apply_step = _stepper(model, params, model_kwargs or {})

        def _prefill(cache_in, prompts, lengths, key):
            cache, y = apply_step(cache_in,
                                  embed(prompts, jnp.arange(prompt_len)),
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

        def _merge_paged(live, fresh, admit, admit_pages):
            # Pool leaves merge per PAGE; page_table rows are replaced
            # wholesale (fresh == host truth: dead rows -> scratch);
            # everything else (cache_index, pending) merges per row.
            def sel(path, o, n):
                name = _leaf_name(path)
                if name == "page_table":
                    return n
                m = (admit_pages if name in _POOL_LEAVES else admit)
                return jnp.where(
                    m.reshape((-1,) + (1,) * (o.ndim - 1)), n, o)

            return jax.tree_util.tree_map_with_path(sel, live, fresh)

        def _set_tables(cache, tables):
            # One logical page assignment drives every layer's table.
            def fix(path, leaf):
                return tables if _leaf_name(path) == "page_table" else leaf

            return jax.tree_util.tree_map_with_path(fix, cache)

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
        self._merge_paged = jax.jit(_merge_paged)
        self._set_tables = jax.jit(_set_tables)
        self._chunk = jax.jit(_chunk_fn)

    # -- paged-pool introspection -------------------------------------

    def _build_template(self):
        """One throwaway prefill discovers the cache pytree; zero it
        (the call wrote a garbage token) and read the paged geometry."""
        B, P = self.num_slots, self.prompt_len
        cache, _ = self._prefill(
            {}, jnp.zeros((B, P), jnp.int32), jnp.ones((B,), jnp.int32),
            jax.random.key(0))
        self._template = jax.tree.map(jnp.zeros_like, cache)
        geom = set()
        for path, leaf in jax.tree_util.tree_leaves_with_path(cache):
            if _leaf_name(path) == "pages_k":
                geom.add((leaf.shape[0], leaf.shape[2]))
            elif _leaf_name(path) == "page_table":
                geom.add(("mp", leaf.shape[1]))
        self._paged = bool(geom)
        if self._paged:
            pools = {g for g in geom if g[0] != "mp"}
            mps = {g[1] for g in geom if g[0] == "mp"}
            if len(pools) != 1 or len(mps) != 1:
                raise ValueError(
                    f"paged layers disagree on pool geometry: {geom} — "
                    "the scheduler drives one shared page assignment")
            (self._n_pages, self._page), = pools
            self._mp = mps.pop()

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
          decoded_tokens; paged mode adds peak_pages_in_use).
        """
        n = len(prompts)
        budgets = ([int(max_new_tokens)] * n
                   if np.ndim(max_new_tokens) == 0
                   else [int(b) for b in max_new_tokens])
        if len(budgets) != n:
            raise ValueError("max_new_tokens must be scalar or match "
                             "len(prompts)")
        if any(b < 1 for b in budgets):
            raise ValueError("max_new_tokens must be >= 1 per request")
        B, P, chunk = self.num_slots, self.prompt_len, self.chunk
        for i, pr in enumerate(prompts):
            if not 1 <= len(pr) <= P:
                raise ValueError(f"prompt {i} length {len(pr)} outside "
                                 f"[1, {P}]")
            if len(pr) + budgets[i] + chunk > self.max_decode_len:
                raise ValueError(
                    f"request {i}: prompt {len(pr)} + budget "
                    f"{budgets[i]} + chunk {chunk} overruns "
                    f"max_decode_len {self.max_decode_len}")

        if self._template is None:
            self._build_template()
        paged = self._paged
        queue = deque(enumerate(prompts))
        results: list = [None] * n
        active = np.zeros(B, bool)
        slot_req = np.full(B, -1)
        slot_toks: list = [[] for _ in range(B)]
        lengths = np.zeros(B, np.int64)  # global index of pending token
        cache = pending = None
        stats = {"admission_events": 0, "chunks": 0,
                 "wasted_slot_steps": 0, "decoded_tokens": 0}
        if paged:
            # Page 0 is the scratch target; 1..NP-1 are allocatable.
            free_pages = deque(range(1, self._n_pages))
            slot_pages: list = [[] for _ in range(B)]
            tables = np.zeros((B, self._mp), np.int32)
            stats["peak_pages_in_use"] = 0

        def pages_needed(plen, budget):
            written = plen + -(-budget // chunk) * chunk
            return -(-written // self._page)

        while queue or active.any():
            free = np.flatnonzero(~active)
            if queue and free.size:
                pr = np.zeros((B, P), np.int32)
                ln = np.ones(B, np.int32)
                admit = np.zeros(B, bool)
                event_pages: list = []
                for s in free:
                    if not queue:
                        break
                    i, prompt = queue[0]
                    if paged:
                        need = pages_needed(len(prompt), budgets[i])
                        if need > len(free_pages):
                            break  # defer; FIFO order preserved
                        alloc = [free_pages.popleft() for _ in
                                 range(need)]
                        slot_pages[s] = alloc
                        event_pages.extend(alloc)
                        tables[s] = 0
                        tables[s, :need] = alloc
                    queue.popleft()
                    pr[s, :len(prompt)] = np.asarray(prompt, np.int32)
                    ln[s] = len(prompt)
                    admit[s] = True
                    slot_req[s] = i
                    slot_toks[s] = []
                    active[s] = True
                if paged and not admit.any() and not active.any():
                    i, prompt = queue[0]
                    raise ValueError(
                        f"request {i} needs "
                        f"{pages_needed(len(prompt), budgets[i])} pages "
                        f"but the pool only has {self._n_pages - 1} "
                        "allocatable — grow kv_num_pages")
                if admit.any():
                    self._key, kp = jax.random.split(self._key)
                    cache_in = self._template
                    if paged:
                        cache_in = self._set_tables(cache_in,
                                                    jnp.asarray(tables))
                        in_use = sum(len(p) for p in slot_pages)
                        stats["peak_pages_in_use"] = max(
                            stats["peak_pages_in_use"], in_use)
                    fresh_cache, fresh_pending = self._prefill(
                        cache_in, jnp.asarray(pr), jnp.asarray(ln), kp)
                    if cache is None:
                        cache, pending = fresh_cache, fresh_pending
                    elif paged:
                        pmask = np.zeros(self._n_pages, bool)
                        pmask[event_pages] = True
                        cache, pending = self._merge_paged(
                            (cache, pending),
                            (fresh_cache, fresh_pending),
                            jnp.asarray(admit), jnp.asarray(pmask))
                    else:
                        cache, pending = self._merge(
                            (cache, pending),
                            (fresh_cache, fresh_pending),
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
                        if paged:
                            # Recycle; the device-side table still points
                            # here until the next admission scratches it,
                            # but hand-out also only happens there — no
                            # window where stale writes can land in a
                            # reallocated page.
                            free_pages.extend(slot_pages[s])
                            slot_pages[s] = []
                            tables[s] = 0
                        break
            # Dead rows keep decoding until recycled; clamp their
            # positions so absolute-PE embed hooks never see indices
            # past the cache page (JAX clamps gathers, but don't rely
            # on it).
            lengths = np.where(active, lengths,
                               np.minimum(lengths, self.max_decode_len - 1))

        self.last_stats = stats
        return results
