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

- **Admission** (``_prefill`` + merge): new prompts prefill at the
  full slot-pool width (freed slots carry the new right-padded prompts
  via ``prompt_lengths``; occupied slots carry a dummy row), then a
  per-row ``where`` selects, leaf-by-leaf over the cache pytree, the
  fresh rows that WROTE this round and the live rows for everyone else.
  The merge is the safety mechanism: the prefill may run on a zeroed
  template (first chunk, no prefix) or on the LIVE cache (shared-prefix
  attends prefix pages; chunked long-prompt rounds >= 1 continue from
  earlier chunks), and in either case every dummy-row write is discarded
  by the mask — nothing a continuing row holds can change. Writes
  themselves must stay in-bounds: ``dynamic_update_slice`` CLAMPS at the
  page boundary (and the paged table gather clips), which is why
  ``_validate`` bounds the PADDED final-round window, not just the
  decode end.
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

from ku.nn.decoding import _mark_seen, _stepper, chosen_logprob, greedy

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
      prompt_len: P, the fixed right-padded prefill width (≥ 2). Longer
        prompts are admitted in ceil(len/P) chunked prefill ROUNDS at
        the same compiled shape — pick P near the workload's typical
        prompt length.
      max_decode_len: the model's cache page length (for budget checks).
      chunk: decode quantum — tokens generated per dispatch between
        scheduling points. An int, or a sequence of sizes (e.g.
        ``(8, 32, 128)``) for ADAPTIVE chunking: one compiled scan per
        size; each round picks the largest size fitting the tightest
        remaining budget (fewest dispatch round trips, bounded waste),
        dropping to the smallest only when EOS is enabled and requests
        are queued (EOS can free a slot on any token). Validation and
        paged-pool accounting use the largest size.
      sampler: (logits (B, V), key) → (B,) ids; greedy by default.
      return_logprobs: also track each emitted token's raw-model
        log-softmax probability; finished requests then map to
        ``(tokens, logprobs)`` tuples (and :meth:`progress` streams
        both).
      eos_id: optional end-of-sequence token id; a slot frees as soon as
        its sequence emits it (the EOS itself is returned).
      rng: PRNG key for stochastic samplers.
      model_kwargs: extra kwargs for ``model.apply``.
      mesh: optional ``jax.sharding.Mesh`` — the serving replica IS the
        mesh: params and every cache are placed by
        :func:`ku.dist.shard_decode_state` (attention heads + KV over
        ``model_axis``; with ``data_axis`` the slot/batch axis shards
        too — 2-D request-DP × head-TP). Pass ``num_head`` (and
        ``num_kv_head`` for GQA) so head divisibility is checked.
      model_axis / data_axis / num_head / num_kv_head: see ``mesh``.
    """

    def __init__(self, model, params, *, embed: Callable,
                 readout: Callable, num_slots: int, prompt_len: int,
                 max_decode_len: int, chunk: int = 8,
                 sampler: Callable = greedy,
                 return_logprobs: bool = False,
                 eos_id: Optional[int] = None,
                 rng: Optional[jax.Array] = None,
                 model_kwargs: Optional[dict] = None,
                 mesh=None, model_axis: str = "model",
                 data_axis: Optional[str] = None,
                 num_head: Optional[int] = None,
                 num_kv_head: Optional[int] = None):
        if prompt_len < 2:
            # prompt_lengths needs a >1-wide chunk (attention.py guard).
            raise ValueError("prompt_len must be >= 2")
        # ADAPTIVE chunking: a sequence of sizes (e.g. (8, 32, 128))
        # compiles one decode scan per size and picks per round — see
        # _pick_chunk (each dispatch costs ~28 ms over a TPU tunnel).
        # Budget/page accounting uses the LARGEST size (a row may
        # overrun its budget by up to chunk-1 dead tokens).
        chunks = ((chunk,) if isinstance(chunk, (int, np.integer))
                  else tuple(chunk))
        if not chunks or any(int(c) < 1 for c in chunks):
            raise ValueError("chunk must be >= 1 (or a non-empty "
                             "sequence of sizes >= 1)")
        self._chunks = tuple(sorted({int(c) for c in chunks}))
        self.chunk = self._chunks[-1]  # max: validation/page accounting
        self._mesh = mesh
        self._shard_kw = dict(model_axis=model_axis, data_axis=data_axis,
                              num_head=num_head, num_kv_head=num_kv_head)
        if mesh is not None:
            from ku.dist.mesh import shard_decode_state

            params, _ = shard_decode_state(params, {}, mesh,
                                           **self._shard_kw)
        self.num_slots = num_slots
        self.prompt_len = prompt_len
        self.max_decode_len = max_decode_len
        self.eos_id = eos_id
        self.return_logprobs = return_logprobs
        self._key = rng if rng is not None else jax.random.key(0)
        self._embed = embed
        self._template = None  # zeroed cache pytree, built lazily
        # Repetition-penalty samplers (make_sampler(repetition_penalty=))
        # need a (B, V) seen-token mask: rebuilt per slot at admission
        # from prefix+prompt, then updated device-side as tokens emit.
        needs_seen = getattr(sampler, "needs_seen", False)
        self._needs_seen = needs_seen
        # Params are an ARGUMENT of every jitted program, never a
        # closure: closure arrays embed as HLO constants, so a 0.9B
        # model's prefill/chunk compiles shipped ~2 GB per
        # remote_compile over a TPU tunnel — measured killing the
        # connection ("Broken pipe" ~30 min in) on three consecutive
        # hardware sweeps (round 5) while the same-size generate(),
        # which takes params as args, compiled in ~2 min.
        self._p = params
        _kw = model_kwargs or {}

        def apply_step(p, cache, x, **extra):
            return _stepper(model, p, _kw)(cache, x, **extra)

        def chosen_lp(logits, tok):
            if not return_logprobs:
                return jnp.zeros(tok.shape, jnp.float32)
            return chosen_logprob(logits, tok)

        def _prefill(p, cache_in, prompts, lengths, key, pos0, seen):
            # pos0: global position of the chunk's first token (0, or
            # the shared-prefix length when prompts continue a prefix).
            cache, y = apply_step(
                p, cache_in,
                embed(prompts, pos0 + jnp.arange(prompts.shape[1])),
                prompt_lengths=lengths)
            y_last = jnp.take_along_axis(y, (lengths - 1)[:, None, None],
                                         axis=1)
            logits = readout(y_last)[:, 0]
            if needs_seen:
                bsz, p = prompts.shape
                if seen is None:
                    seen = jnp.zeros((bsz, logits.shape[-1]), jnp.bool_)
                # Mark this round's prompt piece (padding past lengths
                # excluded). The sampled token is NOT marked here — the
                # decode step marks the fed token before sampling, and
                # non-final-round pendings are garbage anyway.
                valid = jnp.arange(p)[None] < lengths[:, None]
                seen = seen.at[jnp.arange(bsz)[:, None],
                               prompts].max(valid)
                tok = sampler(logits, key, seen)
            else:
                tok = sampler(logits, key)
            return cache, tok, chosen_lp(logits, tok), seen

        def _merge(live, fresh, admit):
            # Cache merge: every leaf is batch-first (incl. the (B,)
            # cache_index).
            def sel(o, n):
                m = admit.reshape((-1,) + (1,) * (o.ndim - 1))
                return jnp.where(m, n, o)

            return jax.tree.map(sel, live, fresh)

        def _merge_paged(live, fresh, admit, admit_pages):
            # Pool leaves merge per PAGE; page_table rows are replaced
            # wholesale (fresh == host truth: dead rows -> scratch);
            # everything else (cache_index) merges per row.
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

        def _set_ci(cache, value):
            # Start every row's cache_index at `value` (the shared-prefix
            # length) so an admission prefill writes/attends at the right
            # global positions; continuing rows' entries are later
            # discarded by the row merge.
            def fix(path, leaf):
                if _leaf_name(path) == "cache_index":
                    return jnp.full(leaf.shape, value, leaf.dtype)
                return leaf

            return jax.tree_util.tree_map_with_path(fix, cache)

        def _seed_pages(cache, src, dst):
            # Copy pool page `src` into per-row pages `dst` ((B,) ids;
            # non-admitted rows point at scratch page 0, which is
            # garbage by definition): gives each request a private copy
            # of a shared prefix's PARTIAL last page, which its own
            # writes will extend.
            def fix(path, leaf):
                if _leaf_name(path) in _POOL_LEAVES:
                    return leaf.at[dst].set(
                        jnp.broadcast_to(leaf[src][None],
                                         (dst.shape[0],) + leaf.shape[1:]))
                return leaf

            return jax.tree_util.tree_map_with_path(fix, cache)

        def _chunk_fn(p, cache, pending, pending_lp, lengths, keys, seen):
            def step(carry, key):
                cache, tok, lp, lens, seen = carry
                cache, y = apply_step(p, cache, embed(tok[:, None],
                                                      lens[:, None]))
                logits = readout(y)[:, 0]
                if needs_seen:
                    # The fed token is now part of the sequence.
                    seen = _mark_seen(seen, tok)
                    nxt = sampler(logits, key, seen)
                else:
                    nxt = sampler(logits, key)
                return ((cache, nxt, chosen_lp(logits, nxt), lens + 1,
                         seen), (tok, lp))

            (cache, pending, pending_lp, _, seen), (toks, lps) = \
                jax.lax.scan(
                    step, (cache, pending, pending_lp, lengths, seen),
                    keys)
            return (cache, pending, pending_lp,
                    jnp.moveaxis(toks, 0, 1), jnp.moveaxis(lps, 0, 1),
                    seen)

        self._prefill = jax.jit(_prefill)
        self._merge = jax.jit(_merge)
        self._merge_paged = jax.jit(_merge_paged)
        self._set_tables = jax.jit(_set_tables)
        self._set_ci = jax.jit(_set_ci)
        self._seed_pages = jax.jit(_seed_pages)
        self._chunk = jax.jit(_chunk_fn)

    # -- paged-pool introspection -------------------------------------

    def _build_template(self):
        """One throwaway prefill discovers the cache pytree; zero it
        (the call wrote a garbage token) and read the paged geometry."""
        import warnings

        B, P = self.num_slots, self.prompt_len
        with warnings.catch_warnings():
            # The small-pool identity-table aliasing warning does not
            # apply here: the scheduler overwrites every table value
            # before real use.
            warnings.filterwarnings("ignore", message=".*ALIASES.*")
            cache, _, _, seen = self._prefill(
                self._p, {}, jnp.zeros((B, P), jnp.int32),
                jnp.ones((B,), jnp.int32), jax.random.key(0), 0, None)
        self._template = jax.tree.map(jnp.zeros_like, cache)
        # Discovered vocab width for the repetition-penalty seen mask.
        self._seen0 = (jnp.zeros_like(seen) if self._needs_seen else None)
        if self._mesh is not None:
            # Place the template on the mesh once; every fresh cache and
            # merge output inherits the placement through GSPMD.
            from ku.dist.mesh import shard_decode_state

            _, self._template = shard_decode_state(
                {}, self._template, self._mesh, **self._shard_kw)
        geom = set()
        dense_mx = None
        for path, leaf in jax.tree_util.tree_leaves_with_path(cache):
            name = _leaf_name(path)
            if name == "pages_k":
                # Transposed pool (NP, hkv, d, pg): slots are MINOR.
                geom.add((leaf.shape[0], leaf.shape[3]))
            elif name == "page_table":
                geom.add(("mp", leaf.shape[1]))
            elif name == "cached_key":
                # Transposed dense cache (B, hkv, d, mx); ring caches
                # (slot-major) are rejected below via cache_pos.
                dense_mx = leaf.shape[3]
            elif name == "cache_pos":
                raise ValueError(
                    "ContinuousBatcher does not support ring (window) "
                    "caches — their slot contents depend on global "
                    "position history and cannot be row-merged")
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
        # Cross-check the declared max_decode_len against the model's
        # ACTUAL cache geometry: a larger declaration would let the
        # overrun guard pass for requests whose writes silently clamp
        # (dense) or drop (paged) past the real page, decoding against a
        # truncated cache with no error.
        real = self._mp * self._page if self._paged else dense_mx
        if real is not None and self.max_decode_len > real:
            raise ValueError(
                f"max_decode_len={self.max_decode_len} exceeds the "
                f"model's actual cache length {real} — size the model's "
                "max_decode_len to cover prompt+budget+chunk")

    # -- online scheduler (submit / step) -----------------------------

    def reset(self, shared_prefix=None, force: bool = False) -> None:
        """(Re)initialize the scheduler: empty queue and slots, fresh
        stats, and — with ``shared_prefix`` (paged mode only, length ≥ 2)
        — one prefix prefill into shared pages that every subsequent
        request's table aliases read-only. Refuses to discard queued or
        in-flight requests unless ``force=True``."""
        if self._template is not None and not self.idle and not force:
            raise RuntimeError(
                "reset() would discard queued/in-flight requests — "
                "drain with step() first or pass force=True")
        if self._template is None:
            self._build_template()
        B = self.num_slots
        self._queue: deque = deque()
        self._next_id = 0
        self._budgets: dict = {}
        self._active = np.zeros(B, bool)
        self._slot_req = [None] * B
        self._slot_toks: list = [[] for _ in range(B)]
        self._slot_lps: list = [[] for _ in range(B)]
        self._lengths = np.zeros(B, np.int64)  # pending token position
        self._cache = self._pending = self._pending_lp = None
        self._seen = self._seen0
        # Host-side base seen row every admitted slot restarts from
        # (marks the shared prefix's tokens once one is installed).
        self._base_seen_row = (
            np.zeros(self._seen0.shape[1], bool)
            if self._needs_seen else None)
        self._stats = {"admission_events": 0, "chunks": 0,
                       "wasted_slot_steps": 0, "decoded_tokens": 0}
        self.last_stats = self._stats
        self._n_shared_full, self._prefix_tail_page = 0, None
        self._shared_ids: list = []
        self._plen_pre = 0
        if self._paged:
            # Page 0 is the scratch target; 1..NP-1 are allocatable.
            self._free_pages = deque(range(1, self._n_pages))
            self._slot_pages: list = [[] for _ in range(B)]
            self._tables = np.zeros((B, self._mp), np.int32)
            self._stats["peak_pages_in_use"] = 0
        if shared_prefix is not None:
            if not self._paged:
                raise ValueError(
                    "shared_prefix needs a paged cache (kv_page_size) — "
                    "dense callers can prepend the prefix to each prompt "
                    "or use fork_cache")
            plen_pre = len(shared_prefix)
            if plen_pre < 2:
                raise ValueError("shared_prefix must have length >= 2")
            # Prefill the prefix ONCE into shared pages through row 0's
            # table; the tail page (if the prefix isn't page-aligned) is
            # copied per request at admission.
            self._plen_pre = plen_pre
            self._n_shared_full = plen_pre // self._page
            tail = plen_pre % self._page
            n_pre = self._n_shared_full + (1 if tail else 0)
            # The prefix pages never free, so at least one page must
            # REMAIN allocatable for requests.
            if n_pre + 1 > self._n_pages - 1:
                raise ValueError(
                    f"shared prefix needs {n_pre} pages and at least "
                    "one request page, but the pool has "
                    f"{self._n_pages - 1} allocatable")
            self._shared_ids = [self._free_pages.popleft()
                                for _ in range(n_pre)]
            if tail:
                self._prefix_tail_page = self._shared_ids[
                    self._n_shared_full]
            pr0 = np.zeros((B, plen_pre), np.int32)
            pr0[0] = np.asarray(shared_prefix, np.int32)
            ln0 = np.ones(B, np.int32)
            ln0[0] = plen_pre
            self._tables[0, :n_pre] = self._shared_ids
            self._key, kp = jax.random.split(self._key)
            self._cache, self._pending, self._pending_lp, _ = \
                self._prefill(
                    self._p,
                    self._set_tables(self._template,
                                     jnp.asarray(self._tables)),
                    jnp.asarray(pr0), jnp.asarray(ln0), kp, 0,
                    self._seen)
            self._tables[0] = 0  # row 0 is not a request
            if self._needs_seen:
                # Every request's sequence starts with these tokens.
                self._base_seen_row[np.asarray(shared_prefix,
                                               np.int64)] = True
            self._stats["shared_prefix_pages"] = n_pre

    @property
    def idle(self) -> bool:
        """True when no request is queued or decoding."""
        return (self._template is None
                or (not self._queue and not self._active.any()))

    def _result(self, s):
        toks = np.asarray(self._slot_toks[s], np.int32)
        if not self.return_logprobs:
            return toks
        return toks, np.asarray(self._slot_lps[s], np.float32)

    def progress(self) -> dict:
        """Tokens emitted SO FAR by every in-flight request
        ({request_id: np.int32 array}, or (tokens, logprobs) tuples with
        ``return_logprobs``) — poll between :meth:`step` calls to stream
        partial generations to clients."""
        if self._template is None:
            return {}
        return {self._slot_req[s]: self._result(s)
                for s in range(self.num_slots) if self._active[s]}

    def _validate(self, prompt, budget, plen_pre, label=""):
        P = self.prompt_len
        if budget < 1:
            raise ValueError(f"max_new_tokens{label} must be >= 1")
        if len(prompt) < 1:
            raise ValueError(f"prompt{label} must be non-empty")
        if plen_pre + len(prompt) + budget + self.chunk \
                > self.max_decode_len:
            raise ValueError(
                f"request{label}: prefix {plen_pre} + prompt "
                f"{len(prompt)} + budget {budget} + chunk {self.chunk} "
                f"overruns max_decode_len {self.max_decode_len}")
        # Long prompts prefill in fixed-P rounds whose FINAL write is a
        # full P-wide chunk at the last round's start: without room for
        # that padded window, the dense dynamic_update_slice CLAMPS (and
        # the paged table gather clips) the write backwards over real
        # prompt K/V below cache_index — silent corruption.
        window = plen_pre + -(-len(prompt) // P) * P
        if window > self.max_decode_len:
            raise ValueError(
                f"request{label}: the padded prefill window (prefix "
                f"{plen_pre} + ceil(len/{P})*{P} = {window}) overruns "
                f"max_decode_len {self.max_decode_len} — grow the "
                "model's cache or lower prompt_len")

    def submit(self, prompt, max_new_tokens: int, request_id=None):
        """Enqueue one request (admitted at the next :meth:`step`);
        returns its id (auto-assigned ints unless given). Requests may
        be submitted at ANY time — including while earlier ones are
        mid-decode. Prompts longer than ``prompt_len`` are prefilled in
        chunked admission rounds at the fixed shape."""
        if self._template is None:
            self.reset()
        budget = int(max_new_tokens)
        self._validate(prompt, budget, self._plen_pre)
        if request_id is None:
            request_id = self._next_id
            self._next_id += 1
        elif request_id in self._budgets:
            raise ValueError(f"request_id {request_id!r} is already "
                             "queued or in flight")
        self._budgets[request_id] = budget
        self._queue.append((request_id, np.asarray(prompt, np.int32)))
        return request_id

    def _pages_needed(self, plen, budget):
        P = self.prompt_len
        written = max(
            self._plen_pre + plen + -(-budget // self.chunk) * self.chunk,
            self._plen_pre + -(-plen // P) * P)  # padded prefill window
        return -(-written // self._page) - self._n_shared_full

    def _admit(self):
        """Fill free slots from the queue. Prompts may exceed
        ``prompt_len``: admission prefills in ceil(len/P) ROUNDS at the
        fixed (B, P) shape — dense-cache chunked prefill composes, and
        each round's merge takes only the rows that wrote (rows whose
        prompt ended in an earlier round keep their state; a done row's
        dummy writes land at positions above its cache_index, invisible
        until decode overwrites them — the ragged-padding argument)."""
        B, P = self.num_slots, self.prompt_len
        paged, plen_pre = self._paged, self._plen_pre
        free = np.flatnonzero(~self._active)
        if not (self._queue and free.size):
            return False
        admitted: list = []  # (slot, prompt) pairs
        admit = np.zeros(B, bool)
        event_pages: list = []
        seed_dst = np.zeros(B, np.int32)
        for s in free:
            if not self._queue:
                break
            rid, prompt = self._queue[0]
            if paged:
                need = self._pages_needed(len(prompt),
                                          self._budgets[rid])
                if need > len(self._free_pages):
                    break  # defer; FIFO order preserved
                alloc = [self._free_pages.popleft() for _ in range(need)]
                self._slot_pages[s] = alloc
                event_pages.extend(alloc)
                self._tables[s] = 0
                if self._n_shared_full:
                    self._tables[s, :self._n_shared_full] = \
                        self._shared_ids[:self._n_shared_full]
                self._tables[s, self._n_shared_full:
                             self._n_shared_full + need] = alloc
                if self._prefix_tail_page is not None:
                    seed_dst[s] = alloc[0]
            self._queue.popleft()
            admitted.append((s, prompt))
            admit[s] = True
            self._slot_req[s] = rid
            self._slot_toks[s] = []
            self._slot_lps[s] = []
            self._active[s] = True
            self._lengths[s] = plen_pre + len(prompt)
        if paged and not admit.any() and not self._active.any():
            rid, prompt = self._queue[0]
            allocatable = (self._n_pages - 1
                           - self._stats.get("shared_prefix_pages", 0))
            raise ValueError(
                f"request {rid} needs "
                f"{self._pages_needed(len(prompt), self._budgets[rid])} "
                f"pages but the pool only has {allocatable} allocatable "
                "(after the shared prefix) — grow kv_num_pages")
        if not admitted:
            return False
        if self._cache is None:
            # Uniform starting point so every round can merge: zeroed
            # template + zero pending (idle rows are garbage anyway).
            self._cache = self._template
            self._pending = jnp.zeros((B,), jnp.int32)
            self._pending_lp = jnp.zeros((B,), jnp.float32)
        if self._needs_seen:
            # Recycled slots restart from the base row (prefix tokens
            # only); their previous request's seen state is discarded.
            admit_j = jnp.asarray(admit)[:, None]
            base = jnp.asarray(self._base_seen_row)[None]
            self._seen = jnp.where(admit_j, base, self._seen)
        if paged:
            pmask = np.zeros(self._n_pages, bool)
            pmask[event_pages] = True
            pmask_j = jnp.asarray(pmask)
            in_use = (sum(len(p) for p in self._slot_pages)
                      + self._stats.get("shared_prefix_pages", 0))
            self._stats["peak_pages_in_use"] = max(
                self._stats["peak_pages_in_use"], in_use)

        rounds = max(-(-len(pr) // P) for _, pr in admitted)
        for c in range(rounds):
            sub = np.zeros((B, P), np.int32)
            sub_ln = np.ones(B, np.int32)
            write = np.zeros(B, bool)
            done = np.zeros(B, bool)
            for s, prompt in admitted:
                piece = prompt[c * P:(c + 1) * P]
                if len(piece):
                    sub[s, :len(piece)] = piece
                    sub_ln[s] = len(piece)
                    write[s] = True
                    done[s] = (c + 1) * P >= len(prompt)
            # Round 0 runs on the live cache only when a prefix must be
            # attended; later rounds ALWAYS continue from the merged
            # live cache (earlier chunks live there). The merge discards
            # every dummy-row write, so running on the live cache is
            # safe in all modes.
            pos0 = plen_pre + c * P
            cache_in = (self._cache if (plen_pre or c)
                        else self._template)
            if paged:
                cache_in = self._set_tables(cache_in,
                                            jnp.asarray(self._tables))
                if pos0:
                    cache_in = self._set_ci(cache_in, pos0)
                if c == 0 and self._prefix_tail_page is not None:
                    cache_in = self._seed_pages(
                        cache_in, self._prefix_tail_page,
                        jnp.asarray(seed_dst))
            self._key, kp = jax.random.split(self._key)
            fresh_cache, fresh_pending, fresh_lp, fresh_seen = \
                self._prefill(
                    self._p, cache_in, jnp.asarray(sub),
                    jnp.asarray(sub_ln), kp, pos0, self._seen)
            if self._needs_seen:
                self._seen = jnp.where(jnp.asarray(write)[:, None],
                                       fresh_seen, self._seen)
            if paged:
                self._cache = self._merge_paged(
                    self._cache, fresh_cache, jnp.asarray(write),
                    pmask_j)
            else:
                self._cache = self._merge(self._cache, fresh_cache,
                                          jnp.asarray(write))
            # The first generated token comes from each row's FINAL
            # prompt chunk.
            done_j = jnp.asarray(done)
            self._pending = jnp.where(done_j, fresh_pending,
                                      self._pending)
            self._pending_lp = jnp.where(done_j, fresh_lp,
                                         self._pending_lp)
        self._stats["admission_events"] += 1
        self._stats["prefill_rounds"] = (
            self._stats.get("prefill_rounds", 0) + rounds)
        return True

    def _pick_chunk(self) -> int:
        """Adaptive policy over ``self._chunks``: the largest size that
        does not overshoot the TIGHTEST remaining budget among active
        rows (bounded dead-token waste, fewest dispatch round trips) —
        without EOS no slot can free any earlier than that row's budget,
        so queued requests lose nothing to a big chunk. Only with an
        ``eos_id`` AND a non-empty queue does the policy drop to the
        smallest size: EOS can free a slot on any token, and a small
        chunk reaches the admission point fast."""
        if len(self._chunks) == 1:
            return self._chunks[0]
        if self._queue and self.eos_id is not None:
            return self._chunks[0]
        remaining = min(
            (self._budgets[self._slot_req[s]] - len(self._slot_toks[s])
             for s in range(self.num_slots) if self._active[s]),
            default=self._chunks[0])
        best = self._chunks[0]
        for c in self._chunks[1:]:
            if c <= max(remaining, self._chunks[0]):
                best = c
        return best

    def step(self) -> dict:
        """One scheduling round: admit what fits, decode ONE chunk
        (a single ``lax.scan`` dispatch), harvest finished slots.

        Returns {request_id: (tokens,) np.int32} for requests that
        FINISHED this round (empty dict if none, or if the engine is
        idle). Drive a server loop with ``submit()`` + ``step()``;
        ``self.idle`` says when everything drained."""
        if self._template is None or self.idle:
            return {}
        self._admit()
        B, paged = self.num_slots, self._paged
        chunk = self._pick_chunk()
        self._key, kc = jax.random.split(self._key)
        (self._cache, self._pending, self._pending_lp, toks,
         lps, self._seen) = self._chunk(
            self._p, self._cache, self._pending, self._pending_lp,
            jnp.asarray(self._lengths, jnp.int32),
            jax.random.split(kc, chunk), self._seen)
        toks = np.asarray(toks)
        lps = np.asarray(lps)
        self._lengths += chunk
        self._stats["chunks"] += 1
        finished = {}
        for s in range(B):
            if not self._active[s]:
                self._stats["wasted_slot_steps"] += chunk
                continue
            rid = self._slot_req[s]
            for j in range(chunk):
                t = int(toks[s, j])
                self._slot_toks[s].append(t)
                self._slot_lps[s].append(float(lps[s, j]))
                self._stats["decoded_tokens"] += 1
                if ((self.eos_id is not None and t == self.eos_id)
                        or len(self._slot_toks[s])
                        >= self._budgets[rid]):
                    finished[rid] = self._result(s)
                    del self._budgets[rid]  # bounded run-forever loops
                    self._active[s] = False
                    self._stats["wasted_slot_steps"] += chunk - 1 - j
                    if paged:
                        # Recycle; the device-side table still points
                        # here until the next admission scratches it,
                        # but hand-out also only happens there — no
                        # window where stale writes can land in a
                        # reallocated page.
                        self._free_pages.extend(self._slot_pages[s])
                        self._slot_pages[s] = []
                        self._tables[s] = 0
                    break
        # Dead rows keep decoding until recycled; clamp their positions
        # so absolute-PE embed hooks never see indices past the cache
        # page (JAX clamps gathers, but don't rely on it).
        self._lengths = np.where(
            self._active, self._lengths,
            np.minimum(self._lengths, self.max_decode_len - 1))
        return finished

    def serve(self, prompts: Sequence[Any], max_new_tokens,
              shared_prefix=None) -> list:
        """Serve a whole workload through the slot pool (a
        :meth:`reset` + :meth:`submit` loop + :meth:`step` drain).

        Args:
          prompts: sequence of 1-D int token arrays (ragged lengths;
            prompts longer than ``prompt_len`` prefill in chunked
            rounds).
          max_new_tokens: per-request generation budget — an int shared
            by all requests or a sequence matching ``prompts``.
          shared_prefix: optional 1-D int token array (length ≥ 2) every
            request's sequence starts with — a system prompt. PAGED mode
            only: the prefix prefills ONCE into shared pages that every
            request's table aliases read-only (the paged answer to
            :func:`ku.nn.fork_cache`); a non-page-aligned tail is copied
            into each request's first own page at admission. Each
            request's output is the continuation of prefix + prompt.

        Returns:
          List of 1-D ``np.int32`` arrays in submission order: each
          request's generated tokens (EOS included when emitted; length
          ≤ its budget) — or, with ``return_logprobs=True``,
          (tokens, logprobs) tuples. ``self.last_stats`` holds scheduler counters
          for the run (admission_events, chunks, wasted_slot_steps,
          decoded_tokens; paged mode adds peak_pages_in_use and, with a
          prefix, shared_prefix_pages).
        """
        n = len(prompts)
        budgets = ([int(max_new_tokens)] * n
                   if np.ndim(max_new_tokens) == 0
                   else [int(b) for b in max_new_tokens])
        if len(budgets) != n:
            raise ValueError("max_new_tokens must be scalar or match "
                             "len(prompts)")
        plen_pre = 0 if shared_prefix is None else len(shared_prefix)
        for i, (pr, b) in enumerate(zip(prompts, budgets)):
            self._validate(pr, b, plen_pre, label=f" {i}")
        self.reset(shared_prefix=shared_prefix)
        results: list = [None] * n
        for i, (pr, b) in enumerate(zip(prompts, budgets)):
            self.submit(pr, b, request_id=i)
        while not self.idle:
            results_step = self.step()
            for rid, toks in results_step.items():
                results[rid] = toks
        return results
