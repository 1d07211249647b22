"""Continuous batching for long-context decode (serving scheduler).

The reference engine (and this repo's ``Engine.batch_generate``) drives
a STATIC batch: B sequences prefill together, decode in lockstep, and
the batch ends when the longest request finishes (reference
models/base.py:572-657). Under real serving traffic that strands decode
slots: a finished sequence's slot idles until the whole batch drains.

``ContinuousBatcher`` keeps the decode batch full: when a slot's
request completes, the next queued request is prefilled INTO THAT SLOT
(re-using the engine's sub-batch prefill machinery — prefill writes its
slices at a batch offset into the donated cache,
models/forward.py::prefill_shadow_into) and decoding resumes with the
other slots' state untouched. Per-slot generation depths ride the cache
as a [B] ``gen_len`` vector: positions/cos/sin gain a batch dim and the
gen-region appends go to per-slot rows (cache/shadow.py
``_append_gen_rows``). Attention is per-sequence, so a slot's tokens
are bit-identical to running its request alone (tests/test_serving.py
asserts greedy-token equality against isolated runs).

Scope notes:
- Shadow (HBM) AND offloaded-V cache modes: offload admission prefills
  a 1-slot cache, merges its V-less slices into the live cache, and
  overwrites the host store's slot (Engine.admit_slot — in-place numpy
  rows for the io_callback path, a pinned-host slot write or
  mirror-repin for the ring/fused-kernel paths).
- All requests share one prompt length (the ShadowLayout is static per
  prefill length; serving traffic is length-bucketed upstream exactly
  like the evaluation datasets, data/dataset.py).
- New capability vs the reference (no serving layer exists there,
  SURVEY.md §1 "no serving layer, no scheduler"); the BASELINE.json
  north star lists continuous batching of long-context decodes.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.models.engine import Engine


@dataclasses.dataclass
class Request:
    uid: int
    input_ids: np.ndarray  # [S] prompt tokens
    gen_len: int  # tokens to generate (incl. the first sampled one)
    # Shared-prefix (prompt-cache) fields: requests with the same
    # context_id share their first context_len prompt tokens verbatim
    # (the long document); the remainder of input_ids is the per-
    # request suffix (the question). The context is prefilled ONCE and
    # snapshotted; later admissions clone the snapshot and the suffix
    # rides the gen region as teacher-forced decode steps interleaved
    # with the other slots' live decoding (no admission stall).
    context_id: Optional[int] = None
    context_len: Optional[int] = None


@dataclasses.dataclass
class ServeStats:
    # wall_seconds covers the whole serve loop INCLUDING admission
    # prefills (end-to-end throughput); the initial batch prefill is
    # outside it. admission_seconds is the prefill time spent inside
    # the loop, so decode_seconds = wall - admissions is pure decode.
    wall_seconds: float = 0.0
    decode_steps: int = 0
    completed_requests: int = 0
    completed_tokens: int = 0
    admissions: int = 0  # mid-stream slot refills (not the first batch)
    chunks: int = 0  # decode dispatches (host syncs) in the loop
    prefill_seconds: float = 0.0  # initial batch + admissions
    admission_seconds: float = 0.0  # admissions only (inside the loop)
    context_hits: int = 0  # admissions served from a context snapshot
    context_prefills: int = 0  # contexts prefilled + snapshotted
    forced_tokens: int = 0  # suffix tokens teacher-forced in-loop

    @property
    def decode_seconds(self) -> float:
        return max(0.0, self.wall_seconds - self.admission_seconds)

    @property
    def tokens_per_second(self) -> float:
        """End-to-end serve throughput (admission stalls included)."""
        if self.wall_seconds == 0:
            return 0.0
        return self.completed_tokens / self.wall_seconds

    @property
    def decode_tokens_per_second(self) -> float:
        if self.decode_seconds == 0:
            return 0.0
        return self.completed_tokens / self.decode_seconds


class ContinuousBatcher:
    """Slot-based continuous batching over one Engine.

    Greedy/sampled decoding of a request stream with ``slots``
    concurrent sequences; finished slots are refilled from the queue
    without disturbing the other slots.
    """

    def __init__(
        self,
        engine: Engine,
        slots: Optional[int] = None,
        temperature: float = 0.0,
        top_k: int = 50,
        top_p: float = 0.9,
        stop_ids: tuple[int, ...] = (),
        seed: int = 0,
        max_contexts: int = 2,
        steps_per_dispatch="auto",
        max_dispatch: int = 64,
    ):
        assert engine.cache_cfg.mode in ("shadow", "shadow_offload"), (
            "continuous batching serves the shadow cache modes"
        )
        assert engine.rt.sp == 1, (
            "continuous batching over an sp mesh is unsupported: "
            "admission prefills one slot, but sequence-parallel prefill "
            "is whole-batch with the cache batch-sharded over (dp, sp)"
        )
        assert engine.rt.pp == 1, (
            "continuous batching over a pp mesh is unsupported: "
            "admission prefills one slot, but the pp prefill is a "
            "whole-batch pipelined program"
        )
        self.engine = engine
        self.slots = slots or engine.rt.batch_size
        self.sample_args = (temperature, top_k, top_p)
        self.stop_ids = stop_ids
        self.seed = seed
        # Decode steps dispatched per host sync. One token fetch per
        # step is a full host<->device round trip (catastrophic on
        # remote/tunneled chips: measured 0.6 s/step vs the 21 ms
        # device step at 122K) — dispatching a chunk of steps
        # asynchronously and replaying the bookkeeping after ONE sync
        # pipelines the dispatches exactly like Engine.batch_generate.
        # A slot finishing mid-chunk idles <= k-1 steps (its sampled
        # garbage is discarded, as idle slots' already is) and frees at
        # the chunk boundary; 1 restores per-step admission latency.
        #
        # 'auto' (default) sizes each chunk adaptively: when the queue
        # holds work, sync exactly at the next admission opportunity
        # (the soonest any live slot can finish — syncing earlier buys
        # nothing, later wastes steps a waiting request could use);
        # when the queue is drained, run the longest chunk the gen
        # region allows, capped by max_dispatch (sync cost amortizes,
        # nothing can be admitted anyway).
        self.steps_per_dispatch = (
            "auto"
            if steps_per_dispatch == "auto"
            else max(1, int(steps_per_dispatch))
        )
        self.max_dispatch = max(1, int(max_dispatch))
        # Shared-prefix snapshots: context_id -> (prefix fingerprint,
        # last-prefix-token logits [1,1,V], 1-slot cache pytree). Each
        # snapshot holds one slot's full shadow state (U/SV/landmarks/
        # buffers/V) in HBM — max_contexts bounds that memory; LRU.
        self.max_contexts = max_contexts
        self._ctx: dict = {}

    def run(self, requests: Sequence[Request]) -> tuple[dict, ServeStats]:
        """Serve ``requests`` to completion. Returns
        ({uid: np.ndarray generated tokens}, ServeStats)."""
        eng = self.engine
        stats = ServeStats()
        queue = list(requests)
        assert queue, "no requests"

        def prefix_len(r: Request) -> int:
            return (
                r.context_len
                if r.context_id is not None
                else len(r.input_ids)
            )

        def split(r: Request):
            p = prefix_len(r)
            return r.input_ids[:p], [int(t) for t in r.input_ids[p:]]

        s = prefix_len(queue[0])
        assert all(prefix_len(r) == s for r in queue), (
            "all requests must share one (bucketed) PREFILL length — the "
            "shadow layout is static per prefill length (for context "
            "requests that is context_len; suffixes ride the gen region)"
        )
        offload = eng.cache_cfg.mode == "shadow_offload"
        cap = eng.cache_cfg.gen_capacity
        assert all(
            r.gen_len + (len(r.input_ids) - prefix_len(r)) <= cap
            for r in queue
        ), "gen_len + suffix length must fit gen_capacity"
        n_slots = min(self.slots, len(queue))

        key = jax.random.PRNGKey(self.seed)
        results: dict = {}
        slot_req: list[Optional[Request]] = [None] * n_slots
        slot_tokens: list[list[int]] = [[] for _ in range(n_slots)]
        # teacher-forced suffix tokens still to consume, per slot
        slot_forced: list[list[int]] = [[] for _ in range(n_slots)]

        def fingerprint(prefix: np.ndarray):
            return hash(np.asarray(prefix, np.int32).tobytes())

        def snapshot_context(r: Request, lg_row, cache, i):
            """LRU-insert slot i's prefilled state for r.context_id.
            In offload mode the slot's host-side V rows ride along
            (the device pytree carries only a placeholder)."""
            if r.context_id is None or r.context_id in self._ctx:
                return
            if len(self._ctx) >= self.max_contexts:
                self._ctx.pop(next(iter(self._ctx)))  # evict LRU
            prefix, _ = split(r)
            self._ctx[r.context_id] = (
                fingerprint(prefix),
                jnp.asarray(lg_row),
                eng._extract_slot(cache, i),
                eng.host_slot_rows(i) if offload else None,
            )
            stats.context_prefills += 1

        # --- initial batch prefill (all slots at once) ---
        t0 = time.perf_counter()
        first = [queue.pop(0) for _ in range(n_slots)]
        ids = np.stack([split(r)[0] for r in first])
        logits, cache = eng.prefill(ids)
        eng._cache = None  # the decode loop donates the cache
        for i, r in enumerate(first):
            slot_req[i] = r
        # per-slot generation depths
        cache = cache.replace(
            gen_len=jnp.zeros((n_slots,), jnp.int32)
        )
        for i, r in enumerate(first):
            snapshot_context(r, logits[i : i + 1], cache, i)
        key, sub = jax.random.split(key)
        tokens = eng._sample(logits, sub, *self.sample_args)  # [B]
        stats.prefill_seconds += time.perf_counter() - t0

        def finish(i):
            r = slot_req[i]
            results[r.uid] = np.asarray(slot_tokens[i], np.int32)
            stats.completed_requests += 1
            stats.completed_tokens += len(slot_tokens[i])
            slot_tokens[i] = []
            slot_req[i] = None

        def record(i, tok: int):
            """Record a freshly sampled token for slot i. Invariant:
            every sampled token is recorded BEFORE the next decode step
            consumes it. Returns True if the slot finished."""
            r = slot_req[i]
            slot_tokens[i].append(tok)
            if len(slot_tokens[i]) >= r.gen_len or (
                self.stop_ids and tok in self.stop_ids
            ):
                finish(i)
                return True
            return False

        def start_suffix(i, suffix):
            """Feed a request's suffix through the decode loop: the
            first suffix token becomes slot i's next input; the rest
            wait in slot_forced and override the sampled token step by
            step (teacher-forcing interleaved with the other slots'
            live decoding — admission costs no stall). The first
            GENERATED token is the sampled output of the step that
            consumes the last suffix token."""
            nonlocal tokens
            tokens = tokens.at[i].set(suffix[0])
            slot_forced[i] = list(suffix[1:])
            stats.forced_tokens += len(suffix)

        def admit(i):
            """Prefill (or clone a context snapshot for) the next
            queued request INTO slot i of the live cache (other slots'
            state untouched), set up its first input token, record its
            first generated token when there is no suffix. Loops in the
            degenerate case that a request finishes on its first
            token."""
            nonlocal tokens, cache, key
            while queue and slot_req[i] is None:
                r = queue.pop(0)
                t1 = time.perf_counter()
                prefix, suffix = split(r)
                hit = r.context_id is not None and r.context_id in self._ctx
                if hit:
                    fp, lg, small, host_rows = self._ctx.pop(r.context_id)
                    assert fp == fingerprint(prefix), (
                        f"context_id {r.context_id} reused with a "
                        "different prefix"
                    )
                    self._ctx[r.context_id] = (fp, lg, small, host_rows)
                    if offload:
                        # the device pytree's v_full is a placeholder;
                        # the slot's real V rows restore host-side
                        cache = eng._merge_slots(cache, small, i)
                        eng.set_host_slot_rows(host_rows, i)
                    else:
                        cache = eng._merge_slots_v(cache, small, i)
                    stats.context_hits += 1
                else:
                    # HBM mode prefills into the live cache at slot i;
                    # offload modes additionally overwrite the host V
                    # store's slot (Engine.admit_slot).
                    lg, cache = eng.admit_slot(cache, prefix, i)
                    snapshot_context(r, lg, cache, i)
                cache = cache.replace(
                    gen_len=cache.gen_len.at[i].set(0)
                )
                slot_req[i] = r
                stats.admissions += 1
                # Admission EXECUTION must be booked here, not smeared
                # into the next decode chunk's sync (dispatch is async;
                # round-2 bench attributed ~12 s/admission of prefill
                # execution to "decode" time). gen_len is (re)written
                # by every admission path, so it is the sync point.
                jax.block_until_ready(cache.gen_len)
                if suffix:
                    start_suffix(i, suffix)
                    span = time.perf_counter() - t1
                    stats.prefill_seconds += span
                    stats.admission_seconds += span
                else:
                    key, sub = jax.random.split(key)
                    tok = eng._sample(lg, sub, *self.sample_args)  # [1]
                    tokens = tokens.at[i].set(tok[0])
                    span = time.perf_counter() - t1
                    stats.prefill_seconds += span
                    stats.admission_seconds += span
                    record(i, int(np.asarray(tok)[0]))

        t_loop = time.perf_counter()
        # first input per initial slot: the prefill-sampled token
        # (recorded as generated) or the request's first suffix token
        toks0 = np.asarray(tokens)
        for i in range(n_slots):
            _, suffix = split(slot_req[i])
            if suffix:
                start_suffix(i, suffix)
            elif record(i, int(toks0[i])):
                admit(i)

        # One k-step program per serve run: the scan length is static,
        # so k stays FIXED across chunks (a varying k would compile a
        # fresh 20-40 s program per distinct value). Overshoot past a
        # completion wastes <= k-1 device steps (~5 ms each) against
        # the ~0.5 s tunnel round trip every sync costs.
        use_chunk = getattr(eng, "_decode_chunk", None) is not None
        k_fixed = min(
            self.max_dispatch
            if self.steps_per_dispatch == "auto"
            else self.steps_per_dispatch,
            cap - 1,
        )

        while any(r is not None for r in slot_req):
            if use_chunk:
                k_steps = k_fixed
            else:
                # per-step dispatch fallback (pp engines): adaptive
                # chunk sizing amortizes what it can.
                live = [
                    len(slot_forced[i]) + (r.gen_len - len(slot_tokens[i]))
                    for i, r in enumerate(slot_req)
                    if r is not None
                ]
                remaining = max(live)
                if self.steps_per_dispatch == "auto":
                    horizon = min(live) if queue else remaining
                    k_steps = min(self.max_dispatch, max(1, horizon))
                else:
                    k_steps = min(
                        self.steps_per_dispatch, max(1, remaining)
                    )
                k_steps = min(k_steps, cap - 1)

            # idle slots (queue drained) keep stepping harmlessly; pin
            # their depth low enough that k_steps of growth stay inside
            # the gen region (the rows are rewritten each step and
            # never read — valid_len only covers live slots' tokens).
            active = jnp.asarray(
                [r is not None for r in slot_req], jnp.bool_
            )
            cache = cache.replace(
                gen_len=jnp.where(
                    active, cache.gen_len,
                    jnp.minimum(cache.gen_len, cap - 1 - k_steps),
                )
            )

            # --- dispatch k steps, then ONE sync. Chunked engines run
            #     the whole chunk as a single scanned program (one RPC
            #     through the tunnel); the fallback pipelines k async
            #     per-step dispatches. Teacher-forced overrides are
            #     schedulable in advance either way (forced queues only
            #     fill at admissions, which happen between chunks) ---
            forced_at = set()  # (step, slot) pairs replay must skip
            for i, r in enumerate(slot_req):
                if r is not None:
                    for t in range(min(len(slot_forced[i]), k_steps)):
                        forced_at.add((t, i))
            if use_chunk:
                fv = np.zeros((k_steps, n_slots), np.int32)
                fm = np.zeros((k_steps, n_slots), bool)
                for t, i in forced_at:
                    fv[t, i] = slot_forced[i][t]
                    fm[t, i] = True
                tokens, cache, key, toks = eng._decode_chunk(
                    eng.params, cache, tokens, key,
                    jnp.asarray(fv), jnp.asarray(fm), *self.sample_args
                )
                stats.decode_steps += k_steps
                toks_all = np.asarray(toks)  # [k, B] (the ONE sync)
            else:
                step_tokens = []
                for t in range(k_steps):
                    key, sub = jax.random.split(key)
                    tokens, cache = eng._decode_shadow(
                        eng.params, cache, tokens[:, None], sub,
                        *self.sample_args
                    )
                    stats.decode_steps += 1
                    step_tokens.append(tokens)
                    overrides = {
                        i: slot_forced[i][t]
                        for i, r in enumerate(slot_req)
                        if r is not None and t < len(slot_forced[i])
                    }
                    if overrides:
                        idx = jnp.asarray(list(overrides), jnp.int32)
                        val = jnp.asarray(
                            [overrides[j] for j in overrides],
                            tokens.dtype,
                        )
                        tokens = tokens.at[idx].set(val)
                toks_all = np.asarray(jnp.stack(step_tokens))  # [k, B]
            stats.chunks += 1

            # --- replay the bookkeeping in step order (identical
            #     record sequences to per-step dispatch; a slot
            #     finishing mid-chunk ignores its later steps and
            #     admits at the chunk boundary) ---
            for i in range(n_slots):
                consumed = min(len(slot_forced[i]), k_steps)
                slot_forced[i] = slot_forced[i][consumed:]
            for t in range(k_steps):
                for i, r in enumerate(slot_req):
                    if r is None or (t, i) in forced_at:
                        continue
                    record(i, int(toks_all[t, i]))
            for i in range(n_slots):
                if slot_req[i] is None and queue:
                    admit(i)

        jax.block_until_ready(tokens)
        stats.wall_seconds = time.perf_counter() - t_loop
        return results, stats
