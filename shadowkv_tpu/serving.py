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
    prefill_seconds: float = 0.0  # initial batch + admissions
    admission_seconds: float = 0.0  # admissions only (inside the loop)

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
    ):
        assert engine.cache_cfg.mode in ("shadow", "shadow_offload"), (
            "continuous batching serves the shadow cache modes"
        )
        assert engine.rt.sp == 1, (
            "continuous batching over an sp mesh is unsupported: "
            "admission prefills one slot, but sequence-parallel prefill "
            "is whole-batch with the cache batch-sharded over (dp, sp)"
        )
        self.engine = engine
        self.slots = slots or engine.rt.batch_size
        self.sample_args = (temperature, top_k, top_p)
        self.stop_ids = stop_ids
        self.seed = seed

    def run(self, requests: Sequence[Request]) -> tuple[dict, ServeStats]:
        """Serve ``requests`` to completion. Returns
        ({uid: np.ndarray generated tokens}, ServeStats)."""
        eng = self.engine
        stats = ServeStats()
        queue = list(requests)
        assert queue, "no requests"
        s = len(queue[0].input_ids)
        assert all(len(r.input_ids) == s for r in queue), (
            "all requests must share one (bucketed) prompt length — the "
            "shadow layout is static per prefill length"
        )
        cap = eng.cache_cfg.gen_capacity
        assert all(r.gen_len <= cap for r in queue)
        n_slots = min(self.slots, len(queue))

        key = jax.random.PRNGKey(self.seed)
        results: dict = {}
        slot_req: list[Optional[Request]] = [None] * n_slots
        slot_tokens: list[list[int]] = [[] for _ in range(n_slots)]

        # --- initial batch prefill (all slots at once) ---
        t0 = time.perf_counter()
        first = [queue.pop(0) for _ in range(n_slots)]
        ids = np.stack([r.input_ids for r in first])
        logits, cache = eng.prefill(ids)
        eng._cache = None  # the decode loop donates the cache
        for i, r in enumerate(first):
            slot_req[i] = r
        # per-slot generation depths
        cache = cache.replace(
            gen_len=jnp.zeros((n_slots,), jnp.int32)
        )
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

        def admit(i):
            """Prefill the next queued request INTO slot i of the live
            cache (other slots' state untouched — the sub-batch prefill
            machinery), sample its first token, record it. Loops in the
            degenerate case that a request finishes on its first
            token."""
            nonlocal tokens, cache, key
            while queue and slot_req[i] is None:
                r = queue.pop(0)
                t1 = time.perf_counter()
                # HBM mode prefills into the live cache at slot i;
                # offload modes additionally overwrite the host V
                # store's slot (Engine.admit_slot).
                lg, cache = eng.admit_slot(cache, r.input_ids, i)
                cache = cache.replace(
                    gen_len=cache.gen_len.at[i].set(0)
                )
                key, sub = jax.random.split(key)
                tok = eng._sample(lg, sub, *self.sample_args)  # [1]
                tokens = tokens.at[i].set(tok[0])
                slot_req[i] = r
                stats.admissions += 1
                span = time.perf_counter() - t1
                stats.prefill_seconds += span
                stats.admission_seconds += span
                record(i, int(np.asarray(tok)[0]))

        t_loop = time.perf_counter()
        # record the prefill-sampled first token of the initial batch
        toks0 = np.asarray(tokens)
        for i in range(n_slots):
            if record(i, int(toks0[i])):
                admit(i)

        while any(r is not None for r in slot_req):
            # idle slots (queue drained) keep stepping harmlessly; pin
            # their depth below capacity so the gen-region write stays
            # in range (the row is rewritten each step and never read —
            # valid_len only covers live tokens of live slots).
            active = jnp.asarray(
                [r is not None for r in slot_req], jnp.bool_
            )
            cache = cache.replace(
                gen_len=jnp.where(
                    active, cache.gen_len,
                    jnp.minimum(cache.gen_len, cap - 2),
                )
            )

            key, sub = jax.random.split(key)
            tokens, cache = eng._decode_shadow(
                eng.params, cache, tokens[:, None], sub, *self.sample_args
            )
            stats.decode_steps += 1

            toks = np.asarray(tokens)
            for i, r in enumerate(slot_req):
                if r is None:
                    continue
                if record(i, int(toks[i])):
                    admit(i)

        jax.block_until_ready(tokens)
        stats.wall_seconds = time.perf_counter() - t_loop
        return results, stats
