"""Chunk landmarks, outlier detection, top-k selection, hit/miss reorder.

Pure-jnp implementations of the selection machinery the reference builds
from torch ops + CUDA kernels:

- landmark/outlier computation at prefill (kv_cache.py:846-935),
- per-step landmark scoring + top-k (kv_cache.py:421-445, 983-1057,
  CUDA batch_gemm_softmax K12),
- the temporal-locality hits-first reorder that the reference implements
  as a shared-memory hash-map CUDA kernel (kernels/map.cuh:754-796).
  On TPU the candidate sets are tiny (select_sets <= 256 chunks), so a
  dense [S, S] membership comparison on the VPU replaces the hash map;
  races are designed out by functional semantics.

Shapes use B=batch, K=kv heads, G=GQA group, C=chunks, S=select_sets.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# ApproxTopK reduction_input_size_override multiplier (x next pow2 of
# the landmark count); 0 = stock lowering. Read at TRACE time — set
# SHADOWKV_TOPK_MULT (or assign the module var) before building jits.
# Default 2 — the measured recall/latency frontier on chip
# (probe_topk_recall, per-layer selection ms at the bench shapes):
#   C=7672 : exact 1.0/--  stock 1.0/0.99  mult2 .986/.76  mult8 .892/.72
#   C=15352: exact 1.0/1.26 stock .993/.89 mult2 .976/.85  mult8 .890/.82
# mult2 is the deepest reduction with >=0.95 recall at BOTH bench
# scales and is within noise of mult8's speed; exact costs ~6 ms/step
# e2e (bench_xla_exact_r4 156.0 vs 201.7 tok/s).
TOPK_OVERRIDE_MULT = int(os.environ.get("SHADOWKV_TOPK_MULT", "2"))
# Two-stage approx top-k: deep-approx to TOPK_TWO_STAGE*select_sets
# candidates, exact top-k over them. 0 = off (single-stage). Read at
# TRACE time like the mult override.
TOPK_TWO_STAGE = int(os.environ.get("SHADOWKV_TOPK_TWO_STAGE", "0"))


class LandmarkState(NamedTuple):
    landmarks: jnp.ndarray  # [B, K, C, Dh] post-RoPE chunk means (all chunks)
    landmark_mask: jnp.ndarray  # [B, K, C] bool, False at outlier chunks
    outlier_idx: jnp.ndarray  # [B, K, O] int32 outlier chunk ids


def compute_landmarks_outliers(
    k_roped_ctx: jnp.ndarray,
    outlier_chunks: int,
) -> LandmarkState:
    """Split context chunks into outliers and landmarks.

    Matches kv_cache.py:846-935: landmark candidate = chunk mean of
    post-RoPE K; outliers = the ``outlier_chunks`` chunks whose *minimum*
    intra-chunk cosine similarity to their mean is lowest.

    TPU-first representation: the landmark table keeps ALL chunk means
    in chunk-id order with a validity mask over outliers, instead of the
    reference's compacted table + id remap (kv_cache.py:915-926).
    Scoring masks outliers to -inf pre-softmax (identical distribution
    over valid rows) and the top-k indices then ARE chunk ids — removing
    a [B,K,S,C]-sized index-translation select-reduce from the decode
    hot path (~2.3 ms/step at 32K/batch-8) for ~1 % extra table rows.

    Args:
      k_roped_ctx: [B, K, C, chunk_size, Dh] post-RoPE context keys.
    """
    b, kh, c, cs, dh = k_roped_ctx.shape
    kf = k_roped_ctx.astype(jnp.float32)
    means = jnp.mean(kf, axis=-2)  # [B, K, C, Dh]

    # Cosine similarity between each token and its chunk mean.
    dots = jnp.einsum("bkcd,bkcsd->bkcs", means, kf)
    denom = (
        jnp.linalg.norm(means, axis=-1)[..., None]
        * jnp.linalg.norm(kf, axis=-1)
        + 1e-8
    )
    cos_sim = dots / denom  # [B, K, C, chunk]
    min_sim = jnp.min(cos_sim, axis=-1)  # [B, K, C]

    # Lowest min-similarity chunks are outliers (topk largest=False).
    _, outlier_idx = jax.lax.top_k(-min_sim, outlier_chunks)
    outlier_idx = outlier_idx.astype(jnp.int32)  # [B, K, O]

    is_outlier = (
        jnp.zeros((b, kh, c), jnp.bool_)
        .at[
            jnp.arange(b)[:, None, None],
            jnp.arange(kh)[None, :, None],
            outlier_idx,
        ]
        .set(True)
    )
    return LandmarkState(
        means.astype(k_roped_ctx.dtype),
        jnp.logical_not(is_outlier),
        outlier_idx,
    )


def score_and_select(
    query: jnp.ndarray,
    landmarks: jnp.ndarray,
    landmark_mask: jnp.ndarray,
    select_sets: int,
    approx: bool = False,
    landmark_scale: jnp.ndarray | None = None,
    resident_ids: jnp.ndarray | None = None,
    hysteresis: float = 0.0,
) -> jnp.ndarray:
    """Score landmarks against queries and pick top chunks.

    Matches the reference scoring exactly (accuracy-parity traps,
    SURVEY.md §7.2 item 7): scale fixed at 1/sqrt(128) regardless of
    head_dim (kv_cache.py:429,930,1017), softmax in fp32 over landmarks,
    sum over query positions, **max** over the GQA group
    (kv_cache.py:433,936,1023). Outlier chunks are masked to -inf before
    the softmax, which equals the reference's softmax over the compacted
    landmark table.

    Args:
      query: [B, K, G, Q, Dh] current queries grouped per KV head.
      landmarks: [B, K, C, Dh]; landmark_mask: [B, K, C] bool.
    Returns:
      selected chunk ids [B, K, select_sets] int32.
    """
    scores = jnp.einsum(
        "bkgqd,bkcd->bkgqc",
        query.astype(jnp.float32),
        landmarks.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(128.0).astype(jnp.float32)
    if landmark_scale is not None:  # int8 landmark table: q.(lm*s) =
        scores = scores * landmark_scale[:, :, None, None, :]  # (q.lm)*s
    scores = jnp.where(
        landmark_mask[:, :, None, None], scores, -jnp.inf
    )
    probs = jax.nn.softmax(scores, axis=-1)
    probs = jnp.sum(probs, axis=-2)  # over Q -> [B, K, G, C]
    probs = jnp.max(probs, axis=-2)  # over G -> [B, K, C]
    if resident_ids is not None and hysteresis:
        # Selection hysteresis (round 5, beyond-reference): boost the
        # chunks currently RESIDENT in the sparse buffer by a relative
        # margin. Near-tied scores (diffuse attention over thousands
        # of landmarks) make the top-S set thrash between adjacent
        # decode steps even when the distribution barely moves —
        # measured 0.32 slot-stay at b4/122K where peaked-score models
        # reach 0.5-0.6. A multiplicative (scale-free) bonus keeps a
        # resident unless a challenger beats it by >h relative — pure
        # anti-thrash damping, accuracy-validated by the oracle before
        # any default flips (a challenger within h of a resident is by
        # construction near-interchangeable attention mass).
        b_, k_, c_ = probs.shape
        bi = jnp.arange(b_)[:, None, None]
        ki = jnp.arange(k_)[None, :, None]
        res = (
            jnp.zeros((b_, k_, c_), jnp.bool_)
            .at[bi, ki, resident_ids]
            .set(True, mode="drop")
        )
        probs = probs * (1.0 + hysteresis * res.astype(probs.dtype))
    if approx:
        # TPU ApproxTopK partial reduction. In the decode program the
        # exact lax.top_k lowers to a full sort (measured on chip,
        # bench_xla_exact_r4: 156.0 tok/s vs 188.4 stock-approx vs
        # 201.7 mult8 at b4/122K — exact costs ~5.9 ms/step). The
        # variants on the recall/speed frontier:
        #   stock (mult=0): XLA's own >=0.95 recall contract — at
        #     C=7672 it falls back to a FULL sort, at C=15352 it
        #     reduces to 7680 rows before the aggregate sort.
        #   reduction_input_size_override (SHADOWKV_TOPK_MULT=m):
        #     claims m * next_pow2(C) inputs, forcing a DEEPER
        #     reduction — faster, but measured recall on chip drops
        #     below the bar (mult8: 0.892 at C=7672; mult4: 0.944 at
        #     C=15352, kernel_recall_r3c / kernel_tests_r3b).
        #   two-stage (SHADOWKV_TOPK_TWO_STAGE=f, default 0 = off;
        #     probe_topk_recall's grid used f=4): deep
        #     approx down to f*select_sets CANDIDATES (top-S recall
        #     of a deep reduce to 4S is far higher than its top-S-
        #     direct recall), then EXACT top-k over the f*S survivors
        #     (a small sort). Candidate indices map back through the
        #     stage-1 gather.
        c = probs.shape[-1]
        mult = TOPK_OVERRIDE_MULT
        if TOPK_TWO_STAGE > 0 and c >= 4096:
            m = TOPK_TWO_STAGE * select_sets
            ov = {}
            if mult > 0:
                ov["reduction_input_size_override"] = (
                    mult * (1 << (c - 1).bit_length())
                )
            cand_val, cand_idx = jax.lax.approx_max_k(
                probs, m, recall_target=0.95,
                aggregate_to_topk=True, **ov,
            )
            _, pos = jax.lax.top_k(cand_val, select_sets)
            top = jnp.take_along_axis(cand_idx, pos, axis=-1)
        elif c >= 4096 and mult > 0:
            override = mult * (1 << (c - 1).bit_length())
            _, top = jax.lax.approx_max_k(
                probs, select_sets, recall_target=0.95,
                aggregate_to_topk=True,
                reduction_input_size_override=override,
            )
        else:
            _, top = jax.lax.approx_max_k(
                probs, select_sets, recall_target=0.95,
                aggregate_to_topk=True,
            )
    else:
        _, top = jax.lax.top_k(probs, select_sets)
    return top.astype(jnp.int32)


class ReorderResult(NamedTuple):
    ids: jnp.ndarray  # [B, K, S] selected chunk ids, hits first
    hit_mask: jnp.ndarray  # [B, K, S] bool, True for slots reusing cache
    src_slot: jnp.ndarray  # [B, K, S] int32 buffer slot a hit comes from
    hit_count: jnp.ndarray  # [B, K] int32


def reorder_hits_first(
    prev_ids: jnp.ndarray, new_ids: jnp.ndarray
) -> ReorderResult:
    """Temporal-locality cache policy: pack re-selected chunks first.

    Functional equivalent of the reference CUDA hash-map kernel
    ``reorder_keys_and_mixed_offsets`` (kernels/map.cuh:621-683,754-796):
    chunks selected last step that are selected again keep their cached
    K/V (a D2D shuffle), only misses are fetched/reconstructed. Hits are
    packed at the front so downstream kernels can skip the hit prefix
    via ``hit_count`` (the reference's ``cnts``).

    Args:
      prev_ids: [B, K, S] chunk ids resident in the sparse buffer slots.
      new_ids:  [B, K, S] freshly selected chunk ids (top-k order).
    """
    s = new_ids.shape[-1]
    eq = new_ids[..., :, None] == prev_ids[..., None, :]  # [B,K,S,S]
    hit = jnp.any(eq, axis=-1)
    slot_of_new = jnp.argmax(eq, axis=-1).astype(jnp.int32)  # valid if hit

    # Stable partition: hits first, preserving top-k order inside each
    # group (argsort of miss flag is stable in jnp).
    order = jnp.argsort(
        jnp.logical_not(hit), axis=-1, stable=True
    ).astype(jnp.int32)
    ids = jnp.take_along_axis(new_ids, order, axis=-1)
    hit_sorted = jnp.take_along_axis(hit, order, axis=-1)
    src_slot = jnp.take_along_axis(slot_of_new, order, axis=-1)
    hit_count = jnp.sum(hit, axis=-1).astype(jnp.int32)
    return ReorderResult(ids, hit_sorted, src_slot, hit_count)


def take_small_int(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis over the last dim via one-hot select-reduce.

    XLA's native gather on TPU is latency-bound for narrow int rows
    (measured ~0.08 ms for an 8192-element gather); a broadcast compare
    + masked sum runs on the VPU in a few microseconds for the small
    shapes used in selection (S, C <= a few hundred).

    Args:
      arr: [..., C] int array; idx: [..., S] indices into C.
    Returns:
      [..., S] = arr[..., idx] (batched).
    """
    c = arr.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (c,), idx.ndim)
    eq = iota == idx[..., None]
    return jnp.sum(jnp.where(eq, arr[..., None, :], 0), axis=-1)


class SlotAssignment(NamedTuple):
    slot_ids: jnp.ndarray  # [B, K, S] chunk id occupying each slot
    stay_mask: jnp.ndarray  # [B, K, S] True where the slot's chunk stays
    stay_count: jnp.ndarray  # [B, K] int32 (the reference's hit count)


def assign_slots_stable(
    prev_slot_ids: jnp.ndarray, new_ids: jnp.ndarray
) -> SlotAssignment:
    """Slot-STABLE temporal-reuse policy (TPU-first redesign).

    Same semantics as the reference's hash-map hits-first repacking
    (kernels/map.cuh:754-796) — re-selected chunks keep their cached
    K/V, only newly selected chunks are fetched/reconstructed — but
    re-selected chunks KEEP THEIR SLOT instead of being packed to the
    front. The repacking only exists so the reference's CUDA kernels
    can early-exit on a contiguous hit prefix; attention is
    permutation-invariant over buffer rows, so on TPU slot stability
    is strictly better: the hit path becomes a dense ``where`` against
    the existing buffer (zero data movement) instead of two gathers.

    Incoming chunks (in new_ids but not resident) fill the slots
    vacated by evicted chunks, in order.

    Args:
      prev_slot_ids: [B, K, S] chunk ids currently in the buffer slots.
      new_ids: [B, K, S] freshly selected chunk ids (distinct).
    Returns:
      slot_ids: updated occupancy; stay_mask: per-slot reuse flag.
    """
    s = new_ids.shape[-1]
    # stay[slot]: is the resident chunk still selected?
    eq_stay = prev_slot_ids[..., :, None] == new_ids[..., None, :]
    stay = jnp.any(eq_stay, axis=-1)  # [B,K,S]
    # incoming[j]: is new_ids[j] not already resident?
    eq_in = new_ids[..., :, None] == prev_slot_ids[..., None, :]
    incoming = jnp.logical_not(jnp.any(eq_in, axis=-1))  # [B,K,S]

    # Vacant slots (ascending) receive the incoming chunks in
    # ASCENDING CHUNK-ID order: one [.., S] sort replaces the old
    # rank-matching select-reduce, and — because the hits-first miss
    # compaction (kernels/reconstruct.py compact_misses) preserves
    # slot order — each step's miss list comes out sorted in BOTH slot
    # and chunk space. Clustered real-model selections then produce
    # contiguous chunk RUNS the refresh kernel fetches with one DMA
    # per run instead of one per chunk (the per-DMA ~0.25 us issue
    # cost is its miss-regime deficit). Attention is
    # permutation-invariant over buffer rows, so placement order is
    # free to choose.
    vac_rank = jnp.cumsum(
        jnp.logical_not(stay).astype(jnp.int32), axis=-1
    ) - 1  # [B,K,S] valid where ~stay
    incoming_sorted = jnp.sort(
        jnp.where(incoming, new_ids, jnp.int32(2**30)), axis=-1
    )  # ascending incoming chunk ids, padded at the tail
    new_for_slot = take_small_int(
        incoming_sorted, jnp.maximum(vac_rank, 0)
    )
    slot_ids = jnp.where(stay, prev_slot_ids, new_for_slot)
    stay_count = jnp.sum(stay, axis=-1).astype(jnp.int32)
    return SlotAssignment(slot_ids, stay, stay_count)


def chunk_ids_to_positions(
    chunk_ids: jnp.ndarray, chunk_size: int
) -> jnp.ndarray:
    """[B, K, S] chunk ids -> [B, K, S * chunk_size] token positions."""
    offs = jnp.arange(chunk_size, dtype=jnp.int32)
    pos = chunk_ids[..., None] * chunk_size + offs
    return pos.reshape(*chunk_ids.shape[:-1], -1)
