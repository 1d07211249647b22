"""ShadowKV sparse KV cache: low-rank K in HBM, chunked V store,
landmark-selected sparse attention with a hits-first reuse policy.

Functional TPU rebuild of the reference ``ShadowKVCache`` /
``ShadowKVCache_CPU`` (models/kv_cache.py:155-1319). All state is one
pytree threaded through the jitted decode step; the per-layer mutation
of the reference (in-place CUDA buffer updates) becomes
``dynamic_update_slice`` on stacked [L, ...] arrays inside the layer
scan, which XLA turns back into in-place updates via buffer donation.

Compact buffer layout per (layer, batch, kv head), identical to the
reference (kv_cache.py:399-400, 891-894):

    [ prefill_local | outlier_chunks * chunk | sparse_budget | gen ]
      0 .. pl         pl .. sparse_start       .. sparse_end    .. cap

The V store is chunk-major [L, B, K, C, chunk * Dh] exactly like the
reference's pinned-CPU layout (kv_cache.py:554-563) so one chunk is one
contiguous row — on TPU this keeps every gather a dense 1024-element
(8 x 128) tile, lane-aligned for DMA. It lives in HBM by default and in
``pinned_host`` memory when offload mode is enabled.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from shadowkv_tpu.config import CacheConfig, ModelConfig
from shadowkv_tpu.core import rope as rope_lib
from shadowkv_tpu.core.lowrank import lowrank_kv_factors
from shadowkv_tpu.core.quant import (
    flat_trailer_lanes,
    scale_lanes_for,
    flat_u_scales,
    flat_v_scales,
    pack_shadow_int8,
    quantize_rows,
    u_scales_from_rows,
    v_scales_from_rows,
)
from shadowkv_tpu.core.selection import (
    chunk_ids_to_positions,
    compute_landmarks_outliers,
    assign_slots_stable,
    score_and_select,
)


@dataclasses.dataclass(frozen=True)
class ShadowLayout:
    """Static (trace-time) geometry of the shadow cache.

    Computed from the prefill length the way the reference does at
    prefill time (kv_cache.py:836-894): context chunks rounded down to a
    multiple of 8, the remainder + last ``local_chunks`` chunks kept
    dense as the "local" region.
    """

    prefill_len: int
    chunk_size: int
    chunks: int  # context chunks (landmark + outlier candidates)
    prefill_local: int  # dense local region (remainder + local chunks)
    outlier_chunks: int
    num_landmarks: int  # chunks - outlier_chunks
    select_sets: int  # sparse_budget // chunk_size
    sparse_start: int
    sparse_end: int
    gen_capacity: int
    buffer_cap: int
    rank: int
    rank_pad: int  # rank rounded up to a lane multiple (128); U/SV are
    # stored zero-padded to it so the refresh kernel's DMA units are
    # tiling-aligned — physically free, XLA pads the minor dim anyway.
    # int8 mode additionally reserves scale_lanes_for(kh) tail lanes of every U
    # token row for the embedded per-token scales (core/quant.py).
    quant: str = "none"  # 'none' | 'int8': V store / U factors /
    # landmarks quantized per row, ~2x feasible batch at 122K (the
    # memory-for-batch trade standing in for the reference's host
    # offload on bandwidth-limited hosts).
    kernel_store: bool = False  # int8 store layout: False = flat rows
    # (the XLA decode path's gather shape), True = (32, row) tiles (the
    # Pallas refresh kernel's DMA shape). Same bytes per chunk, but not
    # bitcastable under TPU tiling — chosen at init for the decode path
    # that will read the store (core/quant.py module docstring).

    @classmethod
    def build(
        cls,
        cache: CacheConfig,
        prefill_len: int,
        kernel_store: bool = False,
        num_kv_heads: int | None = None,
    ) -> "ShadowLayout":
        cs = cache.chunk_size
        assert prefill_len % 8 == 0, "prefill length must be 8-aligned"
        chunks = prefill_len // cs - cache.local_chunks
        chunks -= chunks % 8
        prefill_local = prefill_len - chunks * cs
        outl = cache.resolved_outlier_chunks()
        select_sets = cache.select_sets
        assert select_sets + outl <= chunks, (
            f"prefill {prefill_len} too short for sparse_budget "
            f"{cache.sparse_budget} + {outl} outliers"
        )
        sparse_start = prefill_local + outl * cs
        sparse_end = sparse_start + cache.sparse_budget
        # int8 reserves scale-trailer lanes inside the rank padding;
        # MHA-style head counts (>15) need a wider trailer, so the
        # model's kv-head count must reach build for those shapes
        # (scale_lanes_for, core/quant.py).
        rank_eff = cache.rank + (
            scale_lanes_for(num_kv_heads or 1)
            if cache.kv_quant == "int8"
            else 0
        )
        # Full 128-lane alignment everywhere. An 8-aligned-only
        # rank_pad (192) was tried to cut U gather volume 25 %: the
        # gather itself got 18 % faster but the unaligned rows and the
        # 192-lane einsum operand triggered ~7 ms/step of relayout
        # copies and scheduling stalls at 122K/b4 — strictly worse.
        rank_pad = ((rank_eff + 127) // 128) * 128
        return cls(
            prefill_len=prefill_len,
            chunk_size=cs,
            chunks=chunks,
            prefill_local=prefill_local,
            outlier_chunks=outl,
            num_landmarks=chunks - outl,
            select_sets=select_sets,
            sparse_start=sparse_start,
            sparse_end=sparse_end,
            gen_capacity=cache.gen_capacity,
            buffer_cap=sparse_end + cache.gen_capacity,
            rank=cache.rank,
            rank_pad=rank_pad,
            quant=cache.kv_quant,
            kernel_store=kernel_store and cache.kv_quant == "int8",
        )


class ShadowCache(flax.struct.PyTreeNode):
    """Stacked-over-layers ShadowKV state (one pytree, jit-friendly).

    U is stored CHUNK-MAJOR: [L, B, C, chunk_size * rank], one selected
    chunk = one contiguous 2.5 KB row, so the decode-time gather moves
    dense lane-aligned tiles instead of 320 B slivers (same reasoning as
    the reference's chunk-major pinned V store, kv_cache.py:554-563).
    Only the context region (chunks * chunk_size rows) is kept — the
    local tail is never reconstructed.
    """

    u: jnp.ndarray  # [L, B, C, cs, r_pad] chunk-major pre-RoPE K
    # factors | int8 tiled [L, B, C/pt, 32, r_pad] (core/quant.py)
    sv: jnp.ndarray  # [L, B, K, r_pad, Dh]
    landmarks: jnp.ndarray  # [L, B, K, C, Dh] all-chunk means
    landmark_mask: jnp.ndarray  # [L, B, K, C] bool, False at outliers
    k_buf: jnp.ndarray  # [L, B, K, cap, Dh] compact post-RoPE K buffer
    v_buf: jnp.ndarray  # [L, B, K, cap, Dh]
    v_full: jnp.ndarray  # [L, B, K, C, cs, Dh] chunk-major V store
    # | int8 tiled [L, B, K, C/pt, 32, Dh]
    cached_ids: jnp.ndarray  # [L, B, K, S] chunk ids in sparse slots
    gen_len: jnp.ndarray  # int32 scalar, tokens in gen region
    # int8-mode landmark scale (None when layout.quant == 'none');
    # U/V scales are packed into the quantized rows themselves.
    lm_scale: Optional[jnp.ndarray] = None  # [L, B, K, C] f32
    layout: ShadowLayout = flax.struct.field(
        pytree_node=False, default=None
    )

    @property
    def kv_len(self) -> jnp.ndarray:
        """Logical KV length (prefill + generated)."""
        return self.layout.prefill_len + self.gen_len

    @classmethod
    def init(
        cls,
        model: ModelConfig,
        layout: ShadowLayout,
        batch_size: int,
        v_placeholder: bool = False,
    ) -> "ShadowCache":
        """Preallocate zeroed full-batch buffers. Sub-batch prefill
        writes slices in place (reference batch_prefill accumulates into
        shared buffers via ``prefilled_batch``, kv_cache.py:824-980);
        writing into a donated preallocation instead of concatenating
        sub-batch caches keeps peak HBM at 1x the cache size.

        ``v_placeholder=True`` allocates a ZERO-CHUNK v_full leaf (the
        offloaded-V cache shape: the real chunk-major store lives in
        host DRAM, reference kv_cache.py:554-563, and the pytree keeps
        a structural stand-in) so the full-batch V store is never
        materialized in HBM — at 122K it is larger than the chip."""
        l, b = model.num_layers, batch_size
        kh, dh, dt = model.num_kv_heads, model.head_dim, model.dtype
        lo = layout
        cs = lo.chunk_size
        q8 = lo.quant == "int8"
        store_dt = jnp.int8 if q8 else dt
        # int8 chunk stores are flat rows ([..., C, cs*row], the XLA
        # gather shape) or (32, row) tiles ([..., C/pt, 32, row], the
        # Pallas DMA shape) depending on which decode path this cache
        # serves; per-token scales ride in each U segment's tail lanes
        # either way (core/quant.py).
        if q8:
            assert 32 % cs == 0, (
                f"kv_quant='int8' needs chunk_size dividing 32, got {cs}"
            )
            # The embedded scale trailer holds 2 U-scale bytes plus
            # 2 V-scale bytes PER KV HEAD inside the rank padding; the
            # layout must have reserved enough tail lanes for this
            # model's head count (MHA shapes like Phi-3's 32 heads need
            # 72 lanes, not the default 32 — pass num_kv_heads to
            # ShadowLayout.build).
            assert lo.rank_pad - lo.rank >= scale_lanes_for(kh), (
                f"int8 scale trailer for {kh} kv heads needs "
                f"{scale_lanes_for(kh)} tail lanes but the layout "
                f"reserves {lo.rank_pad - lo.rank}; build the "
                "ShadowLayout with num_kv_heads="
                f"{kh}"
            )
        pt = 32 // cs if q8 else 1
        if not q8:
            u_shape = (l, b, lo.chunks, cs, lo.rank_pad)
            v_shape = (l, b, kh, lo.chunks, cs, dh)
        elif lo.kernel_store:
            u_shape = (l, b, lo.chunks // pt, 32, lo.rank_pad)
            v_shape = (l, b, kh, lo.chunks // pt, 32, dh)
        else:
            u_shape = (
                l, b, lo.chunks,
                cs * lo.rank_pad + flat_trailer_lanes(cs, kh),
            )
            v_shape = (l, b, kh, lo.chunks, cs * dh)
        if v_placeholder:
            v_shape = v_shape[:3] + (0,) + v_shape[4:]
        return cls(
            u=jnp.zeros(u_shape, store_dt),
            sv=jnp.zeros((l, b, kh, lo.rank_pad, dh), dt),
            landmarks=jnp.zeros((l, b, kh, lo.chunks, dh), store_dt),
            landmark_mask=jnp.zeros((l, b, kh, lo.chunks), jnp.bool_),
            k_buf=jnp.zeros((l, b, kh, lo.buffer_cap, dh), dt),
            v_buf=jnp.zeros((l, b, kh, lo.buffer_cap, dh), dt),
            v_full=jnp.zeros(v_shape, store_dt),
            cached_ids=jnp.zeros((l, b, kh, lo.select_sets), jnp.int32),
            gen_len=jnp.zeros((), jnp.int32),
            lm_scale=(
                jnp.zeros((l, b, kh, lo.chunks), jnp.float32) if q8 else None
            ),
            layout=layout,
        )




def shadow_prefill_layer(
    model: ModelConfig,
    layout: ShadowLayout,
    k_pre_rope: jnp.ndarray,  # [B, S, K, Dh]
    k_roped: jnp.ndarray,  # [B, S, K, Dh]
    v: jnp.ndarray,  # [B, S, K, Dh]
    q_last: jnp.ndarray,  # [B, 1, H, Dh] last prefill query (roped)
    tp_axis: str | None = None,  # manual tp axis (pp x tp pipeline):
    # K carries a head slice; the shared-across-heads U factor is a
    # GLOBAL-head computation, distributed via psum'd Grams in
    # core/lowrank.py (everything else here is per-head and local)
    tp_size: int = 1,
) -> dict:
    """Build one layer's shadow-cache slices at prefill.

    Mirrors ShadowKVCache_CPU.prefill_kv_cache + get_svd
    (kv_cache.py:666-737, 788-980): SVD factors from *pre-RoPE* K,
    landmarks/outliers from *post-RoPE* K, buffer seeded from the last
    prefill query's selection.
    """
    b, s, kh, dh = v.shape
    lo = layout
    cs = lo.chunk_size
    dtype = model.dtype

    # --- low-rank factors of pre-RoPE K ---
    u, sv = lowrank_kv_factors(
        k_pre_rope.reshape(b, s, kh * dh), lo.rank, kh, dh, dtype=dtype,
        tp_axis=tp_axis, tp_size=tp_size,
    )
    # Zero-pad rank to the lane multiple the refresh kernel's DMA units
    # need (physically free: XLA pads the minor dim regardless).
    if lo.rank_pad != lo.rank:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, lo.rank_pad - lo.rank)))
        sv = jnp.pad(
            sv, ((0, 0), (0, 0), (0, lo.rank_pad - lo.rank), (0, 0))
        )
    # Chunk-major context slice of U (decode only ever gathers context
    # chunks, kv_cache.py:1108-1176). Kept [C, cs, r] so the gathered
    # result is already matmul-shaped (no post-gather retiling).
    u = u[:, : lo.chunks * cs].reshape(b, lo.chunks, cs, lo.rank_pad)

    # [B, K, S, Dh] views
    k_roped_h = k_roped.transpose(0, 2, 1, 3)
    v_h = v.transpose(0, 2, 1, 3)

    ctx_len = lo.chunks * cs
    k_ctx = k_roped_h[:, :, :ctx_len].reshape(b, kh, lo.chunks, cs, dh)
    v_ctx = v_h[:, :, :ctx_len].reshape(b, kh, lo.chunks, cs, dh)

    lm = compute_landmarks_outliers(k_ctx, lo.outlier_chunks)

    # --- compact buffer: [local | outliers | sparse | gen] ---
    k_buf = jnp.zeros((b, kh, lo.buffer_cap, dh), dtype)
    v_buf = jnp.zeros((b, kh, lo.buffer_cap, dh), dtype)
    k_buf = k_buf.at[:, :, : lo.prefill_local].set(
        k_roped_h[:, :, s - lo.prefill_local :]
    )
    v_buf = v_buf.at[:, :, : lo.prefill_local].set(
        v_h[:, :, s - lo.prefill_local :]
    )

    out_idx = lm.outlier_idx[..., None, None].astype(jnp.int32)
    k_out = jnp.take_along_axis(k_ctx, out_idx, axis=2)
    v_out = jnp.take_along_axis(v_ctx, out_idx, axis=2)
    k_buf = k_buf.at[:, :, lo.prefill_local : lo.sparse_start].set(
        k_out.reshape(b, kh, lo.outlier_chunks * cs, dh)
    )
    v_buf = v_buf.at[:, :, lo.prefill_local : lo.sparse_start].set(
        v_out.reshape(b, kh, lo.outlier_chunks * cs, dh)
    )

    # --- chunk-major V store over the context region ---
    # [B, K, C, cs, Dh]: one chunk = one tiling-aligned (cs, Dh) DMA
    # unit (already in this shape from the reshape above).
    v_full = v_ctx
    lm_scale = None
    landmarks_store = lm.landmarks
    if lo.quant == "int8":
        # int8 stores with scales embedded in U's tail lanes; layout
        # chosen for the decode path that will read them. Long-context
        # quantization is blocked so its f32 intermediates stay ~1/8 of
        # the store (at 244K they otherwise peak ~3 GB/layer and gate
        # the prefill batch).
        blocks = 8 if v_ctx.size >= (1 << 25) else 1
        u, v_full = pack_shadow_int8(
            u, v_ctx, rank=lo.rank, tiled=lo.kernel_store,
            quant_blocks=blocks,
        )
        landmarks_store, lm_scale = quantize_rows(lm.landmarks)

    # --- seed the sparse region from the last prefill query ---
    # (kv_cache.py:922-970: q_len=1 scoring, exact K/V gathered — the
    # seeded K is the true post-RoPE K, not a reconstruction.)
    g = model.num_groups
    q_grouped = q_last.transpose(0, 2, 1, 3).reshape(b, kh, g, 1, dh)
    seed_ids = score_and_select(
        q_grouped, lm.landmarks, lm.landmark_mask, lo.select_sets
    )
    seed_pos = chunk_ids_to_positions(seed_ids, cs)  # [B, K, budget]
    k_seed = jnp.take_along_axis(
        k_roped_h, seed_pos[..., None].astype(jnp.int32), axis=2
    )
    v_seed = jnp.take_along_axis(
        v_h, seed_pos[..., None].astype(jnp.int32), axis=2
    )
    k_buf = k_buf.at[:, :, lo.sparse_start : lo.sparse_end].set(k_seed)
    v_buf = v_buf.at[:, :, lo.sparse_start : lo.sparse_end].set(v_seed)

    out = dict(
        u=u,
        sv=sv,
        landmarks=landmarks_store,
        landmark_mask=lm.landmark_mask,
        k_buf=k_buf,
        v_buf=v_buf,
        v_full=v_full,
        cached_ids=seed_ids,
    )
    if lo.quant == "int8":
        out.update(lm_scale=lm_scale)
    return out


def assemble_cache(layer_slices: dict, layout: ShadowLayout) -> ShadowCache:
    """Stack per-layer prefill outputs (scan ys) into a ShadowCache."""
    return ShadowCache(
        u=layer_slices["u"],
        sv=layer_slices["sv"],
        landmarks=layer_slices["landmarks"],
        landmark_mask=layer_slices["landmark_mask"],
        k_buf=layer_slices["k_buf"],
        v_buf=layer_slices["v_buf"],
        v_full=layer_slices["v_full"],
        cached_ids=layer_slices["cached_ids"],
        gen_len=jnp.zeros((), jnp.int32),
        lm_scale=layer_slices.get("lm_scale"),
        layout=layout,
    )


def concat_shadow_caches(caches: list[ShadowCache]) -> ShadowCache:
    """Concatenate sub-batch prefill results along the batch axis
    (reference batch_prefill accumulates sub-batches into shared
    buffers via ``prefilled_batch``, kv_cache.py:824-980)."""
    if len(caches) == 1:
        return caches[0]
    first = caches[0]

    def cat(get):
        return jnp.concatenate([get(c) for c in caches], axis=1)

    return ShadowCache(
        u=cat(lambda c: c.u),
        sv=cat(lambda c: c.sv),
        landmarks=cat(lambda c: c.landmarks),
        landmark_mask=cat(lambda c: c.landmark_mask),
        k_buf=cat(lambda c: c.k_buf),
        v_buf=cat(lambda c: c.v_buf),
        v_full=cat(lambda c: c.v_full),
        cached_ids=cat(lambda c: c.cached_ids),
        gen_len=first.gen_len,
        lm_scale=(
            None if first.lm_scale is None else cat(lambda c: c.lm_scale)
        ),
        layout=first.layout,
    )


class ShadowStatic(flax.struct.PyTreeNode):
    """Read-only decode-time state: built at prefill, never mutated.

    Kept OUT of the decode layer-scan carry on purpose: XLA copies every
    while-loop carry buffer into the loop (even pass-through ones), so
    carrying the V store + factors + landmarks cost a full
    layout/defensive copy of ~GBs per decode step (measured 11 ms/step
    at 8K/batch-8 on v5e). As jit-arg closure invariants they are read
    in place by the in-loop gathers.
    """

    u: jnp.ndarray  # [L, B, C, cs, r] | int8 tiled [L, B, C/pt, 32, r]
    sv: jnp.ndarray  # [L, B, K, r, Dh]
    landmarks: jnp.ndarray  # [L, B, K, C, Dh]
    landmark_mask: jnp.ndarray  # [L, B, K, C]
    v_full: jnp.ndarray  # [L, B, K, C, cs, Dh] | int8 [L, B, K, C/pt, 32, Dh]
    lm_scale: Optional[jnp.ndarray] = None


class ShadowMut(flax.struct.PyTreeNode):
    """Per-step mutable state: the decode layer-scan carry."""

    k_buf: jnp.ndarray  # [L, B, K, cap, Dh]
    v_buf: jnp.ndarray  # [L, B, K, cap, Dh]
    cached_ids: jnp.ndarray  # [L, B, K, S]


def split_cache(cache: ShadowCache) -> tuple[ShadowStatic, ShadowMut]:
    return (
        ShadowStatic(
            u=cache.u,
            sv=cache.sv,
            landmarks=cache.landmarks,
            landmark_mask=cache.landmark_mask,
            v_full=cache.v_full,
            lm_scale=cache.lm_scale,
        ),
        ShadowMut(
            k_buf=cache.k_buf,
            v_buf=cache.v_buf,
            cached_ids=cache.cached_ids,
        ),
    )


def _append_gen_rows(buf, new_t, row0):
    """Write [B, K, Qn, Dh] new-token rows into ``buf`` [B, K, cap, Dh]
    at row ``row0`` — a scalar (static batch: all slots at the same
    generation depth) or a [B] vector (continuous batching: per-slot
    rows; B is small and static, so the per-slot writes unroll)."""
    if row0.ndim == 0:
        return jax.lax.dynamic_update_slice(buf, new_t, (0, 0, row0, 0))
    for i in range(new_t.shape[0]):
        buf = jax.lax.dynamic_update_slice(
            buf, new_t[i : i + 1], (i, 0, row0[i], 0)
        )
    return buf


def _append_gen_rows_stacked(buf, new_t, layer, row0):
    """Same as _append_gen_rows for the stacked [L, B, K, cap, Dh]
    buffer, writing layer ``layer``."""
    if row0.ndim == 0:
        return jax.lax.dynamic_update_slice(
            buf, new_t[None], (layer, 0, 0, row0, 0)
        )
    for i in range(new_t.shape[0]):
        buf = jax.lax.dynamic_update_slice(
            buf, new_t[None, i : i + 1], (layer, i, 0, row0[i], 0)
        )
    return buf


def shadow_decode_layer(
    model: ModelConfig,
    layout: ShadowLayout,
    static: ShadowStatic,
    mut: ShadowMut,
    gen_len: jnp.ndarray,
    layer: jnp.ndarray,  # traced int32 layer index
    q: jnp.ndarray,  # [B, Qn, H, Dh] roped queries
    k_new: jnp.ndarray,  # [B, Qn, K, Dh] roped new keys
    v_new: jnp.ndarray,  # [B, Qn, K, Dh]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    use_kernel: bool = False,
    inv_freq_full: Optional[jnp.ndarray] = None,
    v_store=None,  # HostVStore when V is offloaded to host DRAM
    approx_topk: bool = False,
    ring_gather: bool = False,
    v_host_axis: str = "batch",  # axis a multi-part host V store
    # shards over ('batch': per-slot parts, 'layer': per-segment parts
    # from the layer-segmented offload prefill)
    v_host=None,  # V store resident in pinned host memory (the cache's
    # v_full is then a placeholder); the ring kernel DMAs selected
    # chunks host->HBM directly
    mesh=None,  # jax.sharding.Mesh with axes (dp, tp): the Pallas
    # kernel calls below are wrapped in shard_map islands (GSPMD can't
    # partition a pallas_call) so the ring/fused decode paths run
    # multi-chip with B on dp and KV heads on tp — the same layout the
    # XLA path shards via NamedSharding (parallel/mesh.py)
    segmented: bool = False,  # return attention SEGMENTS instead of
    # buffer views (core/attention.decode_attention_segments). NOT the
    # default: measured 2.7x SLOWER than views on v5e at b4/122K
    # (probe_decode_variants_r3) — kept as a tested alternative for
    # layouts where the cap-row view copies dominate. XLA + ring paths
    # only (the fused kernel returns views).
    debug_hit_rate: Optional[float] = None,  # BENCHMARK-ONLY: force
    # the selection to a sliding-window id stream with exactly this
    # step-to-step overlap (RuntimeConfig.debug_hit_rate)
    debug_hit_layout: str = "scatter",
    hysteresis: float = 0.0,  # selection hysteresis: relative score
    # bonus for chunks already resident in the sparse buffer
    # (core/selection.py; RuntimeConfig.selection_hysteresis)
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, ShadowMut]:
    """One layer's sparse-attention cache update at decode time.

    Returns (k_view, v_view, kv_valid_len, mut) where k/v views are the
    compact buffer [B, K, cap, Dh] for this layer (mask by valid length).
    With ``segmented=True`` the first element is instead a tuple of
    (k, v, base, masked) attention segments and the second is None.

    The layer index is a traced scalar: all reads from the big stacked
    arrays (U, v_full) are single XLA gathers whose indices include the
    layer coordinate — no [B, S, r]-sized layer slice is ever
    materialized (this is the scan-carry design from SURVEY.md §7.0).
    """
    lo = layout
    b, qn, kh, dh = k_new.shape
    g = model.num_groups
    cs = lo.chunk_size

    # --- 1. selection from landmarks (kv_cache.py:983-1057) ---
    lms = jax.lax.dynamic_index_in_dim(
        static.landmarks, layer, axis=0, keepdims=False
    )
    lm_mask = jax.lax.dynamic_index_in_dim(
        static.landmark_mask, layer, axis=0, keepdims=False
    )
    q_grouped = q.transpose(0, 2, 1, 3).reshape(b, kh, g, qn, dh)
    lm_sc = None
    if lo.quant == "int8":
        lm_sc = jax.lax.dynamic_index_in_dim(
            static.lm_scale, layer, axis=0, keepdims=False
        )
    prev_ids = jax.lax.dynamic_index_in_dim(
        mut.cached_ids, layer, axis=0, keepdims=False
    )
    new_ids = score_and_select(
        q_grouped, lms, lm_mask, lo.select_sets, approx=approx_topk,
        landmark_scale=lm_sc,
        resident_ids=prev_ids if hysteresis else None,
        hysteresis=hysteresis,
    )
    if debug_hit_rate is not None:
        # BENCHMARK-ONLY forced selection: window of select_sets ids
        # sliding by m = S*(1-h) per decode step — consecutive steps
        # overlap in exactly S-m ids, so the slot hit rate is h by
        # construction. 'scatter' pushes the window through a fixed
        # modular bijection (odd multiplier coprime with C) so the
        # miss slots/chunks interleave the way real selection does;
        # 'contig' keeps the raw window (batched-DMA best case). The
        # real scores above are still computed and discarded, so the
        # selection cost is paid exactly as a real step pays it.
        import math

        ssets = lo.select_sets
        c_total = lo.chunks
        m = max(1, int(round(ssets * (1.0 - debug_hit_rate))))
        t = jnp.max(gen_len).astype(jnp.int32)
        ids = (t * m + jnp.arange(ssets, dtype=jnp.int32)) % c_total
        if debug_hit_layout == "scatter":
            mult = 4097
            while math.gcd(mult, c_total) != 1:
                mult += 1
            ids = (ids * mult) % c_total
        # data-dependence on the real top-k so the scoring above is
        # never dead-code-eliminated (the comparison is always False,
        # but XLA cannot prove it)
        new_ids = jnp.where(
            new_ids < -1, new_ids, ids[None, None]
        )

    # --- 2. slot-stable reuse assignment (TPU redesign of the
    #        reference's hash-map hits-first repack, map.cuh:754-796;
    #        prev_ids extracted above for the hysteresis term) ---
    asg = assign_slots_stable(prev_ids, new_ids)

    if use_kernel:
        # --- fused Pallas path: one kernel fetches miss V chunks
        #     (HBM->HBM DMA) and reconstructs + RoPEs + writes miss K
        #     chunks, skipping hits entirely (kernels/reconstruct.py;
        #     replaces reference K2/K3 + K6-K10). ---
        from shadowkv_tpu.kernels.reconstruct import (
            compact_misses,
            sparse_refresh,
        )

        if isinstance(v_host, (tuple, list)):
            # The fused refresh kernel takes ONE host store operand;
            # a multi-part (per-slot / per-segment) host store serves
            # the ring path only for now.
            assert len(v_host) == 1, (
                "use_pallas with a sharded host V store is unsupported "
                f"({len(v_host)} parts); use ring_gather"
            )
            v_host = v_host[0]
        refresh_fn = functools.partial(
            sparse_refresh,
            chunk_size=cs, sparse_start=lo.sparse_start,
            rope_dim=model.rope_dim, rope_style=model.rope_style,
            host_v=v_host is not None,
            interpret=jax.default_backend() == "cpu",
        )
        if mesh is not None:
            # Inside the island each program sees a local head slice;
            # the int8 scale lanes are packed per GLOBAL head, so pass
            # the shard's head offset + the global head count through.
            base_refresh, total_kh = refresh_fn, kh

            def refresh_fn(layer_, mc_, ms_, cnt_, u_, sv_, v_, inv_,
                           kb_, vb_):
                off = jax.lax.axis_index("tp") * sv_.shape[2]
                return base_refresh(
                    layer_, mc_, ms_, cnt_, u_, sv_, v_, inv_, kb_, vb_,
                    head_offset=off, total_kv_heads=total_kh,
                )

            refresh_fn = jax.shard_map(
                refresh_fn, mesh=mesh,
                in_specs=(
                    P(),  # layer (replicated scalar)
                    P("dp", "tp"),  # miss_chunk
                    P("dp", "tp"),  # miss_slot
                    P("dp", "tp"),  # miss_cnt
                    P(None, "dp"),  # u (tp-replicated, shared by heads)
                    P(None, "dp", "tp"),  # sv
                    P(None, "dp", "tp"),  # v store
                    P(),  # inv_freq (replicated)
                    P(None, "dp", "tp"),  # k_buf
                    P(None, "dp", "tp"),  # v_buf
                ),
                out_specs=(P(None, "dp", "tp"), P(None, "dp", "tp")),
                check_vma=False,  # pallas_call outputs carry no vma
            )
        mc, ms, cnt = compact_misses(asg.slot_ids, asg.stay_mask)
        k_buf, v_buf = refresh_fn(
            layer, mc, ms, cnt, static.u, static.sv,
            static.v_full if v_host is None else v_host,
            inv_freq_full, mut.k_buf, mut.v_buf,
        )
        # Append the new tokens to the gen region (narrow in-place
        # write on the stacked buffer; reference update_kv_cache,
        # kv_cache.py:1227-1271).
        gen_row = lo.sparse_end + gen_len
        k_buf = _append_gen_rows_stacked(
            k_buf, k_new.transpose(0, 2, 1, 3).astype(k_buf.dtype),
            layer, gen_row,
        )
        v_buf = _append_gen_rows_stacked(
            v_buf, v_new.transpose(0, 2, 1, 3).astype(v_buf.dtype),
            layer, gen_row,
        )
        mut = mut.replace(
            k_buf=k_buf,
            v_buf=v_buf,
            cached_ids=jax.lax.dynamic_update_slice(
                mut.cached_ids, asg.slot_ids[None], (layer, 0, 0, 0)
            ),
        )
        k_buf_l = jax.lax.dynamic_index_in_dim(
            mut.k_buf, layer, axis=0, keepdims=False
        )
        v_buf_l = jax.lax.dynamic_index_in_dim(
            mut.v_buf, layer, axis=0, keepdims=False
        )
        valid_len = lo.sparse_end + gen_len + qn
        return k_buf_l, v_buf_l, valid_len, mut

    # Only the SPARSE region of the old buffers is read here; the
    # full per-layer view for attention is sliced from the stacked
    # buffer AFTER the commit (one narrow write + a slice that fuses
    # into the attention read), instead of materializing a separate
    # per-layer view and writing both it and the stacked buffer —
    # ~2x the sparse-region bytes per layer for nothing.
    buf_dtype = mut.k_buf.dtype
    ssets = lo.select_sets
    stay_e = asg.stay_mask[..., None]  # [B,K,S,1]

    def _sparse_old(buf):
        return jax.lax.dynamic_slice(
            buf, (layer, 0, 0, lo.sparse_start, 0),
            (1, b, kh, ssets * cs, dh),
        )[0].reshape(b, kh, ssets, cs * dh)

    # --- 3. V: staying slots keep their rows untouched (dense select);
    #        incoming chunks gathered from the chunk-major store
    #        (replaces gather_copy_with_offsets, K2/K3) ---
    v_sparse_old = _sparse_old(mut.v_buf)
    bi = jnp.arange(b)[:, None, None]
    ki = jnp.arange(kh)[None, :, None]
    sv_l = jax.lax.dynamic_index_in_dim(
        static.sv, layer, axis=0, keepdims=False
    )
    ring = ring_gather and v_store is None
    u_sc_flat = None  # int8 per-token U scales [B,K,S*cs] (ring path)
    if ring:
        # --- ring-DMA gather (kernels/gather.py): one Pallas kernel
        #     streams ALL selected chunks' U and V rows out of the
        #     (tiled when int8) stores as a pipelined ring of async
        #     HBM DMAs; dequant/matmul/RoPE stay in XLA. Replaces the
        #     per-row XLA gathers in the miss-heavy regime where the
        #     fused kernel's hit-skip machinery has nothing to skip. ---
        from shadowkv_tpu.core.quant import scales_from_bytes
        from shadowkv_tpu.kernels.gather import gather_chunks

        tile_sub = 32 if lo.quant == "int8" else cs
        gather_fn = functools.partial(
            gather_chunks,
            chunk_size=cs, tile_sub=tile_sub,
            host_v=v_host is not None,
            host_axis=v_host_axis,
            interpret=jax.default_backend() == "cpu",
        )
        if mesh is not None:
            assert not (
                isinstance(v_host, (tuple, list)) and len(v_host) > 1
            ), "sharded host V stores are single-chip only for now"
            if isinstance(v_host, (tuple, list)):
                v_host = v_host[0]
            gather_fn = jax.shard_map(
                gather_fn, mesh=mesh,
                in_specs=(
                    P(),  # layer (replicated scalar)
                    P("dp", "tp"),  # slot_ids
                    P(None, "dp"),  # u (tp-replicated, shared by heads)
                    P(None, "dp", "tp"),  # v store
                ),
                out_specs=(P("dp", "tp"), P("dp", "tp")),
                check_vma=False,  # pallas_call outputs carry no vma
            )
        u_tok, v_tok = gather_fn(
            layer, asg.slot_ids, static.u,
            static.v_full if v_host is None else v_host,
        )  # [B,K,S*cs,rp] , [B,K,S*cs,Dh]
        if lo.quant == "int8":
            base = lo.rank_pad - scale_lanes_for(kh)
            u_sc_flat = scales_from_bytes(
                u_tok[..., base], u_tok[..., base + 1]
            )  # [B,K,S*cs] bf16
            ki4 = ki.reshape(1, kh, 1, 1)
            v_sc = scales_from_bytes(
                jnp.take_along_axis(
                    u_tok[..., base + 2 : base + 2 + kh], ki4, axis=-1
                )[..., 0],
                jnp.take_along_axis(
                    u_tok[..., base + 2 + kh : base + 2 + 2 * kh],
                    ki4,
                    axis=-1,
                )[..., 0],
            )
            v_new_rows = (
                v_tok.astype(buf_dtype)
                * v_sc[..., None].astype(buf_dtype)
            ).reshape(b, kh, ssets, cs * dh)
        else:
            v_new_rows = v_tok.reshape(b, kh, ssets, cs * dh)
        u_q = u_tok  # [B,K,S*cs,rp] store dtype
    elif lo.quant == "int8":
        # int8 stores (core/quant.py): U comes first — its rows carry
        # every scale, so no separate (latency-bound) scale gather
        # exists. CRITICAL shape rule: never materialize an int8 array
        # with cs as the sublane dim ([.., cs, X] int8 pads 4x —
        # measured ~4.5 ms/step of relayout copies); the einsum operand
        # reshapes straight to [.., S*cs, rp] and the scales come from
        # the flat rows' CONTIGUOUS trailer.
        if not lo.kernel_store:
            # Flat rows: ONE whole-row gather per chunk including the
            # traced layer coordinate (XLA's fastest gather shape; a
            # windowed gather over the tiled layout makes XLA relayout
            # the whole store — multi-GB copies per step).
            u_rows = static.u[layer, bi, asg.slot_ids]  # [B,K,S,W]
            u_q = u_rows[..., : cs * lo.rank_pad].reshape(
                b, kh, ssets * cs, lo.rank_pad
            )
            u_sc = flat_u_scales(u_rows, cs, kh)  # [B,K,S,cs] bf16
            v_sc = flat_v_scales(
                u_rows, cs, kh, ki.reshape(1, kh, 1, 1, 1)
            )
            v_q = static.v_full[layer, bi, ki, asg.slot_ids].reshape(
                b, kh, ssets, cs, dh
            )
        else:
            # Tiled stores read by the XLA path (the 'auto' regime:
            # ONE tiled format must serve both decode programs).
            # Gather WHOLE [32, W] tiles by tile id — a plain
            # major-dim gather, the same machinery as the flat path —
            # then select the chunk's cs rows from the small gathered
            # temp with take_along_axis. The previous vmapped
            # dynamic_slice addressed the sublane dim of the store at
            # dynamic offsets, which made XLA RELAYOUT the whole
            # 7.5 GB v_full into an HLO temp (copy of cache.v_full,
            # layout {5,3,2,1,0,4}) — the actual bench_auto_hit60 OOM
            # at b4/122K (19.93G > 15.75G). Cost of the fix: gathers
            # read pt = 32/cs chunks per tile instead of one (2x bytes
            # at cs16) on ~17 MB/layer temps — noise next to a
            # full-store copy.
            pt = 32 // cs
            tiles = asg.slot_ids // pt  # [B, K, S]
            row_sel = (
                (asg.slot_ids % pt) * cs  # [B, K, S]
            )[..., None, None] + jnp.arange(cs)[:, None]  # [B,K,S,cs,1]
            u_tiles = static.u[layer, bi, tiles]  # [B,K,S,32,rp]
            u_rows = jnp.take_along_axis(
                u_tiles,
                jnp.broadcast_to(row_sel, (b, kh, ssets, cs, 1)),
                axis=-2,
            )  # [B,K,S,cs,rp]
            u_q = u_rows.reshape(b, kh, ssets * cs, lo.rank_pad)
            u_sc = u_scales_from_rows(u_rows, lo.rank_pad, kh)
            v_sc = v_scales_from_rows(
                u_rows, lo.rank_pad, kh, ki.reshape(1, kh, 1, 1, 1)
            )
            v_tiles = static.v_full[layer, bi, ki, tiles]  # [B,K,S,32,dh]
            v_q = jnp.take_along_axis(
                v_tiles,
                jnp.broadcast_to(row_sel, (b, kh, ssets, cs, 1)),
                axis=-2,
            )  # [B,K,S,cs,dh]
        v_new_rows = (
            v_q.astype(buf_dtype)
            * v_sc[..., None].astype(buf_dtype)
        ).reshape(b, kh, ssets, cs * dh)
    elif v_store is not None:
        # Host-DRAM fetch via io_callback + native gather
        # (cache/offload.py; reference pinned-CPU DMA path K2/K3).
        v_new_rows = v_store.fetch(
            layer, asg.slot_ids, asg.stay_mask
        ).reshape(b, kh, ssets, cs * dh)
    else:
        # Single XLA gather including the layer coordinate — no
        # layer-sized temporary of the V store is materialized.
        v_new_rows = static.v_full[layer, bi, ki, asg.slot_ids]
        v_new_rows = v_new_rows.reshape(b, kh, ssets, cs * dh)
    v_sparse = jnp.where(stay_e, v_sparse_old, v_new_rows).reshape(
        b, kh, ssets * cs, dh
    )

    # --- 4. K: staying slots untouched; incoming reconstructed
    #        U[chunks] @ SV + RoPE (batch_gather_gemm + push-cache,
    #        K6-K10) ---
    k_sparse_old = _sparse_old(mut.k_buf)
    if lo.quant == "int8":
        # Row scales factor out of the matmul: (q*s) @ SV = (q @ SV)*s.
        # Converting int8 -> bf16 fuses into the dot's operand read;
        # scaling the [*, Dh] OUTPUT avoids materializing a dequantized
        # [*, r_pad] U (2x wider than Dh). The scale-byte lanes multiply
        # only the zero rows of the rank-padded SV, so no masking.
        sc = u_sc_flat if ring else u_sc.reshape(b, kh, ssets * cs)
        k_rec = jnp.einsum(
            "bknr,bkrd->bknd",
            u_q.astype(buf_dtype),
            sv_l,
            preferred_element_type=jnp.float32,
        )
        k_rec = (k_rec * sc[..., None].astype(jnp.float32)).astype(
            buf_dtype
        )
    else:
        if not ring:
            # Chunk-major U gather: one contiguous [cs, r] block/chunk.
            u_q = static.u[layer, bi, asg.slot_ids].reshape(
                b, kh, ssets * cs, lo.rank_pad
            )
        k_rec = jnp.einsum(
            "bknr,bkrd->bknd", u_q.astype(buf_dtype), sv_l,
            preferred_element_type=jnp.float32,
        ).astype(buf_dtype)
    # Decomposed RoPE: rotate(x, chunk*cs + off) =
    # rotate(rotate(x, off), chunk*cs). The off table is cs static rows
    # and the chunk-base gather is cs x fewer rows than per-token
    # (XLA's gather of 128 B cos/sin rows is brutally latency-bound —
    # a single-stage per-token-gather variant measured 2x slower).
    half = cos_table.shape[-1]
    k_rec = k_rec.reshape(b, kh, ssets, cs, dh)
    cos_off = cos_table[:cs][None, None, None]  # [1,1,1,cs,half]
    sin_off = sin_table[:cs][None, None, None]
    k_rec = rope_lib.rotate_with_tables(
        k_rec, cos_off, sin_off, style=model.rope_style
    )
    # Chunk-base trig is COMPUTED, not gathered: 6K gathers of 128 B
    # cos/sin rows per layer are catastrophically latency-bound
    # (measured ~2.9 ms/step), while VPU trig over [B,K,S,half] is
    # microseconds. Same values as the tables (both are cos/sin of
    # compute_inv_freq angles), at f32 rather than table precision.
    inv = rope_lib.compute_inv_freq(model)  # [half] trace-time constant
    base_ang = (
        (asg.slot_ids * cs).astype(jnp.float32)[..., None, None]
        * inv[None, :]
    )  # [B,K,S,1,half]
    cos_g = jnp.cos(base_ang).astype(cos_table.dtype)
    sin_g = jnp.sin(base_ang).astype(sin_table.dtype)
    k_rec = rope_lib.rotate_with_tables(
        k_rec, cos_g, sin_g, style=model.rope_style
    )
    k_rec = k_rec.reshape(b, kh, ssets, cs * dh)
    k_sparse = jnp.where(stay_e, k_sparse_old, k_rec).reshape(
        b, kh, ssets * cs, dh
    )

    # --- 5. build the attention view: sparse region + appended new
    #        tokens over this layer's buffer ---
    k_new_t = k_new.transpose(0, 2, 1, 3)
    v_new_t = v_new.transpose(0, 2, 1, 3)
    gen_row = lo.sparse_end + gen_len

    # --- 6. commit this layer's state: ONLY the changed regions
    #        (sparse + gen row) are written into the stacked buffers —
    #        the local/outlier prefix is static after prefill, so the
    #        full-buffer write-back the reference's in-place CUDA
    #        updates imply would move ~40 % more bytes per layer for
    #        nothing. ---
    k_st = jax.lax.dynamic_update_slice(
        mut.k_buf, k_sparse[None], (layer, 0, 0, lo.sparse_start, 0)
    )
    k_st = _append_gen_rows_stacked(k_st, k_new_t, layer, gen_row)
    v_st = jax.lax.dynamic_update_slice(
        mut.v_buf, v_sparse[None], (layer, 0, 0, lo.sparse_start, 0)
    )
    v_st = _append_gen_rows_stacked(v_st, v_new_t, layer, gen_row)
    mut = mut.replace(
        k_buf=k_st,
        v_buf=v_st,
        cached_ids=jax.lax.dynamic_update_slice(
            mut.cached_ids, asg.slot_ids[None], (layer, 0, 0, 0)
        ),
    )
    valid_len = lo.sparse_end + gen_len + qn
    if segmented:
        # Attention segments (decode_attention_segments): the fresh
        # sparse K/V feed the dots directly; only the small static
        # prefix (local+outlier rows, constant after prefill) and the
        # gen region are sliced out of the stacked buffers. XLA
        # materializes dot-operand slices as full copies, so returning
        # cap-row views here would cost 2 x cap copies per layer.
        cap = mut.k_buf.shape[3]

        def _rows(buf, r0, n):
            return jax.lax.dynamic_slice(
                buf, (layer, 0, 0, r0, 0), (1, b, kh, n, dh)
            )[0]

        k_sp = k_sparse.reshape(b, kh, ssets * cs, dh)
        v_sp = v_sparse.reshape(b, kh, ssets * cs, dh)
        segs = (
            (
                _rows(mut.k_buf, 0, lo.sparse_start),
                _rows(mut.v_buf, 0, lo.sparse_start),
                0, False,
            ),
            (k_sp, v_sp, lo.sparse_start, False),
            (
                _rows(mut.k_buf, lo.sparse_end, cap - lo.sparse_end),
                _rows(mut.v_buf, lo.sparse_end, cap - lo.sparse_end),
                lo.sparse_end, True,
            ),
        )
        return segs, None, valid_len, mut
    # The attention view is a slice of the just-committed stacked
    # buffer (measured FASTER than the segmented split on v5e —
    # probe_decode_variants_r3).
    k_buf_l = jax.lax.dynamic_index_in_dim(
        mut.k_buf, layer, axis=0, keepdims=False
    )
    v_buf_l = jax.lax.dynamic_index_in_dim(
        mut.v_buf, layer, axis=0, keepdims=False
    )
    return k_buf_l, v_buf_l, valid_len, mut
