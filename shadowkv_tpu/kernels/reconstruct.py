"""Fused sparse-buffer refresh kernel (the ShadowKV decode hot path).

One Pallas kernel replaces four reference CUDA kernels plus the XLA
gathers around them:

- V miss fetch  -> direct HBM->HBM chunk DMAs
  (reference ``gather_copy_with_offsets``, kernels/gather_copy.cu:332-419
  + block-specialized pipeline copy.cuh:785-846),
- K reconstruction -> per-chunk U DMA + [cs, r] x [r, Dh] MXU matmul
  (reference CUTLASS ``batch_gather_gemm``, kernels/batch_gather_gemm.cu
  + gather iterator kernels/special_batch_gather_predicated_tile_iterator.h),
- RoPE -> in-register rotation with trig computed from the chunk id
  (reference ``apply_rotary_pos_emb_push_cache_opt``,
  kernels/rope_new.cu:321-411),
- hit skipping -> misses are compacted OUTSIDE the kernel (plain VPU
  sort), and the kernel loops only over the miss count per (batch, head)
  (reference hash-map reorder kernels/map.cuh:754-796 + ``cnts``-based
  early exit). Hit slots move ZERO bytes.

Measured motivation: XLA's gather runs the chunk fetches at ~106 GB/s
and reconstructs ALL slots (hits included); a pipelined DMA ring runs
the same fetch near memory speed (see benchmarks/prof_gather_kernel.py)
and the miss compaction cuts bytes by the hit rate (~60 % steady-state,
index.html:326).

Layout contracts (asserted in the wrapper):
- bf16 stores: v_full [L, B, K, C, cs, Dh] (one chunk = one (cs, Dh)
  tile), u [L, B, C, cs, r]; cs % 8 == 0 and Dh % 128 == 0 so every DMA
  unit is tiling-aligned.
- int8 stores (CacheConfig.kv_quant == 'int8'): the tiled format of
  core/quant.py — u [L, B, C/pt, 32, r_pad], v_full
  [L, B, K, C/pt, 32, Dh] with pt = 32 // cs chunks merged per
  32-sublane int8 tile (zero physical padding; Mosaic can DMA
  8-aligned sublane slices of a 32-tile, but NOT one flat row of a
  sublane-tiled chunk axis). Per-token bf16 scales live in the tail
  SCALE_LANES of each U token row; the kernel extracts them with
  mask-reduce lane picks (Mosaic supports neither sub-128-lane
  reshapes nor strided lane slices). The U scale folds into the
  reconstruction matmul OUTPUT; the scale-byte lanes multiply only the
  zero rows of the rank-padded SV, so the matmul needs no masking.
  V misses become load->dequant->store instead of a direct HBM->HBM
  copy, scaled by this head's V scale column from the same U tile.
- k_buf / v_buf [L, B, K, cap, Dh] with sparse_start % 8 == 0: row
  ranges written per-chunk stay sublane-aligned.
- inv_freq_full [1, Dh]: neox-duplicated inverse frequencies
  (concat(invf, invf)) so the in-kernel RoPE needs no lane concatenation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shadowkv_tpu.core.quant import scale_lanes_for

GROUP = 16  # miss chunks processed per pipeline stage: the group's U
# loads are issued back-to-back (latency amortized), reconstruction is
# ONE [GROUP*cs, r] x [r, Dh] MXU matmul, and RoPE is vectorized over
# the whole [GROUP*cs, Dh] tile. Double-buffered across groups.
NBUF = 2


def _scale_col(u8, lane_lo, lane_hi):
    """bf16 [rows, 1] scale column from the (lo, hi) scale-byte lanes of
    an int8 U tile [rows, r_pad]. Lane indices may be TRACED (the V
    scale lane depends on this program's kv head). Mask-reduce is the
    only lane extraction Mosaic supports here (no sub-128-lane reshape,
    no strided/dynamic lane slicing)."""
    t32 = u8.astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, u8.shape, 1)

    def pick(l):
        return jnp.sum(jnp.where(lane == l, t32, 0), axis=1, keepdims=True)

    bits = ((pick(lane_hi) << 8) | (pick(lane_lo) & 0xFF)).astype(
        jnp.int16
    )
    return pltpu.bitcast(bits, jnp.bfloat16)


def _refresh_kernel(
    # scalar prefetch
    layer_ref,  # [2]: (layer, global kv-head offset of this shard)
    miss_chunk_ref,  # [BK, S]
    miss_slot_ref,  # [BK, S]
    miss_cnt_ref,  # [BK]
    # tensors
    u_hbm,  # FLAT row-space view [L, B, C*cs, r] (bf16 or int8), ANY —
    # sparse_refresh reshapes the chunked/tiled store before the call;
    # chunk cid occupies rows [cid*cs, cid*cs+cs)
    v_full_hbm,  # FLAT [L, B, K, C*cs, Dh] (bf16 or int8), ANY — except
    # host-resident V (host_win>0), which keeps the TILED layout
    # ([L, B, K, C/pt, 32, Dh] int8 | [L, B, K, C, cs, Dh] bf16): host
    # DMAs move whole 4096-B window units over the leading axis
    sv_hbm,  # [L, B, K, r, Dh] ANY (manually DMA'd ONLY when misses
    # exist: a VMEM BlockSpec would fetch 64 KB per program with no
    # compute to hide it — at steady-state ~99 % hits most programs
    # have zero misses and the block pipeline dominated the kernel,
    # ~1.2 ms of pure fixed overhead per invocation)
    inv_freq_vmem,  # [1, Dh] VMEM (constant index_map -> fetched once)
    k_buf_hbm,  # [L, B, K, cap, Dh] ANY (aliased out 0)
    v_buf_hbm,  # [L, B, K, cap, Dh] ANY (aliased out 1)
    # outputs (aliases of the two above)
    k_out_hbm,
    v_out_hbm,
    # scratch (quant=False):
    #   sv_tile, sv_sem, u_tile, k_tile, pos_tile, v_sems, u_sems, w_sems
    # scratch (quant=True):
    #   sv_tile, sv_sem, u8_tile, v8_tile, k_tile, v_tile, pos_tile,
    #   v_sems, u_sems, w_sems, vw_sems
    *scratch,
    num_kv_heads: int,
    total_kv_heads: int,  # GLOBAL head count: the int8 scale lanes are
    # packed per global head (core/quant.py); under shard_map this
    # program sees a local head slice and layer_ref[1] carries the
    # shard's global head offset
    chunk_size: int,
    head_dim: int,
    sparse_start: int,
    rope_dim: int,
    rope_style: str,
    quant: bool,
    host_win: int,  # >0: V is host-resident; fetch windows of host_win
    # leading-axis elements (>=4096 B, the host DMA word size) into a
    # VMEM stage and select the chunk locally
):
    if quant and host_win:
        (sv_tile, sv_sem, u8_tile, v8_tile, k_tile, v_tile, pos_tile,
         v_stage, v_sems, u_sems, w_sems, vw_sems) = scratch
    elif quant:
        (sv_tile, sv_sem, u8_tile, v8_tile, k_tile, v_tile, pos_tile,
         v_sems, u_sems, w_sems, vw_sems) = scratch
        v_stage = None
    elif host_win:
        (sv_tile, sv_sem, u_tile, k_tile, v_tile, pos_tile,
         v_stage, v_sems, u_sems, w_sems, vw_sems) = scratch
    else:
        (sv_tile, sv_sem, u_tile, k_tile, pos_tile,
         v_sems, u_sems, w_sems) = scratch
        v_stage = None

    bk = pl.program_id(0)
    b = bk // num_kv_heads
    k = bk % num_kv_heads
    layer = layer_ref[0]
    n = miss_cnt_ref[bk]
    cs, dh = chunk_size, head_dim
    pt = 32 // cs  # chunks per 32-sublane int8 tile (host windows)
    n_groups = (n + GROUP - 1) // GROUP

    # Device-resident U and V arrive as FLAT row-space views
    # ([.., C*cs, r] / [.., C*cs, Dh]; the wrapper's free leading-dim
    # reshape of the tiled stores): chunk cid's rows are
    # [cid*cs, cid*cs + cs) — an 8-aligned sublane slice either dtype
    # (int8 tile 32, bf16 tile 8; cs % 8 == 0) — and a RUN of
    # contiguous chunk ids is ONE contiguous row range, fetchable by a
    # single DMA (assign_slots_stable hands out incoming slots in
    # ascending chunk order precisely so these runs survive into the
    # compacted miss list).

    def v_dma(j, buf, i):
        cid = miss_chunk_ref[bk, j]
        if host_win:
            # Host-space DMA descriptors move 4096-byte words (round-2
            # LLO finding): fetch a clamped window of host_win
            # consecutive leading-axis elements — one contiguous
            # >=4096 B run — into the VMEM stage; the sub-chunk is
            # selected locally afterwards. (Host V keeps the TILED
            # layout; only device-resident stores are flattened.)
            ct = v_full_hbm.shape[3]
            lead = cid // pt if quant else cid
            wstart = jnp.minimum(
                (lead // host_win) * host_win, ct - host_win
            )
            return pltpu.make_async_copy(
                v_full_hbm.at[layer, b, k, pl.ds(wstart, host_win)],
                v_stage.at[buf, i],
                v_sems.at[buf, i],
            )
        if quant:
            # flat int8 rows -> VMEM (dequantized + written out later)
            return pltpu.make_async_copy(
                v_full_hbm.at[layer, b, k, pl.ds(cid * cs, cs), :],
                v8_tile.at[buf, pl.ds(i * cs, cs), :],
                v_sems.at[buf, i],
            )
        row = sparse_start + miss_slot_ref[bk, j] * cs
        return pltpu.make_async_copy(
            v_full_hbm.at[layer, b, k, pl.ds(cid * cs, cs), :],
            v_out_hbm.at[layer, b, k, pl.ds(row, cs), :],
            v_sems.at[buf, i],
        )

    def v_select(j, buf, i):
        """Stage -> chunk slot (host modes): a VMEM-local copy of the
        cs rows belonging to miss j, started and waited inline. Draining
        the stage inline frees v_stage[buf] before the NEXT fetch into
        the same buffer (issued from group_body(g+1)) can race it —
        out-of-stage v_write DMAs read the local tile, never the stage
        (advisor round 2, high #2)."""
        cid = miss_chunk_ref[bk, j]
        ct = v_full_hbm.shape[3]
        if quant:
            lead = cid // pt
            wstart = jnp.minimum(
                (lead // host_win) * host_win, ct - host_win
            )
            src = v_stage.at[
                buf, i, lead - wstart, pl.ds((cid % pt) * cs, cs), :
            ]
            dst = v8_tile.at[buf, pl.ds(i * cs, cs), :]
        else:
            wstart = jnp.minimum(
                (cid // host_win) * host_win, ct - host_win
            )
            src = v_stage.at[buf, i, cid - wstart]
            dst = v_tile.at[buf, pl.ds(i * cs, cs), :]
        cp = pltpu.make_async_copy(src, dst, v_sems.at[buf, i])
        cp.start()
        cp.wait()

    def u_dma(j, buf, i):
        cid = miss_chunk_ref[bk, j]
        tile = u8_tile if quant else u_tile
        return pltpu.make_async_copy(
            u_hbm.at[layer, b, pl.ds(cid * cs, cs), :],
            tile.at[buf, pl.ds(i * cs, cs), :],
            u_sems.at[buf, i],
        )

    # ---- run-batched fetches: when a group's GROUP miss chunks are
    # one contiguous id run, its GROUP*cs rows are one row range and
    # the whole group's U (and, int8-device, V) input moves in ONE DMA
    # instead of GROUP scalar-issued ones. bf16-device V additionally
    # needs the slot run contiguous (the fetch IS the scattered write).

    # A GROUP*cs-row batched slice must be addressable in the flat
    # stores (tiny test buffers are smaller) — python-level so the
    # batched copies are never even constructed when impossible.
    can_fetch = (
        (not host_win)
        and u_hbm.shape[2] >= GROUP * cs
        and v_full_hbm.shape[3] >= GROUP * cs
    )

    def fetch_contig(g):
        if not can_fetch:
            return jnp.bool_(False)
        j0 = g * GROUP
        last = jnp.minimum(j0 + GROUP - 1, jnp.maximum(n - 1, 0))
        return (j0 + GROUP <= n) & (
            miss_chunk_ref[bk, last] - miss_chunk_ref[bk, j0]
            == GROUP - 1
        )

    def v_fetch_batchable(g):
        """None = V never batches here (host windows; bf16-device with
        an un-addressable output slice); else the traced predicate:
        int8-device needs the chunk run, bf16-device (fetch IS the
        scattered write) additionally the slot run."""
        if host_win:
            return None
        if quant:
            return fetch_contig(g)
        if not can_batch:
            return None  # python-level: the batched copy's GROUP*cs
            # output slice must never be constructed
        return fetch_contig(g) & group_contig(g)

    def u_batched(g, buf):
        cid0 = miss_chunk_ref[bk, g * GROUP]
        tile = u8_tile if quant else u_tile
        return pltpu.make_async_copy(
            u_hbm.at[layer, b, pl.ds(cid0 * cs, GROUP * cs), :],
            tile.at[buf],
            u_sems.at[buf, 0],
        )

    def v_batched_fetch(g, buf):
        # device modes only (host windows never batch)
        cid0 = miss_chunk_ref[bk, g * GROUP]
        if quant:
            return pltpu.make_async_copy(
                v_full_hbm.at[
                    layer, b, k, pl.ds(cid0 * cs, GROUP * cs), :
                ],
                v8_tile.at[buf],
                v_sems.at[buf, 0],
            )
        row0 = sparse_start + miss_slot_ref[bk, g * GROUP] * cs
        return pltpu.make_async_copy(
            v_full_hbm.at[layer, b, k, pl.ds(cid0 * cs, GROUP * cs), :],
            v_out_hbm.at[layer, b, k, pl.ds(row0, GROUP * cs), :],
            v_sems.at[buf, 0],
        )

    def k_write_dma(j, buf, i):
        row = sparse_start + miss_slot_ref[bk, j] * cs
        return pltpu.make_async_copy(
            k_tile.at[buf, pl.ds(i * cs, cs), :],
            k_out_hbm.at[layer, b, k, pl.ds(row, cs), :],
            w_sems.at[buf, i],
        )

    def v_write_dma(j, buf, i):  # quant, or bf16 host: from the local
        # tile (NEVER the stage — the stage buffer is refetched one
        # group ahead of this DMA's retirement)
        row = sparse_start + miss_slot_ref[bk, j] * cs
        return pltpu.make_async_copy(
            v_tile.at[buf, pl.ds(i * cs, cs), :],
            v_out_hbm.at[layer, b, k, pl.ds(row, cs), :],
            vw_sems.at[buf, i],
        )

    # Batched write-back needs the whole [GROUP*cs, Dh] tile slice to
    # be addressable in the output (tiny test buffers are smaller).
    can_batch = k_out_hbm.shape[3] >= GROUP * cs

    def group_contig(g):
        """True when group g is FULL and its miss slots are consecutive
        — then the whole [GROUP*cs, Dh] tile writes back as ONE DMA
        instead of GROUP scalar-issued ones. Compacted miss slots are
        ascending (compact_misses is a stable sort on the stay flag),
        so below ~50 % hit rates most groups qualify; per-DMA issue
        cost (~0.25 us) was the kernel's miss-regime deficit vs the
        XLA gather path (CLAUDE.md / VERDICT round-2 #2)."""
        j0 = g * GROUP
        last = jnp.minimum(j0 + GROUP - 1, jnp.maximum(n - 1, 0))
        return (j0 + GROUP <= n) & (
            miss_slot_ref[bk, last] - miss_slot_ref[bk, j0]
            == GROUP - 1
        )

    def k_write_batched(g, buf):
        row = sparse_start + miss_slot_ref[bk, g * GROUP] * cs
        return pltpu.make_async_copy(
            k_tile.at[buf],
            k_out_hbm.at[layer, b, k, pl.ds(row, GROUP * cs), :],
            w_sems.at[buf, 0],
        )

    def v_write_batched(g, buf):
        row = sparse_start + miss_slot_ref[bk, g * GROUP] * cs
        return pltpu.make_async_copy(
            v_tile.at[buf],
            v_out_hbm.at[layer, b, k, pl.ds(row, GROUP * cs), :],
            vw_sems.at[buf, 0],
        )

    def start_group(g):
        """Issue the group's U loads + V copies: one DMA per kind when
        the group is a contiguous chunk run, else GROUP each."""
        buf = g % NBUF
        fc = fetch_contig(g)
        vb = v_fetch_batchable(g)

        if can_fetch:
            @pl.when(fc)
            def _():
                u_batched(g, buf).start()

        if vb is not None and can_fetch:
            @pl.when(vb)
            def _():
                v_batched_fetch(g, buf).start()

        def issue(i, _):
            j = g * GROUP + i

            @pl.when((j < n) & jnp.logical_not(fc))
            def _():
                u_dma(j, buf, i).start()

            no_vb = (
                jnp.logical_not(vb) if vb is not None else True
            )

            @pl.when((j < n) & no_vb)
            def _():
                v_dma(j, buf, i).start()

            return 0

        jax.lax.fori_loop(0, GROUP, issue, 0)

    def sv_dma():
        return pltpu.make_async_copy(
            sv_hbm.at[layer, b, k], sv_tile, sv_sem
        )

    @pl.when(n > 0)
    def _():
        # the sv fetch rides ahead of the first group's chunk loads
        sv_dma().start()
        start_group(0)

    def group_body(g, _):
        buf = g % NBUF
        j0 = g * GROUP

        # All loop-invariant vector setup lives INSIDE the (n-bounded)
        # loop on purpose: zero-miss programs — the steady-state
        # majority — must execute nothing but the miss-count check.
        row_pos = jax.lax.broadcasted_iota(
            jnp.int32, (cs, dh), 0
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP * cs, dh), 1)
        if rope_style == "neox":
            # rotate-half: partner(x)[l] = x[(l + Dh/2) % Dh], sign -1
            # on the first half. inv_freq_full zeroes lanes >= rope_dim
            # so pass-through lanes get cos=1/sin=0 automatically.
            rot_shift = rope_dim // 2
            rot_sign = jnp.where(lane < rope_dim // 2, -1.0, 1.0)
            even_partner = False
        else:  # 'glm': interleaved (even, odd) pairs on the first
            # rope_dim lanes (reference rope_new.cu:429-534): partner of
            # an even lane is the next odd lane and vice versa, sign -1
            # on even.
            rot_shift = 1
            rot_sign = jnp.where(lane % 2 == 0, -1.0, 1.0)
            even_partner = True
        rope_lane = lane < rope_dim
        inv_freq = inv_freq_vmem[0][None, :]  # [1, Dh]

        # Wait the group's input loads; retire this buffer's previous
        # writes (and, bf16 mode, its direct V copies) before any reuse
        # (exact semaphore accounting: every started DMA is waited
        # exactly once).
        fc_g = fetch_contig(g)
        vb_g = v_fetch_batchable(g)

        def wait_in(i, _):
            j = j0 + i

            if can_fetch:
                @pl.when(fc_g & (i == 0))
                def _():
                    u_batched(g, buf).wait()

            @pl.when((j < n) & jnp.logical_not(fc_g))
            def _():
                u_dma(j, buf, i).wait()

            if quant or host_win:
                if vb_g is None or not can_fetch:
                    # host windows / tiny stores: always per-miss

                    @pl.when(j < n)
                    def _():
                        v_dma(j, buf, i).wait()

                else:

                    @pl.when(vb_g & (i == 0))
                    def _():
                        v_batched_fetch(g, buf).wait()

                    @pl.when((j < n) & jnp.logical_not(vb_g))
                    def _():
                        v_dma(j, buf, i).wait()

            if quant and host_win:

                @pl.when(j < n)
                def _():
                    v_select(j, buf, i)

            jp = (g - NBUF) * GROUP + i
            gp = g - NBUF

            @pl.when((jp >= 0) & (jp < n))
            def _():
                if can_batch:
                    cp = group_contig(jnp.maximum(gp, 0))

                    @pl.when(cp & (i == 0))
                    def _():
                        k_write_batched(gp, buf).wait()
                        if quant or host_win:
                            v_write_batched(gp, buf).wait()

                    @pl.when(jnp.logical_not(cp))
                    def _():
                        k_write_dma(jp, buf, i).wait()
                        if quant or host_win:
                            v_write_dma(jp, buf, i).wait()
                else:
                    k_write_dma(jp, buf, i).wait()
                    if quant or host_win:
                        v_write_dma(jp, buf, i).wait()

                if not (quant or host_win):
                    # bf16 device mode: the V fetch IS the scattered
                    # write; batched iff BOTH runs were contiguous at
                    # issue time (v_fetch_batchable)
                    if can_fetch and can_batch:
                        vbp = v_fetch_batchable(jnp.maximum(gp, 0))

                        @pl.when(vbp & (i == 0))
                        def _():
                            v_batched_fetch(
                                jnp.maximum(gp, 0), buf
                            ).wait()

                        @pl.when(jnp.logical_not(vbp))
                        def _():
                            v_dma(jp, buf, i).wait()
                    else:
                        v_dma(jp, buf, i).wait()

            if not quant and host_win:
                # bf16 host: drain the stage into v_tile only AFTER the
                # v_write that last read this tile slot retired above.
                @pl.when(j < n)
                def _():
                    v_select(j, buf, i)

            # Absolute RoPE positions for this group's rows.
            @pl.when(j < n)
            def _():
                cid = miss_chunk_ref[bk, j]
                pos_tile[pl.ds(i * cs, cs), :] = (
                    cid.astype(jnp.float32) * cs + row_pos
                )

            return 0

        jax.lax.fori_loop(0, GROUP, wait_in, 0)

        # Prefetch the NEXT group while this one computes.
        @pl.when(g + 1 < n_groups)
        def _():
            start_group(g + 1)

        # One MXU matmul + vectorized RoPE for the whole group.
        @pl.when(g == 0)
        def _():
            sv_dma().wait()

        sv = sv_tile[...]  # [r, Dh]
        if quant:
            u8 = u8_tile[buf]  # [GROUP*cs, r_pad] int8
            base = sv.shape[0] - scale_lanes_for(total_kv_heads)
            kg = layer_ref[1] + k  # global kv-head index
            u_sc = _scale_col(u8, base, base + 1)  # [GROUP*cs, 1]
            v_sc = _scale_col(
                u8, base + 2 + kg, base + 2 + total_kv_heads + kg
            )
            # int8 -> bf16 feeds the MXU directly; the row scale folds
            # into the f32 OUTPUT ((q*s) @ SV == (q @ SV)*s). Scale-byte
            # lanes hit only zero rows of the rank-padded SV.
            u_mat = u8.astype(jnp.bfloat16)
        else:
            u_mat = u_tile[buf]
        k_rec = jnp.dot(
            u_mat, sv, preferred_element_type=jnp.float32
        )  # [GROUP*cs, Dh]
        if quant:
            k_rec = k_rec * u_sc.astype(jnp.float32)
        ang = pos_tile[:, :] * inv_freq
        if even_partner:
            partner = jnp.where(
                lane % 2 == 0,
                pltpu.roll(k_rec, dh - 1, 1),  # even <- next odd lane
                pltpu.roll(k_rec, 1, 1),  # odd <- previous even lane
            )
        else:
            partner = pltpu.roll(k_rec, rot_shift, 1)
        roped = k_rec * jnp.cos(ang) + partner * rot_sign * jnp.sin(ang)
        k_tile[buf] = jnp.where(rope_lane, roped, k_rec).astype(
            k_tile.dtype
        )
        if quant:
            v_tile[buf] = (
                v8_tile[buf].astype(jnp.bfloat16) * v_sc
            ).astype(v_tile.dtype)

        def write_out(i, _):
            j = j0 + i

            @pl.when(j < n)
            def _():
                k_write_dma(j, buf, i).start()
                if quant or host_win:
                    v_write_dma(j, buf, i).start()

            return 0

        if can_batch:
            cg = group_contig(g)

            @pl.when(cg)
            def _():
                k_write_batched(g, buf).start()
                if quant or host_win:
                    v_write_batched(g, buf).start()

            @pl.when(jnp.logical_not(cg))
            def _():
                jax.lax.fori_loop(0, GROUP, write_out, 0)
        else:
            jax.lax.fori_loop(0, GROUP, write_out, 0)

        return 0

    jax.lax.fori_loop(0, n_groups, group_body, 0)

    # Drain the last NBUF groups' K writes and V copies.
    def drain(t, _):
        g = n_groups - NBUF + t

        @pl.when(g >= 0)
        def _():
            buf = g % NBUF

            def w(i, _):
                j = g * GROUP + i

                @pl.when(j < n)
                def _():
                    k_write_dma(j, buf, i).wait()
                    if quant or host_win:
                        v_write_dma(j, buf, i).wait()

                return 0

            if can_batch:
                cg = group_contig(g)

                @pl.when(cg)
                def _():
                    k_write_batched(g, buf).wait()
                    if quant or host_win:
                        v_write_batched(g, buf).wait()

                @pl.when(jnp.logical_not(cg))
                def _():
                    jax.lax.fori_loop(0, GROUP, w, 0)
            else:
                jax.lax.fori_loop(0, GROUP, w, 0)

            if not (quant or host_win):
                vbg = (
                    v_fetch_batchable(g) if can_fetch and can_batch
                    else jnp.bool_(False)
                )
                if can_fetch and can_batch:
                    @pl.when(vbg)
                    def _():
                        v_batched_fetch(g, buf).wait()

                def wv(i, _):
                    j = g * GROUP + i

                    @pl.when((j < n) & jnp.logical_not(vbg))
                    def _():
                        v_dma(j, buf, i).wait()

                    return 0

                jax.lax.fori_loop(0, GROUP, wv, 0)

        return 0

    jax.lax.fori_loop(0, NBUF, drain, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_size", "sparse_start", "rope_dim", "rope_style",
        "host_v", "interpret", "total_kv_heads",
    ),
)
def sparse_refresh(
    layer: jnp.ndarray,  # [] int32
    miss_chunk: jnp.ndarray,  # [B, K, S] int32 (compacted miss chunk ids)
    miss_slot: jnp.ndarray,  # [B, K, S] int32 (slot index per miss)
    miss_cnt: jnp.ndarray,  # [B, K] int32
    u: jnp.ndarray,  # [L, B, C, cs, r] | tiled int8 [L, B, C/pt, 32, r]
    sv: jnp.ndarray,  # [L, B, K, r, Dh]
    v_full: jnp.ndarray,  # [L, B, K, C, cs, Dh] | tiled int8 [..., C/pt, 32, Dh]
    inv_freq_full: jnp.ndarray,  # [1, Dh] f32, neox-duplicated
    k_buf: jnp.ndarray,  # [L, B, K, cap, Dh] (donated, aliased)
    v_buf: jnp.ndarray,  # [L, B, K, cap, Dh] (donated, aliased)
    *,
    chunk_size: int,
    sparse_start: int,
    rope_dim: int,
    rope_style: str = "neox",
    host_v: bool = False,
    interpret: bool = False,
    head_offset=0,  # traced int32: global index of this shard's first
    # kv head (nonzero only inside shard_map islands over tp)
    total_kv_heads: int | None = None,  # global head count (defaults
    # to this call's local count — the unsharded case)
):
    """Refresh the sparse region of k_buf/v_buf for one layer in place.

    Returns (k_buf, v_buf) aliased onto the inputs. Accepts either bf16
    chunk stores or the tiled int8 stores of core/quant.py (detected
    from u.dtype); int8 chunks are dequantized in VMEM with the scales
    embedded in U's tail lanes.

    ``host_v=True``: the V store resides in pinned host DRAM and every
    miss V fetch becomes a host->HBM DMA — hit reuse + host gather of
    misses only, the reference ShadowKVCache_CPU architecture exactly
    (kv_cache.py:1081-1095 + copy.cuh:785-846).

    INVARIANT (load-bearing for the batched contiguous-run fetch): each
    (b, k)'s ``miss_chunk[:miss_cnt]`` must be sorted ASCENDING and
    duplicate-free. ``fetch_contig`` detects a GROUP-chunk run purely
    from ``miss_chunk[last] - miss_chunk[first] == GROUP-1``, which is
    only equivalent to "contiguous run" under that ordering; an
    unsorted or duplicated list silently fetches the wrong chunk rows.
    The producing paths guarantee it (``compact_misses``'s stable
    argsort over ascending slot assignments from
    ``assign_slots_stable``); new callers can verify with
    ``SHADOWKV_DEBUG_MISS=1``, which makes violations print loudly at
    runtime instead of corrupting the cache.
    """
    if os.environ.get("SHADOWKV_DEBUG_MISS") == "1":
        within = (
            jnp.arange(miss_chunk.shape[-1] - 1)[None, None, :]
            < miss_cnt[..., None] - 1
        )
        viol = jnp.sum(
            within & (jnp.diff(miss_chunk, axis=-1) < 1)
        )
        jax.lax.cond(
            viol > 0,
            lambda v: jax.debug.print(
                "SHADOWKV MISS-LIST INVARIANT VIOLATED: {} non-ascending"
                " adjacent pairs — batched run fetches are WRONG", v
            ),
            lambda v: None,
            viol,
        )
    quant = u.dtype == jnp.int8
    # Host V windows: >=4096 B per DMA over the leading store axis
    # (tiles when int8, chunks when bf16) — see kernels/gather.py.
    _dh = sv.shape[4]
    _unit = (
        32 * _dh if quant else chunk_size * _dh * v_full.dtype.itemsize
    )
    host_win = max(1, -(-4096 // _unit)) if host_v else 0
    if host_v:
        assert v_full.shape[3] >= host_win, (v_full.shape, host_win)
    if host_v and interpret:
        # Interpret mode emulates DMAs with dynamic_update_slice, which
        # rejects mixed memory spaces (see kernels/gather.py).
        from jax._src import core as _core

        v_full = jax.device_put(v_full, _core.MemorySpace.Device)
        host_v = False
    cs = chunk_size
    l, bsz = u.shape[0], u.shape[1]
    kh, r = sv.shape[2], sv.shape[3]
    dh = sv.shape[4]
    s = miss_chunk.shape[-1]
    total_kh = total_kv_heads if total_kv_heads is not None else kh
    assert cs % 8 == 0 and dh % 128 == 0 and sparse_start % 8 == 0
    if quant:
        assert v_full.dtype == jnp.int8
        assert 32 % cs == 0
        assert u.shape[-2:] == (32, r), (u.shape, r)
        assert v_full.shape[-2:] == (32, dh), v_full.shape
        # rank padding must hold the scale lanes clear of real SV rows
        assert r >= scale_lanes_for(total_kh), (r, total_kh)
    bk = bsz * kh

    # FLAT row-space views of the device-resident stores (free
    # leading-dim reshapes — same bytes): chunk cid = rows
    # [cid*cs, cid*cs+cs), so per-chunk DMAs are 8-aligned sublane
    # slices and contiguous chunk RUNS are single DMAs. Host-resident
    # V keeps the tiled layout (host DMAs move 4096-B window units).
    u = u.reshape(l, bsz, -1, u.shape[-1])
    if not host_win:  # host_win (not host_v): interpret-mode host
        # tests emulate the window addressing on a device array
        v_full = v_full.reshape(l, bsz, kh, -1, dh)

    kernel = functools.partial(
        _refresh_kernel,
        num_kv_heads=kh,
        total_kv_heads=total_kh,
        chunk_size=cs,
        head_dim=dh,
        sparse_start=sparse_start,
        rope_dim=rope_dim,
        rope_style=rope_style,
        quant=quant,
        host_win=host_win,
    )
    sv_scratch = [
        pltpu.VMEM((r, dh), sv.dtype),
        pltpu.SemaphoreType.DMA,
    ]
    if quant:
        scratch_shapes = sv_scratch + [
            pltpu.VMEM((NBUF, GROUP * cs, r), jnp.int8),
            pltpu.VMEM((NBUF, GROUP * cs, dh), jnp.int8),
            pltpu.VMEM((NBUF, GROUP * cs, dh), k_buf.dtype),
            pltpu.VMEM((NBUF, GROUP * cs, dh), v_buf.dtype),
            pltpu.VMEM((GROUP * cs, dh), jnp.float32),
        ]
        if host_win:  # window stage: [win, 32, dh] int8 per miss
            scratch_shapes += [
                pltpu.VMEM((NBUF, GROUP, host_win, 32, dh), jnp.int8),
            ]
        scratch_shapes += [
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
        ]
    else:
        scratch_shapes = sv_scratch + [
            pltpu.VMEM((NBUF, GROUP * cs, r), u.dtype),
            pltpu.VMEM((NBUF, GROUP * cs, dh), k_buf.dtype),
        ]
        if host_win:  # out-of-stage V tile (the v_write source)
            scratch_shapes += [
                pltpu.VMEM((NBUF, GROUP * cs, dh), v_buf.dtype),
            ]
        scratch_shapes += [pltpu.VMEM((GROUP * cs, dh), jnp.float32)]
        if host_win:  # window stage: [win, cs, dh] bf16 per miss
            scratch_shapes += [
                pltpu.VMEM(
                    (NBUF, GROUP, host_win, cs, dh), v_full.dtype
                ),
            ]
        scratch_shapes += [
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
        ]
        if host_win:
            scratch_shapes += [pltpu.SemaphoreType.DMA((NBUF, GROUP))]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u
            pl.BlockSpec(  # v_full (HBM, or pinned host when offloaded)
                memory_space=(
                    pltpu.MemorySpace.HOST if host_v else pl.ANY
                )
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # sv (manual DMA, n>0)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv_freq
            pl.BlockSpec(memory_space=pl.ANY),  # k_buf
            pl.BlockSpec(memory_space=pl.ANY),  # v_buf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=scratch_shapes,
    )
    k_out, v_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_buf.shape, k_buf.dtype),
            jax.ShapeDtypeStruct(v_buf.shape, v_buf.dtype),
        ),
        # flat input indices INCLUDE the 4 scalar-prefetch args:
        # 0-3 scalars, 4 u, 5 v_full, 6 sv, 7 inv_freq, 8 k_buf, 9 v_buf
        input_output_aliases={8: 0, 9: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # (b, k) cells touch disjoint buffer rows — no ordering
            # between grid programs is required.
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        jnp.stack(
            [
                jnp.asarray(layer, jnp.int32).reshape(()),
                jnp.asarray(head_offset, jnp.int32).reshape(()),
            ]
        ),
        miss_chunk.reshape(bk, s),
        miss_slot.reshape(bk, s),
        miss_cnt.reshape(bk),
        u,
        v_full,
        sv,
        inv_freq_full,
        k_buf,
        v_buf,
    )
    return k_out, v_out


def compact_misses(slot_ids, stay_mask):
    """Pack miss slots first (plain VPU sort; the reference's hash-map
    repack, map.cuh:621-683). Returns (miss_chunk, miss_slot, miss_cnt);
    entries past miss_cnt are padding (slot 0 repeated — the kernel
    never reads them)."""
    s = slot_ids.shape[-1]
    order = jnp.argsort(stay_mask.astype(jnp.int32), axis=-1, stable=True)
    order = order.astype(jnp.int32)
    miss_chunk = jnp.take_along_axis(slot_ids, order, axis=-1)
    miss_cnt = jnp.sum(
        jnp.logical_not(stay_mask), axis=-1
    ).astype(jnp.int32)
    return miss_chunk, order, miss_cnt
