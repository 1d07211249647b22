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
- v_full [L, B, K, C, cs, Dh]: one chunk = one (cs, Dh) tile, cs % 8 == 0
  and Dh % 128 == 0 so every DMA unit is tiling-aligned.
- u [L, B, C, cs, r]: chunk-major low-rank rows (r is lane-padded by XLA
  to 128 multiples either way).
- k_buf / v_buf [L, B, K, cap, Dh] with sparse_start % 8 == 0: row
  ranges written per-chunk stay sublane-aligned.
- inv_freq_full [1, Dh]: neox-duplicated inverse frequencies
  (concat(invf, invf)) so the in-kernel RoPE needs no lane concatenation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 16  # miss chunks processed per pipeline stage: the group's U
# loads are issued back-to-back (latency amortized), reconstruction is
# ONE [GROUP*cs, r] x [r, Dh] MXU matmul, and RoPE is vectorized over
# the whole [GROUP*cs, Dh] tile. Double-buffered across groups.
NBUF = 2


def _refresh_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    miss_chunk_ref,  # [BK, S]
    miss_slot_ref,  # [BK, S]
    miss_cnt_ref,  # [BK]
    # tensors
    u_hbm,  # [L, B, C, cs, r] ANY
    v_full_hbm,  # [L, B, K, C, cs, Dh] ANY
    sv_vmem,  # [1, 1, 1, r, Dh] VMEM block for this (layer, b, k)
    inv_freq_vmem,  # [1, Dh] VMEM
    k_buf_hbm,  # [L, B, K, cap, Dh] ANY (aliased out 0)
    v_buf_hbm,  # [L, B, K, cap, Dh] ANY (aliased out 1)
    # outputs (aliases of the two above)
    k_out_hbm,
    v_out_hbm,
    # scratch
    u_tile,  # VMEM [NBUF, GROUP * cs, r]
    k_tile,  # VMEM [NBUF, GROUP * cs, Dh]
    pos_tile,  # VMEM [GROUP * cs, Dh] f32
    v_sems,  # DMA sems [NBUF, GROUP]
    u_sems,  # DMA sems [NBUF, GROUP]
    w_sems,  # DMA sems [NBUF, GROUP]
    *,
    num_kv_heads: int,
    chunk_size: int,
    head_dim: int,
    sparse_start: int,
    rope_dim: int,
    rope_style: str,
):
    bk = pl.program_id(0)
    b = bk // num_kv_heads
    k = bk % num_kv_heads
    layer = layer_ref[0]
    n = miss_cnt_ref[bk]
    cs, dh = chunk_size, head_dim
    n_groups = (n + GROUP - 1) // GROUP

    def v_dma(j, buf, i):
        cid = miss_chunk_ref[bk, j]
        row = sparse_start + miss_slot_ref[bk, j] * cs
        return pltpu.make_async_copy(
            v_full_hbm.at[layer, b, k, cid],
            v_out_hbm.at[layer, b, k, pl.ds(row, cs), :],
            v_sems.at[buf, i],
        )

    def u_dma(j, buf, i):
        cid = miss_chunk_ref[bk, j]
        return pltpu.make_async_copy(
            u_hbm.at[layer, b, cid],
            u_tile.at[buf, pl.ds(i * cs, cs), :],
            u_sems.at[buf, i],
        )

    def k_write_dma(j, buf, i):
        row = sparse_start + miss_slot_ref[bk, j] * cs
        return pltpu.make_async_copy(
            k_tile.at[buf, pl.ds(i * cs, cs), :],
            k_out_hbm.at[layer, b, k, pl.ds(row, cs), :],
            w_sems.at[buf, i],
        )

    def start_group(g):
        """Issue the group's GROUP U loads + V copies back-to-back."""
        buf = g % NBUF

        def issue(i, _):
            j = g * GROUP + i

            @pl.when(j < n)
            def _():
                u_dma(j, buf, i).start()
                v_dma(j, buf, i).start()

            return 0

        jax.lax.fori_loop(0, GROUP, issue, 0)

    @pl.when(n > 0)
    def _():
        start_group(0)

    row_pos = jax.lax.broadcasted_iota(jnp.int32, (cs, dh), 0).astype(
        jnp.float32
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP * cs, dh), 1)
    if rope_style == "neox":
        # rotate-half: partner(x)[l] = x[(l + Dh/2) % Dh], sign -1 on
        # the first half. inv_freq_full zeroes lanes >= rope_dim so
        # pass-through lanes get cos=1/sin=0 automatically.
        rot_shift = rope_dim // 2
        rot_sign = jnp.where(lane < rope_dim // 2, -1.0, 1.0)
        even_partner = False
    else:  # 'glm': interleaved (even, odd) pairs on the first rope_dim
        # lanes (reference rope_new.cu:429-534): partner of an even
        # lane is the next odd lane and vice versa, sign -1 on even.
        rot_shift = 1
        rot_sign = jnp.where(lane % 2 == 0, -1.0, 1.0)
        even_partner = True
    rope_lane = lane < rope_dim
    inv_freq = inv_freq_vmem[0][None, :]  # [1, Dh]
    sv = sv_vmem[0, 0, 0]  # [r, Dh]

    def group_body(g, _):
        buf = g % NBUF
        j0 = g * GROUP

        # Wait the group's U loads; retire this buffer's previous
        # K-writes and V copies before any reuse (exact semaphore
        # accounting: every started DMA is waited exactly once).
        def wait_in(i, _):
            j = j0 + i

            @pl.when(j < n)
            def _():
                u_dma(j, buf, i).wait()

            jp = (g - NBUF) * GROUP + i

            @pl.when((jp >= 0) & (jp < n))
            def _():
                k_write_dma(jp, buf, i).wait()
                v_dma(jp, buf, i).wait()

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
        k_rec = jnp.dot(
            u_tile[buf], sv, preferred_element_type=jnp.float32
        )  # [GROUP*cs, Dh]
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

        def write_out(i, _):
            j = j0 + i

            @pl.when(j < n)
            def _():
                k_write_dma(j, buf, i).start()

            return 0

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
                    v_dma(j, buf, i).wait()

                return 0

            jax.lax.fori_loop(0, GROUP, w, 0)

        return 0

    jax.lax.fori_loop(0, NBUF, drain, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_size", "sparse_start", "rope_dim", "rope_style",
        "interpret",
    ),
)
def sparse_refresh(
    layer: jnp.ndarray,  # [] int32
    miss_chunk: jnp.ndarray,  # [B, K, S] int32 (compacted miss chunk ids)
    miss_slot: jnp.ndarray,  # [B, K, S] int32 (slot index per miss)
    miss_cnt: jnp.ndarray,  # [B, K] int32
    u: jnp.ndarray,  # [L, B, C, cs, r]
    sv: jnp.ndarray,  # [L, B, K, r, Dh]
    v_full: jnp.ndarray,  # [L, B, K, C, cs, Dh]
    inv_freq_full: jnp.ndarray,  # [1, Dh] f32, neox-duplicated
    k_buf: jnp.ndarray,  # [L, B, K, cap, Dh] (donated, aliased)
    v_buf: jnp.ndarray,  # [L, B, K, cap, Dh] (donated, aliased)
    *,
    chunk_size: int,
    sparse_start: int,
    rope_dim: int,
    rope_style: str = "neox",
    interpret: bool = False,
):
    """Refresh the sparse region of k_buf/v_buf for one layer in place.

    Returns (k_buf, v_buf) aliased onto the inputs.
    """
    l, bsz, c, cs, r = u.shape
    kh, dh = sv.shape[2], sv.shape[4]
    s = miss_chunk.shape[-1]
    assert cs % 8 == 0 and dh % 128 == 0 and sparse_start % 8 == 0
    bk = bsz * kh

    kernel = functools.partial(
        _refresh_kernel,
        num_kv_heads=kh,
        chunk_size=chunk_size,
        head_dim=dh,
        sparse_start=sparse_start,
        rope_dim=rope_dim,
        rope_style=rope_style,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # u
            pl.BlockSpec(memory_space=pl.ANY),  # v_full
            pl.BlockSpec(  # sv tile for (layer, b, k)
                (1, 1, 1, r, dh),
                lambda i, layer_ref, *_: (layer_ref[0], i // kh, i % kh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # inv_freq
            pl.BlockSpec(memory_space=pl.ANY),  # k_buf
            pl.BlockSpec(memory_space=pl.ANY),  # v_buf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, GROUP * cs, r), u.dtype),
            pltpu.VMEM((NBUF, GROUP * cs, dh), k_buf.dtype),
            pltpu.VMEM((GROUP * cs, dh), jnp.float32),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
            pltpu.SemaphoreType.DMA((NBUF, GROUP)),
        ],
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
            # (b, k) cells touch disjoint buffer rows; letting Mosaic
            # treat the grid as parallel keeps the sv block pipeline
            # ahead of the (often nearly empty) cell bodies.
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
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
