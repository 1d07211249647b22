"""Ring-DMA chunk gather for the decode hot path (low-hit regimes).

The XLA decode path spends most of its step gathering selected chunk
rows out of the U and V stores (measured 50-80 GB/s effective at the
bench config — per-row gather overhead dominates 1-2 KB rows). This
kernel issues the same fetches as a pipelined ring of async HBM->HBM
DMAs (16 in flight), which runs the identical access pattern at
~470 GB/s (benchmarks/prof_gather_kernel.py). It is a GATHER ONLY:
dequantization, the U x SV reconstruction matmul and RoPE stay in XLA,
which already runs them near memory speed.

With ``host_v=True`` the V store is declared resident in pinned host
memory (``pltpu.MemorySpace.HOST``) and the same ring issues host->HBM
DMAs — the direct TPU analogue of the reference's pinned-memory gather
(kv_cache.py:554-563 + gather_copy.cu K2/K3), without the io_callback
round-trip that some TPU runtimes reject.

Reference mapping: this replaces the gather half of
``gather_copy_with_offsets`` / ``batch_gather_gemm``'s chunk-gather
iterator (kernels/gather_copy.cu:332-419,
kernels/special_batch_gather_predicated_tile_iterator.h:294) for the
miss-heavy regime, where the reference's hit-skip machinery has nothing
to skip. The hit-skipping fused kernel (kernels/reconstruct.py) remains
the high-locality path.

Layout contract (core/quant.py): stores are TILED chunk-major —
  u   [L, B, CT, TS, WU]      (int8: CT = C/pt, TS = 32; bf16: CT = C,
  v   [L, B, K, CT, TS, WV]    TS = cs)
so chunk cid occupies sublane rows (cid % pt)*cs .. +cs of tile
cid // pt (pt = TS // cs). Every DMA'd unit is an 8-aligned sublane
slice of a tiling-aligned array — the only per-chunk slice Mosaic
supports for int8 (a flat [C, W] row CANNOT be DMA'd per-chunk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 16  # DMAs in flight per stream (u / v each get their own ring)


def _gather_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    ids_ref,  # [BK, S] selected chunk ids
    # tensors (all ANY/HBM or HOST — the kernel is pure DMA issue):
    # u_hbm [L, B, CT, TS, WU], then one or more V parts. A single part
    # is the whole store [L, B, K, CT, TS, WV]; multiple parts are a
    # host store SHARDED along layers or batch (this platform cannot
    # update pinned arrays in place, so the store is assembled as
    # per-slot / per-layer-segment device_puts — see engine._offload_v)
    *refs,
    num_kv_heads: int,
    chunk_size: int,
    tile_sub: int,
    host_win: int,  # leading-axis tiles per host V DMA (0 = device)
    part_starts: tuple,  # per-part start along host_axis
    host_axis: int,  # 0 = layer-sharded parts, 1 = batch-sharded
):
    n_parts = len(part_starts)
    u_hbm = refs[0]
    v_parts = refs[1 : 1 + n_parts]
    u_out, v_out = refs[1 + n_parts : 3 + n_parts]
    u_sems, v_sems = refs[3 + n_parts : 5 + n_parts]
    bk = pl.program_id(0)
    b = bk // num_kv_heads
    k = bk % num_kv_heads
    layer = layer_ref[0]
    cs = chunk_size
    pt = tile_sub // cs
    s = ids_ref.shape[1]
    nsem = min(NSEM, s)

    def u_dma(j, slot):
        cid = ids_ref[bk, j]
        return pltpu.make_async_copy(
            u_hbm.at[
                layer, b, cid // pt, pl.ds((cid % pt) * cs, cs), :
            ],
            u_out.at[bk, pl.ds(j * cs, cs), :],
            u_sems.at[slot],
        )

    def _v_descr(v_hbm, lay, bb, j, slot):
        cid = ids_ref[bk, j]
        if host_win:
            # Host-space DMA descriptors operate in 4096-byte words
            # (round-2 Mosaic LLO finding: an 8-sublane 2048 B slice is
            # rejected with "multiplier_in_bytes % word_size == 0
            # (2048 vs 4096)"). Fetch a WINDOW of host_win consecutive
            # leading-axis tiles — one contiguous >=4096 B run (the
            # store is tile-major) — and let the caller select the
            # cs-row sub-chunk. int8 32-tiles are already 4096 B
            # (host_win=1, full tile); bf16 cs-tiles pair up
            # (host_win=2).
            wpt = host_win * pt  # chunks per fetched window
            ct = v_hbm.shape[3]
            # Clamp the last window to the array end (tile counts need
            # not divide host_win); the caller recomputes the same
            # start to pick the right sub-chunk.
            wstart = jnp.minimum(
                (cid // wpt) * host_win, ct - host_win
            )
            return pltpu.make_async_copy(
                v_hbm.at[lay, bb, k, pl.ds(wstart, host_win)],
                v_out.at[bk, j],
                v_sems.at[slot],
            )
        return pltpu.make_async_copy(
            v_hbm.at[
                lay, bb, k, cid // pt, pl.ds((cid % pt) * cs, cs), :
            ],
            v_out.at[bk, pl.ds(j * cs, cs), :],
            v_sems.at[slot],
        )

    def _v_each(j, slot, op):
        """Issue/wait the V transfer on the part owning (layer, b).
        Parts are a STATIC tuple: the selection unrolls to pl.when
        guards (exactly one fires), each naming its own ref — pinned
        arrays cannot be dynamically indexed across."""
        if n_parts == 1:
            op(_v_descr(v_parts[0], layer, b, j, slot))
            return
        sel = layer if host_axis == 0 else b
        for p, (ref, lo) in enumerate(zip(v_parts, part_starts)):
            size = ref.shape[host_axis]
            lay = layer - lo if host_axis == 0 else layer
            bb = b - lo if host_axis == 1 else b

            @pl.when((sel >= lo) & (sel < lo + size))
            def _(ref=ref, lay=lay, bb=bb):
                op(_v_descr(ref, lay, bb, j, slot))

    def loop(j, _):
        @pl.when(j >= nsem)
        def _():
            u_dma(j - nsem, j % nsem).wait()
            _v_each(j - nsem, j % nsem, lambda d: d.wait())

        u_dma(j, j % nsem).start()
        _v_each(j, j % nsem, lambda d: d.start())
        return 0

    jax.lax.fori_loop(0, s, loop, 0)

    def drain(i, _):
        j = s - nsem + i
        u_dma(j, j % nsem).wait()
        _v_each(j, j % nsem, lambda d: d.wait())
        return 0

    jax.lax.fori_loop(0, nsem, drain, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "chunk_size", "tile_sub", "host_v", "interpret", "host_axis",
    ),
)
def gather_chunks(
    layer: jnp.ndarray,  # [] int32
    slot_ids: jnp.ndarray,  # [B, K, S] int32 selected chunk ids
    u: jnp.ndarray,  # [L, B, CT, TS, WU]
    v_full,  # [L, B, K, CT, TS, WV], or a TUPLE of pinned-host parts
    # sharded along ``host_axis`` (this platform cannot assemble one
    # big pinned array in place — engine._offload_v builds per-slot /
    # per-layer-segment parts with direct device_puts instead)
    *,
    chunk_size: int,
    tile_sub: int,
    host_v: bool = False,
    interpret: bool = False,
    host_axis: str = "batch",
):
    """Fetch the selected chunks' U token rows and V rows for one layer.

    Returns (u_tok [B, K, S*cs, WU], v_tok [B, K, S*cs, WV]) in the
    stores' dtypes — TOKEN-major, never exposing a cs-sublane int8
    shape (a materialized [..., cs, W] int8 array pads 4x under TPU
    tiling; see core/quant.py). U rows are fetched PER KV HEAD (each
    head selects different chunks); scales ride inside the U rows.
    """
    b, kh, s = slot_ids.shape
    cs = chunk_size
    parts = v_full if isinstance(v_full, (tuple, list)) else (v_full,)
    parts = tuple(parts)
    assert host_v or len(parts) == 1, "sharded V stores are host-only"
    axis = 0 if host_axis == "layer" else 1
    starts, acc = [], 0
    for p in parts:
        starts.append(acc)
        acc += p.shape[axis]
        assert p.shape[-1] == parts[0].shape[-1]
        assert p.shape[-2] == parts[0].shape[-2]
    wu, wv = u.shape[-1], parts[0].shape[-1]
    assert u.shape[-2] == tile_sub and parts[0].shape[-2] == tile_sub
    assert tile_sub % cs == 0 and cs % 8 == 0
    # Host-space DMA descriptors move 4096-byte words, so host fetches
    # are WINDOWS of host_win consecutive leading-axis tiles (one
    # contiguous run in the tile-major store): int8 32-tiles are
    # already 4096 B (window = 1 full tile), bf16 cs-tiles pair up
    # (window = 2). The caller-visible contract is unchanged — the
    # cs-row sub-chunk is selected from the fetched window below.
    unit = tile_sub * wv * parts[0].dtype.itemsize
    host_win = max(1, -(-4096 // unit)) if host_v else 0
    if host_v:
        assert (host_win * unit) % 4096 == 0, (unit, host_win)
        assert parts[0].shape[-3] >= host_win, (parts[0].shape, host_win)
    bk = b * kh

    if host_v and interpret:
        # Interpret mode emulates DMAs with dynamic_update_slice, which
        # rejects mixed memory spaces — move the store to device memory
        # for the emulation (CPU "host" and "device" are the same DRAM;
        # tests exercise plumbing + tokens, not placement).
        from jax._src import core as _core

        parts = tuple(
            jax.device_put(p, _core.MemorySpace.Device) for p in parts
        )
        host_v = False

    kernel = functools.partial(
        _gather_kernel,
        num_kv_heads=kh,
        chunk_size=cs,
        tile_sub=tile_sub,
        host_win=host_win,
        part_starts=tuple(starts),
        host_axis=axis,
    )
    v_space = pltpu.MemorySpace.HOST if host_v else pl.ANY
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=v_space) for _ in parts],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((min(NSEM, s),)),
            pltpu.SemaphoreType.DMA((min(NSEM, s),)),
        ],
    )
    v_shape = (
        (bk, s, host_win, tile_sub, wv) if host_win else (bk, s * cs, wv)
    )
    u_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bk, s * cs, wu), u.dtype),
            jax.ShapeDtypeStruct(v_shape, parts[0].dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        slot_ids.reshape(bk, s),
        u,
        *parts,
    )
    if host_win:
        # Select the cs-row sub-chunk out of each fetched window (same
        # clamped window start as the kernel). All shapes keep wide
        # lane dims so no int8 sublane padding appears.
        pt = tile_sub // cs
        wpt = host_win * pt  # chunks per window
        ids = slot_ids.reshape(bk, s)
        wstart = jnp.minimum(
            (ids // wpt) * host_win, parts[0].shape[-3] - host_win
        )
        sub = (ids - wstart * pt)[..., None, None]
        v_rows = jnp.take_along_axis(
            v_rows.reshape(bk, s, wpt, cs * wv), sub, axis=2
        )[:, :, 0]
        v_rows = v_rows.reshape(bk, s * cs, wv)
    return (
        u_rows.reshape(b, kh, s * cs, wu),
        v_rows.reshape(b, kh, s * cs, wv),
    )


def gather_chunks_reference(
    layer, slot_ids, u, v_full, *, chunk_size, tile_sub
):
    """jnp reference for tests: same outputs via take_along-style
    indexing over the tiled stores."""
    b, kh, s = slot_ids.shape
    cs = chunk_size
    pt = tile_sub // cs
    ct = u.shape[2]
    u_l = u[layer]  # [B, CT, TS, WU]
    v_l = v_full[layer]  # [B, K, CT, TS, WV]
    u_tok = u_l.reshape(b, ct * pt, cs, u.shape[-1])  # [B, C, cs, WU]
    v_tok = v_l.reshape(b, kh, ct * pt, cs, v_full.shape[-1])
    bi = jnp.arange(b)[:, None, None]
    ki = jnp.arange(kh)[None, :, None]
    return (
        u_tok[bi, slot_ids].reshape(b, kh, s * cs, u.shape[-1]),
        v_tok[bi, ki, slot_ids].reshape(b, kh, s * cs, v_full.shape[-1]),
    )
