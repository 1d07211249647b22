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
memory (``pltpu.MemorySpace.HOST``) and a second ring issues host->HBM
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

HOST word-size rule (round-2 LLO bisect, benchmarks/
probe_ring_compile.py): in a kernel with ANY host-space operand,
EVERY DMA descriptor's dim strides and dynamic-offset multipliers must
be multiples of 4096 bytes — including device-only descriptors sharing
the kernel (the int8 U fetch's 1024 B sublane-offset multiplier was
the compile failure, not the V fetch). Hence the host path runs TWO
kernels: a device-only U ring (unconstrained) and a host V ring whose
fetch unit is one full leading-axis row [TSH, WV] with
TSH*WV*itemsize == 4096 (int8 32-row tiles already are; bf16 stores
are committed host-side as PAIRED 16-row units — engine._host_aligned).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NSEM = 16  # DMAs in flight per stream (u / v each get their own ring)
HOST_WORD = 4096  # bytes per host-space DMA descriptor word


def _ring(s, issue, wait):
    """Pipelined ring: keep min(NSEM, s) DMAs in flight."""
    nsem = min(NSEM, s)

    def loop(j, _):
        @pl.when(j >= nsem)
        def _():
            wait(j - nsem, j % nsem)

        issue(j, j % nsem)
        return 0

    jax.lax.fori_loop(0, s, loop, 0)

    def drain(i, _):
        j = s - nsem + i
        wait(j, j % nsem)
        return 0

    jax.lax.fori_loop(0, nsem, drain, 0)


def _gather_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    ids_ref,  # [BK, S] selected chunk ids
    # tensors (all ANY/HBM — the kernel is pure DMA issue)
    u_hbm,  # [L, B, CT, TS, WU]
    v_hbm,  # [L, B, K, CT, TS, WV]
    # outputs
    u_out,
    v_out,
    # scratch
    u_sems,
    v_sems,
    *,
    num_kv_heads: int,
    chunk_size: int,
    tile_sub: int,
):
    """Device-store path: U and V rings share one kernel."""
    bk = pl.program_id(0)
    b = bk // num_kv_heads
    k = bk % num_kv_heads
    layer = layer_ref[0]
    cs = chunk_size
    pt = tile_sub // cs
    s = ids_ref.shape[1]

    def u_dma(j, slot):
        cid = ids_ref[bk, j]
        return pltpu.make_async_copy(
            u_hbm.at[
                layer, b, cid // pt, pl.ds((cid % pt) * cs, cs), :
            ],
            u_out.at[bk, pl.ds(j * cs, cs), :],
            u_sems.at[slot],
        )

    def v_dma(j, slot):
        cid = ids_ref[bk, j]
        return pltpu.make_async_copy(
            v_hbm.at[
                layer, b, k, cid // pt, pl.ds((cid % pt) * cs, cs), :
            ],
            v_out.at[bk, pl.ds(j * cs, cs), :],
            v_sems.at[slot],
        )

    _ring(
        s,
        lambda j, slot: (u_dma(j, slot).start(), v_dma(j, slot).start()),
        lambda j, slot: (u_dma(j, slot).wait(), v_dma(j, slot).wait()),
    )


def _u_gather_kernel(
    layer_ref, ids_ref, u_hbm, u_out, u_sems,
    *, num_kv_heads: int, chunk_size: int, tile_sub: int,
):
    """U ring alone (device store). Split out of the host-V kernel so
    its sub-4096 B sublane slices stay legal (see module docstring)."""
    bk = pl.program_id(0)
    b = bk // num_kv_heads
    layer = layer_ref[0]
    cs = chunk_size
    pt = tile_sub // cs
    s = ids_ref.shape[1]

    def u_dma(j, slot):
        cid = ids_ref[bk, j]
        return pltpu.make_async_copy(
            u_hbm.at[
                layer, b, cid // pt, pl.ds((cid % pt) * cs, cs), :
            ],
            u_out.at[bk, pl.ds(j * cs, cs), :],
            u_sems.at[slot],
        )

    _ring(
        s,
        lambda j, slot: u_dma(j, slot).start(),
        lambda j, slot: u_dma(j, slot).wait(),
    )


def _v_host_kernel(
    # scalar prefetch
    layer_ref,
    ids_ref,  # [BK, S]
    # tensors: one or more V parts (HOST). A single part is the whole
    # store [L, B, K, CTH, TSH, WV]; multiple parts are sharded along
    # layers or batch (this platform cannot update pinned arrays in
    # place, so the store is assembled as per-slot / per-layer-segment
    # device_puts — see engine._offload_v)
    *refs,
    num_kv_heads: int,
    pt_v: int,  # chunks per fetched [TSH, WV] unit
    part_starts: tuple,  # per-part start along host_axis
    host_axis: int,  # 0 = layer-sharded parts, 1 = batch-sharded
):
    """Host-V ring: each fetch is ONE whole leading-axis row
    [TSH, WV] (= 4096 B by the committed layout), so every descriptor
    stride / dynamic-offset multiplier is host-word aligned."""
    n_parts = len(part_starts)
    v_parts = refs[:n_parts]
    v_out = refs[n_parts]
    v_sems = refs[n_parts + 1]
    bk = pl.program_id(0)
    b = bk // num_kv_heads
    k = bk % num_kv_heads
    layer = layer_ref[0]
    s = ids_ref.shape[1]

    def _descr(ref, lay, bb, j, slot):
        row = ids_ref[bk, j] // pt_v
        return pltpu.make_async_copy(
            ref.at[lay, bb, k, row],
            v_out.at[bk, j],
            v_sems.at[slot],
        )

    def _each(j, slot, op):
        """Run ``op`` on the part owning (layer, b). Parts are a STATIC
        tuple: the selection unrolls to pl.when guards (exactly one
        fires), each naming its own ref — pinned arrays cannot be
        dynamically indexed across."""
        if n_parts == 1:
            op(_descr(v_parts[0], layer, b, j, slot))
            return
        sel = layer if host_axis == 0 else b
        for ref, lo in zip(v_parts, part_starts):
            size = ref.shape[host_axis]
            lay = layer - lo if host_axis == 0 else layer
            bb = b - lo if host_axis == 1 else b

            @pl.when((sel >= lo) & (sel < lo + size))
            def _(ref=ref, lay=lay, bb=bb):
                op(_descr(ref, lay, bb, j, slot))

    _ring(
        s,
        lambda j, slot: _each(j, slot, lambda d: d.start()),
        lambda j, slot: _each(j, slot, lambda d: d.wait()),
    )


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
    v_full,  # [L, B, K, CT, TS, WV] device store; host_v=True: one
    # host-aligned pinned array [L, B, K, CTH, TSH, WV] with
    # TSH*WV*itemsize == 4096 (engine._host_aligned), or a TUPLE of
    # such parts sharded along ``host_axis``
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
    assert u.shape[-2] == tile_sub
    assert tile_sub % cs == 0 and cs % 8 == 0
    bk = b * kh
    ids = slot_ids.reshape(bk, s)
    layer_s = layer.reshape(1).astype(jnp.int32)

    # The host path keeps its structure under interpret (CPU tests must
    # exercise the same kernels + selection), only the PLACEMENT is
    # emulated: interpret-mode DMAs are dynamic_update_slices, which
    # reject mixed memory spaces.
    host_path = host_v
    if host_v and interpret:
        from jax._src import core as _core

        parts = tuple(
            jax.device_put(p, _core.MemorySpace.Device) for p in parts
        )
        host_v = False

    if not host_path:
        assert parts[0].shape[-2] == tile_sub
        kernel = functools.partial(
            _gather_kernel,
            num_kv_heads=kh,
            chunk_size=cs,
            tile_sub=tile_sub,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((min(NSEM, s),)),
                pltpu.SemaphoreType.DMA((min(NSEM, s),)),
            ],
        )
        u_rows, v_rows = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((bk, s * cs, wu), u.dtype),
                jax.ShapeDtypeStruct((bk, s * cs, wv), parts[0].dtype),
            ),
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(layer_s, ids, u, parts[0])
        return (
            u_rows.reshape(b, kh, s * cs, wu),
            v_rows.reshape(b, kh, s * cs, wv),
        )

    # --- host path: device-only U ring + host V ring (two kernels) ---
    tsh = parts[0].shape[-2]
    assert tsh % cs == 0, (tsh, cs)
    pt_v = tsh // cs
    unit = tsh * wv * parts[0].dtype.itemsize
    if host_v:  # placement is real (not the interpret emulation)
        assert unit % HOST_WORD == 0, (
            f"host V store rows must be {HOST_WORD}-byte units "
            f"(engine._host_aligned); got [{tsh},{wv}] "
            f"{parts[0].dtype} = {unit} B"
        )

    u_kernel = functools.partial(
        _u_gather_kernel,
        num_kv_heads=kh,
        chunk_size=cs,
        tile_sub=tile_sub,
    )
    u_rows = pl.pallas_call(
        u_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(NSEM, s),))],
        ),
        out_shape=jax.ShapeDtypeStruct((bk, s * cs, wu), u.dtype),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(layer_s, ids, u)

    v_kernel = functools.partial(
        _v_host_kernel,
        num_kv_heads=kh,
        pt_v=pt_v,
        part_starts=tuple(starts),
        host_axis=axis,
    )
    v_space = pltpu.MemorySpace.HOST if host_v else pl.ANY
    v_units = pl.pallas_call(
        v_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bk,),
            in_specs=[
                pl.BlockSpec(memory_space=v_space) for _ in parts
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((min(NSEM, s),))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bk, s, tsh, wv), parts[0].dtype
        ),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(layer_s, ids, *parts)

    # Select the cs-row sub-chunk out of each fetched unit. All shapes
    # keep wide lane dims so no int8 sublane padding appears.
    sub = (ids % pt_v)[..., None, None]
    v_rows = jnp.take_along_axis(
        v_units.reshape(bk, s, pt_v, cs * wv), sub, axis=2
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
