"""Symmetric int8 row quantization for the shadow-cache stores.

The reference keeps all cache state in bf16 and wins HBM back by
offloading V to host DRAM (kv_cache.py:554-563). On a TPU chip whose
host link cannot sustain the per-step gather, the equivalent
memory-for-batch trade is quantization: V chunks, U factor rows and
landmark tables drop to int8 with one scale per row, roughly doubling
the feasible batch at 122K context. Dequantization fuses into the
consuming gather/matmul (XLA reads int8 bytes and converts in-register).

Two store layouts hold the SAME per-chunk bytes (each chunk = cs
token rows, each ``row`` lanes wide); which one a cache uses is fixed
at init by the decode path that will read it:

    flat  (XLA path):    u [B, C, cs*rank_pad + flat_trailer_lanes],
                         v_full [B, K, C, cs*head_dim]
    tiled (Pallas path): u [B, C/pt, 32, rank_pad],
                         v_full [B, K, C/pt, 32, head_dim]
                         (pt = 32 // chunk_size; chunk c = sublane rows
                         (c % pt)*cs .. +cs of tile c // pt)

The flat U row ADDITIONALLY carries a ``flat_trailer_lanes(cs, K)``
trailer repeating all of the chunk's scales contiguously — lo plane
then hi plane, each
[u(cs) | v head 0 (cs) | ... | v head K-1 (cs) | pad-to-8] — because the
XLA path must not touch the per-token embedded lanes: extracting them
needs a [..., cs, rank_pad] int8 view, and any materialization of
that shape is 4x sublane-padded (measured ~4.5 ms/step of relayout
copies). A contiguous tail slice + tiny reshapes is near-free.

Why two: XLA's gather runs fastest over whole rows of an untiled
leading axis (the flat form; a windowed gather over the tiled form
makes XLA relayout the WHOLE store — a multi-GB copy per step that
OOMs at 122K). Mosaic DMA is the opposite: it cannot slice one flat
row (one sublane of a tiled chunk axis) but happily slices 8-aligned
sublane ranges out of a 32-tile, and the tiled form is int8's native
(32, 128) tile with ZERO padding (a [..., cs=8, row] int8 array pads
4x). The layouts are byte-identical per chunk but NOT bitcastable
between each other under TPU tiling, hence the init-time choice.

Per-token bf16 scales are EMBEDDED in the tail lanes of each U token
row (``SCALE_LANES`` lanes reserved by rank_pad; e.g. rank 160 + 32
scale lanes = 192 for the flat layout, rounded up to 256 for the
tiled one whose DMA units need 128-lane alignment):

    lane rp-SL        u scale lo byte        (SL = SCALE_LANES)
    lane rp-SL+1      u scale hi byte
    lane rp-SL+2 + k    v scale lo byte, kv head k  (k < K <= SL/2 - 1)
    lane rp-SL+2+K + k  v scale hi byte, kv head k

so ONE U fetch delivers the data and every scale (a separate per-token
scale array costs a catastrophically latency-bound 32 B-row gather,
and V rows need no trailer at all). The scale lanes sit inside the
rank padding: the reconstruction matmul multiplies them only against
the zero rows of the rank-padded SV, so no masking is needed anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize along the last axis. Returns (int8 values, f32 scale)
    with ``x ~= q * scale[..., None]``.

    The amax reduce runs in x's own dtype (|x| and max are exact in any
    float format) and only the REDUCED result converts to f32. Sharing
    one ``x.astype(f32)`` between the reduce and the divide makes XLA
    materialize a full-size f32 copy of x — ~1 GB per layer when
    quantizing the V store of a 244K prefill; unshared, the convert
    fuses into the quantize loop and no full-size temp exists.
    """
    amax = jnp.max(jnp.abs(x), axis=-1).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_rows_blocked(
    x: jnp.ndarray, blocks: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """quantize_rows with HBM temps bounded by a lax.map over row
    blocks. XLA materializes the f32 intermediate of the quantize loop
    inside the prefill layer scan (~1 GB/layer for a 244K V store,
    measured — the amax/divide pair defeats fusion there); mapping over
    ``blocks`` row groups caps the temp at 1/blocks with no extra
    traffic. ``blocks`` must divide the row count."""
    if blocks <= 1:
        return quantize_rows(x)
    n = 1
    for d in x.shape[:-1]:
        n *= d
    assert n % blocks == 0, (x.shape, blocks)
    xb = x.reshape(blocks, n // blocks, x.shape[-1])
    q, s = jax.lax.map(quantize_rows, xb)
    return (
        q.reshape(x.shape),
        s.reshape(x.shape[:-1]),
    )


def dequantize(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


SCALE_LANES = 32  # MINIMUM per-token U tail lanes reserved for
# embedded scales (2 + 2*kv_heads used; every lane here is gathered on
# every decode step, so the reservation is kept tight). MHA-style
# models with >15 kv heads grow the reservation — scale_lanes_for().


def scale_lanes_for(num_kv_heads: int) -> int:
    """U tail lanes reserved for the embedded scale trailer: 2 U-scale
    bytes + 2 V-scale bytes per kv head, rounded up to a sublane-tile
    multiple (8), floored at the legacy 32 so every <=15-head layout is
    bit-identical to round 1. Phi-3's 32 MHA heads -> 72 lanes (rank
    160 + 72 still pads to the same 256-lane tiled row)."""
    return max(SCALE_LANES, (2 + 2 * num_kv_heads + 7) // 8 * 8)


def flat_trailer_lanes(chunk_size: int, num_kv_heads: int) -> int:
    """Width of the flat U row's contiguous scale trailer: lo + hi
    planes, each holding [u(cs) | v head 0 (cs) | ... | v head K-1 (cs)]
    padded to a full 128-lane tile. Keeping the whole flat row
    128-lane aligned matters more than the padding bytes: an 8-aligned
    trailer (plane 72) made every decode-step gather/reshape of U rows
    relayout-copy (~7 ms/step at 122K/b4, measured)."""
    plane = ((1 + num_kv_heads) * chunk_size + 127) // 128 * 128
    return 2 * plane


def _scale_bytes(scale_bf16: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(lo, hi) int8 bytes of a bf16 scale array (explicit arithmetic so
    the byte order is endianness-independent)."""
    bits = jax.lax.bitcast_convert_type(scale_bf16, jnp.uint16)
    lo = jax.lax.bitcast_convert_type(
        (bits & 0xFF).astype(jnp.uint8), jnp.int8
    )
    hi = jax.lax.bitcast_convert_type(
        (bits >> 8).astype(jnp.uint8), jnp.int8
    )
    return lo, hi


def scales_from_bytes(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Rebuild bf16 scales from (lo, hi) int8/int32 byte arrays."""
    bits = (
        (hi.astype(jnp.int32) << 8) | (lo.astype(jnp.int32) & 0xFF)
    ).astype(jnp.uint16)
    return jax.lax.bitcast_convert_type(bits, jnp.bfloat16)


def pack_shadow_int8(
    u: jnp.ndarray,
    v: jnp.ndarray,
    rank: int | None = None,
    tiled: bool = True,
    quant_blocks: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize one layer's chunk stores into the int8 format.

    u [..., C, cs, rank_pad] (rank-padded, zero beyond rank)
    v [..., K, C, cs, head_dim]
    -> tiled: (u8 [..., C/pt, 32, rank_pad], v8 [..., K, C/pt, 32, dh])
       flat:  (u8 [..., C, cs*rank_pad],     v8 [..., K, C, cs*dh])
    with all per-token scales embedded in the tail lanes of each
    token's U segment (module docstring). The trailer OVERWRITES u's
    last SCALE_LANES lanes — pass ``rank`` so the fit is checked
    (rank <= rank_pad - SCALE_LANES), or guarantee those lanes are
    zero padding yourself.
    """
    c, cs, rp = u.shape[-3:]
    kh, dh = v.shape[-4], v.shape[-1]
    assert 32 % cs == 0, f"chunk_size {cs} must divide 32"
    pt = 32 // cs
    assert c % pt == 0, (c, pt)
    sl = scale_lanes_for(kh)
    assert rank is None or rank <= rp - sl, (
        f"rank {rank} overlaps the scale trailer (rank_pad {rp} reserves "
        f"the last {sl} lanes for {kh} kv heads; pad rank to rank_pad - "
        f"{sl} or less)"
    )
    uq, us = quantize_rows_blocked(u, quant_blocks)  # us [..., C, cs]
    vq, vs = quantize_rows_blocked(v, quant_blocks)  # vs [..., K, C, cs]
    u_lo, u_hi = _scale_bytes(us.astype(jnp.bfloat16))
    v_lo, v_hi = _scale_bytes(vs.astype(jnp.bfloat16))
    v_lo = jnp.moveaxis(v_lo, -3, -1)  # [..., C, cs, K]
    v_hi = jnp.moveaxis(v_hi, -3, -1)
    pad = jnp.zeros(us.shape + (sl - 2 - 2 * kh,), jnp.int8)
    trailer = jnp.concatenate(
        [u_lo[..., None], u_hi[..., None], v_lo, v_hi, pad], axis=-1
    )
    u8 = jnp.concatenate([uq[..., : rp - sl], trailer], axis=-1)
    if tiled:
        return (
            u8.reshape(*u.shape[:-3], c // pt, 32, rp),
            vq.reshape(*v.shape[:-3], c // pt, 32, dh),
        )
    # flat: append the contiguous scale trailer (module docstring)
    plane = flat_trailer_lanes(cs, kh) // 2
    zpad = jnp.zeros(us.shape[:-1] + (plane - (1 + kh) * cs,), jnp.int8)

    def plane_of(u_b, v_b):
        vb = v_b.reshape(*v_b.shape[:-2], cs * kh)  # [..., C, K*cs]
        return jnp.concatenate([u_b, vb, zpad], axis=-1)

    v_lo_kc = jnp.moveaxis(v_lo, -1, -2)  # [..., C, K, cs]
    v_hi_kc = jnp.moveaxis(v_hi, -1, -2)
    flat_trailer = jnp.concatenate(
        [plane_of(u_lo, v_lo_kc), plane_of(u_hi, v_hi_kc)], axis=-1
    )  # [..., C, trailer]
    u8f = jnp.concatenate(
        [u8.reshape(*u.shape[:-3], c, cs * rp), flat_trailer], axis=-1
    )
    return u8f, vq.reshape(*v.shape[:-3], c, cs * dh)


def u_scales_from_rows(
    u_rows: jnp.ndarray, rank_pad: int, num_kv_heads: int | None = None
) -> jnp.ndarray:
    """bf16 U scales [..., cs] from gathered U token rows [..., cs, rp].
    Pass ``num_kv_heads`` (the GLOBAL head count the rows were packed
    with) whenever it may exceed 15 — it sets the trailer width."""
    sl = SCALE_LANES if num_kv_heads is None else scale_lanes_for(num_kv_heads)
    base = rank_pad - sl
    return scales_from_bytes(u_rows[..., base], u_rows[..., base + 1])


def v_scales_from_rows(
    u_rows: jnp.ndarray,
    rank_pad: int,
    num_kv_heads: int,
    k_index: jnp.ndarray,
) -> jnp.ndarray:
    """bf16 V scales [..., cs] for kv head ``k_index`` (broadcastable to
    ``u_rows.shape[:-1] + (1,)``) from gathered U token rows."""
    base = rank_pad - scale_lanes_for(num_kv_heads) + 2
    lo = jnp.take_along_axis(
        u_rows[..., base : base + num_kv_heads], k_index, axis=-1
    )[..., 0]
    hi = jnp.take_along_axis(
        u_rows[..., base + num_kv_heads : base + 2 * num_kv_heads],
        k_index,
        axis=-1,
    )[..., 0]
    return scales_from_bytes(lo, hi)


def u_rows_view(
    u8: jnp.ndarray, chunk_size: int, rank_pad: int
) -> jnp.ndarray:
    """[..., C, cs, rp] token-row view of either int8 U layout
    (free reshape — both layouts are chunk-major token rows; the flat
    layout's scale trailer is stripped)."""
    cs = chunk_size
    if u8.shape[-1] == rank_pad:  # tiled [..., C/pt, 32, rp]
        return u8.reshape(
            *u8.shape[:-3], u8.shape[-3] * (32 // cs), cs, rank_pad
        )
    return u8[..., : cs * rank_pad].reshape(
        *u8.shape[:-1], cs, rank_pad
    )  # flat


def flat_u_scales(
    u8_flat: jnp.ndarray, chunk_size: int, num_kv_heads: int
) -> jnp.ndarray:
    """bf16 U scales [..., C, cs] from flat U rows' contiguous trailer."""
    cs = chunk_size
    trailer = flat_trailer_lanes(cs, num_kv_heads)
    tail = u8_flat[..., u8_flat.shape[-1] - trailer :]
    plane = trailer // 2
    return scales_from_bytes(
        tail[..., :cs], tail[..., plane : plane + cs]
    )


def flat_v_scales(
    u8_flat: jnp.ndarray,
    chunk_size: int,
    num_kv_heads: int,
    k_index: jnp.ndarray,
) -> jnp.ndarray:
    """bf16 V scales [..., C, cs] for kv head ``k_index`` (broadcastable
    to ``u8_flat.shape[:-1] + (1, 1)``) from the flat U trailer."""
    cs, kh = chunk_size, num_kv_heads
    trailer = flat_trailer_lanes(cs, kh)
    tail = u8_flat[..., u8_flat.shape[-1] - trailer :]
    plane = trailer // 2

    def pick(block):  # block [..., K*cs] -> [..., cs] for head k_index
        kc = block.reshape(*block.shape[:-1], kh, cs)
        return jnp.take_along_axis(kc, k_index, axis=-2)[..., 0, :]

    lo = pick(tail[..., cs : cs + kh * cs])
    hi = pick(tail[..., plane + cs : plane + cs + kh * cs])
    return scales_from_bytes(lo, hi)


def v_rows_view(
    v8: jnp.ndarray, chunk_size: int, head_dim: int
) -> jnp.ndarray:
    """[..., K, C, cs, dh] token-row view of either int8 V layout."""
    cs = chunk_size
    if v8.shape[-1] == head_dim:  # tiled [..., K, C/pt, 32, dh]
        return v8.reshape(
            *v8.shape[:-3], v8.shape[-3] * (32 // cs), cs, head_dim
        )
    return v8.reshape(*v8.shape[:-1], cs, head_dim)  # flat


def unpack_u_int8(
    u8: jnp.ndarray,
    chunk_size: int,
    rank_pad: int,
    dtype,
    num_kv_heads: int | None = None,
) -> jnp.ndarray:
    """Dequantize an int8 U store (either layout) to [..., C, cs, rp]
    in ``dtype`` with the scale lanes zeroed. Pass ``num_kv_heads``
    when it may exceed 15 (trailer width)."""
    sl = SCALE_LANES if num_kv_heads is None else scale_lanes_for(num_kv_heads)
    rows = u_rows_view(u8, chunk_size, rank_pad)
    sc = u_scales_from_rows(rows, rank_pad, num_kv_heads)
    data = rows.astype(dtype) * sc[..., None].astype(dtype)
    lane = jnp.arange(rank_pad)
    return jnp.where(lane < rank_pad - sl, data, 0)


def unpack_v_int8(
    v8: jnp.ndarray,
    u8: jnp.ndarray,
    chunk_size: int,
    rank_pad: int,
    head_dim: int,
    dtype,
) -> jnp.ndarray:
    """Dequantize an int8 V store (either layout) using the scales
    embedded in the matching u8; returns [..., K, C, cs, dh]."""
    rows_u = u_rows_view(u8, chunk_size, rank_pad)
    # K sits one axis further out in the tiled layout ([..., K, C/pt,
    # 32, dh]) than in the flat one ([..., K, C, cs*dh]).
    kh = v8.shape[-4] if v8.shape[-1] == head_dim else v8.shape[-3]
    base = rank_pad - scale_lanes_for(kh) + 2
    lo = rows_u[..., base : base + kh]  # [..., C, cs, K]
    hi = rows_u[..., base + kh : base + 2 * kh]
    sc = jnp.moveaxis(scales_from_bytes(lo, hi), -1, -3)  # [..., K, C, cs]
    rows_v = v_rows_view(v8, chunk_size, head_dim)
    return rows_v.astype(dtype) * sc[..., None].astype(dtype)
