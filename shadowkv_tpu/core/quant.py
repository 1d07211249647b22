"""Symmetric int8 row quantization for the shadow-cache stores.

The reference keeps all cache state in bf16 and wins HBM back by
offloading V to host DRAM (kv_cache.py:554-563). On a TPU chip whose
host link cannot sustain the per-step gather, the equivalent
memory-for-batch trade is quantization: V chunks, U factor rows and
landmark tables drop to int8 with one scale per row, roughly doubling
the feasible batch at 122K context. Dequantization fuses into the
consuming gather/matmul (XLA reads int8 bytes and converts in-register).

Tiled store format (consumed by BOTH the XLA decode path in
cache/shadow.py and the fused Pallas refresh kernel in
kernels/reconstruct.py):

    u      [B, C/pt, 32, rank_pad]   pt = 32 // chunk_size
    v_full [B, K, C/pt, 32, head_dim]

Chunk ``c`` occupies sublane rows ``(c % pt) * cs .. + cs`` of tile
``c // pt``. Why this shape: the int8 TPU tile is (32, 128) — merging
``pt`` chunks per 32-sublane tile stores int8 with ZERO padding (a
[..., cs=8, row] int8 array pads 4x), and Mosaic DMA can slice
8-aligned sublane ranges out of a 32-tile (a single flat row — one
sublane of a tiled chunk axis — cannot be DMA'd at all).

Per-token bf16 scales are EMBEDDED in the tail lanes of each U token
row (``SCALE_LANES`` lanes reserved by rank_pad; rank 160 pads to 256
leaving 96 free int8 lanes):

    lane rp-64        u scale lo byte
    lane rp-63        u scale hi byte
    lane rp-62 + k    v scale lo byte, kv head k   (k < K <= 31)
    lane rp-62+K + k  v scale hi byte, kv head k

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
    with ``x ~= q * scale[..., None]``."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def dequantize(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None].astype(jnp.float32)).astype(dtype)


SCALE_LANES = 64  # U-row tail lanes reserved for embedded scales


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
    u: jnp.ndarray, v: jnp.ndarray, rank: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize one layer's chunk stores into the tiled int8 format.

    u [..., C, cs, rank_pad] (rank-padded, zero beyond rank)
    v [..., K, C, cs, head_dim]
    -> (u8 [..., C/pt, 32, rank_pad], v8 [..., K, C/pt, 32, head_dim])
    with all per-token scales embedded in u8's tail lanes (module
    docstring). The trailer OVERWRITES u's last SCALE_LANES lanes —
    pass ``rank`` so the fit is checked (rank <= rank_pad -
    SCALE_LANES), or guarantee those lanes are zero padding yourself.
    """
    c, cs, rp = u.shape[-3:]
    kh, dh = v.shape[-4], v.shape[-1]
    assert 32 % cs == 0, f"chunk_size {cs} must divide 32"
    pt = 32 // cs
    assert c % pt == 0, (c, pt)
    assert 2 + 2 * kh <= SCALE_LANES, f"{kh} kv heads > {SCALE_LANES//2 - 1}"
    assert rank is None or rank <= rp - SCALE_LANES, (
        f"rank {rank} overlaps the scale trailer (rank_pad {rp} reserves "
        f"the last {SCALE_LANES} lanes; pad rank to rank_pad - "
        f"{SCALE_LANES} or less)"
    )
    uq, us = quantize_rows(u)  # us [..., C, cs]
    vq, vs = quantize_rows(v)  # vs [..., K, C, cs]
    u_lo, u_hi = _scale_bytes(us.astype(jnp.bfloat16))
    v_lo, v_hi = _scale_bytes(vs.astype(jnp.bfloat16))
    v_lo = jnp.moveaxis(v_lo, -3, -1)  # [..., C, cs, K]
    v_hi = jnp.moveaxis(v_hi, -3, -1)
    pad = jnp.zeros(us.shape + (SCALE_LANES - 2 - 2 * kh,), jnp.int8)
    trailer = jnp.concatenate(
        [u_lo[..., None], u_hi[..., None], v_lo, v_hi, pad], axis=-1
    )
    u8 = jnp.concatenate([uq[..., : rp - SCALE_LANES], trailer], axis=-1)
    return (
        u8.reshape(*u.shape[:-3], c // pt, 32, rp),
        vq.reshape(*v.shape[:-3], c // pt, 32, dh),
    )


def u_scales_from_rows(u_rows: jnp.ndarray, rank_pad: int) -> jnp.ndarray:
    """bf16 U scales [..., cs] from gathered U token rows [..., cs, rp]."""
    base = rank_pad - SCALE_LANES
    return scales_from_bytes(u_rows[..., base], u_rows[..., base + 1])


def v_scales_from_rows(
    u_rows: jnp.ndarray,
    rank_pad: int,
    num_kv_heads: int,
    k_index: jnp.ndarray,
) -> jnp.ndarray:
    """bf16 V scales [..., cs] for kv head ``k_index`` (broadcastable to
    ``u_rows.shape[:-1] + (1,)``) from gathered U token rows."""
    base = rank_pad - SCALE_LANES + 2
    lo = jnp.take_along_axis(
        u_rows[..., base : base + num_kv_heads], k_index, axis=-1
    )[..., 0]
    hi = jnp.take_along_axis(
        u_rows[..., base + num_kv_heads : base + 2 * num_kv_heads],
        k_index,
        axis=-1,
    )[..., 0]
    return scales_from_bytes(lo, hi)


def unpack_u_int8(u8: jnp.ndarray, chunk_size: int, dtype) -> jnp.ndarray:
    """Dequantize a tiled U store [..., C/pt, 32, rp] to
    [..., C, cs, rp] in ``dtype`` with the scale lanes zeroed."""
    rp = u8.shape[-1]
    cs = chunk_size
    rows = u8.reshape(*u8.shape[:-3], u8.shape[-3] * (32 // cs), cs, rp)
    sc = u_scales_from_rows(rows, rp)
    data = rows.astype(dtype) * sc[..., None].astype(dtype)
    lane = jnp.arange(rp)
    return jnp.where(lane < rp - SCALE_LANES, data, 0)


def unpack_v_int8(
    v8: jnp.ndarray, u8: jnp.ndarray, chunk_size: int, dtype
) -> jnp.ndarray:
    """Dequantize a tiled V store v8 [..., K, C/pt, 32, dh] using the
    scales embedded in the matching u8 [..., C/pt, 32, rp]; returns
    [..., K, C, cs, dh] in ``dtype``."""
    cs = chunk_size
    rp = u8.shape[-1]
    kh, dh = v8.shape[-4], v8.shape[-1]
    c = v8.shape[-3] * (32 // cs)
    rows_u = u8.reshape(*u8.shape[:-3], c, cs, rp)
    base = rp - SCALE_LANES + 2
    lo = rows_u[..., base : base + kh]  # [..., C, cs, K]
    hi = rows_u[..., base + kh : base + 2 * kh]
    sc = jnp.moveaxis(scales_from_bytes(lo, hi), -1, -3)  # [..., K, C, cs]
    rows_v = v8.reshape(*v8.shape[:-3], c, cs, dh)
    return rows_v.astype(dtype) * sc[..., None].astype(dtype)
