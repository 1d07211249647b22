"""Symmetric int8 row quantization for the shadow-cache stores.

The reference keeps all cache state in bf16 and wins HBM back by
offloading V to host DRAM (kv_cache.py:554-563). On a TPU chip whose
host link cannot sustain the per-step gather, the equivalent
memory-for-batch trade is quantization: V chunks, U factor rows and
landmark tables drop to int8 with one scale per row, roughly doubling
the feasible batch at 122K context. Dequantization fuses into the
consuming gather/matmul (XLA reads int8 bytes and converts in-register).
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


SCALE_TRAILER = 128  # int8 lanes appended per chunk row for the scales


def pack_chunk_int8(x: jnp.ndarray) -> jnp.ndarray:
    """Quantize a chunk [..., cs, row] to one flat int8 row
    [..., cs*row + 128] with the per-token bf16 scales packed into a
    128-lane trailer.

    Why packed: the scales otherwise live in a separate [..., cs] f32
    array whose decode-time gather moves 32-byte rows — measured
    ~0.8 ms/step of pure gather latency at 122K. One combined row means
    ONE gather fetches data + scales.
    """
    cs, row = x.shape[-2], x.shape[-1]
    assert 2 * cs <= SCALE_TRAILER
    q, scale = quantize_rows(x)  # scale [..., cs] f32
    flat = q.reshape(*x.shape[:-2], cs * row)
    sc = jax.lax.bitcast_convert_type(
        scale.astype(jnp.bfloat16), jnp.int8
    )  # [..., cs, 2]
    sc = sc.reshape(*x.shape[:-2], cs * 2)
    pad = jnp.zeros(
        x.shape[:-2] + (SCALE_TRAILER - cs * 2,), jnp.int8
    )
    return jnp.concatenate([flat, sc, pad], axis=-1)


def unpack_chunk_int8(
    packed: jnp.ndarray, cs: int, row: int, dtype
) -> jnp.ndarray:
    """Inverse of pack_chunk_int8: [..., cs*row + 128] -> [..., cs, row]
    dequantized in ``dtype`` (no f32 intermediates — the convert+scale
    fuses into the consumer)."""
    q = packed[..., : cs * row].reshape(*packed.shape[:-1], cs, row)
    sc_bytes = packed[..., cs * row : cs * row + cs * 2].reshape(
        *packed.shape[:-1], cs, 2
    )
    scale = jax.lax.bitcast_convert_type(sc_bytes, jnp.bfloat16)
    return q.astype(dtype) * scale[..., None].astype(dtype)

