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
