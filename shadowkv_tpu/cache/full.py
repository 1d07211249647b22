"""Full-attention KV cache (the baseline path).

Functional equivalent of the reference ``KV_Cache``
(models/kv_cache.py:32-153): dense K/V per layer, append-on-decode.
The reference preallocates on CPU and staggers H2D copies; on TPU the
baseline cache lives in HBM as one stacked [L, B, T, K, Dh] pair whose
per-layer slices are threaded through the layer scan. ``length`` is
advanced once per forward step by the engine (the reference advances
``kv_offset`` only after the last layer writes, kv_cache.py:127-130 —
with scan the same effect falls out for free).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, ModelConfig


class FullCache(flax.struct.PyTreeNode):
    k: jnp.ndarray  # [L, B, T, K, Dh]
    v: jnp.ndarray  # [L, B, T, K, Dh]
    length: jnp.ndarray  # int32 scalar: valid tokens

    @classmethod
    def init(
        cls, model: ModelConfig, cache: CacheConfig, batch_size: int
    ) -> "FullCache":
        shape = (
            model.num_layers,
            batch_size,
            cache.max_length,
            model.num_kv_heads,
            model.head_dim,
        )
        return cls(
            k=jnp.zeros(shape, model.dtype),
            v=jnp.zeros(shape, model.dtype),
            length=jnp.zeros((), jnp.int32),
        )


def write_prefill(
    cache_k_l: jnp.ndarray,
    cache_v_l: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    start: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Write [B, S, K, Dh] new keys/values at offset ``start``."""
    cache_k_l = jax.lax.dynamic_update_slice(
        cache_k_l, k.astype(cache_k_l.dtype), (0, start, 0, 0)
    )
    cache_v_l = jax.lax.dynamic_update_slice(
        cache_v_l, v.astype(cache_v_l.dtype), (0, start, 0, 0)
    )
    return cache_k_l, cache_v_l
