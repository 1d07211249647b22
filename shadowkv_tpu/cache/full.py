"""Full-attention KV cache (the baseline path).

Functional equivalent of the reference ``KV_Cache``
(models/kv_cache.py:32-153): dense K/V per layer, append-on-decode.
The reference preallocates on CPU and staggers H2D copies; on TPU the
baseline cache lives in HBM as one stacked pair whose per-layer slices
are threaded through the layer scan. ``length`` is advanced once per
forward step by the engine (the reference advances ``kv_offset`` only
after the last layer writes, kv_cache.py:127-130 — with scan the same
effect falls out for free).

Layout is HEAD-MAJOR [L, B, K, T, Dh]: both the decode-append write and
the attention-read contraction then prefer the same (T sublane, Dh lane)
tiling, so XLA keeps ONE layout for the donated buffer. The seq-major
[L, B, T, K, Dh] alternative makes the updater and the attention dots
disagree on layout and XLA materializes full 2x cache copies per step
(measured: +8 GB HLO temp at 32K/batch-4 on v5e, an instant OOM).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, ModelConfig


class FullCache(flax.struct.PyTreeNode):
    k: jnp.ndarray  # [L, B, K, T, Dh]
    v: jnp.ndarray  # [L, B, K, T, Dh]
    length: jnp.ndarray  # int32 scalar: valid tokens

    @classmethod
    def init(
        cls, model: ModelConfig, cache: CacheConfig, batch_size: int
    ) -> "FullCache":
        shape = (
            model.num_layers,
            batch_size,
            model.num_kv_heads,
            cache.max_length,
            model.head_dim,
        )
        return cls(
            k=jnp.zeros(shape, model.dtype),
            v=jnp.zeros(shape, model.dtype),
            length=jnp.zeros((), jnp.int32),
        )
