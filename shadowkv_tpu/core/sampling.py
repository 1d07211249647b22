"""Token sampling: greedy / temperature + top-k / top-p.

Functional equivalent of the reference's sampling helpers
(models/tensor_op.py:242-296): temperature scaling, top-k filter, then
nucleus (top-p) filter where the highest-probability token is always
kept, softmax, categorical draw. Greedy when temperature == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = jnp.finfo(jnp.float32).min


def top_k_top_p_filter(
    logits: jnp.ndarray, top_k: int = 0, top_p: float = 0.0
) -> jnp.ndarray:
    """Mask logits outside the top-k / nucleus-p sets to -inf.

    Args:
      logits: [B, V] fp32.
    """
    if top_k and top_k > 0:
        k = min(top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, _NEG_INF, logits)
    if top_p and top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        cum_probs = jnp.cumsum(
            jax.nn.softmax(sorted_logits, axis=-1), axis=-1
        )
        # Keep the first token whose cumulative prob crosses top_p
        # (reference shifts the filter right by one and always keeps
        # rank 0, tensor_op.py:259-262).
        exceeded = cum_probs > top_p
        exceeded = jnp.concatenate(
            [jnp.zeros_like(exceeded[..., :1]), exceeded[..., :-1]], axis=-1
        )
        # Threshold logit: smallest kept sorted logit.
        kept_sorted = jnp.where(exceeded, jnp.inf, sorted_logits)
        threshold = jnp.min(kept_sorted, axis=-1, keepdims=True)
        logits = jnp.where(logits < threshold, _NEG_INF, logits)
    return logits


def sample_token(
    logits: jnp.ndarray,
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 50,
    top_p: float = 0.9,
) -> jnp.ndarray:
    """Sample next token ids [B] from logits [B, V]."""
    logits = logits.astype(jnp.float32)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    logits = top_k_top_p_filter(logits, top_k=top_k, top_p=top_p)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
