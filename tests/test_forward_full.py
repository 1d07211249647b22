"""Full-attention engine correctness on a toy model.

The oracle: incremental decode (prefill + N single-token steps) must
produce the same logits trajectory as one long prefill over the whole
sequence (teacher forcing). This validates cache writes, masking, RoPE
positions, and the scan-over-layers plumbing in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.cache.full import FullCache
from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


@pytest.fixture(scope="module")
def setup():
    cfg = toy_config(dtype=jnp.float32)
    rt = RuntimeConfig(prefill_block_q=16)
    cache_cfg = CacheConfig(mode="full", max_length=128)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(1), scale=0.1)
    cos, sin = compute_cos_sin(cfg, 256)
    return cfg, rt, cache_cfg, params, cos, sin


def test_incremental_decode_matches_long_prefill(setup):
    cfg, rt, cache_cfg, params, cos, sin = setup
    b, s_total = 2, 24
    s_prompt = 16
    ids = jax.random.randint(
        jax.random.PRNGKey(2), (b, s_total), 0, cfg.vocab_size
    )

    # Oracle: single prefill over all tokens.
    cache_a = FullCache.init(cfg, cache_cfg, b)
    logits_a, _ = forward.prefill_full(
        cfg, rt, params, cache_a, ids, 0, cos, sin
    )

    # Incremental: prefill prompt, then teacher-forced decode steps.
    cache_b = FullCache.init(cfg, cache_cfg, b)
    logits_b, cache_b = forward.prefill_full(
        cfg, rt, params, cache_b, ids[:, :s_prompt], 0, cos, sin
    )
    for t in range(s_prompt, s_total):
        logits_b, cache_b = forward.decode_full(
            cfg, params, cache_b, ids[:, t : t + 1], cos, sin
        )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=2e-3, atol=2e-3
    )
    assert int(cache_b.length) == s_total


def test_chunked_prefill_matches_single_prefill(setup):
    """prefill_cont semantics: two chunks == one long prefill."""
    cfg, rt, cache_cfg, params, cos, sin = setup
    b, s = 1, 32
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, s), 0, cfg.vocab_size)

    cache_a = FullCache.init(cfg, cache_cfg, b)
    logits_a, _ = forward.prefill_full(cfg, rt, params, cache_a, ids, 0, cos, sin)

    cache_b = FullCache.init(cfg, cache_cfg, b)
    _, cache_b = forward.prefill_full(
        cfg, rt, params, cache_b, ids[:, :16], 0, cos, sin
    )
    logits_b, cache_b = forward.prefill_full(
        cfg, rt, params, cache_b, ids[:, 16:], 16, cos, sin
    )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=2e-3, atol=2e-3
    )


def test_multi_token_decode_step(setup):
    """Decode with q_len > 1 must equal successive single-token steps."""
    cfg, rt, cache_cfg, params, cos, sin = setup
    b = 1
    ids = jax.random.randint(jax.random.PRNGKey(4), (b, 20), 0, cfg.vocab_size)
    cache_a = FullCache.init(cfg, cache_cfg, b)
    _, cache_a = forward.prefill_full(
        cfg, rt, params, cache_a, ids[:, :16], 0, cos, sin
    )
    logits_a, _ = forward.decode_full(
        cfg, params, cache_a, ids[:, 16:20], cos, sin
    )

    cache_b = FullCache.init(cfg, cache_cfg, b)
    _, cache_b = forward.prefill_full(
        cfg, rt, params, cache_b, ids[:, :16], 0, cos, sin
    )
    for t in range(16, 20):
        logits_b, cache_b = forward.decode_full(
            cfg, params, cache_b, ids[:, t : t + 1], cos, sin
        )
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=2e-3, atol=2e-3
    )
