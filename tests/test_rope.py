"""RoPE unit tests: neox rotate-half, GLM partial interleaved,
position-gathered application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.core import rope as rope_lib
from shadowkv_tpu.models.registry import toy_config


def _naive_neox(x, pos, theta, head_dim):
    """Straight transcription of rotate-half RoPE for verification."""
    inv_freq = 1.0 / (
        theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    out = np.array(x, dtype=np.float64)
    b, s, h, d = x.shape
    for si in range(s):
        ang = pos[si] * inv_freq  # [d/2]
        cos = np.cos(ang)
        sin = np.sin(ang)
        x1 = np.array(x[:, si, :, : d // 2], np.float64)
        x2 = np.array(x[:, si, :, d // 2 :], np.float64)
        out[:, si, :, : d // 2] = x1 * cos - x2 * sin
        out[:, si, :, d // 2 :] = x2 * cos + x1 * sin
    return out


def test_neox_rope_matches_naive(rng):
    cfg = toy_config(head_dim=32, rope_theta=10000.0)
    x = jax.random.normal(rng, (2, 5, 4, 32), jnp.float32)
    cos, sin = rope_lib.compute_cos_sin(cfg, 16)
    pos = np.arange(5) + 3
    got = rope_lib.apply_rope(
        x, cos[3:8], sin[3:8], style="neox"
    )
    want = _naive_neox(np.asarray(x), pos, 10000.0, 32)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_glm_rope_partial_interleaved(rng):
    cfg = toy_config(
        head_dim=32, rope_style="glm", rope_partial_dim=16,
        rope_theta=10000.0,
    )
    x = jax.random.normal(rng, (1, 4, 2, 32), jnp.float32)
    cos, sin = rope_lib.compute_cos_sin(cfg, 8)
    got = rope_lib.apply_rope(x, cos[:4], sin[:4], style="glm")
    got = np.asarray(got)
    x = np.asarray(x)
    # Pass-through of last head_dim - rope_partial_dim dims.
    np.testing.assert_allclose(got[..., 16:], x[..., 16:], rtol=1e-6)
    # Interleaved pairs rotate: check one pair by hand.
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, 16, 2) / 16))
    si, pair = 2, 3
    ang = si * inv_freq[pair]
    e, o = x[0, si, 0, 2 * pair], x[0, si, 0, 2 * pair + 1]
    np.testing.assert_allclose(
        got[0, si, 0, 2 * pair], e * np.cos(ang) - o * np.sin(ang),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        got[0, si, 0, 2 * pair + 1], o * np.cos(ang) + e * np.sin(ang),
        rtol=1e-5, atol=1e-6,
    )


def test_apply_rope_at_matches_apply_rope(rng):
    """Scattered-position application must agree with contiguous rope."""
    cfg = toy_config(head_dim=32)
    cos, sin = rope_lib.compute_cos_sin(cfg, 64)
    x = jax.random.normal(rng, (2, 10, 3, 32), jnp.float32)
    contiguous = rope_lib.apply_rope(x, cos[:10], sin[:10], style="neox")
    # apply_rope_at on [B, H, N, D] layout with explicit positions.
    xt = x.transpose(0, 2, 1, 3)  # [B, H, S, D]
    pos = jnp.broadcast_to(jnp.arange(10), (2, 3, 10))
    scattered = rope_lib.apply_rope_at(xt, pos, cos, sin, style="neox")
    np.testing.assert_allclose(
        np.asarray(scattered.transpose(0, 2, 1, 3)),
        np.asarray(contiguous),
        rtol=1e-5,
        atol=1e-5,
    )


def test_llama31_scaling_changes_low_freqs():
    cfg = toy_config(
        head_dim=64,
        rope_theta=500000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
    )
    scaled = rope_lib.compute_inv_freq(cfg)
    unscaled = rope_lib.compute_inv_freq(
        toy_config(head_dim=64, rope_theta=500000.0)
    )
    # High-frequency components untouched, low-frequency divided by ~8.
    assert np.allclose(scaled[0], unscaled[0])
    assert np.allclose(scaled[-1], unscaled[-1] / 8.0, rtol=1e-4)
