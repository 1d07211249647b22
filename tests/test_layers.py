"""Long-prefill layer-op variants vs their short-sequence forms.

The memory-bounded forms (split QKV projection, chunked MLP, chunked
RoPE, blocked quantization) only engage above large token thresholds the
CPU suite never reaches naturally, so these tests drop the thresholds
via monkeypatching / direct calls and check exact agreement with the
plain forms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.core import layers
from shadowkv_tpu.core.layers import LayerParams, qkv_proj, swiglu_mlp


def _layer(rng, d, h, kh, dh, i, bias):
    ks = jax.random.split(rng, 5)
    return LayerParams(
        attn_norm=jnp.ones((d,)),
        wqkv=jax.random.normal(ks[0], (d, (h + 2 * kh) * dh)) * 0.05,
        bqkv=(
            jax.random.normal(ks[1], ((h + 2 * kh) * dh,)) * 0.05
            if bias
            else None
        ),
        wo=jax.random.normal(ks[2], (h * dh, d)) * 0.05,
        mlp_norm=jnp.ones((d,)),
        w_gate_up=jax.random.normal(ks[3], (d, 2 * i)) * 0.05,
        w_down=jax.random.normal(ks[4], (i, d)) * 0.05,
    )


@pytest.mark.parametrize("bias", [False, True])
def test_split_qkv_matches_fused(monkeypatch, bias):
    """The long-prefill split projection (three dots on static weight
    slices, core/layers.py qkv_proj) is bit-identical to the fused
    matmul + slices."""
    d, h, kh, dh, i = 64, 4, 2, 16, 96
    lp = _layer(jax.random.PRNGKey(0), d, h, kh, dh, i, bias)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, d))

    fused = qkv_proj(x, lp, h, kh, dh)
    monkeypatch.setattr(layers, "MLP_CHUNK_TOKENS", 4)  # force split
    split = qkv_proj(x, lp, h, kh, dh)
    for a, b in zip(fused, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_mlp_matches_plain(monkeypatch):
    d, h, kh, dh, i = 64, 4, 2, 16, 96
    lp = _layer(jax.random.PRNGKey(2), d, h, kh, dh, i, False)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 24, d))
    plain = swiglu_mlp(x, lp)
    monkeypatch.setattr(layers, "MLP_CHUNK_TOKENS", 8)
    chunked = swiglu_mlp(x, lp)
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(chunked), rtol=1e-6, atol=1e-6
    )


def test_chunked_rope_matches_plain():
    from shadowkv_tpu.core import rope as rope_lib

    # 16384 rows trips the chunked path (s >= 16384, divisible by 8)
    s, h, dh = 16384, 2, 8
    cos = jnp.cos(jnp.arange(s * dh // 2, dtype=jnp.float32)).reshape(
        s, dh // 2
    )
    sin = jnp.sin(jnp.arange(s * dh // 2, dtype=jnp.float32)).reshape(
        s, dh // 2
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (1, s, h, dh))
    plain = rope_lib.apply_rope(x, cos, sin, "neox")
    chunked = rope_lib.apply_rope_chunked(x, cos, sin, "neox")
    # separate compilations may fuse mul+add as FMA -> ulp diffs
    np.testing.assert_allclose(
        np.asarray(plain), np.asarray(chunked), rtol=2e-5, atol=2e-6
    )
    # multi-batch input falls back to the plain form
    x2 = jax.random.normal(jax.random.PRNGKey(5), (2, s, h, dh))
    np.testing.assert_array_equal(
        np.asarray(rope_lib.apply_rope_chunked(x2, cos, sin, "neox")),
        np.asarray(rope_lib.apply_rope(x2, cos, sin, "neox")),
    )


def test_blocked_quantization_matches_plain():
    from shadowkv_tpu.core.quant import quantize_rows, quantize_rows_blocked

    x = jax.random.normal(jax.random.PRNGKey(6), (4, 6, 8, 32))
    q0, s0 = quantize_rows(x)
    q1, s1 = quantize_rows_blocked(x, 8)
    np.testing.assert_array_equal(np.asarray(q0), np.asarray(q1))
    # reduce-tree order differs between the mapped and fused compiles
    np.testing.assert_allclose(
        np.asarray(s0), np.asarray(s1), rtol=1e-6
    )
