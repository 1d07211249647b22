"""Sink+window sparse prefill (splash attention) vs jnp masked oracle."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from shadowkv_tpu.core.attention import mha, sparse_prefill_splash


def test_splash_matches_masked_reference(rng):
    b, s, h, kh, dh = 1, 512, 4, 2, 128
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    window, sink = 128, 64
    out = sparse_prefill_splash(q, k, v, window, sink, interpret=True)
    pos = np.arange(s)
    m = (pos[None] <= pos[:, None]) & (
        (pos[None] < sink) | (pos[:, None] - pos[None] < window)
    )
    ref = mha(q, k, v, mask=jnp.asarray(m)[None, None, None])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_splash_head_major_layout(rng):
    b, s, h, kh, dh = 1, 256, 4, 2, 128
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    a = sparse_prefill_splash(q, k, v, 64, 32, interpret=True)
    bm = sparse_prefill_splash(
        q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
        64, 32, head_major=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(bm), atol=1e-6)
