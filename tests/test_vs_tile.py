"""Decomposed VS prefill (kernels/vs_tile.py + the tile dispatchers).

Semantics under test: active(q, kt) = causal & (diag_flag[(q-kt)//block]
| kt in v_idx) — verticals TOKEN-granular (the reference MInference
semantic, minference vertical_slash_sparse_attention), slashes
block-granular. Oracle chain: the kernel (interpret mode) is checked
against the [S, S]-materializing jnp oracle; the dispatchers are checked
kernel-vs-oracle and tile-vs-dense at saturating sizes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.core import minference as mi
from shadowkv_tpu.kernels.vs_tile import (
    vs_tile_attention,
    vs_tok_attention_reference,
)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(7)


@pytest.mark.parametrize("seq", [2048, 1748])  # exact + padded tail
def test_tile_kernel_matches_token_oracle(rng, seq):
    s, block, h, kh, dh, tk = 2048, 128, 4, 2, 128, 512
    g = h // kh
    ks = jax.random.split(rng, 5)
    q = jax.random.normal(ks[0], (h, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (kh, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (kh, s, dh), jnp.float32)
    # duplicate + past-seq vertical indices exercise dedup and padding
    v_idx = jax.random.randint(ks[3], (h, 512), 0, s + 200)
    df = (jax.random.uniform(ks[4], (h, s // block)) < 0.2).astype(
        jnp.int32
    )
    df = df.at[:, 0].set(1)
    kv_map = jnp.asarray([hh // g for hh in range(h)], jnp.int32)
    out = vs_tile_attention(
        q, k, v, v_idx, df, kv_map, block=block, scale=dh**-0.5,
        seq_len=seq, tq=tk, tk=tk, interpret=True,
    )
    ref = vs_tok_attention_reference(
        q, k, v, v_idx, df, kv_map, block=block, scale=dh**-0.5,
        seq_len=seq,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :seq]), np.asarray(ref[:, :seq]),
        rtol=2e-5, atol=2e-5,
    )


def test_tile_all_diags_equals_causal(rng):
    """Every diagonal active + no verticals == exact causal attention
    (the allset fast path must not change the math)."""
    from shadowkv_tpu.core.attention import mha

    s, h, kh, dh, tk = 1024, 2, 2, 128, 512
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (h, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (kh, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (kh, s, dh), jnp.float32)
    v_idx = jnp.full((h, tk), 4 * s, jnp.int32)
    df = jnp.ones((h, s // 128), jnp.int32)
    kv_map = jnp.arange(h, dtype=jnp.int32)
    out = vs_tile_attention(
        q, k, v, v_idx, df, kv_map, block=128, scale=dh**-0.5,
        seq_len=s, tq=tk, tk=tk, interpret=True,
    )
    ref = vs_tok_attention_reference(
        q, k, v, v_idx, df, kv_map, block=128, scale=dh**-0.5, seq_len=s
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # and the oracle itself equals dense causal attention here
    pos = jnp.arange(s)
    causal = pos[None, :] <= pos[:, None]
    dense = mha(
        q.transpose(1, 0, 2)[None],
        k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None],
        mask=causal,
    )
    np.testing.assert_allclose(
        np.asarray(ref),
        np.asarray(dense[0].transpose(1, 0, 2)),
        rtol=2e-4, atol=2e-4,
    )


def test_tile_dispatch_kernel_matches_oracle(rng):
    """minference_prefill_tile: interpret kernel vs the dispatcher's
    own oracle path, mixed head kinds."""
    b, s, h, kh, dh = 2, 1536, 4, 2, 128
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    pats = (
        ("vertical_and_slash", 96, 200),
        ("stream_llm", 0, 0),
        ("dense", 0, 0),
        ("vertical_and_slash", 48, 120),
    )
    kw = dict(
        patterns=pats, block=128, stream_sink=160, stream_window=384,
        tile=512,
    )
    out_k = mi.minference_prefill_tile(
        q, k, v, use_kernel=True, interpret=True, **kw
    )
    out_o = mi.minference_prefill_tile(q, k, v, use_kernel=False, **kw)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_o), rtol=2e-5, atol=2e-5
    )


def test_tile_dynamic_matches_static(rng):
    """The per-layer traced-pattern tile variant agrees with the static
    dispatcher on the same single-layer table (vs + stream + dense)."""
    b, s, h, kh, dh = 1, 1536, 4, 2, 128
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    pats = (
        ("vertical_and_slash", 96, 200),
        ("stream_llm", 0, 0),
        ("dense", 0, 0),
        ("vertical_and_slash", 48, 120),
    )
    kw = dict(block=128, stream_sink=160, stream_window=384, tile=512)
    out_s = mi.minference_prefill_tile(
        q, k, v, patterns=pats, use_kernel=False, **kw
    )
    kinds, vs_a, ss_a, v_cap, s_cap = mi.patterns_to_arrays(
        [pats], h, 1, 1000, 6144
    )
    out_d = mi.minference_prefill_dynamic_tile(
        q, k, v,
        jnp.asarray(kinds[0]), jnp.asarray(vs_a[0]), jnp.asarray(ss_a[0]),
        v_cap=v_cap, s_cap=s_cap, use_kernel=False, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_d), rtol=2e-5, atol=2e-5
    )


def test_engine_vs_tile_prefill_generates():
    """Shadow engine with prefill_pattern='vs' + the default tile impl
    runs end-to-end on CPU; near-dense sizes match dense-prefill greedy
    tokens (vs_impl='tile' is the production default)."""
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cache_cfg = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4,
    )
    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, (1, 256))

    eng_dense = Engine(cfg, cache_cfg, RuntimeConfig(), params)
    out_dense, _ = eng_dense.generate(ids, gen_len=8)

    eng_vs = Engine(
        cfg, cache_cfg,
        RuntimeConfig(
            prefill_pattern="vs", vs_impl="tile",
            # saturating sizes: everything active -> dense equivalence
            vs_vertical_size=256, vs_slash_size=256, vs_block=64,
            vs_tile=128,
        ),
        params,
    )
    assert eng_vs.rt.vs_impl == "tile"
    out_vs, _ = eng_vs.generate(ids, gen_len=8)
    np.testing.assert_array_equal(np.asarray(out_vs), np.asarray(out_dense))
