"""Sequence-parallel (context-parallel) prefill over a virtual mesh.

RuntimeConfig.sp > 1 shards the PROMPT's sequence dim over an 'sp'
mesh axis during the whole-batch shadow prefill (SURVEY §5.7's
TPU-native long-context scaling axis — the reference has none,
SURVEY §2.4): attention runs per-shard against all-gathered K/V inside
a shard_map, the SVD sketch's S-contractions become GSPMD psums, and
the cache reshards batch-over-("dp","sp") for decode. These tests pin
the whole pipeline to the unsharded engine's outputs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.attention import (
    causal_prefill_attention,
    sp_causal_prefill_attention,
)
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config
from shadowkv_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _toy(kv_heads=4):
    return toy_config(
        num_layers=2, hidden_size=256, num_heads=8, num_kv_heads=kv_heads,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )


def test_sp_attention_matches_dense():
    """The shard_map island (local q vs all-gathered K/V at the shard's
    row offset) must equal single-device blockwise causal attention."""
    cfg = _toy()
    mesh = mesh_lib.build_mesh(1, 2, sp=4)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, s, h, kh, dh = 2, 128, 8, 2, 32
    q = jax.random.normal(kq, (b, s, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(kv, (b, s, kh, dh), jnp.float32)
    ref = causal_prefill_attention(q, k, v, block_q=32)
    got = jax.jit(
        lambda q, k, v: sp_causal_prefill_attention(
            mesh, q, k, v, block_q=32
        )
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 4), (2, 2, 2), (1, 8, 1)])
def test_engine_sp_generation_matches_single(dp, sp, tp):
    """sp prefill + (dp, sp)-batch-sharded decode must reproduce the
    single-device engine's greedy tokens."""
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    b = 8 if dp * sp == 8 else 4
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (b, 256))

    def run(rt):
        eng = Engine(cfg, cc, rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, dp=dp, tp=tp, sp=sp))
    np.testing.assert_array_equal(ref, got)


def test_sp_prefill_logits_match():
    """Prefill-time last-token logits under sp match unsharded."""
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(1), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 256))
    ref_lg, _ = Engine(cfg, cc, RuntimeConfig(prefill_block_q=64),
                       params).prefill(ids)
    sp_lg, _ = Engine(
        cfg, cc, RuntimeConfig(prefill_block_q=64, dp=1, tp=4, sp=2),
        params,
    ).prefill(ids)
    np.testing.assert_allclose(
        np.asarray(ref_lg), np.asarray(sp_lg), rtol=2e-4, atol=2e-4
    )


def test_sp_rejects_unsupported_modes():
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc_off = CacheConfig(
        mode="shadow_offload", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    with pytest.raises(AssertionError, match="shadow"):
        Engine(cfg, cc_off, RuntimeConfig(sp=2, tp=4), params)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    with pytest.raises(AssertionError, match="XLA decode"):
        Engine(cfg, cc, RuntimeConfig(sp=2, tp=4, ring_gather=True),
               params)


@pytest.mark.slow
def test_engine_sp_generation_with_int8_weights():
    """QTensor weights (core/wquant.py) under the (dp, sp, tp) mesh:
    sp-sharded generation must reproduce the single-device engine's
    greedy tokens with the same quantized params."""
    from shadowkv_tpu.core.wquant import quantize_params

    cfg = _toy()
    params = quantize_params(
        init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    )
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (4, 256))

    def run(rt):
        eng = Engine(cfg, cc, rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, dp=1, tp=2, sp=2))
    np.testing.assert_array_equal(ref, got)
