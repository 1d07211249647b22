"""Segmented decode attention (RuntimeConfig.decode_segmented) is
token-identical to the stacked-view path. Segmenting is a dataflow
change only — the same softmax over the same rows, computed without
materializing the per-layer cap-row view (core/attention.py
decode_attention_segments docstring)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.attention import (
    decode_attention_hm,
    decode_attention_segments,
)
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def test_segments_match_hm():
    """Unit: segments over a split cache == decode_attention_hm over
    the concatenation, including the validity mask on the last seg."""
    rng = np.random.RandomState(0)
    b, k, g, dh = 2, 2, 3, 32
    h = k * g
    sizes = [16, 48, 24]  # prefix / sparse / gen segments
    t = sum(sizes)
    q = jnp.asarray(rng.randn(b, 1, h, dh), jnp.float32)
    kk = jnp.asarray(rng.randn(b, k, t, dh), jnp.float32)
    vv = jnp.asarray(rng.randn(b, k, t, dh), jnp.float32)
    kv_len = jnp.asarray([t - 10, t - 3])  # per-batch valid rows
    segs, off = [], 0
    for i, n in enumerate(sizes):
        segs.append((
            kk[:, :, off:off + n], vv[:, :, off:off + n],
            off, i == len(sizes) - 1,
        ))
        off += n
    # the hm oracle masks everything past kv_len; zero out the rows the
    # unmasked segments would need valid (they are valid here: kv_len
    # exceeds prefix+sparse)
    a = decode_attention_hm(q, kk, vv, kv_len)
    s = decode_attention_segments(q, segs, kv_len)
    np.testing.assert_allclose(np.asarray(a), np.asarray(s), atol=2e-5)


def _gen(segmented, unroll=False, quant="int8", head_dim=32, **rt_kw):
    cfg = toy_config(
        name="t", num_layers=3, hidden_size=4 * head_dim,
        num_heads=4, num_kv_heads=2, head_dim=head_dim,
        intermediate_size=256, vocab_size=128, dtype=jnp.float32,
    )
    rt = RuntimeConfig(
        prefill_sub_batch=1, temperature=0.0, decode_unroll=unroll,
        decode_segmented=segmented, **rt_kw,
    )
    cc = CacheConfig(
        mode="shadow", max_length=640, sparse_budget=64, rank=16,
        chunk_size=8, local_chunks=2, outlier_chunks=2,
        kv_quant=quant,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(3))
    eng = Engine(cfg, cc, rt, params)
    ids = np.random.RandomState(0).randint(0, 128, (2, 512))
    toks, _stats = eng.batch_generate(ids, gen_len=12)
    return np.asarray(toks)


@pytest.mark.parametrize("quant", ["int8", "none"])
def test_segmented_token_identical(quant):
    a = _gen(segmented=False, quant=quant)
    b = _gen(segmented=True, quant=quant)
    np.testing.assert_array_equal(a, b)


def test_segmented_token_identical_unroll():
    a = _gen(segmented=False, unroll=True)
    b = _gen(segmented=True, unroll=True)
    np.testing.assert_array_equal(a, b)


def test_segmented_token_identical_ring():
    a = _gen(segmented=False, ring_gather=True)
    b = _gen(segmented=True, ring_gather=True)
    np.testing.assert_array_equal(a, b)
