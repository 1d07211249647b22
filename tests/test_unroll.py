"""Unrolled decode (RuntimeConfig.decode_unroll) is token-identical to
the scan path — the unroll is a pure lowering change (constant layer
indices so XLA folds per-layer slices; see forward._scan_layers)."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config

import jax


def _gen(mode, unroll, quant="int8", head_dim=32, **rt_kw):
    cfg = toy_config(
        name="t", num_layers=3, hidden_size=4 * head_dim,
        num_heads=4, num_kv_heads=2, head_dim=head_dim,
        intermediate_size=256, vocab_size=128, dtype=jnp.float32,
    )
    rt = RuntimeConfig(
        prefill_sub_batch=1, temperature=0.0, decode_unroll=unroll,
        **rt_kw,
    )
    cc = CacheConfig(
        mode=mode, max_length=640, sparse_budget=64, rank=16,
        chunk_size=8, local_chunks=2, outlier_chunks=2,
        kv_quant=quant,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(3))
    eng = Engine(cfg, cc, rt, params)
    ids = np.random.RandomState(0).randint(0, 128, (2, 512))
    toks, _stats = eng.batch_generate(ids, gen_len=12)
    return np.asarray(toks)


@pytest.mark.parametrize("mode", ["shadow", "full"])
def test_unroll_token_identical(mode):
    a = _gen(mode, unroll=False)
    b = _gen(mode, unroll=True)
    np.testing.assert_array_equal(a, b)


def test_unroll_token_identical_ring():
    a = _gen("shadow", unroll=False, ring_gather=True)
    b = _gen("shadow", unroll=True, ring_gather=True)
    np.testing.assert_array_equal(a, b)


def test_unroll_token_identical_kernel():
    # The fused refresh kernel needs Dh % 128 == 0 (reconstruct.py).
    a = _gen("shadow", unroll=False, use_pallas=True, head_dim=128)
    b = _gen("shadow", unroll=True, use_pallas=True, head_dim=128)
    np.testing.assert_array_equal(a, b)
