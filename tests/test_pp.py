"""Pipeline-parallel (pp) decode over a virtual mesh.

RuntimeConfig.pp > 1 shards the LAYER axis: each stage holds L/pp
layers' weights + cache state, decode runs the circular microbatch
pipeline with ppermute handoffs (parallel/pipeline.py). The reference
has no model parallelism at all (SURVEY §2.4). Greedy tokens must be
bit-identical to the single-device engine.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 (virtual) devices"
)


def _toy():
    return toy_config(
        num_layers=4, hidden_size=256, num_heads=8, num_kv_heads=2,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )


def _cc():
    return CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32,
    )


@pytest.mark.parametrize(
    "pp,batch",
    [
        pytest.param(2, 4, marks=pytest.mark.slow),
        pytest.param(4, 4, marks=pytest.mark.slow),
        (4, 2),
    ],
)
def test_engine_pp_generation_matches_single(pp, batch):
    """pp-pipelined decode reproduces single-device greedy tokens
    (incl. batch < pp, where microbatches are single rows)."""
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (batch, 256))

    def run(rt):
        eng = Engine(cfg, _cc(), rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, pp=pp))
    np.testing.assert_array_equal(ref, got)


@pytest.mark.slow
def test_pp_with_int8_weights():
    """QTensor weights shard their L axis over pp too."""
    from shadowkv_tpu.core.wquant import quantize_params

    cfg = _toy()
    params = quantize_params(
        init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    )
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 256))

    def run(rt):
        eng = Engine(cfg, _cc(), rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, pp=2))
    np.testing.assert_array_equal(ref, got)


def test_pp_rejects_unsupported_modes():
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    with pytest.raises(AssertionError):
        Engine(
            cfg,
            CacheConfig(
                mode="shadow_offload", max_length=512, sparse_budget=64,
                rank=32, outlier_chunks=4,
            ),
            RuntimeConfig(prefill_block_q=64, pp=2),
            params,
        )
    with pytest.raises(AssertionError):  # pp x dp x tp (3 axes)
        Engine(cfg, _cc(),
               RuntimeConfig(prefill_block_q=64, pp=2, tp=2, dp=2),
               params)
    with pytest.raises(AssertionError):  # pp must divide num_layers
        Engine(cfg, _cc(), RuntimeConfig(prefill_block_q=64, pp=3), params)


@pytest.mark.slow
def test_pp_composes_with_dp():
    """(pp, dp) mesh, BOTH manual: dp shards the batch (each dp rank
    runs its own microbatch pipeline), pp pipelines layers. Tokens
    match single-device bit-exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(4).randint(0, cfg.vocab_size, (8, 256))

    def run(rt):
        eng = Engine(cfg, _cc(), rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, pp=2, dp=2))
    np.testing.assert_array_equal(ref, got)
    got4 = run(RuntimeConfig(prefill_block_q=64, pp=2, dp=4))
    np.testing.assert_array_equal(ref, got4)


@pytest.mark.slow
def test_pp_composes_with_tp():
    """(pp, tp) mesh, BOTH manual (round-1 weak #8 resolved): tp shards
    heads inside each pipeline stage with EXPLICIT lax.psum("tp") after
    o_proj/MLP — every rank traces one identical program so the
    collective ids line up (the GSPMD-auto tp composition deadlocked on
    divergent instance ids, commit 2772c9e). The packed wqkv/w_gate_up
    dims are permuted per rank (permute_packed_for_tp) so block shards
    equal Megatron slices. Tokens match single-device bit-exactly."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(5).randint(0, cfg.vocab_size, (4, 256))

    def run(rt):
        eng = Engine(cfg, _cc(), rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(RuntimeConfig(prefill_block_q=64))
    got = run(RuntimeConfig(prefill_block_q=64, pp=2, tp=2))
    np.testing.assert_array_equal(ref, got)


def test_pp_tp_rejects_int8_kv():
    """The int8 scale trailer is packed per GLOBAL head; the manual-tp
    body reads with local head counts, so pp x tp + kv_quant='int8' is
    rejected at engine init."""
    cfg = _toy()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32, kv_quant="int8",
    )
    with pytest.raises(AssertionError, match="kv_quant"):
        Engine(cfg, cc, RuntimeConfig(prefill_block_q=64, pp=2, tp=2),
               params)
