"""use_pallas='auto' adaptive decode-path selection (engine.py).

The fused refresh kernel wins above ~75 % slot hit rate, the XLA
gather path below (measured on v5e, CLAUDE.md); 'auto' measures the
live hit rate and switches. Synthetic-weight selection churns (~3 %
hits), so auto must stay on the XLA path by default and flip to the
kernel when the threshold is degenerate (0.0) — both paths are
bit-identical, so switching never changes tokens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


@pytest.fixture(scope="module")
def toy():
    # head_dim=128 per the fused kernel's DMA contract (reconstruct.py)
    cfg = toy_config(
        dtype=jnp.float32, head_dim=128, hidden_size=512,
        num_heads=4, num_kv_heads=2, intermediate_size=1024,
    )
    return cfg, init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)


def _engine(cfg, params, threshold, interval=4):
    return Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=32,
        ),
        RuntimeConfig(
            prefill_block_q=128, use_pallas="auto",
            pallas_hit_threshold=threshold, pallas_auto_interval=interval,
        ),
        params,
    )


def test_auto_stays_on_xla_when_selection_churns(toy):
    cfg, params = toy
    eng = _engine(cfg, params, threshold=0.99)
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 1024))
    out, _ = eng.batch_generate(ids, gen_len=12, temperature=0.0,
                                warmup_steps=2)
    assert out.shape == (2, 12)
    assert eng._auto_hit_ema is not None  # it did measure
    assert eng._kernel_now is False
    stats = eng.kv_stats()
    assert stats["auto_kernel_now"] is False
    assert stats["auto_hit_ema"] == eng._auto_hit_ema


@pytest.mark.slow
def test_auto_switches_to_kernel_at_degenerate_threshold(toy):
    cfg, params = toy
    eng = _engine(cfg, params, threshold=0.0)
    ids = np.random.RandomState(1).randint(1, cfg.vocab_size, (2, 1024))
    out, _ = eng.batch_generate(ids, gen_len=12, temperature=0.0,
                                warmup_steps=2)
    assert eng._kernel_now is True
    assert eng._auto_switches >= 1
    # Both paths are bit-identical (tests/test_gather_kernel.py), so a
    # mid-stream switch must not change greedy tokens.
    eng_x = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=32,
        ),
        RuntimeConfig(prefill_block_q=128),
        params,
    )
    base, _ = eng_x.batch_generate(ids, gen_len=12, temperature=0.0,
                                   warmup_steps=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(base))


def test_auto_rejected_for_offload_mode(toy):
    cfg, params = toy
    with pytest.raises(AssertionError):
        Engine(
            cfg,
            CacheConfig(
                mode="shadow_offload", max_length=1024, sparse_budget=128,
                rank=64, outlier_chunks=4,
            ),
            RuntimeConfig(prefill_block_q=128, use_pallas="auto"),
            params,
        )


def test_auto_with_int8_stores(toy):
    """auto + kv_quant='int8' must build the TILED store up front (the
    fused kernel cannot read flat rows) — regression for the crash at
    the first path flip; both paths serve the tiled format."""
    cfg, params = toy
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=32, kv_quant="int8",
        ),
        RuntimeConfig(
            prefill_block_q=128, use_pallas="auto",
            pallas_hit_threshold=0.0, pallas_auto_interval=4,
        ),
        params,
    )
    ids = np.random.RandomState(3).randint(1, cfg.vocab_size, (2, 1024))
    out, _ = eng.batch_generate(ids, gen_len=10, temperature=0.0,
                                warmup_steps=2)
    assert out.shape == (2, 10)
    assert eng._kernel_now is True  # degenerate threshold -> flipped


def test_tiled_xla_decode_matches_flat(toy):
    """The int8 TILED store read by the XLA decode path (the 'auto'
    regime before any flip) must produce tokens bit-identical to the
    flat-row store's XLA decode. Pins the round-5 whole-tile gather
    rewrite of the tiled branch (cache/shadow.py): the old vmapped
    dynamic_slice addressed the store's sublane dim dynamically and
    made XLA relayout the whole 7.5 GB store (bench_auto_hit60 OOM)."""
    cfg, params = toy
    ids = np.random.RandomState(5).randint(1, cfg.vocab_size, (2, 1024))
    outs = {}
    for ks in (False, True):
        eng = Engine(
            cfg,
            CacheConfig(
                mode="shadow", max_length=1024, sparse_budget=128,
                rank=64, outlier_chunks=4, gen_capacity=32,
                kv_quant="int8",
            ),
            RuntimeConfig(
                prefill_block_q=128,
                # force the tiled store WITHOUT enabling the kernel:
                # auto keeps the XLA program until the hit EMA crosses
                use_pallas="auto" if ks else None,
                pallas_hit_threshold=2.0,  # never flips
            ),
            params,
        )
        out, _ = eng.batch_generate(
            ids, gen_len=12, temperature=0.0, warmup_steps=0
        )
        outs[ks] = np.asarray(out)
    np.testing.assert_array_equal(outs[False], outs[True])
