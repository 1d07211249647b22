"""Selection hysteresis (RuntimeConfig.selection_hysteresis).

Round-5 beyond-reference mechanism: near-tied landmark scores thrash
the top-S selection between adjacent decode steps (measured 0.32
organic slot-stay at b4/122K); a multiplicative resident bonus damps
the thrash. These tests pin (a) h=0 is EXACTLY the reference-parity
selection path, (b) h>0 measurably raises the slot hit rate, (c) the
mechanism composes with the int8/tiled regimes.
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
    cfg = toy_config(dtype=jnp.float32)
    return cfg, init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)


def _run(cfg, params, h, quant="none", temperature=0.7):
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=48, kv_quant=quant,
        ),
        RuntimeConfig(
            prefill_block_q=128, selection_hysteresis=h,
            track_hit_rate=True, pallas_auto_interval=2,
        ),
        params,
    )
    ids = np.random.RandomState(7).randint(1, cfg.vocab_size, (2, 1024))
    out, _ = eng.batch_generate(
        ids, gen_len=24, temperature=temperature, warmup_steps=0
    )
    ks = eng.kv_stats()
    return np.asarray(out), ks.get("hit_rate_mean")


def test_h0_matches_default(toy):
    """h=0 must leave the selection path bit-identical to an engine
    that never heard of hysteresis (the reference-parity contract)."""
    cfg, params = toy
    out_default, _ = _run(cfg, params, 0.0)
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=48,
        ),
        RuntimeConfig(prefill_block_q=128, track_hit_rate=True,
                      pallas_auto_interval=2),
        params,
    )
    ids = np.random.RandomState(7).randint(1, cfg.vocab_size, (2, 1024))
    out, _ = eng.batch_generate(
        ids, gen_len=24, temperature=0.7, warmup_steps=0
    )
    np.testing.assert_array_equal(out_default, np.asarray(out))


def test_hysteresis_raises_hit_rate(toy):
    """Synthetic weights churn selection (~near-tied scores); a strong
    resident bonus must measurably raise the slot-stay rate."""
    cfg, params = toy
    _, hit0 = _run(cfg, params, 0.0)
    _, hit1 = _run(cfg, params, 0.5)
    assert hit0 is not None and hit1 is not None
    assert hit1 > hit0 + 0.1, (hit0, hit1)


def test_hysteresis_int8_runs(toy):
    cfg, params = toy
    out, hit = _run(cfg, params, 0.2, quant="int8")
    assert out.shape == (2, 24)
    assert hit is not None
