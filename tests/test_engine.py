"""Engine-level generation tests (prefill + decode loops, sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


@pytest.fixture(scope="module")
def toy_params():
    cfg = toy_config(dtype=jnp.float32)
    return cfg, init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)


def test_generate_full_mode(toy_params):
    cfg, params = toy_params
    eng = Engine(
        cfg,
        CacheConfig(mode="full", max_length=512),
        RuntimeConfig(prefill_block_q=64),
        params,
    )
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 40))
    out, stats = eng.generate(ids, gen_len=8)
    assert out.shape == (2, 8)
    # 8 output tokens = 1 from prefill logits + 7 timed decode steps.
    assert stats.decode_tokens == 14
    # Greedy is deterministic: same call -> same tokens.
    out2, _ = eng.generate(ids, gen_len=8)
    np.testing.assert_array_equal(out, out2)


def test_generate_shadow_mode(toy_params):
    cfg, params = toy_params
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=64, rank=32,
            outlier_chunks=4,
        ),
        RuntimeConfig(prefill_block_q=64),
        params,
    )
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 256))
    out, stats = eng.generate(ids, gen_len=8)
    assert out.shape == (2, 8)
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_shadow_agrees_with_full_on_greedy_tokens(toy_params):
    """With a generous budget, greedy decode tokens should match the
    full path for several steps (the reference's accuracy criterion in
    miniature)."""
    cfg, params = toy_params
    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 256))
    eng_full = Engine(
        cfg, CacheConfig(mode="full", max_length=512),
        RuntimeConfig(prefill_block_q=64), params,
    )
    eng_shadow = Engine(
        cfg,
        CacheConfig(
            # Full coverage: all 20 landmark chunks fit in the budget
            # and rank == kv hidden size, so sparse == dense exactly.
            mode="shadow", max_length=512, sparse_budget=160,
            rank=64, outlier_chunks=4,
        ),
        RuntimeConfig(prefill_block_q=64), params,
    )
    out_f, _ = eng_full.generate(ids, gen_len=6)
    out_s, _ = eng_shadow.generate(ids, gen_len=6)
    np.testing.assert_array_equal(out_f, out_s)


def test_sampled_generation_reproducible(toy_params):
    cfg, params = toy_params
    eng = Engine(
        cfg, CacheConfig(mode="full", max_length=256),
        RuntimeConfig(prefill_block_q=64), params,
    )
    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 32))
    out1, _ = eng.generate(ids, gen_len=6, temperature=0.8, seed=42)
    out2, _ = eng.generate(ids, gen_len=6, temperature=0.8, seed=42)
    np.testing.assert_array_equal(out1, out2)


def test_generate_cont_matches_joint_prefill():
    """generate(cont=True) over [ctx][query] must equal one generate
    over the concatenation (full-attention oracle; reference
    generate(cont=True) path, models/base.py:162-204)."""
    import jax.numpy as jnp

    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    rt = RuntimeConfig(prefill_block_q=128)
    cc = CacheConfig(mode="full", max_length=640)
    rng = np.random.RandomState(0)
    ctx = rng.randint(1, cfg.vocab_size, (1, 256))
    query = rng.randint(1, cfg.vocab_size, (1, 16))

    eng = Engine(cfg, cc, rt, params)
    eng.generate(ctx, gen_len=1, temperature=0.0)
    cont_out, _ = eng.generate(query, gen_len=8, temperature=0.0,
                               cont=True)

    eng2 = Engine(cfg, cc, rt, params)
    joint = np.concatenate([ctx, query], axis=1)
    joint_out, _ = eng2.generate(joint, gen_len=8, temperature=0.0)
    np.testing.assert_array_equal(cont_out, joint_out)


def test_kv_stats_measured(toy_params, capsys):
    """kv_stats() reports the LIVE cache's real bytes (reference
    print_stats/print_kv_stats observability, kv_cache.py:651-663)."""
    cfg, params = toy_params
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=64, rank=32,
            outlier_chunks=4,
        ),
        RuntimeConfig(prefill_block_q=64), params,
    )
    assert "bytes_by_field" not in eng.kv_stats()  # before prefill
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (2, 256))
    eng.generate(ids, gen_len=4)
    s = eng.kv_stats()
    assert s["mode"] == "shadow"
    assert s["cached"] == 256 + 3  # prefill + decode-appended tokens
    for field in ("u", "sv", "landmarks", "k_buf", "v_buf", "v_full"):
        assert s["bytes_by_field"][field] > 0
    assert s["device_bytes"] == sum(s["bytes_by_field"].values())
    assert s["host_bytes"] == 0
    eng.print_kv_stats()
    out = capsys.readouterr().out
    assert "budget 64" in out and "HBM" in out


def test_kv_stats_full_mode(toy_params):
    cfg, params = toy_params
    eng = Engine(
        cfg, CacheConfig(mode="full", max_length=512),
        RuntimeConfig(prefill_block_q=64), params,
    )
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 40))
    eng.generate(ids, gen_len=4)
    s = eng.kv_stats()
    assert s["cached"] == 40 + 3
    assert s["bytes_by_field"]["k"] == s["bytes_by_field"]["v"]


@pytest.mark.slow
def test_cont_chunked_teacher_forcing(toy_params):
    """generate(cont=True) consumes the follow-up turn in multi-token
    decode steps (cont_chunk). With a full-coverage budget (selection
    == everything) the chunked and per-token paths are bit-identical;
    selection differences only appear under real sparsity, where the
    chunked form is the reference's own multi-query semantics
    (kv_cache.py:431 sum over q positions)."""
    cfg, params = toy_params
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=160, rank=64,
        outlier_chunks=4, gen_capacity=64,
    )
    prefix = np.random.RandomState(11).randint(0, cfg.vocab_size, (2, 256))
    suffix = np.random.RandomState(12).randint(0, cfg.vocab_size, (2, 37))

    def run(chunk):
        eng = Engine(cfg, cc, RuntimeConfig(prefill_block_q=64), params)
        eng.generate(prefix, gen_len=1)
        out, _ = eng.generate(suffix, gen_len=8, cont=True,
                              cont_chunk=chunk)
        return out

    np.testing.assert_array_equal(run(1), run(16))
