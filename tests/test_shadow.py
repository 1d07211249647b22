"""ShadowKV sparse-path correctness.

Key oracle (mirrors the reference's verification philosophy, SURVEY §4):
when the sparse budget + outliers + local region cover the ENTIRE
context and rank equals the full head dim, the shadow path must
reproduce full attention's decode logits almost exactly — the SVD is
exact and every chunk is always selected. With a small budget it must
still run, reuse hits, and produce finite logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.cache.full import FullCache
from shadowkv_tpu.cache.shadow import ShadowLayout
from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


@pytest.fixture(scope="module")
def setup():
    cfg = toy_config(dtype=jnp.float32)
    rt = RuntimeConfig(prefill_block_q=64)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(7), scale=0.2)
    cos, sin = compute_cos_sin(cfg, 1024)
    return cfg, rt, params, cos, sin


S = 256  # prefill length; chunks = 256//8 - 4 = 28 -> 24, local = 64


def _prefill_both(cfg, rt, params, cos, sin, cache_cfg, b=2, seed=11):
    ids = jax.random.randint(
        jax.random.PRNGKey(seed), (b, S), 0, cfg.vocab_size
    )
    full_cfg = CacheConfig(mode="full", max_length=S + 64)
    cache_f = FullCache.init(cfg, full_cfg, b)
    logits_f, cache_f = forward.prefill_full(
        cfg, rt, params, cache_f, ids, 0, cos, sin
    )
    layout = ShadowLayout.build(cache_cfg, S)
    logits_s, cache_s = forward.prefill_shadow(
        cfg, rt, layout, params, ids, cos, sin
    )
    return ids, (logits_f, cache_f), (logits_s, cache_s)


def test_prefill_logits_identical(setup):
    """Prefill attention is dense in both paths -> identical logits."""
    cfg, rt, params, cos, sin = setup
    cache_cfg = CacheConfig(
        mode="shadow", max_length=S, sparse_budget=64, rank=32,
        outlier_chunks=4,
    )
    _, (logits_f, _), (logits_s, _) = _prefill_both(
        cfg, rt, params, cos, sin, cache_cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits_f), np.asarray(logits_s), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_full_coverage_budget_matches_full_attention(setup):
    """budget covers all landmarks + full rank => decode == full path."""
    cfg, rt, params, cos, sin = setup
    d = cfg.num_kv_heads * cfg.head_dim  # 64 = full rank
    cache_cfg = CacheConfig(
        mode="shadow", max_length=S,
        sparse_budget=20 * 8,  # all 20 landmark chunks
        rank=d,
        outlier_chunks=4,
    )
    ids, (logits_f, cache_f), (logits_s, cache_s) = _prefill_both(
        cfg, rt, params, cos, sin, cache_cfg
    )
    # Several teacher-forced decode steps must track the full path.
    steps = jax.random.randint(jax.random.PRNGKey(5), (2, 4), 0, cfg.vocab_size)
    for t in range(steps.shape[1]):
        tok = steps[:, t : t + 1]
        logits_f, cache_f = forward.decode_full(
            cfg, params, cache_f, tok, cos, sin
        )
        logits_s, cache_s = forward.decode_shadow(
            cfg, params, cache_s, tok, cos, sin
        )
        np.testing.assert_allclose(
            np.asarray(logits_f),
            np.asarray(logits_s),
            rtol=5e-3,
            atol=5e-3,
            err_msg=f"step {t}",
        )


def test_small_budget_decode_runs_and_reuses_hits(setup):
    cfg, rt, params, cos, sin = setup
    cache_cfg = CacheConfig(
        mode="shadow", max_length=S, sparse_budget=64, rank=32,
        outlier_chunks=4,
    )
    ids, _, (logits_s, cache_s) = _prefill_both(
        cfg, rt, params, cos, sin, cache_cfg
    )
    assert np.isfinite(np.asarray(logits_s)).all()
    prev_ids = np.asarray(cache_s.cached_ids).copy()
    tok = jnp.full((2, 1), 3, jnp.int32)
    logits1, cache_s = forward.decode_shadow(cfg, params, cache_s, tok, cos, sin)
    assert int(cache_s.gen_len) == 1
    assert np.isfinite(np.asarray(logits1)).all()
    # Decoding again with an identical-ish query: hit reuse keeps ids as
    # a subset of valid chunk range, and the sparse K buffer rows for
    # hits must be bit-identical to the previous step's rows.
    logits2, cache_s2 = forward.decode_shadow(cfg, params, cache_s, tok, cos, sin)
    assert int(cache_s2.gen_len) == 2
    ids2 = np.asarray(cache_s2.cached_ids)
    assert (ids2 >= 0).all() and (ids2 < cache_s2.layout.chunks).all()


def test_gen_region_participates_in_attention(setup):
    """Tokens appended at decode must influence subsequent logits."""
    cfg, rt, params, cos, sin = setup
    cache_cfg = CacheConfig(
        mode="shadow", max_length=S, sparse_budget=64, rank=32,
        outlier_chunks=4,
    )
    _, _, (_, cache_a) = _prefill_both(cfg, rt, params, cos, sin, cache_cfg)
    _, _, (_, cache_b) = _prefill_both(cfg, rt, params, cos, sin, cache_cfg)

    tok_a = jnp.full((2, 1), 5, jnp.int32)
    tok_b = jnp.full((2, 1), 9, jnp.int32)
    _, cache_a = forward.decode_shadow(cfg, params, cache_a, tok_a, cos, sin)
    _, cache_b = forward.decode_shadow(cfg, params, cache_b, tok_b, cos, sin)
    # Same next token; histories differ only in the generated token.
    probe = jnp.full((2, 1), 1, jnp.int32)
    la, _ = forward.decode_shadow(cfg, params, cache_a, probe, cos, sin)
    lb, _ = forward.decode_shadow(cfg, params, cache_b, probe, cos, sin)
    assert not np.allclose(np.asarray(la), np.asarray(lb))
