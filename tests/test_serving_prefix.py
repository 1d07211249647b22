"""Shared-prefix (prompt-cache) admissions in ContinuousBatcher.

Requests with the same context_id share their first context_len prompt
tokens; the context is prefilled once and snapshotted, later admissions
clone the snapshot and teacher-force the per-request suffix through the
batched decode loop. The oracle is the engine's own multi-turn path:
generate(prefix) then generate(suffix, cont=True) — identical math
(prefix prefill + suffix through decode steps), so greedy tokens must
match bit-exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config
from shadowkv_tpu.serving import ContinuousBatcher, Request

PREFIX_LEN = 256
GEN = 6
SUF = 3


@pytest.fixture(scope="module")
def setup():
    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    return cfg, params


def _cache_cfg(mode="shadow"):
    return CacheConfig(
        mode=mode, max_length=PREFIX_LEN, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32,
    )


def _engine(cfg, params, batch, mode="shadow", ring=None):
    return Engine(
        cfg, _cache_cfg(mode),
        RuntimeConfig(prefill_block_q=64, batch_size=batch,
                      ring_gather=ring), params,
    )


def _oracle(cfg, params, prefix, suffix, gen_len, mode="shadow",
            ring=None):
    """generate(prefix) -> generate(suffix, cont=True): the engine's
    multi-turn continuation path (prefix prefill + suffix through
    decode steps — the same math as a prefix-cache admission)."""
    assert len(suffix) > 0
    eng = _engine(cfg, params, 1, mode, ring)
    eng.generate(prefix[None], gen_len=1, temperature=0.0)
    out, _ = eng.generate(suffix[None], gen_len=gen_len, temperature=0.0,
                          cont=True)
    # first token of the continuation run is the first generated token
    return out[0]


@pytest.mark.parametrize(
    "mode,ring",
    [
        ("shadow", None),
        pytest.param("shadow_offload", True, marks=pytest.mark.slow),
        pytest.param("shadow_offload", None, marks=pytest.mark.slow),
    ],
    ids=["hbm", "offload-ring", "offload-callback"],
)
def test_prefix_cache_matches_multiturn_oracle(setup, mode, ring):
    cfg, params = setup
    rng = np.random.RandomState(0)
    prefix = rng.randint(1, cfg.vocab_size, PREFIX_LEN).astype(np.int32)
    suffixes = [
        rng.randint(1, cfg.vocab_size, SUF).astype(np.int32)
        for _ in range(4)
    ]
    reqs = [
        Request(
            uid=i,
            input_ids=np.concatenate([prefix, suf]),
            gen_len=GEN,
            context_id=7,
            context_len=PREFIX_LEN,
        )
        for i, suf in enumerate(suffixes)
    ]
    eng = _engine(cfg, params, 2, mode, ring)
    cb = ContinuousBatcher(eng, slots=2, temperature=0.0)
    results, stats = cb.run(reqs)
    assert stats.completed_requests == 4
    # slots 0/1 prefill the context (stacked initial batch); later
    # admissions must be snapshot clones, not prefills
    assert stats.context_hits == 2
    assert stats.context_prefills >= 1
    assert stats.forced_tokens == 4 * SUF
    for i, suf in enumerate(suffixes):
        want = _oracle(cfg, params, prefix, suf, GEN, mode, ring)
        np.testing.assert_array_equal(
            results[i], np.asarray(want), err_msg=f"request {i}"
        )


@pytest.mark.slow
def test_distinct_contexts_and_eviction(setup):
    cfg, params = setup
    rng = np.random.RandomState(1)
    prefixes = [
        rng.randint(1, cfg.vocab_size, PREFIX_LEN).astype(np.int32)
        for _ in range(2)
    ]
    sufs = [
        rng.randint(1, cfg.vocab_size, SUF).astype(np.int32)
        for _ in range(4)
    ]
    # ctx 0, ctx 1, ctx 0 again, ctx 1 again — max_contexts=1 forces
    # re-prefill on every context change
    reqs = [
        Request(uid=i, input_ids=np.concatenate([prefixes[i % 2], sufs[i]]),
                gen_len=GEN, context_id=i % 2, context_len=PREFIX_LEN)
        for i in range(4)
    ]
    eng = _engine(cfg, params, 1)
    cb = ContinuousBatcher(eng, slots=1, temperature=0.0, max_contexts=1)
    results, stats = cb.run(reqs)
    assert stats.completed_requests == 4
    assert stats.context_hits == 0  # every admission evicted the other
    for i in range(4):
        want = _oracle(cfg, params, prefixes[i % 2], sufs[i], GEN)
        np.testing.assert_array_equal(results[i], np.asarray(want))

    # with room for both contexts the repeats are hits
    eng2 = _engine(cfg, params, 1)
    cb2 = ContinuousBatcher(eng2, slots=1, temperature=0.0, max_contexts=2)
    results2, stats2 = cb2.run(reqs)
    assert stats2.context_hits == 2
    for i in range(4):
        np.testing.assert_array_equal(results2[i], results[i])


def test_mixed_context_and_plain_requests_rejected_on_length(setup):
    cfg, params = setup
    rng = np.random.RandomState(2)
    prefix = rng.randint(1, cfg.vocab_size, PREFIX_LEN).astype(np.int32)
    # plain request whose full prompt length differs from the context
    # requests' prefill length must be rejected (static layout)
    reqs = [
        Request(uid=0, input_ids=np.concatenate(
            [prefix, rng.randint(1, cfg.vocab_size, SUF).astype(np.int32)]
        ), gen_len=GEN, context_id=3, context_len=PREFIX_LEN),
        Request(uid=1, input_ids=prefix[: PREFIX_LEN - 8], gen_len=GEN),
    ]
    eng = _engine(cfg, params, 2)
    cb = ContinuousBatcher(eng, slots=2, temperature=0.0)
    with pytest.raises(AssertionError):
        cb.run(reqs)


def test_context_id_reuse_with_different_prefix_rejected(setup):
    cfg, params = setup
    rng = np.random.RandomState(3)
    p1 = rng.randint(1, cfg.vocab_size, PREFIX_LEN).astype(np.int32)
    p2 = rng.randint(1, cfg.vocab_size, PREFIX_LEN).astype(np.int32)
    suf = rng.randint(1, cfg.vocab_size, SUF).astype(np.int32)
    reqs = [
        Request(uid=0, input_ids=np.concatenate([p1, suf]), gen_len=GEN,
                context_id=5, context_len=PREFIX_LEN),
        Request(uid=1, input_ids=np.concatenate([p2, suf]), gen_len=GEN,
                context_id=5, context_len=PREFIX_LEN),
    ]
    eng = _engine(cfg, params, 1)
    cb = ContinuousBatcher(eng, slots=1, temperature=0.0)
    with pytest.raises(AssertionError):
        cb.run(reqs)
