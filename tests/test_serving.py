"""Continuous batching: slot refills, per-slot depths, greedy parity.

The load-bearing property: a request served through the continuous
batcher must produce EXACTLY the tokens it produces when run alone
(attention is per-sequence; admission into a live batch must not
disturb anything). Greedy decoding makes this bit-exact.
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
from shadowkv_tpu.serving import ContinuousBatcher, Request


@pytest.fixture(scope="module")
def serve_setup():
    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cache_cfg = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32,
    )
    return cfg, params, cache_cfg


def _isolated_tokens(cfg, params, cache_cfg, ids, gen_len):
    eng = Engine(cfg, cache_cfg, RuntimeConfig(), params)
    out, _ = eng.generate(ids[None], gen_len=gen_len)
    return out[0]


@pytest.mark.parametrize("chunk", [1, 3])
def test_continuous_batching_matches_isolated_runs(serve_setup, chunk):
    """chunk=1 is per-step dispatch; chunk=3 (odd, < every gen_len)
    exercises mid-chunk finishes, chunk-boundary admissions and forced
    suffixes that straddle chunk boundaries — outputs must be
    bit-identical either way (greedy)."""
    cfg, params, cache_cfg = serve_setup
    s = 256
    rng = np.random.RandomState(7)
    n_req = 5
    prompts = rng.randint(0, cfg.vocab_size, (n_req, s))
    gen_lens = [6, 9, 4, 7, 5]
    requests = [
        Request(uid=i, input_ids=prompts[i], gen_len=gen_lens[i])
        for i in range(n_req)
    ]

    eng = Engine(cfg, cache_cfg, RuntimeConfig(batch_size=2), params)
    cb = ContinuousBatcher(eng, slots=2, steps_per_dispatch=chunk)
    results, stats = cb.run(requests)

    assert stats.completed_requests == n_req
    assert stats.admissions == n_req - 2  # 2 initial slots, 3 refills
    assert stats.completed_tokens == sum(gen_lens)
    for i in range(n_req):
        want = _isolated_tokens(
            cfg, params, cache_cfg, prompts[i], gen_lens[i]
        )
        np.testing.assert_array_equal(
            results[i], want,
            err_msg=f"request {i} diverged from its isolated run",
        )


@pytest.mark.slow
def test_continuous_batching_single_slot_queue(serve_setup):
    """Degenerate capacity-1 case: pure sequential serving."""
    cfg, params, cache_cfg = serve_setup
    s = 256
    rng = np.random.RandomState(8)
    prompts = rng.randint(0, cfg.vocab_size, (2, s))
    requests = [
        Request(uid=0, input_ids=prompts[0], gen_len=5),
        Request(uid=1, input_ids=prompts[1], gen_len=5),
    ]
    eng = Engine(cfg, cache_cfg, RuntimeConfig(batch_size=1), params)
    results, stats = ContinuousBatcher(eng, slots=1).run(requests)
    assert stats.completed_requests == 2
    for i in range(2):
        want = _isolated_tokens(cfg, params, cache_cfg, prompts[i], 5)
        np.testing.assert_array_equal(results[i], want)


def test_idle_slot_drain(serve_setup):
    """Queue shorter than slots: idle slots must not corrupt live ones
    or overflow the gen region while the last request drains."""
    cfg, params, cache_cfg = serve_setup
    s = 256
    rng = np.random.RandomState(9)
    prompts = rng.randint(0, cfg.vocab_size, (3, s))
    # one long request keeps decoding after the others finish
    gen_lens = [3, 30, 3]
    requests = [
        Request(uid=i, input_ids=prompts[i], gen_len=gen_lens[i])
        for i in range(3)
    ]
    eng = Engine(cfg, cache_cfg, RuntimeConfig(batch_size=3), params)
    results, stats = ContinuousBatcher(eng, slots=3).run(requests)
    assert stats.completed_requests == 3
    want = _isolated_tokens(cfg, params, cache_cfg, prompts[1], 30)
    np.testing.assert_array_equal(results[1], want)


@pytest.mark.slow
@pytest.mark.parametrize("ring", [False, True])
def test_continuous_batching_offload(serve_setup, ring):
    """Offload-mode continuous batching: admissions must overwrite the
    host V store's slot (io_callback rows in place; ring store repin)
    and reproduce each request's isolated offload run exactly. The
    initial prefill runs the incremental per-sub-batch V eviction path
    (prefill_sub_batch=1 forces multiple merge steps)."""
    cfg, params, _ = serve_setup
    cache_cfg = CacheConfig(
        mode="shadow_offload", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    s = 256
    rng = np.random.RandomState(13)
    n_req = 4
    prompts = rng.randint(0, cfg.vocab_size, (n_req, s))
    gen_lens = [5, 8, 4, 6]
    requests = [
        Request(uid=i, input_ids=prompts[i], gen_len=gen_lens[i])
        for i in range(n_req)
    ]
    rt = RuntimeConfig(
        batch_size=2, ring_gather=ring, prefill_sub_batch=1
    )
    eng = Engine(cfg, cache_cfg, rt, params)
    results, stats = ContinuousBatcher(eng, slots=2).run(requests)
    assert stats.completed_requests == n_req
    assert stats.admissions == n_req - 2
    for i in range(n_req):
        e2 = Engine(
            cfg, cache_cfg, RuntimeConfig(ring_gather=ring), params
        )
        want, _ = e2.generate(prompts[i][None], gen_len=gen_lens[i])
        np.testing.assert_array_equal(
            results[i], want[0],
            err_msg=f"offload request {i} diverged (ring={ring})",
        )


@pytest.mark.slow
def test_continuous_batching_sharded_offload():
    """Offload-mode continuous batching over a (dp, tp) mesh: admission
    merges an unsharded 1-slot prefill into the sharded cache and
    updates the host V store via the global numpy mirror."""
    cfg = toy_config(
        num_layers=2, hidden_size=256, num_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow_offload", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4, gen_capacity=32,
    )
    rng = np.random.RandomState(17)
    prompts = rng.randint(0, cfg.vocab_size, (4, 256))
    reqs = lambda: [
        Request(uid=i, input_ids=prompts[i], gen_len=4 + i)
        for i in range(4)
    ]

    eng1 = Engine(
        cfg, cc, RuntimeConfig(prefill_block_q=64, ring_gather=True),
        params,
    )
    ref, _ = ContinuousBatcher(eng1, slots=2).run(reqs())

    eng2 = Engine(
        cfg, cc,
        RuntimeConfig(prefill_block_q=64, dp=2, tp=4, ring_gather=True),
        params,
    )
    got, stats = ContinuousBatcher(eng2, slots=2).run(reqs())
    assert stats.completed_requests == 4
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])


@pytest.mark.slow
def test_continuous_batching_sharded_mesh():
    """Continuous batching over a (dp, tp) mesh: slot admissions into
    the dp/tp-sharded cache must reproduce the unsharded CB tokens."""
    from shadowkv_tpu.models.registry import toy_config as _toy

    cfg = _toy(
        num_layers=2, hidden_size=256, num_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32,
    )
    rng = np.random.RandomState(11)
    prompts = rng.randint(0, cfg.vocab_size, (4, 256))
    reqs = lambda: [
        Request(uid=i, input_ids=prompts[i], gen_len=4 + i)
        for i in range(4)
    ]

    eng1 = Engine(cfg, cc, RuntimeConfig(prefill_block_q=64), params)
    ref, _ = ContinuousBatcher(eng1, slots=2).run(reqs())

    eng2 = Engine(
        cfg, cc, RuntimeConfig(prefill_block_q=64, dp=2, tp=4), params
    )
    got, stats = ContinuousBatcher(eng2, slots=2).run(reqs())
    assert stats.completed_requests == 4
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
