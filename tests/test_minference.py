"""MInference-style dynamic sparse prefill: estimation, block metadata,
the VS Pallas kernel (interpret mode) and the per-head dispatch.

Oracle chain: estimation is checked against a naive numpy port of the
reference recipe (models/tensor_op.py:85-100); the kernel is checked
against the jnp block-mask oracle; the dense head kind is checked
against exact causal attention (sanity that the metadata encoding is
lossless when everything is active).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.core import minference as mi
from shadowkv_tpu.core.attention import mha
from shadowkv_tpu.kernels.vs_sparse import vs_sparse_attention


def _naive_estimate(q, k, scale):
    """Direct numpy port of the reference estimation for one head."""
    s = q.shape[0]
    lq = min(64, s)
    qk = (q[-lq:] @ k.T) * scale  # [lq, S]
    for i in range(lq):
        for j in range(lq):
            if j > i:
                qk[i, s - lq + j] = -1e30
    p = np.exp(qk - qk.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    vertical = p.sum(0)
    slash = np.zeros(s)
    for i in range(lq):
        for j in range(s):
            d = (s - lq + i) - j
            if 0 <= d < s:
                slash[d] += p[i, j]
    vertical[:30] = np.inf
    slash[:100] = np.inf
    return vertical, slash


def test_estimation_matches_naive(rng):
    b, s, h, kh, dh = 1, 160, 2, 1, 32
    ks = jax.random.split(rng, 2)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    vert, slash = mi.estimate_vertical_slash(q, k)
    scale = dh**-0.5
    for hh in range(h):
        nv, nsl = _naive_estimate(
            np.asarray(q[0, :, hh]), np.asarray(k[0, :, 0]), scale
        )
        got_v = np.asarray(vert[0, hh])
        got_s = np.asarray(slash[0, hh])
        assert np.isinf(got_v[:30]).all() and np.isinf(got_s[:100]).all()
        np.testing.assert_allclose(got_v[30:], nv[30:], atol=1e-4)
        np.testing.assert_allclose(got_s[100:], nsl[100:], atol=1e-4)


def test_block_meta_bruteforce():
    s, block = 1024, 128
    n_blk = s // block
    v_idx = jnp.asarray([[5, 130, 131, 900]], jnp.int32)
    s_idx = jnp.asarray([[0, 3, 128, 200, 700]], jnp.int32)
    meta = mi.build_vs_meta(v_idx, s_idx, s, block)
    # brute force block mask over tokens
    colset = {5 // block, 130 // block, 131 // block, 900 // block}
    diagset = {0}
    for d in [0, 3, 128, 200, 700]:
        diagset.add(d // block)
        diagset.add((d + block - 1) // block)
    want = np.zeros((n_blk, n_blk), bool)
    for qb in range(n_blk):
        for kb in range(qb + 1):
            want[qb, kb] = (kb in colset) or ((qb - kb) in diagset)
    got = np.asarray(mi.expand_block_mask(meta, n_blk))[0]
    np.testing.assert_array_equal(got, want)
    # prefix counts consistent with lists
    cf = np.asarray(meta.col_flag[0])
    np.testing.assert_array_equal(np.cumsum(cf), np.asarray(meta.col_cnt[0]))


def _random_meta(rng, bh, s, block, nv=24, ns=12):
    ks = jax.random.split(rng, 2)
    v_idx = jax.random.randint(ks[0], (bh, nv), 0, s)
    s_idx = jax.random.randint(ks[1], (bh, ns), 0, s)
    return mi.build_vs_meta(v_idx, s_idx, s, block)


@pytest.mark.parametrize("s,block", [(512, 128), (1024, 256)])
def test_vs_kernel_matches_oracle(rng, s, block):
    b, h, kh, dh = 1, 4, 2, 128
    g = h // kh
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (b * h, s, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b * kh, s, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b * kh, s, dh), jnp.float32)
    meta = _random_meta(ks[3], b * h, s, block)
    kv_map = jnp.asarray([hh // g for hh in range(h)], jnp.int32)
    scale = dh**-0.5
    out = vs_sparse_attention(
        q, k, v, meta.col_ids, meta.col_cnt, meta.col_flag,
        meta.diag_ids, meta.diag_cnt, kv_map,
        block=block, scale=scale, seq_len=s, interpret=True,
    )
    ref = mi.vs_attention_reference(
        q, k, v, meta, kv_map, block, scale=scale
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_vs_kernel_padded_tail(rng):
    """seq_len not a block multiple: padded key columns must not be
    attended, padded query rows are discarded by the caller."""
    b, h, kh, dh, block = 1, 2, 1, 128, 128
    s_real, s_pad = 448, 512
    ks = jax.random.split(rng, 4)
    q = jax.random.normal(ks[0], (h, s_real, dh), jnp.float32)
    k = jax.random.normal(ks[1], (kh, s_real, dh), jnp.float32)
    v = jax.random.normal(ks[2], (kh, s_real, dh), jnp.float32)
    pad = s_pad - s_real
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    meta = _random_meta(ks[3], h, s_pad, block)
    kv_map = jnp.zeros((h,), jnp.int32)
    out = vs_sparse_attention(
        qp, kp, vp, meta.col_ids, meta.col_cnt, meta.col_flag,
        meta.diag_ids, meta.diag_cnt, kv_map,
        block=block, scale=dh**-0.5, seq_len=s_real, interpret=True,
    )[:, :s_real]
    ref = mi.vs_attention_reference(
        qp, kp, vp, meta, kv_map, block, seq_len=s_real
    )[:, :s_real]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_dense_head_kind_equals_causal(rng):
    """A 'dense' head pattern through the metadata path must reproduce
    exact causal attention (metadata encoding is lossless)."""
    b, s, h, kh, dh = 1, 384, 2, 1, 64
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    out = mi.minference_prefill(
        q, k, v, patterns=["dense"] * h, block=128, use_kernel=False
    )
    pos = np.arange(s)
    causal = jnp.asarray(pos[None] <= pos[:, None])
    ref = mha(q, k, v, mask=causal[None, None, None])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_stream_head_matches_splash_semantics(rng):
    """stream_llm through VS metadata == sink/window mask at block
    granularity (block-expanded window)."""
    s, block, sink, window = 1024, 128, 256, 256
    meta = mi.stream_meta(1, s, block, sink, window)
    n_blk = s // block
    got = np.asarray(mi.expand_block_mask(meta, n_blk))[0]
    want = np.zeros((n_blk, n_blk), bool)
    for qb in range(n_blk):
        for kb in range(qb + 1):
            want[qb, kb] = (kb * block < sink) or (
                (qb - kb) * block < window + block
            )
    np.testing.assert_array_equal(got, want)


def test_block_sparse_matches_bruteforce(rng):
    b, s, h, kh, dh, block, tk = 1, 512, 2, 1, 64, 64, 3
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    out = mi.block_sparse_attention(q, k, v, topk_blocks=tk, block=block)
    nb = s // block
    scale = dh**-0.5
    for hh in range(h):
        qn = np.asarray(q[0, :, hh])
        kn = np.asarray(k[0, :, 0])
        vn = np.asarray(v[0, :, 0])
        qb = qn.reshape(nb, block, dh).mean(1)
        kb = kn.reshape(nb, block, dh).mean(1)
        sc = qb @ kb.T
        mask_tok = np.zeros((s, s), bool)
        for i in range(nb):
            row = sc[i].copy()
            row[i + 1:] = -np.inf
            row[i] = np.inf  # frontier always attends
            sel = np.argsort(-row)[:tk]
            for j in sel:
                mask_tok[
                    i * block : (i + 1) * block,
                    j * block : (j + 1) * block,
                ] = True
        pos = np.arange(s)
        mask_tok &= pos[None] <= pos[:, None]
        scn = (qn @ kn.T) * scale
        scn = np.where(mask_tok, scn, -1e30)
        p = np.exp(scn - scn.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        ref = p @ vn
        np.testing.assert_allclose(
            np.asarray(out[0, :, hh]), ref, rtol=2e-3, atol=2e-3
        )


def test_mixed_per_head_dispatch(rng):
    """Each head kind routes to its own implementation and the outputs
    land on the right heads."""
    b, s, h, kh, dh = 1, 512, 4, 2, 64
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    patterns = [
        ("vertical_and_slash", 64, 64),
        "stream_llm",
        "dense",
        "block_sparse",
    ]
    out = mi.minference_prefill(
        q, k, v, patterns=patterns, block=128,
        stream_sink=128, stream_window=128, bs_topk_blocks=2,
        use_kernel=False,
    )
    assert out.shape == q.shape
    assert not np.isnan(np.asarray(out)).any()
    # the dense head is exactly causal attention
    pos = np.arange(s)
    causal = jnp.asarray(pos[None] <= pos[:, None])
    ref = mha(q, k, v, mask=causal[None, None, None])
    np.testing.assert_allclose(
        np.asarray(out[:, :, 2]), np.asarray(ref[:, :, 2]),
        rtol=2e-4, atol=2e-4,
    )
    # kernel path (interpret) agrees with the oracle path on the
    # non-block-sparse heads
    out_k = mi.minference_prefill(
        q, k, v, patterns=patterns, block=128,
        stream_sink=128, stream_window=128, bs_topk_blocks=2,
        use_kernel=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out), rtol=2e-4, atol=2e-4
    )


def test_engine_vs_prefill_generates():
    """Shadow engine with the MInference 'vs' prefill pattern runs
    end-to-end on CPU (oracle path) and emits valid tokens; with
    near-dense pattern sizes it matches the dense-prefill greedy
    tokens."""
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cache_cfg = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4,
    )
    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, (1, 256))

    eng_dense = Engine(cfg, cache_cfg, RuntimeConfig(), params)
    out_dense, _ = eng_dense.generate(ids, gen_len=8)

    eng_vs = Engine(
        cfg, cache_cfg,
        RuntimeConfig(
            prefill_pattern="vs",
            # near-dense sizes: every block active -> same attention
            vs_vertical_size=256, vs_slash_size=256, vs_block=64,
        ),
        params,
    )
    out_vs, _ = eng_vs.generate(ids, gen_len=8)
    assert out_vs.shape == (1, 8)
    np.testing.assert_array_equal(np.asarray(out_vs), np.asarray(out_dense))

    # sparse sizes still produce valid tokens
    eng_sparse = Engine(
        cfg, cache_cfg,
        RuntimeConfig(
            prefill_pattern="vs",
            vs_vertical_size=32, vs_slash_size=50, vs_block=64,
        ),
        params,
    )
    out_sparse, _ = eng_sparse.generate(ids, gen_len=8)
    assert (np.asarray(out_sparse) >= 0).all()


def test_calibration_search_and_roundtrip(tmp_path):
    """The offline pattern search returns a usable per-head table; when
    a cheap pattern already covers the context (short prompt inside the
    stream window), the tie-break picks it. Table round-trips JSON and
    feeds RuntimeConfig.minference_patterns."""
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.calibrate import (
        calibrate_patterns,
        load_patterns,
        save_patterns,
    )
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(5).randint(0, cfg.vocab_size, (256,))
    table, errs = calibrate_patterns(
        cfg, params, ids,
        block=64, stream_sink=64,
        stream_window=256,  # covers the whole 256-token prompt
        return_errors=True,
    )
    assert len(table) == cfg.num_heads
    assert errs.shape[1] == cfg.num_heads
    # window covers everything -> stream error ~0 -> tie-break picks it
    assert all(t[0] == "stream_llm" for t in table), table

    p = tmp_path / "patterns.json"
    save_patterns(table, str(p))
    assert load_patterns(str(p)) == table

    # the table drives the engine
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=64, rank=32,
            outlier_chunks=4,
        ),
        RuntimeConfig(
            prefill_pattern="vs", minference_patterns=table,
            vs_block=64, stream_sink=64, stream_window=256,
        ),
        params,
    )
    out, _ = eng.generate(ids[None], gen_len=4)
    assert out.shape == (1, 4)
