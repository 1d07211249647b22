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


@pytest.mark.slow
def test_dynamic_matches_static_mixed(rng):
    """The traced-pattern path (per-layer variant) must reproduce the
    static per-head dispatch exactly for every supported kind mix —
    same flags, same metadata, same attention."""
    b, s, h, kh, dh = 2, 512, 4, 2, 64
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, s, h, dh), jnp.float32)
    k = jax.random.normal(ks[1], (b, s, kh, dh), jnp.float32)
    v = jax.random.normal(ks[2], (b, s, kh, dh), jnp.float32)
    patterns = [
        ("vertical_and_slash", 64, 64),
        ("vertical_and_slash", 100, 80),
        "stream_llm",
        "dense",
    ]
    kw = dict(block=128, stream_sink=128, stream_window=128)
    want = mi.minference_prefill(
        q, k, v, patterns=patterns, use_kernel=False, **kw
    )
    kinds = jnp.asarray([0, 0, 1, 2], jnp.int32)
    vsz = jnp.asarray([64, 100, 0, 0], jnp.int32)
    ssz = jnp.asarray([64, 80, 0, 0], jnp.int32)
    got = mi.minference_prefill_dynamic(
        q, k, v, kinds, vsz, ssz, v_cap=100, s_cap=80,
        use_kernel=False, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    # kernel path (interpret) agrees too
    got_k = mi.minference_prefill_dynamic(
        q, k, v, kinds, vsz, ssz, v_cap=100, s_cap=80,
        use_kernel=True, interpret=True, **kw,
    )
    np.testing.assert_allclose(
        np.asarray(got_k), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_patterns_to_arrays():
    kinds, vs, ss, v_cap, s_cap = mi.patterns_to_arrays(
        (
            (("vertical_and_slash", 64, 64), "dense"),
            (("vertical_and_slash", 128, 90), "stream_llm"),
        ),
        num_heads=2, num_layers=2, vertical_size=1000, slash_size=6144,
    )
    np.testing.assert_array_equal(kinds, [[0, 2], [0, 1]])
    assert v_cap == 128 and s_cap == 90
    with pytest.raises(ValueError, match="block_sparse"):
        mi.patterns_to_arrays(
            (("block_sparse",),), num_heads=1, num_layers=1,
            vertical_size=10, slash_size=10,
        )


@pytest.mark.slow
def test_per_layer_table_through_engine():
    """A per-layer pattern table whose rows are all identical must be
    bit-exact with the uniform static table through the full engine
    (the table rides the prefill layer scan as traced xs); a table with
    genuinely different rows matches a per-layer Python-loop oracle."""
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
    h = cfg.num_heads
    row = tuple(
        ("vertical_and_slash", 64, 64) if i % 2 else "stream_llm"
        for i in range(h)
    )
    kw = dict(vs_block=64, stream_sink=64, stream_window=128)

    eng_static = Engine(
        cfg, cache_cfg,
        RuntimeConfig(prefill_pattern="vs", minference_patterns=row, **kw),
        params,
    )
    out_static, _ = eng_static.generate(ids, gen_len=6)

    table = tuple(row for _ in range(cfg.num_layers))
    eng_dyn = Engine(
        cfg, cache_cfg,
        RuntimeConfig(
            prefill_pattern="vs", minference_layer_patterns=table, **kw
        ),
        params,
    )
    out_dyn, _ = eng_dyn.generate(ids, gen_len=6)
    np.testing.assert_array_equal(
        np.asarray(out_dyn), np.asarray(out_static)
    )


def test_per_layer_table_matches_layer_loop_oracle(rng):
    """Different rows per layer: the scanned traced-pattern prefill
    must match a Python loop that applies each layer's STATIC table."""
    from shadowkv_tpu.core import rope as rope_lib
    from shadowkv_tpu.models.forward import (
        _finalize, _layer_qkv, _layer_tail, _minference_ctx, _pattern_xs,
    )
    from shadowkv_tpu.config import RuntimeConfig
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32, num_layers=2)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(1), scale=0.2)
    s = 256
    ids = jnp.asarray(
        np.random.RandomState(7).randint(0, cfg.vocab_size, (1, s))
    )
    h = cfg.num_heads
    row_a = tuple(("vertical_and_slash", 40, 60) for _ in range(h))
    row_b = ("dense",) * (h // 2) + ("stream_llm",) * (h - h // 2)
    table = (row_a, row_b)
    kw = dict(vs_block=64, stream_sink=64, stream_window=128)
    rt = RuntimeConfig(
        prefill_pattern="vs", minference_layer_patterns=table, **kw
    )

    cos_t, sin_t = rope_lib.compute_cos_sin(cfg, s, dtype=jnp.float32)
    cos, sin = cos_t[:s], sin_t[:s]

    # oracle: python loop, static per-layer tables (the tile dispatch —
    # token-granular verticals — matching the production vs_impl default)
    x = jnp.take(params.embed, ids, axis=0).astype(cfg.dtype)
    for li, tbl in enumerate(table):
        lp = jax.tree_util.tree_map(lambda a: a[li], params.layers)
        q, k_r, _, v = _layer_qkv(cfg, lp, x, cos, sin)
        ctx = mi.minference_prefill_tile(
            q, k_r, v, patterns=tbl, block=64,
            stream_sink=64, stream_window=128, tile=rt.vs_tile,
            use_kernel=False,
        )
        x = _layer_tail(lp, cfg, x, ctx)
    want = _finalize(cfg, params, x, last_only=True)

    # scanned traced-pattern path
    pat_xs, caps = _pattern_xs(rt, cfg)
    x = jnp.take(params.embed, ids, axis=0).astype(cfg.dtype)

    def body(x, inputs):
        _layer, lp, pat = inputs
        q, k_r, _, v = _layer_qkv(cfg, lp, x, cos, sin)
        ctx = _minference_ctx(rt, q, k_r, v, False, pat, caps)
        return _layer_tail(lp, cfg, x, ctx), None

    xs = (jnp.arange(cfg.num_layers), params.layers, pat_xs)
    x, _ = jax.lax.scan(body, x, xs)
    got = _finalize(cfg, params, x, last_only=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_calibration_per_layer_and_roundtrip(tmp_path):
    """per_layer=True emits one table per layer (per-layer winners, no
    averaging) that round-trips the reference-shaped JSON (a
    layer-indexed list of head dicts) and drives the engine."""
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.calibrate import (
        calibrate_patterns, load_patterns, save_patterns,
    )
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(5).randint(0, cfg.vocab_size, (256,))
    table = calibrate_patterns(
        cfg, params, ids, block=64, stream_sink=64, stream_window=256,
        per_layer=True,
    )
    assert len(table) == cfg.num_layers
    assert all(len(row) == cfg.num_heads for row in table)

    p = tmp_path / "patterns_layer.json"
    save_patterns(table, str(p))
    assert load_patterns(str(p)) == table

    # per-layer rows mixing bare kind strings with tuples must still be
    # detected as per-layer (regression: table[0][0]=='dense' is a str)
    mixed = (
        ("dense", ("vertical_and_slash", 64, 64)),
        ("stream_llm", "dense"),
    )
    p2 = tmp_path / "patterns_mixed.json"
    save_patterns(mixed, str(p2))
    assert load_patterns(str(p2)) == mixed

    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=64, rank=32,
            outlier_chunks=4,
        ),
        RuntimeConfig(
            prefill_pattern="vs", minference_layer_patterns=table,
            vs_block=64, stream_sink=64, stream_window=256,
        ),
        params,
    )
    out, _ = eng.generate(ids[None], gen_len=4)
    assert out.shape == (1, 4)


@pytest.mark.slow
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


def test_sim_clustered_scores(rng):
    """vs_sim='clustered' (benchmark-only): simulated slash scores
    concentrate near the diagonal, verticals pick a hot-token subset,
    and the prefill pipeline runs end-to-end with the sim installed."""
    b, hm, s = 1, 2, 1024
    k1, k2, k3 = jax.random.split(rng, 3)
    vert_est = jax.random.normal(k1, (b, hm, s), jnp.float32)
    slash_est = jax.random.normal(k2, (b, hm, s), jnp.float32)
    vert_est = vert_est.at[:, :, :30].set(jnp.inf)
    slash_est = slash_est.at[:, :, :100].set(jnp.inf)
    vt, sl = mi.sim_vs_scores("clustered", vert_est, slash_est)
    # forced regions survive the blend as +inf
    assert bool(jnp.isinf(vt[:, :, :30]).all())
    assert bool(jnp.isinf(sl[:, :, :100]).all())
    # top-k slashes cluster near the diagonal (small d): with a /2048
    # decay and 0.2 sigma noise, the top 64 of 1024 live in the first
    # ~half even at this small scale
    _, s_idx = jax.lax.top_k(sl[0, 0], 64)
    assert float(jnp.median(s_idx)) < s / 2, s_idx

    # e2e: the oracle path runs with the sim installed
    h, kh, dh = 4, 2, 32
    kq, kk, kv2 = jax.random.split(k3, 3)
    q = jax.random.normal(kq, (1, 256, h, dh), jnp.float32)
    k = jax.random.normal(kk, (1, 256, kh, dh), jnp.float32)
    v = jax.random.normal(kv2, (1, 256, kh, dh), jnp.float32)
    out = mi.minference_prefill_tile(
        q, k, v, vertical_size=64, slash_size=64, block=64, tile=64,
        use_kernel=False, sim="clustered",
    )
    assert out.shape == q.shape
    assert bool(jnp.isfinite(out).all())
