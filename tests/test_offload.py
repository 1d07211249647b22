"""Offloaded V store: native host gather + io_callback decode path.

The offload engine must produce exactly the tokens of the HBM-resident
shadow engine — V rows are fetched from host DRAM bit-for-bit
(reference parity contract for ShadowKVCache_CPU vs ShadowKVCache)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config
from shadowkv_tpu.native import gather_rows, have_native


def test_native_gather_rows():
    rng = np.random.RandomState(0)
    src = np.ascontiguousarray(rng.randn(64, 8, 16).astype(np.float32))
    idx = rng.randint(0, 64, 40).astype(np.int64)
    out = gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_native_gather_rows_masked():
    rng = np.random.RandomState(1)
    src = np.ascontiguousarray(rng.randn(32, 4, 8).astype(np.float32))
    idx = rng.randint(0, 32, 16).astype(np.int64)
    skip = rng.rand(16) > 0.5
    out = np.zeros((16, 4, 8), np.float32)
    gather_rows(src, idx, skip=skip, out=out)
    np.testing.assert_array_equal(out[~skip], src[idx[~skip]])
    np.testing.assert_array_equal(out[skip], 0.0)


def test_native_library_builds():
    # The C++ library should compile in this environment (g++ present).
    assert have_native(), "libhost_gather.so failed to build/load"


def test_offload_engine_matches_hbm_engine():
    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    rt = RuntimeConfig(prefill_sub_batch=2, prefill_block_q=128)
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (2, 512))
    outs = {}
    for mode in ("shadow", "shadow_offload"):
        cc = CacheConfig(
            mode=mode, max_length=512, sparse_budget=64, rank=32,
            outlier_chunks=4, gen_capacity=32,
        )
        eng = Engine(cfg, cc, rt, params)
        toks, _ = eng.generate(ids, gen_len=12, temperature=0.0)
        outs[mode] = toks
    np.testing.assert_array_equal(outs["shadow"], outs["shadow_offload"])


@pytest.mark.slow
def test_ring_offload_engine_matches_hbm_engine():
    """shadow_offload + ring_gather: the V store stays a cache leaf in
    pinned host memory and the ring kernel fetches selected chunks —
    same tokens as the HBM engine, for bf16 and int8 stores (the
    io_callback path can't serve int8; the ring path can)."""
    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    ids = np.random.RandomState(2).randint(1, cfg.vocab_size, (2, 512))
    for quant in ("none", "int8"):
        outs = {}
        for mode, ring in (("shadow", False), ("shadow_offload", True)):
            cc = CacheConfig(
                mode=mode, max_length=512, sparse_budget=64, rank=32,
                outlier_chunks=4, gen_capacity=32, kv_quant=quant,
            )
            rt = RuntimeConfig(
                prefill_sub_batch=2, prefill_block_q=128,
                ring_gather=ring,
            )
            eng = Engine(cfg, cc, rt, params)
            if mode == "shadow_offload":
                assert eng.ring_host and eng.v_store is None
            toks, _ = eng.generate(ids, gen_len=12, temperature=0.0)
            outs[mode] = toks
        np.testing.assert_array_equal(
            outs["shadow"], outs["shadow_offload"], err_msg=quant
        )


@pytest.mark.slow
def test_fused_kernel_offload_matches_hbm_kernel_engine():
    """shadow_offload + use_pallas: hit-reuse + host-DMA fetch of MISS
    chunks only — the reference ShadowKVCache_CPU architecture. Engine
    tokens must match the HBM fused-kernel engine exactly (identical
    math, only the V store's memory placement differs; the kernel runs
    in interpret mode on CPU). head_dim=128 per the kernel's DMA
    contract."""
    cfg = toy_config(
        dtype=jnp.float32, head_dim=128, hidden_size=512,
        num_heads=4, num_kv_heads=2, intermediate_size=1024,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(5).randint(1, cfg.vocab_size, (2, 1024))
    outs = {}
    for mode in ("shadow", "shadow_offload"):
        cc = CacheConfig(
            mode=mode, max_length=1024, sparse_budget=128, rank=64,
            outlier_chunks=4, gen_capacity=32,
        )
        rt = RuntimeConfig(
            prefill_sub_batch=2, prefill_block_q=128, use_pallas=True,
        )
        eng = Engine(cfg, cc, rt, params)
        assert eng.use_pallas
        if mode == "shadow_offload":
            assert eng.ring_host and eng.v_store is None
        toks, _ = eng.generate(ids, gen_len=8, temperature=0.0)
        outs[mode] = toks
    np.testing.assert_array_equal(outs["shadow"], outs["shadow_offload"])


@pytest.mark.slow
def test_offload_bf16_store_layout():
    """bf16 V store layout through the incremental offload prefill: a
    bf16 chunk unit (8*128*2 = 2048 B) is NOT host-word aligned, so the
    fused-kernel (use_pallas) engine must commit the RAW chunk layout
    (sparse_refresh's contract) while the ring engine commits the
    host-ALIGNED paired-row layout. Guards the advisor-round-2
    regression where _prefill_offload_incremental aligned the store for
    EVERY ring_host engine and the fused engine's first decode step
    failed at trace time. (bf16 decode itself can't run on the CPU
    backend — DotThunk rejects BF16xBF16=F32 in the decode program —
    so this asserts the committed layout, which is the root cause.)"""
    cfg = toy_config(
        dtype=jnp.bfloat16, head_dim=128, hidden_size=512,
        num_heads=4, num_kv_heads=2, intermediate_size=1024,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(7).randint(1, cfg.vocab_size, (2, 1024))
    cs = 8
    for ring, want_ts in ((False, cs), (True, 2 * cs)):
        cc = CacheConfig(
            mode="shadow_offload", max_length=1024, sparse_budget=128,
            rank=64, outlier_chunks=4, gen_capacity=32, chunk_size=cs,
        )
        rt = RuntimeConfig(
            prefill_sub_batch=2, prefill_block_q=128,
            use_pallas=not ring, ring_gather=ring,
        )
        eng = Engine(cfg, cc, rt, params)
        assert eng.ring_host
        eng.prefill(jnp.asarray(ids, jnp.int32))
        hv = eng._host_v
        parts = hv if isinstance(hv, tuple) else (hv,)
        for p in parts:
            assert p.shape[-2] == want_ts, (ring, p.shape)
            assert p.dtype == jnp.bfloat16
