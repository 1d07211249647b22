"""Ring-DMA chunk-gather kernel (kernels/gather.py) in interpret mode.

Checks the pipelined-DMA gather against a plain jnp indexing reference
over both store layouts (bf16 chunk-major, int8 (32, row) tiles), then
that the engine's ring_gather decode path produces the same greedy
tokens as the XLA gather path (different store layouts, same bytes —
tests/test_quant.py proves the layouts hold identical chunk data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.kernels.gather import (
    gather_chunks,
    gather_chunks_reference,
)


@pytest.mark.parametrize(
    "dtype,tile_sub",
    [(jnp.float32, 8), (jnp.int8, 32)],
    ids=["f32-chunk-rows", "int8-tiled"],
)
def test_gather_chunks_matches_reference(dtype, tile_sub):
    l, b, kh, s, cs = 3, 2, 4, 24, 8
    c, wu, wv = 40, 256, 128
    ct = c // (tile_sub // cs)
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    if dtype == jnp.int8:
        u = jax.random.randint(ks[0], (l, b, ct, tile_sub, wu), -127, 128, jnp.int32).astype(dtype)
        v = jax.random.randint(ks[1], (l, b, kh, ct, tile_sub, wv), -127, 128, jnp.int32).astype(dtype)
    else:
        u = jax.random.normal(ks[0], (l, b, ct, tile_sub, wu), dtype)
        v = jax.random.normal(ks[1], (l, b, kh, ct, tile_sub, wv), dtype)
    ids = jax.random.randint(ks[2], (b, kh, s), 0, c, jnp.int32)
    layer = jnp.int32(1)

    u_got, v_got = gather_chunks(
        layer, ids, u, v, chunk_size=cs, tile_sub=tile_sub,
        interpret=True,
    )
    u_ref, v_ref = gather_chunks_reference(
        layer, ids, u, v, chunk_size=cs, tile_sub=tile_sub
    )
    np.testing.assert_array_equal(np.asarray(u_got), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))


@pytest.mark.parametrize(
    "dtype,tile_sub,nparts,axis",
    [
        (jnp.int8, 32, 1, "batch"),
        (jnp.int8, 32, 2, "batch"),
        (jnp.int8, 32, 3, "layer"),
        (jnp.float32, 8, 1, "batch"),  # f32 rows pair like bf16 would
        (jnp.bfloat16, 8, 2, "batch"),  # paired 16-row host units
    ],
    ids=["i8-host", "i8-slot-parts", "i8-layer-parts", "f32-host",
         "bf16-host-paired"],
)
def test_gather_chunks_host_path(dtype, tile_sub, nparts, axis):
    """The host-V split path (device U ring + host V ring over
    4096-B-aligned units, kernels/gather.py): same outputs as the
    reference over single and sharded part stores."""
    from shadowkv_tpu.models.engine import Engine

    l, b, kh, s, cs = 3, 2, 4, 24, 8
    c, wu, wv = 48, 256, 128
    ct = c // (tile_sub // cs)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    if dtype == jnp.int8:
        u = jax.random.randint(ks[0], (l, b, ct, tile_sub, wu), -127, 128, jnp.int32).astype(dtype)
        v = jax.random.randint(ks[1], (l, b, kh, ct, tile_sub, wv), -127, 128, jnp.int32).astype(dtype)
    else:
        u = jax.random.normal(ks[0], (l, b, ct, tile_sub, wu), dtype)
        v = jax.random.normal(ks[1], (l, b, kh, ct, tile_sub, wv), dtype)
    ids = jax.random.randint(ks[2], (b, kh, s), 0, c, jnp.int32)
    layer = jnp.int32(2)

    u_ref, v_ref = gather_chunks_reference(
        layer, ids, u, v, chunk_size=cs, tile_sub=tile_sub
    )
    va = Engine._host_aligned(v)
    if nparts == 1:
        parts = (va,)
    elif axis == "batch":
        parts = tuple(va[:, i : i + 1] for i in range(va.shape[1]))
    else:
        seg = l // nparts
        parts = tuple(
            va[i * seg : (i + 1) * seg] for i in range(nparts)
        )
    u_got, v_got = gather_chunks(
        layer, ids, u, parts, chunk_size=cs, tile_sub=tile_sub,
        host_v=True, host_axis=axis, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(u_got), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))


@pytest.mark.parametrize(
    "quant", [pytest.param("none", marks=pytest.mark.slow), "int8"]
)
def test_engine_ring_gather_matches_xla_path(quant):
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, kv_quant=quant,
    )
    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 256))

    out_xla, _ = Engine(
        cfg, cc, RuntimeConfig(prefill_block_q=64), params
    ).generate(ids, gen_len=8)
    out_ring, _ = Engine(
        cfg, cc, RuntimeConfig(prefill_block_q=64, ring_gather=True),
        params,
    ).generate(ids, gen_len=8)
    np.testing.assert_array_equal(out_xla, out_ring)
