"""Sharded decode over a virtual (dp, tp) mesh (8 CPU devices).

Validates the multi-chip design from SURVEY.md §7.0: GQA KV heads +
SV factors + landmarks + buffers sharded on tp, batch on dp, U
replicated over tp — and that the sharded sparse decode step produces
the same logits as the unsharded one.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config
from shadowkv_tpu.parallel import mesh as mesh_lib

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _build(batch, prefill_len=256, tp=4, quant="none",
           kernel_store=False, head_dim=32):
    cfg = toy_config(
        num_layers=2, hidden_size=8 * head_dim, num_heads=8,
        num_kv_heads=tp, head_dim=head_dim,
        intermediate_size=16 * head_dim, vocab_size=512,
        dtype=jnp.float32,
    )
    rt = RuntimeConfig(prefill_block_q=128)
    cc = CacheConfig(mode="shadow", max_length=prefill_len,
                     sparse_budget=64, rank=32, outlier_chunks=4,
                     gen_capacity=32, kv_quant=quant)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.1)
    cos, sin = compute_cos_sin(cfg, prefill_len + cc.gen_capacity)
    ids = jax.random.randint(
        jax.random.PRNGKey(1), (batch, prefill_len), 0, cfg.vocab_size
    )
    layout = ShadowLayout.build(cc, prefill_len, kernel_store=kernel_store)
    _, cache = jax.jit(
        forward.prefill_shadow, static_argnums=(0, 1, 2)
    )(cfg, rt, layout, params, ids, cos, sin)
    return cfg, params, cache, cos, sin


@pytest.mark.parametrize(
    "quant", ["none", pytest.param("int8", marks=pytest.mark.slow)]
)
def test_sharded_decode_matches_unsharded(quant):
    """Covers the bench configuration too: int8 stores (whose leaves
    change rank — tiled U, flat V rows) shard under the same pspec
    rules (trailing dims replicate)."""
    tp, dp = 4, 2
    batch = 2 * dp
    cfg, params, cache, cos, sin = _build(batch, tp=tp, quant=quant)
    tokens = jnp.ones((batch, 1), jnp.int32)

    step = jax.jit(
        lambda p, c, t: forward.decode_shadow(cfg, p, c, t, cos, sin)
    )
    ref_logits, ref_cache = step(params, cache, tokens)

    mesh = mesh_lib.build_mesh(dp, tp)
    params_s = mesh_lib.shard_pytree(
        mesh, params, mesh_lib.param_pspecs(params)
    )
    cache_s = mesh_lib.shard_pytree(
        mesh, cache, mesh_lib.shadow_cache_pspecs(cache)
    )
    tokens_s = jax.device_put(
        tokens, NamedSharding(mesh, P("dp", None))
    )
    logits_s, cache_s2 = step(params_s, cache_s, tokens_s)

    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(logits_s), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.k_buf), np.asarray(cache_s2.k_buf),
        rtol=2e-4, atol=2e-4,
    )
    # Sharding survived the step (buffers stay tp/dp-sharded).
    spec = cache_s2.k_buf.sharding.spec
    assert "tp" in str(spec) and "dp" in str(spec)


@pytest.mark.parametrize(
    "path,quant",
    [
        ("ring", "none"),
        pytest.param("ring", "int8", marks=pytest.mark.slow),
        pytest.param("fused", "none", marks=pytest.mark.slow),
        pytest.param("fused", "int8", marks=pytest.mark.slow),
    ],
)
def test_sharded_pallas_decode_matches_unsharded(path, quant):
    """The Pallas decode paths (ring-DMA gather / fused refresh) run
    inside shard_map islands under a (dp, tp) mesh — GSPMD cannot
    partition a pallas_call, so shadow_decode_layer wraps them with
    B on dp and KV heads on tp. Sharded logits must equal unsharded."""
    tp, dp = 4, 2
    batch = 2 * dp
    kernel_store = quant == "int8"
    # The fused refresh kernel requires lane-aligned heads (Dh % 128).
    head_dim = 128 if path == "fused" else 32
    cfg, params, cache, cos, sin = _build(
        batch, tp=tp, quant=quant, kernel_store=kernel_store,
        head_dim=head_dim,
    )
    tokens = jnp.ones((batch, 1), jnp.int32)
    kwargs = (
        dict(ring_gather=True) if path == "ring" else dict(use_kernel=True)
    )

    ref_step = jax.jit(
        lambda p, c, t: forward.decode_shadow(
            cfg, p, c, t, cos, sin, **kwargs
        )
    )
    ref_logits, ref_cache = ref_step(params, cache, tokens)

    mesh = mesh_lib.build_mesh(dp, tp)
    params_s = mesh_lib.shard_pytree(
        mesh, params, mesh_lib.param_pspecs(params)
    )
    cache_s = mesh_lib.shard_pytree(
        mesh, cache, mesh_lib.shadow_cache_pspecs(cache)
    )
    tokens_s = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))
    step_s = jax.jit(
        lambda p, c, t: forward.decode_shadow(
            cfg, p, c, t, cos, sin, mesh=mesh, **kwargs
        )
    )
    logits_s, cache_s2 = step_s(params_s, cache_s, tokens_s)

    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(logits_s), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ref_cache.k_buf), np.asarray(cache_s2.k_buf),
        rtol=2e-4, atol=2e-4,
    )
    spec = cache_s2.k_buf.sharding.spec
    assert "tp" in str(spec) and "dp" in str(spec)


@pytest.mark.parametrize(
    "quant,ring",
    [
        ("none", False),
        pytest.param("int8", True, marks=pytest.mark.slow),
    ],
)
def test_engine_mesh_generation_matches_single(quant, ring):
    """Engine-level multi-chip: RuntimeConfig(dp, tp) builds the mesh,
    shards weights at init and caches at prefill; generation (XLA path
    and ring-Pallas path) must produce the single-device tokens."""
    from shadowkv_tpu.models.engine import Engine

    cfg = toy_config(
        num_layers=2, hidden_size=256, num_heads=8, num_kv_heads=4,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32, kv_quant=quant,
    )
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (4, 256))

    def run(dp, tp):
        rt = RuntimeConfig(
            prefill_block_q=64, dp=dp, tp=tp, ring_gather=ring
        )
        eng = Engine(cfg, cc, rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out, eng

    ref, _ = run(1, 1)
    got, eng = run(2, 4)
    assert eng.mesh is not None and eng.mesh.shape == {"dp": 2, "tp": 4}
    np.testing.assert_array_equal(ref, got)


def test_full_cache_sharded_decode():
    tp, dp = 4, 2
    batch = dp
    cfg = toy_config(
        num_layers=2, hidden_size=256, num_heads=8, num_kv_heads=tp,
        head_dim=32, intermediate_size=512, vocab_size=512,
        dtype=jnp.float32,
    )
    from shadowkv_tpu.cache.full import FullCache

    cc = CacheConfig(mode="full", max_length=128)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.1)
    cos, sin = compute_cos_sin(cfg, 256)
    cache = FullCache.init(cfg, cc, batch)
    ids = jax.random.randint(jax.random.PRNGKey(1), (batch, 64), 0, 512)
    logits, cache = jax.jit(
        forward.prefill_full, static_argnums=(0, 1, 5)
    )(cfg, RuntimeConfig(), params, cache, ids, 0, cos, sin, 0)

    mesh = mesh_lib.build_mesh(dp, tp)
    params_s = mesh_lib.shard_pytree(
        mesh, params, mesh_lib.param_pspecs(params)
    )
    cache_s = mesh_lib.shard_pytree(
        mesh, cache, mesh_lib.full_cache_pspecs(cache)
    )
    tokens = jnp.ones((batch, 1), jnp.int32)
    step = jax.jit(
        lambda p, c, t: forward.decode_full(cfg, p, c, t, cos, sin)
    )
    ref_logits, _ = step(params, cache, tokens)
    logits_s, _ = step(
        params_s, cache_s,
        jax.device_put(tokens, NamedSharding(mesh, P("dp", None))),
    )
    np.testing.assert_allclose(
        np.asarray(ref_logits), np.asarray(logits_s), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
@pytest.mark.parametrize("ring", [False, True])
def test_engine_mesh_offload_generation_matches_single(ring):
    """Multi-chip + host-offloaded V: the whole-batch prefill path
    offloads the dp/tp-sharded store (ring: pinned NamedSharding;
    io_callback: host rows) and generation must match single-device
    offload tokens."""
    from shadowkv_tpu.models.engine import Engine

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
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (4, 256))

    def run(dp, tp):
        rt = RuntimeConfig(
            prefill_block_q=64, dp=dp, tp=tp, ring_gather=ring
        )
        eng = Engine(cfg, cc, rt, params)
        out, _ = eng.generate(ids, gen_len=8)
        return out

    ref = run(1, 1)
    got = run(2, 4)
    np.testing.assert_array_equal(ref, got)
