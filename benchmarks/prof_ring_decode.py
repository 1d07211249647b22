"""Ring-DMA gather vs XLA gather on the decode step, without prefill.

Builds a structurally-valid synthetic ShadowCache directly (random
stores — decode-step cost does not depend on cache values) and times
the jitted decode step for both RuntimeConfig gather paths at the
bench config. Run in the default (TPU) env:

    python benchmarks/prof_ring_decode.py [datalen] [batch] [quant]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
from shadowkv_tpu.config import CacheConfig
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def rand_like_tree(cache, key):
    """Fill array leaves with random bits of the right dtype/shape."""
    leaves, treedef = jax.tree.flatten(cache)
    out = []
    for i, leaf in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        if leaf.dtype == jnp.int8:
            out.append(
                jax.random.randint(k, leaf.shape, -20, 20, jnp.int32).astype(jnp.int8)
            )
        elif leaf.dtype == jnp.bool_:
            out.append(jnp.ones(leaf.shape, jnp.bool_))
        elif jnp.issubdtype(leaf.dtype, jnp.integer):
            out.append(jnp.zeros(leaf.shape, leaf.dtype))
        else:
            out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * 0.05)
    return jax.tree.unflatten(treedef, out)


def main():
    datalen = int(sys.argv[1]) if len(sys.argv) > 1 else 122880
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    quant = sys.argv[3] if len(sys.argv) > 3 else "int8"
    cfg = toy_config(
        name="prof", num_layers=16, hidden_size=2048, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=5632,
        vocab_size=32768, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=8, kv_quant=quant,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    cos, sin = compute_cos_sin(cfg, datalen + 256)
    tokens = jnp.ones((batch, 1), jnp.int32)
    key = jax.random.PRNGKey(7)

    for label, ring in (("xla ", False), ("ring", True)):
        layout = ShadowLayout.build(cache_cfg, datalen, kernel_store=ring)
        cache = rand_like_tree(
            ShadowCache.init(cfg, layout, batch), key
        )
        step = jax.jit(
            lambda p, c, t, ring=ring: forward.decode_shadow(
                cfg, p, c, t, cos, sin, ring_gather=ring,
                approx_topk=True,
            )
        )
        dt = timeit(step, params, cache, tokens)
        print(f"{label} gather decode step: {dt * 1e3:.2f} ms")
        del cache


if __name__ == "__main__":
    main()
