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


def timeit_donated(step, params, cache, tokens, n=20, warmup=3):
    """Time a (logits, cache)-returning step whose cache arg is donated:
    the cache is threaded through every call so device memory holds one
    copy, not input+output."""
    for _ in range(warmup):
        logits, cache = step(params, cache, tokens)
    jax.block_until_ready((logits, cache))
    t0 = time.perf_counter()
    for _ in range(n):
        logits, cache = step(params, cache, tokens)
    jax.block_until_ready((logits, cache))
    return (time.perf_counter() - t0) / n, cache


def rand_like_tree(shape_tree, seed):
    """Fill array leaves with random host-generated bits, device_put one
    leaf at a time (never two full device trees at once — the cache is
    11.3 GiB at the bench config and this probe OOM'd holding init +
    randomized copies simultaneously). Takes a ShapeDtypeStruct tree."""
    leaves, treedef = jax.tree.flatten(shape_tree)
    rng = np.random.default_rng(seed)
    out = []
    for leaf in leaves:
        if leaf.dtype == jnp.int8:
            a = rng.integers(-20, 20, leaf.shape, dtype=np.int8)
        elif leaf.dtype == jnp.bool_:
            a = np.ones(leaf.shape, np.bool_)
        elif jnp.issubdtype(leaf.dtype, jnp.integer):
            a = np.zeros(leaf.shape, np.dtype(leaf.dtype))
        else:
            a = (rng.standard_normal(leaf.shape, np.float32) * 0.05).astype(
                jnp.dtype(leaf.dtype)
            )
        out.append(jax.device_put(a))
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

    for label, ring in (("xla ", False), ("ring", True)):
        layout = ShadowLayout.build(cache_cfg, datalen, kernel_store=ring)
        cache_shape = jax.eval_shape(
            lambda: ShadowCache.init(cfg, layout, batch)
        )
        cache = rand_like_tree(cache_shape, 7)
        step = jax.jit(
            lambda p, c, t, ring=ring: forward.decode_shadow(
                cfg, p, c, t, cos, sin, ring_gather=ring,
                approx_topk=True,
            ),
            donate_argnums=(1,),
        )
        dt, cache = timeit_donated(step, params, cache, tokens)
        print(f"{label} gather decode step: {dt * 1e3:.2f} ms")
        del cache


if __name__ == "__main__":
    main()
