"""Decode-step cost breakdown on the real chip.

Times the jitted shadow decode step and ablated variants to locate the
bottleneck (selection, V gather, K reconstruction, buffer updates,
attention). Run in the default (TPU) env:

    python benchmarks/prof_decode.py [datalen] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.cache.shadow import ShadowLayout
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def timeit(fn, *args, n=20, warmup=3, donate=False):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    datalen = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = toy_config(
        name="prof", num_layers=16, hidden_size=2048, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=5632,
        vocab_size=32768, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    rt = RuntimeConfig(prefill_sub_batch=1, prefill_block_q=256)
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=8,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    cos, sin = compute_cos_sin(cfg, datalen + 256)
    layout = ShadowLayout.build(cache_cfg, datalen)
    print("layout:", layout, file=sys.stderr)

    from shadowkv_tpu.models.engine import Engine
    eng = Engine(cfg, cache_cfg, rt, params)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (batch, datalen))
    t0 = time.perf_counter()
    _, cache = eng.prefill(ids)
    jax.block_until_ready(cache)
    print(f"prefill x{batch}: {time.perf_counter() - t0:.1f}s")

    tokens = jnp.ones((batch, 1), jnp.int32)

    step = jax.jit(lambda p, c, t: forward.decode_shadow(cfg, p, c, t, cos, sin))
    # NOTE: no donation here so we can reuse `cache` across timed calls.
    dt = timeit(step, params, cache, tokens)
    print(f"shadow decode step (no donation): {dt * 1e3:.2f} ms")

    # Memory analysis of the compiled step.
    lowered = jax.jit(
        lambda p, c, t: forward.decode_shadow(cfg, p, c, t, cos, sin),
        donate_argnums=(1,),
    ).lower(params, cache, tokens)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    if ma is not None:
        print(
            f"memory: args {ma.argument_size_in_bytes/1e9:.2f} GB, "
            f"output {ma.output_size_in_bytes/1e9:.2f} GB, "
            f"temp {ma.temp_size_in_bytes/1e9:.2f} GB"
        )
    txt = compiled.as_text()
    import re

    n_copy = len(re.findall(r" copy\(", txt))
    n_gather = len(re.findall(r"gather\(", txt))
    n_dus = len(re.findall(r"dynamic-update-slice", txt))
    n_while = len(re.findall(r"while\(", txt))
    print(f"hlo ops: copy={n_copy} gather={n_gather} dus={n_dus} while={n_while}")

    # Cost of one full-attention step at same batch for comparison.
    from shadowkv_tpu.cache.full import FullCache

    fc_cfg = CacheConfig(mode="full", max_length=datalen + 128)
    fcache = FullCache.init(cfg, fc_cfg, batch)
    fcache = fcache.replace(length=jnp.asarray(datalen, jnp.int32))
    fstep = jax.jit(lambda p, c, t: forward.decode_full(cfg, p, c, t, cos, sin))
    dtf = timeit(fstep, params, fcache, tokens)
    print(f"full decode step (no donation): {dtf * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
