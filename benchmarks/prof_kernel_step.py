"""Profile the shadow decode step (kernel vs XLA path) at the bench
config: 122K ctx, batch 3, int8 stores, steady-state hit rate.

    python benchmarks/prof_kernel_step.py [datalen] [batch] [mode]
mode: both | kernel | xla
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def main():
    datalen = int(sys.argv[1]) if len(sys.argv) > 1 else 122880
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    trace = os.environ.get("PROF_TRACE", "") == "1"
    cfg = toy_config(
        name="prof", num_layers=16, hidden_size=2048, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=5632,
        vocab_size=32768, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=8, kv_quant="int8",
    )
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (batch, datalen))

    variants = (
        [("kernel", True), ("xla", False)] if mode == "both"
        else [(mode, mode == "kernel")]
    )
    for name, up in variants:
        rt = RuntimeConfig(
            prefill_sub_batch=1, prefill_block_q=256, use_pallas=up
        )
        eng = Engine(cfg, cache_cfg, rt, params)
        t0 = time.perf_counter()
        logits, cache = eng.prefill(ids)
        jax.block_until_ready(cache)
        print(f"[{name}] prefill: {time.perf_counter() - t0:.1f}s",
              flush=True)

        key = jax.random.PRNGKey(0)
        tokens = jnp.ones((batch,), jnp.int32)
        sargs = (0.6, 50, 0.9)

        def step(c, t, k):
            return eng._decode_shadow(params, c, t[:, None], k, *sargs)

        # settle to steady-state hits + compile
        for _ in range(8):
            key, sub = jax.random.split(key)
            tokens, cache = step(cache, tokens, sub)
        jax.block_until_ready(tokens)

        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            tokens, cache = step(cache, tokens, sub)
        jax.block_until_ready(tokens)
        dt = (time.perf_counter() - t0) / n
        print(f"[{name}] decode step: {dt * 1e3:.2f} ms", flush=True)

        if trace:
            from shadowkv_tpu.utils.profiling import top_ops

            tdir = f"/tmp/prof_kernel_{name}"
            with jax.profiler.trace(tdir):
                for _ in range(5):
                    key, sub = jax.random.split(key)
                    tokens, cache = step(cache, tokens, sub)
                jax.block_until_ready(tokens)
            print(f"[{name}] top ops:")
            for ms, count, op in top_ops(tdir, limit=20):
                print(f"    {ms:8.2f} ms x{count:4d}  {op}")
        del eng, cache
        import gc

        gc.collect()


if __name__ == "__main__":
    main()
