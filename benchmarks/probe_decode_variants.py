"""Bisect the round-3 decode regression on the real chip.

bench_xla_r3 measured 186.4 tok/s at b4/122K (scan + stacked-view
attention + stock ApproxTopK); bench_xla_warm measured 69.4 tok/s with
the full round-3 decode stack (trace-time layer unroll + segmented
attention + 4x-pow2 ApproxTopK override). This probe prefills ONCE and
then times each decode variant on the live cache (the cache is donated
through every step, so variants run back-to-back on the same state —
per-step cost does not depend on token values).

Variants: (unroll, segmented, topk_mult). Prints ms/step per variant.
Run: python benchmarks/probe_decode_variants.py  (TPU, one job at a time)
"""

from __future__ import annotations

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.core import selection
    from shadowkv_tpu.core.sampling import sample_token
    from shadowkv_tpu.models import forward
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    datalen = 122880
    batch = 4
    steps = 25
    cfg = toy_config(
        name="sbench-1.4b-llama", num_layers=16, hidden_size=2048,
        num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=5632, vocab_size=32768, rope_theta=500000.0,
        dtype=jnp.bfloat16,
    )
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        prefill_pattern="dense-splash",
    )
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=8, kv_quant="int8",
    )
    log(f"devices: {jax.devices()}")
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    eng = Engine(cfg, cache_cfg, rt, params)
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (batch, datalen))
    t0 = time.perf_counter()
    logits, cache = eng.prefill(ids)
    jax.block_until_ready(cache.k_buf)
    log(f"prefill (cold, compile+run): {time.perf_counter() - t0:.1f}s")

    model = eng.model
    cos_table, sin_table = eng.cos_table, eng.sin_table

    def make_step(unroll: bool, segmented: bool, mult: int):
        selection.TOPK_OVERRIDE_MULT = mult

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, cache, tokens, key):
            lg, cache = forward.decode_shadow(
                model, params, cache, tokens, cos_table, sin_table,
                approx_topk=True, unroll=unroll, segmented=segmented,
            )
            tok = sample_token(
                lg[:, -1], key, temperature=0.6, top_k=50, top_p=0.9
            )
            return tok, cache

        return step

    variants = [
        ("scan  views mult0", False, False, 0),
        ("unrl  views mult0", True, False, 0),
        ("unrl  segs  mult0", True, True, 0),
        ("unrl  segs  mult4", True, True, 4),
        ("unrl  segs  mult8", True, True, 8),
        ("scan  segs  mult0", False, True, 0),
    ]
    keys = jax.random.split(jax.random.PRNGKey(1), 512)
    ki = 0
    tok = jnp.asarray(ids[:, -1])
    results = []
    for name, unroll, segmented, mult in variants:
        step = make_step(unroll, segmented, mult)
        tc = time.perf_counter()
        # 2 warm steps (compile + settle)
        for _ in range(2):
            tok, cache = step(params, cache, tok[:, None], keys[ki])
            ki += 1
        jax.block_until_ready(tok)
        compile_s = time.perf_counter() - tc
        t1 = time.perf_counter()
        for _ in range(steps):
            tok, cache = step(params, cache, tok[:, None], keys[ki])
            ki += 1
        jax.block_until_ready(tok)
        ms = (time.perf_counter() - t1) / steps * 1000.0
        tps = batch / ms * 1000.0
        log(f"{name}: {ms:7.2f} ms/step  ({tps:6.1f} tok/s)  "
            f"[compile+warm {compile_s:.1f}s]")
        results.append((name, ms))
        # free this variant's executable before compiling the next
        # (unrolled decode programs are large)
        del step
        jax.clear_caches()
    print({n: round(m, 2) for n, m in results})


if __name__ == "__main__":
    main()
