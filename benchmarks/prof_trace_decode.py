"""Per-HLO-op attribution of the REAL decode step at the bench config.

Runs the engine's own decode program (donated cache, sampling included)
under jax.profiler for ~40 steps and prints the top ops by device time
(utils/profiling.top_ops). This is the targeting data for decode-step
optimization: the coarse breakdown (prof_ablate) says WHICH component,
this says WHICH op inside it.

Env: PROF_DATALEN (122880), PROF_BATCH (4), PROF_QUANT (int8).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config
    from shadowkv_tpu.utils.profiling import top_ops

    datalen = int(os.environ.get("PROF_DATALEN", 122880))
    batch = int(os.environ.get("PROF_BATCH", 4))
    quant = os.environ.get("PROF_QUANT", "int8")
    cfg = toy_config(
        name="prof-1.4b", num_layers=16, hidden_size=2048,
        num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=5632, vocab_size=32768,
        rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        prefill_pattern="dense-splash",
    )
    cc = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160,
        chunk_size=int(os.environ.get("BENCH_CHUNK_SIZE", "8")),
        kv_quant=quant,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    eng = Engine(cfg, cc, rt, params)
    ids = np.random.RandomState(1).randint(
        0, cfg.vocab_size, (batch, datalen)
    )
    t0 = time.perf_counter()
    _, cache = eng.prefill(ids)
    jax.block_until_ready(cache)
    print(f"prefill: {time.perf_counter() - t0:.1f}s", flush=True)

    # drive the engine's real decode jit directly so the trace holds
    # ONLY decode steps (batch_generate would put the 90 s prefill in
    # the same trace and drown the per-step ops)
    tokens = jnp.ones((batch, 1), jnp.int32)
    key = jax.random.PRNGKey(0)
    sample = (0.6, 0, 1.0)

    def step(cache, tokens, key):
        key, sub = jax.random.split(key)
        toks, cache = eng._decode_shadow(
            eng.params, cache, tokens, sub, *sample
        )
        return cache, toks.reshape(batch, 1), key

    for _ in range(4):  # warmup/compile
        cache, tokens, key = step(cache, tokens, key)
    jax.block_until_ready(tokens)

    n = 40
    logdir = "/tmp/prof_decode_trace"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(n):
            cache, tokens, key = step(cache, tokens, key)
        jax.block_until_ready(tokens)
    dt = (time.perf_counter() - t0) / n
    print(
        f"decode: {dt*1e3:.2f} ms/step -> {batch/dt:.1f} tok/s",
        flush=True,
    )
    for ms, n, name in top_ops(logdir, limit=40):
        print(f"{ms:9.2f} ms  x{n:<5d} {name[:110]}", flush=True)

    # round-5 grouped views: device-only, unroll-suffix-proof — the
    # tables the README step-anatomy quotes
    from shadowkv_tpu.utils.profiling import (
        op_table, print_op_table, program_table,
    )

    print("\n-- programs --", flush=True)
    for r in program_table(logdir):
        print(r, flush=True)
    step_ms = next(
        (r["ms_per_call"] for r in program_table(logdir)
         if "decode" in r["key"]), None,
    )
    tot = step_ms * n if step_ms else None
    print("\n-- by source line --", flush=True)
    print_op_table(op_table(logdir, by="source", limit=20), tot)
    print("\n-- by hlo category --", flush=True)
    print_op_table(op_table(logdir, by="category", limit=12), tot)


if __name__ == "__main__":
    main()
