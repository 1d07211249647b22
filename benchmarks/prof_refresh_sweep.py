"""Kernel-vs-XLA decode crossover sweep over FORCED hit rates.

The fused refresh kernel's win condition is temporal selection
locality; synthetic bench weights give ~3 % hits and the trained tiny
model measures 45.7 %, but neither can DIAL the rate. This harness uses
RuntimeConfig.debug_hit_rate (cache/shadow.py forced sliding-window
selection: step-to-step overlap == the requested rate by construction)
to measure ms/step for both decode paths across the whole locality
axis in ONE process: prefill once per path, then mutate
engine._debug_hit_rate and clear the decode jit cache per point (a
~30 s retrace each instead of an unusable multi-GB state reload
through the tunnel).

    python benchmarks/prof_refresh_sweep.py [datalen] [batch]

Env: SWEEP_RATES (comma floats, default 0.30,0.45,0.60,0.75,0.90,0.98),
SWEEP_LAYOUT (scatter|contig), SWEEP_PATHS (xla,kernel),
BENCH_CHUNK_SIZE (8|16), SWEEP_STEPS (timed steps, default 30).

Output: one JSON line per (path, rate) with ms/step; a final summary
line names the crossover rate.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    datalen = int(sys.argv[1]) if len(sys.argv) > 1 else 122880
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    rates = [
        float(x)
        for x in os.environ.get(
            "SWEEP_RATES", "0.30,0.45,0.60,0.75,0.90,0.98"
        ).split(",")
    ]
    layout = os.environ.get("SWEEP_LAYOUT", "scatter")
    paths = os.environ.get("SWEEP_PATHS", "xla,kernel").split(",")
    steps = int(os.environ.get("SWEEP_STEPS", "30"))
    cs = int(os.environ.get("BENCH_CHUNK_SIZE", "8"))

    cfg = toy_config(
        name="sweep", num_layers=16, hidden_size=2048, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=5632,
        vocab_size=32768, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=cs, kv_quant="int8",
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    ids = np.random.RandomState(0).randint(
        1, cfg.vocab_size, (batch, datalen)
    )
    results = {}

    for path in paths:
        use_pallas = path == "kernel"
        rt = RuntimeConfig(
            prefill_sub_batch=1, prefill_block_q=256,
            use_pallas=use_pallas,
            prefill_pattern="dense-splash",
            debug_hit_rate=rates[0], debug_hit_layout=layout,
        )
        eng = Engine(cfg, cache_cfg, rt, params)
        t0 = time.time()
        logits, cache = eng.prefill(ids)
        eng._cache = None  # about to be donated by the decode loop
        jax.block_until_ready(logits)
        log(f"[{path}] prefill {time.time() - t0:.1f}s")
        key = jax.random.PRNGKey(0)
        sample_args = (0.6, 50, 0.9)
        tokens = eng._sample(logits, key, *sample_args)

        for rate in rates:
            eng._debug_hit_rate = rate
            eng._decode_shadow_jit.clear_cache()
            decode = eng._decode_shadow
            # warmup: compile + reach forced steady state
            t0 = time.time()
            for _ in range(3):
                key, sub = jax.random.split(key)
                tokens, cache = decode(
                    eng.params, cache, tokens[:, None], sub,
                    *sample_args,
                )
            jax.block_until_ready(tokens)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                tokens, cache = decode(
                    eng.params, cache, tokens[:, None], sub,
                    *sample_args,
                )
            jax.block_until_ready(tokens)
            ms = (time.time() - t0) / steps * 1e3
            results[(path, rate)] = ms
            print(
                json.dumps(
                    {
                        "path": path, "hit_rate": rate,
                        "layout": layout, "chunk_size": cs,
                        "ms_per_step": round(ms, 2),
                        "compile_s": round(compile_s, 1),
                    }
                ),
                flush=True,
            )
        del eng, cache, tokens, logits
        gc.collect()

    if "xla" in paths and "kernel" in paths:
        cross = None
        for r in sorted(rates):
            if results[("kernel", r)] < results[("xla", r)]:
                cross = r
                break
        print(
            json.dumps(
                {
                    "summary": "crossover",
                    "kernel_wins_at": cross,
                    "layout": layout,
                    "chunk_size": cs,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
