"""AOT HBM-fit probe: compile (never run) the shadow prefill + decode
programs for a bench configuration and print XLA's memory analysis.

Answers "does this batch/length/model fit the chip?" in one remote
compile (~1-2 min) instead of a full bench run (the CLAUDE.md AOT
`.lower().compile().memory_analysis()` method that found the b4
prefill recipe). Nothing is allocated: params/cache are
jax.ShapeDtypeStructs end to end.

Env (mirrors bench.py): BENCH_MODEL (1.4b|8b), BENCH_DATALEN,
BENCH_SHADOW_BATCH, BENCH_WQUANT (8b forces int8), BENCH_QUANT,
BENCH_FAMILY.

Prints one JSON line per program: {"program", "argument_bytes",
"output_bytes", "temp_bytes", "peak_bytes", "fits_16g"}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.core.rope import compute_cos_sin
    from shadowkv_tpu.core.wquant import quantize_params
    from shadowkv_tpu.models import forward
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    datalen = int(os.environ.get("BENCH_DATALEN", 122880))
    mode = os.environ.get("BENCH_MODE", "shadow")
    batch = int(
        os.environ.get("BENCH_FULL_BATCH", 1)
        if mode == "full"
        else os.environ.get("BENCH_SHADOW_BATCH", 4)
    )
    model_size = os.environ.get("BENCH_MODEL", "1.4b")
    quant = os.environ.get("BENCH_QUANT", "int8")
    wquant = os.environ.get("BENCH_WQUANT", "")
    family = os.environ.get("BENCH_FAMILY", "llama")
    family_kw = {
        "glm": dict(num_kv_heads=4, rope_style="glm",
                    rope_partial_dim=64, qkv_bias=True),
        "yi": dict(num_kv_heads=4, rope_theta=5_000_000.0,
                   vocab_size=64000),
        "llama": {},
    }[family]
    if model_size == "8b":
        wquant = "int8"
        cfg_kw = dict(
            name="probe-8b", num_layers=32, hidden_size=4096,
            num_heads=32, num_kv_heads=8, head_dim=128,
            intermediate_size=14336, vocab_size=128256,
            rope_theta=500000.0, dtype=jnp.bfloat16,
        )
    else:
        cfg_kw = dict(
            name="probe-1.4b", num_layers=16, hidden_size=2048,
            num_heads=16, num_kv_heads=8, head_dim=128,
            intermediate_size=5632, vocab_size=32768,
            rope_theta=500000.0, dtype=jnp.bfloat16,
        )
    cfg_kw.update(family_kw)
    cfg = toy_config(**cfg_kw)
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        prefill_pattern=os.environ.get("BENCH_PREFILL", "dense-splash"),
    )
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160,
        chunk_size=int(os.environ.get("BENCH_CHUNK_SIZE", "16")),
        kv_quant=quant,
        gen_capacity=int(os.environ.get("BENCH_GEN_CAPACITY", "256")),
    )
    # BENCH_KERNEL_STORE=1: probe the 'auto' regime — tiled stores with
    # BOTH decode programs compiled (XLA-on-tiled + fused kernel), the
    # pair that OOM'd at b4/122K in bench_auto_hit60.
    kernel_store = os.environ.get("BENCH_KERNEL_STORE", "") == "1"

    def params_struct():
        base = jax.eval_shape(
            lambda: init_synthetic_params(cfg, jax.random.PRNGKey(0))
        )
        if wquant == "int8":
            return jax.eval_shape(quantize_params, base)
        return base

    layout = ShadowLayout.build(
        cache_cfg, datalen, kernel_store=kernel_store,
        num_kv_heads=cfg.num_kv_heads,
    )
    cache_s = jax.eval_shape(lambda: ShadowCache.init(cfg, layout, batch))
    params_s = params_struct()
    max_pos = datalen + cache_cfg.gen_capacity
    cos_s, sin_s = jax.eval_shape(
        lambda: compute_cos_sin(cfg, max_pos, dtype=jnp.float32)
    )
    ids_s = jax.ShapeDtypeStruct((1, datalen), jnp.int32)
    b0_s = jax.ShapeDtypeStruct((), jnp.int32)
    tok_s = jax.ShapeDtypeStruct((batch, 1), jnp.int32)

    use_flash = jax.devices()[0].platform != "cpu"

    def report(name, lowered):
        try:
            compiled = lowered.compile()
        except Exception as e:  # compile-time OOM: pull the summary
            # lines out of the (many-thousand-line) compile-helper dump
            # — the axon preamble and the allocation table are noise.
            lines = str(e).splitlines()
            keys = (
                "RESOURCE_EXHAUSTED", "Ran out of memory", "exceeds",
                "reserve", "out of memory", "OOM", "hbm", "LLO",
                "Mosaic", "requested",
            )
            hits = [ln for ln in lines if any(k in ln for k in keys)]
            head = "\n".join((hits or lines[:12])[:20])
            print(json.dumps({
                "program": name, "compile_error": head[:4000],
                "fits_16g": False,
            }), flush=True)
            return
        ma = compiled.memory_analysis()
        # donated buffers (the cache) appear in BOTH argument and
        # output sizes; alias_size_in_bytes is that overlap — without
        # subtracting it a multi-GB donated cache double-counts and
        # the probe reports fits_16g=false for configs that fit
        peak = (
            ma.argument_size_in_bytes
            + ma.output_size_in_bytes
            + ma.temp_size_in_bytes
            - ma.alias_size_in_bytes
        )
        print(json.dumps({
            "program": name,
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "peak_bytes": int(peak),
            # XLA reports usable HBM as 15.75G(iB); leave ~0.25 GiB
            # headroom. (The old 15.5e9-BYTE threshold was ~1.3 GiB
            # too conservative — GB/GiB mixup.)
            "fits_16g": bool(peak < 15.5 * 2**30),
        }), flush=True)

    log(f"probing {cfg.name} b{batch} @{datalen} wquant={wquant or 'none'}"
        f" quant={quant} mode={mode} on {jax.devices()[0].platform}")

    if mode == "full":
        # Full-attention baseline fit (gates the bench_*_full stages):
        # whole-prompt sub-batch-1 prefill + one decode step on the
        # [L, B, K, T, Dh] dense cache.
        from shadowkv_tpu.cache.full import FullCache

        full_cfg = CacheConfig(mode="full", max_length=datalen + 128)
        fcache_s = jax.eval_shape(
            lambda: FullCache.init(cfg, full_cfg, batch)
        )
        prefill = jax.jit(
            lambda p, c, ids, cos, sin, b0: forward.prefill_full(
                cfg, rt, p, c, ids, 0, cos, sin, batch_start=b0,
                use_flash=use_flash,
            ),
            donate_argnums=(1,),
        )
        report(
            "prefill_full_sub1",
            prefill.lower(params_s, fcache_s, ids_s, cos_s, sin_s, b0_s),
        )
        decode = jax.jit(
            lambda p, c, tok, cos, sin: forward.decode_full(
                cfg, p, c, tok, cos, sin
            ),
            donate_argnums=(1,),
        )
        report(
            "decode_full_step",
            decode.lower(params_s, fcache_s, tok_s, cos_s, sin_s),
        )
        return

    prefill = jax.jit(
        lambda p, c, ids, cos, sin, b0: forward.prefill_shadow_into(
            cfg, rt, p, c, ids, cos, sin, b0, use_flash=use_flash
        ),
        donate_argnums=(1,),
    )
    report(
        "prefill_sub1",
        prefill.lower(params_s, cache_s, ids_s, cos_s, sin_s, b0_s),
    )

    decode = jax.jit(
        lambda p, c, tok, cos, sin: forward.decode_shadow(
            cfg, p, c, tok, cos, sin,
        ),
        donate_argnums=(1,),
    )
    report(
        "decode_step",
        decode.lower(params_s, cache_s, tok_s, cos_s, sin_s),
    )

    if kernel_store:
        # the 'auto' pair: the fused-kernel decode program coexists in
        # HBM with the XLA one above (both executables live at once)
        decode_k = jax.jit(
            lambda p, c, tok, cos, sin: forward.decode_shadow(
                cfg, p, c, tok, cos, sin, use_kernel=True,
            ),
            donate_argnums=(1,),
        )
        report(
            "decode_step_kernel",
            decode_k.lower(params_s, cache_s, tok_s, cos_s, sin_s),
        )


if __name__ == "__main__":
    main()
