"""Dump the compiled HLO of the REAL decode step (AOT, chipless).

The per-op trace (prof_trace_decode / prof_decode_60k_*) names hot ops
like ``fusion.236`` but a trace cannot say what a fusion computes. This
probe compiles the same decode program (same model/cache config and the
engine's sampling epilogue) through the remote AOT compiler — which is
chipless, so it is safe to run while a bench owns the chip — saves the
optimized HLO text, and prints a summary of every fusion/sort/copy op
above a size threshold so trace names can be matched to computations.

Env: PROF_DATALEN (61440), PROF_BATCH (6), PROF_QUANT (int8),
PROF_OUT (/tmp/decode_hlo.txt).
"""

from __future__ import annotations

import os
import re
import sys
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp


def main():
    from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.core.rope import compute_cos_sin
    from shadowkv_tpu.core.sampling import sample_token
    from shadowkv_tpu.models import forward
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    datalen = int(os.environ.get("PROF_DATALEN", 61440))
    batch = int(os.environ.get("PROF_BATCH", 6))
    quant = os.environ.get("PROF_QUANT", "int8")
    out_path = os.environ.get("PROF_OUT", "/tmp/decode_hlo.txt")
    unroll = os.environ.get("PROF_UNROLL", "0") == "1"

    cfg = toy_config(
        name="prof-1.4b", num_layers=16, hidden_size=2048,
        num_heads=16, num_kv_heads=8, head_dim=128,
        intermediate_size=5632, vocab_size=32768,
        rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    cc = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160, chunk_size=8, kv_quant=quant,
    )
    layout = ShadowLayout.build(cc, datalen)
    cache_s = jax.eval_shape(lambda: ShadowCache.init(cfg, layout, batch))
    params_s = jax.eval_shape(
        lambda: init_synthetic_params(cfg, jax.random.PRNGKey(0))
    )
    max_pos = datalen + cc.gen_capacity
    cos_s, sin_s = jax.eval_shape(
        lambda: compute_cos_sin(cfg, max_pos, dtype=jnp.float32)
    )
    tok_s = jax.ShapeDtypeStruct((batch, 1), jnp.int32)
    key_s = jax.ShapeDtypeStruct((2,), jnp.uint32)

    approx = jax.devices()[0].platform != "cpu"

    @partial(jax.jit, static_argnums=(6, 7, 8), donate_argnums=(1,))
    def decode_jit(params, cache, tokens, key, cos, sin,
                   temperature, top_k, top_p):
        logits, cache = forward.decode_shadow(
            cfg, params, cache, tokens, cos, sin,
            approx_topk=approx, unroll=unroll,
        )
        return (
            sample_token(
                logits[:, -1], key, temperature=temperature,
                top_k=top_k, top_p=top_p,
            ),
            cache,
        )

    lowered = decode_jit.lower(
        params_s, cache_s, tok_s, key_s, cos_s, sin_s, 0.6, 0, 1.0
    )
    print("lowered; compiling (chipless AOT)...", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print(
        f"mem: args={ma.argument_size_in_bytes/2**30:.2f}G "
        f"out={ma.output_size_in_bytes/2**30:.2f}G "
        f"temp={ma.temp_size_in_bytes/2**30:.2f}G "
        f"alias={ma.alias_size_in_bytes/2**30:.2f}G",
        flush=True,
    )
    txt = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(txt)
    print(f"HLO text: {len(txt)/1e6:.1f} MB -> {out_path}", flush=True)

    # Summarize ops worth tracing back: every fusion / sort / copy /
    # dynamic-update-slice at the top level of the while body.
    pat = re.compile(
        r"^\s*%?((?:fusion|sort|copy|reshape|convert|bitcast|"
        r"dynamic-update-slice|dynamic-slice|select|custom-call|gather|"
        r"all-reduce|transpose)[\w.\-]*)\s*=\s*([^\s]+)\s", re.M
    )
    sizes: dict[str, tuple[str, int]] = {}

    def nbytes(shape: str) -> int:
        m = re.match(r"\(?([a-z0-9]+)\[([0-9,]*)\]", shape)
        if not m:
            return 0
        dt, dims = m.groups()
        bits = {"f32": 32, "bf16": 16, "s32": 32, "u32": 32, "s8": 8,
                "u8": 8, "pred": 8, "f16": 16, "s16": 16, "u16": 16,
                "f64": 64, "s64": 64}.get(dt, 8)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * bits // 8

    for m in pat.finditer(txt):
        name, shape = m.groups()
        sizes[name] = (shape, nbytes(shape))

    big = sorted(sizes.items(), key=lambda kv: -kv[1][1])[:60]
    print("\n== largest named ops (output bytes) ==", flush=True)
    for name, (shape, nb) in big:
        print(f"  {nb/2**20:9.2f} MiB  {name:44s} {shape[:80]}")


if __name__ == "__main__":
    main()
