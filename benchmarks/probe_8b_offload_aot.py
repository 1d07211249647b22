"""AOT feasibility probe: 8B @ 122K b1, segmented-offload prefill
(VERDICT round-2 next #6).

Round 2 recorded 8B@122K as infeasible only AS STAGED: bench_8b_offload
hit RESOURCE_EXHAUSTED inside _prefill_offload_incremental /
_prefill_offload_segmented at runtime, which cannot distinguish "the
program truly exceeds 16 GB" from a staging bug holding a double
buffer. This probe compiles (never runs) the exact segment program
(forward.prefill_shadow_segment) with ShapeDtypeStruct inputs and
prints XLA's byte accounting per segment count, plus the residual-HBM
ledger (int8 params + V-less cache + x + one segment buffer).

Env: PROBE_SEGMENTS (comma list, default "4,8,16"),
BENCH_DATALEN (122880), BENCH_SHADOW_BATCH (1).
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
    from functools import partial

    from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.core.wquant import quantize_params
    from shadowkv_tpu.models import forward
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    datalen = int(os.environ.get("BENCH_DATALEN", 122880))
    b = int(os.environ.get("BENCH_SHADOW_BATCH", 1))
    segs = [
        int(s)
        for s in os.environ.get("PROBE_SEGMENTS", "4,8,16").split(",")
    ]
    cfg = toy_config(
        name="probe-8b", num_layers=32, hidden_size=4096,
        num_heads=32, num_kv_heads=8, head_dim=128,
        intermediate_size=14336, vocab_size=128256,
        rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        prefill_pattern="dense-splash", ring_gather=True,
        weight_quant="int8",
    )
    cc = CacheConfig(
        mode="shadow_offload", max_length=datalen + 128,
        sparse_budget=2048, rank=160, chunk_size=8, kv_quant="int8",
    )
    # ring_gather engines build the tiled (kernel) int8 store layout
    # (engine.py ~616) — the segment body writes v_seg in that shape.
    layout = ShadowLayout.build(
        cc, datalen, kernel_store=True, num_kv_heads=8
    )
    cache_s = jax.eval_shape(
        lambda: ShadowCache.init(cfg, layout, b, v_placeholder=True)
    )
    params_s = jax.eval_shape(
        lambda: quantize_params(
            init_synthetic_params(cfg, jax.random.PRNGKey(0))
        )
    )
    x_s = jax.ShapeDtypeStruct((b, datalen, cfg.hidden_size), cfg.dtype)
    max_pos = datalen + cc.gen_capacity
    # cos/sin tables are [S, head_dim // 2] (core/rope.py apply_rope).
    cos_s = jax.ShapeDtypeStruct(
        (max_pos, cfg.head_dim // 2), jnp.bfloat16
    )
    sin_s = cos_s
    layer0_s = jax.ShapeDtypeStruct((), jnp.int32)

    kh, dh = cfg.num_kv_heads, cfg.head_dim
    pt = 32 // layout.chunk_size
    gib = 2.0**30

    def nbytes(tree):
        import numpy as np

        return sum(
            int(np.prod(l.shape)) * jnp.dtype(l.dtype).itemsize
            for l in jax.tree.leaves(tree)
        )

    resident_base = nbytes(params_s) + nbytes(cache_s) + nbytes(x_s)
    log(
        f"resident (int8 params {nbytes(params_s)/gib:.2f} + V-less "
        f"cache {nbytes(cache_s)/gib:.2f} + x {nbytes(x_s)/gib:.2f}) = "
        f"{resident_base/gib:.2f} GiB"
    )

    for n_seg in segs:
        assert cfg.num_layers % n_seg == 0
        seg_len = cfg.num_layers // n_seg
        v_shape = (
            seg_len, b, kh, layout.chunks // pt, 32, dh,
        )
        v_seg_s = jax.ShapeDtypeStruct(v_shape, jnp.int8)

        @partial(jax.jit, donate_argnums=(1, 2, 3), static_argnums=(6,))
        def seg_fn(params, cache, v_seg, x, cos, sin, seg_len, layer0):
            return forward.prefill_shadow_segment(
                cfg, rt, params, cache, v_seg, x, cos, sin, layer0,
                seg_len, use_flash=True,
            )

        try:
            lowered = seg_fn.lower(
                params_s, cache_s, v_seg_s, x_s, cos_s, sin_s,
                seg_len, layer0_s,
            )
            mem = lowered.compile().memory_analysis()
            peak = (
                mem.argument_size_in_bytes
                + mem.temp_size_in_bytes
                + mem.output_size_in_bytes
                - mem.alias_size_in_bytes
            )
            print(json.dumps({
                "n_seg": n_seg,
                "v_seg_gib": round(nbytes(v_seg_s) / gib, 3),
                "arg_gib": round(mem.argument_size_in_bytes / gib, 3),
                "temp_gib": round(mem.temp_size_in_bytes / gib, 3),
                "out_gib": round(mem.output_size_in_bytes / gib, 3),
                "alias_gib": round(mem.alias_size_in_bytes / gib, 3),
                "peak_gib": round(peak / gib, 3),
                "fits_15g75": peak < 15.75 * gib,
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "n_seg": n_seg,
                "error": f"{type(e).__name__}: {str(e)[:300]}",
            }), flush=True)


if __name__ == "__main__":
    main()
