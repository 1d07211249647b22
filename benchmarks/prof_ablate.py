"""Ablation timing of the shadow decode layer to find the bottleneck."""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.cache.shadow import ShadowLayout, concat_shadow_caches
from shadowkv_tpu.core import rope as rope_lib
from shadowkv_tpu.core.attention import decode_attention_hm
from shadowkv_tpu.core.rope import compute_cos_sin
from shadowkv_tpu.core.selection import (
    reorder_hits_first,
    score_and_select,
)
from shadowkv_tpu.models import forward
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def timeit(fn, *args, n=10, warmup=2):
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
    nlayers = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cfg = toy_config(
        name="prof", num_layers=nlayers, hidden_size=2048, num_heads=16,
        num_kv_heads=8, head_dim=128, intermediate_size=5632,
        vocab_size=32768, rope_theta=500000.0, dtype=jnp.bfloat16,
    )
    # Match the bench config exactly (bench.py main): int8 stores and
    # the same prefill knobs (bf16 V at b4/122K is 16 GB and cannot
    # fit the chip at all; a different block_q compiles a different
    # prefill whose temps miss the ceiling by ~8 MB).
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        prefill_pattern="dense-splash",  # flash at b4/122K OOMs; splash
        # causal is what buys batch 4 (CLAUDE.md prefill-HBM notes)
    )
    cache_cfg = CacheConfig(
        mode="shadow", max_length=datalen + 128, sparse_budget=2048,
        rank=160,
        chunk_size=int(os.environ.get("BENCH_CHUNK_SIZE", "16")),
        kv_quant="int8",
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
    layout = ShadowLayout.build(cache_cfg, datalen)
    lo = layout

    from shadowkv_tpu.models.engine import Engine
    import numpy as np
    eng = Engine(cfg, cache_cfg, rt, params)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (batch, datalen))
    _, cache = eng.prefill(ids)
    jax.block_until_ready(cache)
    # Reuse the engine's cos/sin tables — a private duplicate (~63 MB)
    # pushed the b4/122K prefill 8.4 MB past the 15.75 GiB ceiling.
    cos, sin = eng.cos_table, eng.sin_table

    b, kh, g, dh = batch, cfg.num_kv_heads, cfg.num_groups, cfg.head_dim
    cs = lo.chunk_size
    ssets = lo.select_sets
    rank = lo.rank_pad
    q = jax.random.normal(jax.random.PRNGKey(2), (b, 1, cfg.num_heads, dh), cfg.dtype)

    # Whole-step + dense timings FIRST (they need the live engine/
    # params); everything engine-side is then freed before the
    # micro-ablations — keeping the full cache resident next to the
    # per-layer ablation slices OOM'd the chip twice (r4/r4b).
    # The cache must be DONATED (it flows through to the outputs;
    # without donation XLA materializes a second multi-GB copy of the
    # pass-through stores — the r4c OOM), so the timing loop rebinds
    # it each step instead of using timeit.
    step = jax.jit(
        lambda p, c, t_, cos_, sin_: forward.decode_shadow(
            cfg, p, c, t_, cos_, sin_
        ),
        donate_argnums=(1,),
    )
    tokens = jnp.ones((batch, 1), jnp.int32)
    for _ in range(2):
        logits, cache = step(params, cache, tokens, cos, sin)
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    for _ in range(10):
        logits, cache = step(params, cache, tokens, cos, sin)
    jax.block_until_ready(logits)
    t = (time.perf_counter() - t0) / 10
    print(f"WHOLE shadow step ({nlayers} layers): {t*1e3:.2f} ms",
          flush=True)

    def mlp_qkv_only(params, x):
        # the dense compute of one step without any cache logic
        from shadowkv_tpu.core.layers import qkv_proj, rms_norm, swiglu_mlp, o_proj
        def body(x, inputs):
            _, lp = inputs
            h = rms_norm(x, lp.attn_norm, cfg.rms_norm_eps)
            q_, k_, v_ = qkv_proj(h, lp, cfg.num_heads, cfg.num_kv_heads, dh)
            ctx = q_  # skip attention
            x = x + o_proj(ctx, lp)
            h2 = rms_norm(x, lp.mlp_norm, cfg.rms_norm_eps)
            return x + swiglu_mlp(h2, lp), None
        x, _ = jax.lax.scan(body, x, (jnp.arange(nlayers), params.layers))
        return x @ params.lm_head

    x0 = jax.random.normal(jax.random.PRNGKey(3), (b, 1, cfg.hidden_size), cfg.dtype)
    t = timeit(jax.jit(mlp_qkv_only), params, x0)
    print(f"dense compute (all layers+head): {t*1e3:7.2f} ms",
          flush=True)

    # Flat row-space views of the (possibly int8-tiled) stores: chunk
    # cid = rows [cid*cs, cid*cs+cs) — matches the decode path's
    # addressing; dequant scales are omitted (byte traffic, not scale
    # math, is what this ablation times).
    lms0, mask0, prev0 = (
        cache.landmarks[0], cache.landmark_mask[0], cache.cached_ids[0]
    )
    lm_sc0 = cache.lm_scale[0] if cache.lm_scale is not None else None
    kbuf0, vbuf0, sv0 = cache.k_buf[0], cache.v_buf[0], cache.sv[0]
    u_flat0 = cache.u[0].reshape(b, -1, rank)  # [B, C*cs, rank_pad]
    # v_full stays in its TILED layout ([L,B,K,C/pt,32,dh] int8):
    # reshaping the 8 GB store materializes a second copy next to the
    # original (the r4d OOM) — v_path below does the two-level
    # row//32, row%32 indexing instead.
    v_store = cache.v_full
    v_sub = v_store.shape[-2]  # 32 (int8 tile) or cs (bf16 chunks)
    import gc
    jax.block_until_ready((lms0, kbuf0, vbuf0, sv0, u_flat0))
    del cache, eng, params
    gc.collect()

    def sel_only(q, lms, mask, prev, lm_sc):
        qg = q.transpose(0, 2, 1, 3).reshape(b, kh, g, 1, dh)
        ids_new = score_and_select(
            qg, lms, mask, ssets, landmark_scale=lm_sc
        )
        ro = reorder_hits_first(prev, ids_new)
        return ro.ids, ro.hit_count

    t = timeit(jax.jit(sel_only), q, lms0, mask0, prev0, lm_sc0)
    print(f"selection+reorder     x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")
    ids_new = jax.jit(sel_only)(q, lms0, mask0, prev0, lm_sc0)[0]
    rows_of = lambda ids_sel: (
        ids_sel[..., None] * cs + jnp.arange(cs, dtype=jnp.int32)
    ).reshape(b, kh, ssets * cs)

    def v_path(ids_sel, v_store, vbuf):
        bi = jnp.arange(b)[:, None, None]
        ki = jnp.arange(kh)[None, :, None]
        v_old = vbuf[:, :, lo.sparse_start:lo.sparse_end].reshape(b, kh, ssets, cs*dh)
        v_hits = jnp.take_along_axis(v_old, ids_sel[..., None] % ssets, axis=2)
        if v_store.ndim == 5:  # XLA-path store: flat chunk rows
            # [L, B, K, C, cs*dh]
            v_miss = v_store[0, bi, ki, ids_sel].astype(vbuf.dtype)
        else:  # kernel-path tiled [L, B, K, C/pt, 32, dh]
            rows = rows_of(ids_sel)
            v_miss = v_store[
                0, bi, ki, rows // v_sub, rows % v_sub
            ].astype(vbuf.dtype).reshape(b, kh, ssets, cs*dh)
        v_sp = jnp.where((ids_sel % 2 == 0)[..., None], v_hits, v_miss)
        return jax.lax.dynamic_update_slice(
            vbuf, v_sp.reshape(b, kh, ssets*cs, dh), (0, 0, lo.sparse_start, 0))

    t = timeit(jax.jit(v_path), ids_new, v_store, vbuf0)
    print(f"v hits+miss+write     x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")

    def u_gather_only(ids_sel, u_l):
        bi = jnp.arange(b)[:, None, None]
        return u_l[bi, rows_of(ids_sel)]  # [B,K,S*cs,r]

    t = timeit(jax.jit(u_gather_only), ids_new, u_flat0)
    print(f"u chunk gather        x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")

    def k_gemm_only(ids_sel, u_l, sv_l):
        bi = jnp.arange(b)[:, None, None]
        u_rows = u_l[bi, rows_of(ids_sel)].astype(jnp.bfloat16)
        return jnp.einsum("bknr,bkrd->bknd", u_rows,
                          sv_l.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    t = timeit(jax.jit(k_gemm_only), ids_new, u_flat0, sv0)
    print(f"u gather + gemm       x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")

    half = cos.shape[-1]
    cos_ctx = cos[: lo.chunks * cs].reshape(lo.chunks, cs, half)
    sin_ctx = sin[: lo.chunks * cs].reshape(lo.chunks, cs, half)

    def k_full_path(ids_sel, u_l, sv_l, kbuf, cos_ctx, sin_ctx):
        bi = jnp.arange(b)[:, None, None]
        u_rows = u_l[bi, rows_of(ids_sel)].astype(jnp.bfloat16)
        k_rec = jnp.einsum("bknr,bkrd->bknd", u_rows,
                           sv_l.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        cos_g = cos_ctx[ids_sel].reshape(b, kh, ssets*cs, half)
        sin_g = sin_ctx[ids_sel].reshape(b, kh, ssets*cs, half)
        k_rec = rope_lib.rotate_with_tables(k_rec, cos_g, sin_g, "neox")
        k_old = kbuf[:, :, lo.sparse_start:lo.sparse_end].reshape(b, kh, ssets, cs*dh)
        k_hits = jnp.take_along_axis(k_old, ids_sel[..., None] % ssets, axis=2)
        k_sp = jnp.where((ids_sel % 2 == 0)[..., None],
                         k_hits, k_rec.reshape(b, kh, ssets, cs*dh))
        return jax.lax.dynamic_update_slice(
            kbuf, k_sp.reshape(b, kh, ssets*cs, dh), (0, 0, lo.sparse_start, 0))

    t = timeit(jax.jit(k_full_path), ids_new, u_flat0, sv0, kbuf0,
               cos_ctx, sin_ctx)
    print(f"k full path           x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")

    def attn(q, kbuf, vbuf):
        return decode_attention_hm(q, kbuf, vbuf, lo.sparse_end + 1)

    t = timeit(jax.jit(attn), q, kbuf0, vbuf0)
    print(f"attention (head-major) x{nlayers}: {t*nlayers*1e3:7.2f} ms ({t*1e3:.3f}/layer)")


if __name__ == "__main__":
    main()
