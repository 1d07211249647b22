"""The transformer forward pass: one scan over stacked layer params.

Replaces the reference's eager per-layer Python loop + per-mode dispatch
(models/base.py:127-370 ``inference``/``layer_compute``) with two jitted
programs per cache mode:

- ``prefill_*``: embeds the prompt, runs all layers via ``lax.scan``,
  builds the cache, returns last-token logits.
- ``decode_*``: one autoregressive step over the cache.

The whole cache rides in the scan carry; per-layer reads from the big
stacked arrays are gathers indexed by the (traced) layer counter, so no
layer-sized temporary of U or the V store is ever materialized
(SURVEY.md §7.0 mapping for the scan-carry design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shadowkv_tpu.cache.full import FullCache
from shadowkv_tpu.cache.shadow import (
    ShadowCache,
    ShadowLayout,
    shadow_decode_layer,
    shadow_prefill_layer,
)
from shadowkv_tpu.config import CacheConfig, ModelConfig, RuntimeConfig
from shadowkv_tpu.core import rope as rope_lib
from shadowkv_tpu.core import wquant
from shadowkv_tpu.core.attention import (
    causal_prefill_attention,
    causal_prefill_attention_hm,
    causal_prefill_flash,
    causal_prefill_splash,
    decode_attention_hm,
    decode_attention_segments,
    sp_causal_prefill_attention,
    sparse_prefill_splash,
)
from shadowkv_tpu.core.layers import (
    LayerParams,
    ModelParams,
    o_proj,
    qkv_proj,
    rms_norm,
    swiglu_mlp,
)


def _minference_ctx(
    rt: RuntimeConfig, q, k, v, use_flash: bool, pat_row=None, caps=None,
    layer=0,
):
    """MInference per-head dynamic sparse prefill (pattern 'vs'):
    Pallas kernel on TPU, jnp oracle on CPU (tests). ``pat_row`` is
    this layer's traced (kind_ids, vertical, slash) [H] rows when a
    per-layer table is configured (rides the prefill scan's xs)."""
    from shadowkv_tpu.core import minference as mi

    tile = rt.vs_impl == "tile"
    tile_kw = {"tile": rt.vs_tile} if tile else {}
    if pat_row is not None:
        kinds, vs_r, ss_r = pat_row
        fn = (
            mi.minference_prefill_dynamic_tile
            if tile
            else mi.minference_prefill_dynamic
        )
        return fn(
            q, k, v, kinds, vs_r, ss_r,
            v_cap=caps[0], s_cap=caps[1],
            block=rt.vs_block,
            stream_sink=rt.stream_sink,
            stream_window=rt.stream_window,
            use_kernel=use_flash,
            interpret=False,
            **tile_kw,
        )
    fn = mi.minference_prefill_tile if tile else mi.minference_prefill
    return fn(
        q, k, v,
        patterns=rt.minference_patterns,
        vertical_size=rt.vs_vertical_size,
        slash_size=rt.vs_slash_size,
        block=rt.vs_block,
        stream_sink=rt.stream_sink,
        stream_window=rt.stream_window,
        use_kernel=use_flash,
        interpret=False,
        sim=rt.vs_sim,
        sim_salt=layer,
        **tile_kw,
    )


def _pattern_xs(rt: RuntimeConfig, model: ModelConfig):
    """Per-layer pattern table -> traced scan-xs arrays [L, H] + static
    top-k caps; (None, None) when no per-layer table is configured."""
    if rt.prefill_pattern != "vs" or rt.minference_layer_patterns is None:
        return None, None
    from shadowkv_tpu.core.minference import patterns_to_arrays

    kinds, vs, ss, v_cap, s_cap = patterns_to_arrays(
        rt.minference_layer_patterns, model.num_heads,
        model.num_layers, rt.vs_vertical_size, rt.vs_slash_size,
    )
    return (
        (jnp.asarray(kinds), jnp.asarray(vs), jnp.asarray(ss)),
        (v_cap, s_cap),
    )


def _scan_layers(
    model: ModelConfig, params: ModelParams, x, cache, body, extra_xs=None,
    unroll: bool = False,
):
    """Scan ``body`` over (layer index, layer params[, extra per-layer
    arrays]); ``extra_xs`` leaves must be [L, ...] (None is fine — an
    empty pytree node contributes no leaf).

    ``unroll=True`` emits all layers inline as a Python loop with
    CONSTANT layer indices. Inside a rolled scan body every per-layer
    operand slice (weights, landmark table, attention views) is a
    dynamic-slice at a runtime index that XLA materializes as a full
    copy each iteration; with constant indices the simplifier folds
    them to static slices and contiguous leading-dim slices become
    zero-copy bitcasts. (lax.scan's own unroll= keeps the indices as
    runtime carry values — measured via prof_hlo_decode.py: the copies
    survive — so the loop must be a real trace-time unroll.) Numerics
    are identical; see RuntimeConfig.decode_unroll."""
    if unroll:
        carry = (x, cache)
        for l in range(model.num_layers):
            lp = jax.tree.map(lambda a, _l=l: a[_l], params.layers)
            ex = (
                None if extra_xs is None
                else jax.tree.map(lambda a, _l=l: a[_l], extra_xs)
            )
            carry, _ = body(carry, (jnp.int32(l), lp, ex))
        return carry
    xs = (jnp.arange(model.num_layers), params.layers, extra_xs)
    (x, cache), _ = jax.lax.scan(body, (x, cache), xs)
    return x, cache


def _finalize(model: ModelConfig, params: ModelParams, x, last_only: bool):
    if last_only:
        x = x[:, -1:]
    x = rms_norm(x, params.final_norm, model.rms_norm_eps)
    return wquant.mat(x, params.lm_head, preferred_element_type=jnp.float32)


def _layer_qkv(model: ModelConfig, lp: LayerParams, x, cos, sin,
               chunked: bool = True):
    """Shared pre-attention compute. Returns (q_roped, k_roped, k_pre, v)."""
    h = rms_norm(x, lp.attn_norm, model.rms_norm_eps)
    q, k, v = qkv_proj(
        h, lp, model.num_heads, model.num_kv_heads, model.head_dim
    )
    # Chunked form bounds long-prefill RoPE temps; short (decode) and
    # multi-sub-batch shapes fall back to the one-shot rotation inside.
    # The sequence-parallel prefill disables chunking: a lax.map over
    # sequence chunks cannot be partitioned over 'sp' (the loop dim is
    # sequential), and per-chip temps are already 1/sp-sized.
    if chunked:
        q_r = rope_lib.apply_rope_chunked(q, cos, sin, model.rope_style)
        k_r = rope_lib.apply_rope_chunked(k, cos, sin, model.rope_style)
    else:
        q_r = rope_lib.apply_rope(q, cos, sin, model.rope_style)
        k_r = rope_lib.apply_rope(k, cos, sin, model.rope_style)
    return q_r, k_r, k, v


def _layer_tail(lp: LayerParams, model: ModelConfig, x, ctx,
                tp_axis: str | None = None):
    """Post-attention tail. ``tp_axis`` names a MANUAL tensor-parallel
    shard_map axis: wo / w_down are row-sharded there, so their matmuls
    produce partial sums that must be psum'd before joining the
    (replicated) residual stream. GSPMD paths pass None — the psums are
    inserted by the partitioner from the weight shardings."""
    o = o_proj(ctx, lp)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)
    x = x + o
    h = rms_norm(x, lp.mlp_norm, model.rms_norm_eps)
    m = swiglu_mlp(h, lp)
    if tp_axis is not None:
        m = jax.lax.psum(m, tp_axis)
    return x + m


# --------------------------------------------------------------------------
# Full-attention baseline (reference KV_Cache path)
# --------------------------------------------------------------------------


def prefill_full(
    model: ModelConfig,
    rt: RuntimeConfig,
    params: ModelParams,
    cache: FullCache,
    input_ids: jnp.ndarray,  # [Bsub, S]
    start_pos: int,  # static
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    batch_start=0,  # traced: sub-batch offset into the cache
    use_flash: bool = False,
):
    """Prefill with dense attention; supports chunked continuation via
    a static ``start_pos`` and sub-batch prefill via ``batch_start``
    (reference prefill/prefill_cont + batch_prefill,
    models/base.py:162-204,499-548)."""
    b, s = input_ids.shape
    x = wquant.take_rows(params.embed, input_ids, model.dtype)
    positions = start_pos + jnp.arange(s)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    end = start_pos + s
    pat_xs, pat_caps = _pattern_xs(rt, model)

    def body(carry, inputs):
        x, cache = carry
        layer, lp, pat = inputs
        q, k_r, _, v = _layer_qkv(model, lp, x, cos, sin)
        k_cache = jax.lax.dynamic_update_slice(
            cache.k, k_r.transpose(0, 2, 1, 3)[None].astype(cache.k.dtype),
            (layer, batch_start, 0, start_pos, 0),
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache.v, v.transpose(0, 2, 1, 3)[None].astype(cache.v.dtype),
            (layer, batch_start, 0, start_pos, 0),
        )
        cache = cache.replace(k=k_cache, v=v_cache)
        k_hist = jax.lax.dynamic_slice(
            cache.k, (layer, batch_start, 0, 0, 0),
            (1, b, cache.k.shape[2], end, cache.k.shape[4]),
        )[0]
        v_hist = jax.lax.dynamic_slice(
            cache.v, (layer, batch_start, 0, 0, 0),
            (1, b, cache.v.shape[2], end, cache.v.shape[4]),
        )[0]
        if use_flash and start_pos == 0 and rt.prefill_pattern == "stream":
            ctx = sparse_prefill_splash(
                q, k_hist, v_hist, rt.stream_window, rt.stream_sink,
                head_major=True,
            )
        elif start_pos == 0 and rt.prefill_pattern == "vs":
            ctx = _minference_ctx(
                rt, q, k_hist.transpose(0, 2, 1, 3),
                v_hist.transpose(0, 2, 1, 3), use_flash, pat, pat_caps,
                layer=layer,
            )
        elif (
            use_flash
            and start_pos == 0
            and rt.prefill_pattern == "dense-splash"
        ):
            ctx = causal_prefill_splash(q, k_hist, v_hist, head_major=True)
        elif use_flash and start_pos == 0:
            ctx = causal_prefill_flash(q, k_hist, v_hist, head_major=True)
        else:
            ctx = causal_prefill_attention_hm(
                q, k_hist, v_hist, end, block_q=min(rt.prefill_block_q, s)
            )
        return (_layer_tail(lp, model, x, ctx), cache), None

    x, cache = _scan_layers(model, params, x, cache, body, pat_xs)
    cache = cache.replace(length=jnp.asarray(end, jnp.int32))
    logits = _finalize(model, params, x, last_only=True)
    return logits, cache


def decode_full(
    model: ModelConfig,
    params: ModelParams,
    cache: FullCache,
    tokens: jnp.ndarray,  # [B, Qn]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    unroll: bool = False,
):
    b, qn = tokens.shape
    x = wquant.take_rows(params.embed, tokens, model.dtype)
    positions = cache.length + jnp.arange(qn)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    new_len = cache.length + qn

    def body(carry, inputs):
        x, cache = carry
        layer, lp, _pat = inputs
        q, k_r, _, v = _layer_qkv(model, lp, x, cos, sin)
        k_cache = jax.lax.dynamic_update_slice(
            cache.k, k_r.transpose(0, 2, 1, 3)[None].astype(cache.k.dtype),
            (layer, 0, 0, cache.length, 0),
        )
        v_cache = jax.lax.dynamic_update_slice(
            cache.v, v.transpose(0, 2, 1, 3)[None].astype(cache.v.dtype),
            (layer, 0, 0, cache.length, 0),
        )
        cache = cache.replace(k=k_cache, v=v_cache)
        k_hist = jax.lax.dynamic_index_in_dim(
            cache.k, layer, axis=0, keepdims=False
        )
        v_hist = jax.lax.dynamic_index_in_dim(
            cache.v, layer, axis=0, keepdims=False
        )
        ctx = decode_attention_hm(q, k_hist, v_hist, new_len)
        return (_layer_tail(lp, model, x, ctx), cache), None

    x, cache = _scan_layers(model, params, x, cache, body, unroll=unroll)
    cache = cache.replace(length=new_len)
    logits = _finalize(model, params, x, last_only=True)
    return logits, cache


# --------------------------------------------------------------------------
# ShadowKV sparse path
# --------------------------------------------------------------------------


def prefill_shadow(
    model: ModelConfig,
    rt: RuntimeConfig,
    layout: ShadowLayout,
    params: ModelParams,
    input_ids: jnp.ndarray,  # [B, S]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    sp_mesh=None,
):
    """Prefill building the shadow cache (reference models/base.py:299-313
    prefill branch: dense attention during prefill, SVD of pre-RoPE K,
    landmark/outlier registration, budget seeding from the last query).

    ``sp_mesh``: a mesh with an 'sp' axis enables sequence-parallel
    (context-parallel) prefill — activations stay sharded [B, S/sp, D]
    per chip (sharding constraints below), attention runs in a
    shard_map island (core/attention.py::sp_causal_prefill_attention),
    and the shadow-cache math (SVD sketch, landmarks, outlier top-k,
    seed gathers) is partitioned by GSPMD, whose S-contractions become
    psums over 'sp'. The reference has no sequence parallelism
    (SURVEY §2.4); this is the TPU-native prefill scaling axis."""
    b, s = input_ids.shape
    assert s == layout.prefill_len
    sp = sp_mesh is not None and sp_mesh.shape.get("sp", 1) > 1
    if sp:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x_sharding = NamedSharding(sp_mesh, P("dp", "sp", None))
        constrain = lambda x: jax.lax.with_sharding_constraint(
            x, x_sharding
        )
    else:
        constrain = lambda x: x
    x = constrain(
        wquant.take_rows(params.embed, input_ids, model.dtype)
    )
    positions = jnp.arange(s)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)

    def body(x, inputs):
        layer, lp, _pat = inputs
        q, k_r, k_pre, v = _layer_qkv(
            model, lp, x, cos, sin, chunked=not sp
        )
        slices = shadow_prefill_layer(
            model,
            layout,
            k_pre,
            k_r,
            v,
            q[:, -1:],
        )
        if sp:
            ctx = sp_causal_prefill_attention(
                sp_mesh, q, k_r, v, block_q=rt.prefill_block_q
            )
        else:
            ctx = causal_prefill_attention(
                q, k_r, v, block_q=min(rt.prefill_block_q, s)
            )
        return constrain(_layer_tail(lp, model, x, ctx)), slices

    xs = (jnp.arange(model.num_layers), params.layers, None)
    x, layer_slices = jax.lax.scan(body, x, xs)
    from shadowkv_tpu.cache.shadow import assemble_cache

    cache = assemble_cache(layer_slices, layout)
    logits = _finalize(model, params, x, last_only=True)
    return logits, cache


def prefill_shadow_into(
    model: ModelConfig,
    rt: RuntimeConfig,
    params: ModelParams,
    cache: ShadowCache,
    input_ids: jnp.ndarray,  # [Bsub, S]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    batch_start=0,  # traced: sub-batch offset into the cache
    use_flash: bool = False,
):
    """Sub-batch shadow prefill writing into a preallocated (donated)
    full-batch cache at ``batch_start`` — peak HBM stays at one cache
    (see ShadowCache.init; reference batch_prefill + prefilled_batch,
    models/base.py:499-548, kv_cache.py:824-980).

    The cache rides the layer-scan CARRY and each layer writes its
    [1, b_sub, ...] slice in place, instead of stacking [L, b_sub, ...]
    ys and copying at the end — that stacking costs an extra ~1/T cache
    of HLO temp, which is exactly what pushed a batch-8 32K prefill 93 MB
    over a 16 GB chip."""
    b, s = input_ids.shape
    layout = cache.layout
    assert s == layout.prefill_len
    x = wquant.take_rows(params.embed, input_ids, model.dtype)
    positions = jnp.arange(s)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    pat_xs, pat_caps = _pattern_xs(rt, model)

    body = make_shadow_prefill_body(
        model, rt, layout, cos, sin, use_flash, batch_start, pat_caps
    )
    xs = (jnp.arange(model.num_layers), params.layers, pat_xs)
    (x, cache), _ = jax.lax.scan(body, (x, cache), xs)
    logits = _finalize(model, params, x, last_only=True)
    return logits, cache


def prefill_shadow_segment(
    model: ModelConfig,
    rt: RuntimeConfig,
    params: ModelParams,
    cache: ShadowCache,
    v_seg: jnp.ndarray,  # [seg_len, B, K, CT, TS, W] segment V buffer
    x: jnp.ndarray,  # [B, S, D] residual carried between segments
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    layer0: jnp.ndarray,  # traced int32 first layer of this segment
    seg_len: int,
    use_flash: bool = False,
):
    """One layer segment of an offload prefill: runs layers
    [layer0, layer0+seg_len) via the shared prefill body (cond-gated
    over the full layer scan — ONE compile serves every segment), writes
    the segment's V into ``v_seg`` and everything else into ``cache``
    (whose v_full is a zero-chunk placeholder). The engine evicts
    ``v_seg`` to pinned host DRAM between calls, so peak HBM holds
    seg_len layers of V — the reference's per-layer V->pinned-CPU copy
    during prefill (kv_cache.py:825-828) in TPU form. Logits are
    computed every call (one cheap lm_head matmul on the last token);
    only the final segment's are meaningful."""
    layout = cache.layout
    s = x.shape[1]
    assert s == layout.prefill_len
    positions = jnp.arange(s)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    pat_xs, pat_caps = _pattern_xs(rt, model)
    body = make_shadow_prefill_body(
        model, rt, layout, cos, sin, use_flash, 0, pat_caps,
        seg=(layer0, seg_len),
    )
    carry_cache = cache.replace(v_full=v_seg)
    xs = (jnp.arange(model.num_layers), params.layers, pat_xs)
    (x, carry_cache), _ = jax.lax.scan(body, (x, carry_cache), xs)
    v_seg = carry_cache.v_full
    cache = carry_cache.replace(v_full=cache.v_full)
    logits = _finalize(model, params, x, last_only=True)
    return logits, x, cache, v_seg


def make_shadow_prefill_body(
    model: ModelConfig,
    rt: RuntimeConfig,
    layout: ShadowLayout,
    cos: jnp.ndarray,  # [S, half]
    sin: jnp.ndarray,
    use_flash: bool,
    batch_offset,  # traced: where this sub/micro-batch's slices land
    pat_caps=None,
    tp_axis: str | None = None,
    tp_size: int = 1,
    seg=None,  # (layer0 traced, seg_len static): layer-segmented
    # offload prefill — the body is cond-gated to layers
    # [layer0, layer0+seg_len) and cache.v_full is a SEGMENT-LOCAL
    # buffer indexed at layer - layer0 (engine evicts it to pinned
    # host DRAM between segments; reference kv_cache.py:825-828)
):
    """The shadow prefill LAYER body, shared between the sub-batch
    scan (prefill_shadow_into) and the pp pipeline's per-stage scan
    (parallel/pipeline.py::prefill_shadow_pp): per layer, compute
    QKV + RoPE, build the shadow slices (SVD/landmarks/outliers/seed),
    write them into the carried cache at (layer, batch_offset), and
    run the configured prefill attention. ``inputs`` is
    (layer_idx, layer_params, pattern_row-or-None).

    ``tp_axis``: manual tensor-parallel axis (pp x tp pipeline) — pass
    a head-scaled ``model`` alongside it; the attention/SVD/landmark
    math is per-head (local heads work unchanged) and only the
    o_proj/MLP partial sums need the psum in _layer_tail."""
    s = cos.shape[0]

    def _active_body(carry, layer, lp, pat):
        x, cache = carry
        q, k_r, k_pre, v = _layer_qkv(model, lp, x, cos, sin)
        slices = shadow_prefill_layer(
            model, layout, k_pre, k_r, v, q[:, -1:],
            tp_axis=tp_axis, tp_size=tp_size,
        )

        def put(dst, src, lidx=None):
            idx = (
                layer if lidx is None else lidx,
                batch_offset,
            ) + (0,) * (dst.ndim - 2)
            return jax.lax.dynamic_update_slice(
                dst, src[None].astype(dst.dtype), idx
            )

        updates = dict(
            u=put(cache.u, slices["u"]),
            sv=put(cache.sv, slices["sv"]),
            landmarks=put(cache.landmarks, slices["landmarks"]),
            landmark_mask=put(cache.landmark_mask, slices["landmark_mask"]),
            k_buf=put(cache.k_buf, slices["k_buf"]),
            v_buf=put(cache.v_buf, slices["v_buf"]),
            v_full=put(
                cache.v_full, slices["v_full"],
                lidx=None if seg is None else layer - seg[0],
            ),
            cached_ids=put(cache.cached_ids, slices["cached_ids"]),
        )
        if layout.quant == "int8":
            updates.update(
                lm_scale=put(cache.lm_scale, slices["lm_scale"]),
            )
        cache = cache.replace(**updates)
        if use_flash and rt.prefill_pattern == "stream":
            ctx = sparse_prefill_splash(
                q, k_r, v, rt.stream_window, rt.stream_sink
            )
        elif rt.prefill_pattern == "vs":
            ctx = _minference_ctx(
                rt, q, k_r, v, use_flash, pat, pat_caps, layer=layer
            )
        elif use_flash and rt.prefill_pattern == "dense-splash":
            ctx = causal_prefill_splash(q, k_r, v)
        elif use_flash:
            ctx = causal_prefill_flash(q, k_r, v)
        else:
            ctx = causal_prefill_attention(
                q, k_r, v, block_q=min(rt.prefill_block_q, s)
            )
        return (_layer_tail(lp, model, x, ctx, tp_axis), cache)

    if seg is None:
        def body(carry, inputs):
            layer, lp, pat = inputs
            return _active_body(carry, layer, lp, pat), None

        return body

    layer0, seg_len = seg

    def body(carry, inputs):
        layer, lp, pat = inputs
        active = (layer >= layer0) & (layer < layer0 + seg_len)
        # cond (not where): the skipped layers of a segmented prefill
        # must execute NO attention — the whole point is bounding the
        # per-call footprint/time to seg_len real layers.
        out = jax.lax.cond(
            active,
            lambda c: _active_body(c, layer, lp, pat),
            lambda c: c,
            carry,
        )
        return out, None

    return body


def decode_shadow(
    model: ModelConfig,
    params: ModelParams,
    cache: ShadowCache,
    tokens: jnp.ndarray,  # [B, Qn]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    use_kernel: bool = False,
    v_store=None,
    approx_topk: bool = False,
    ring_gather: bool = False,
    v_host=None,
    v_host_axis: str = "batch",  # axis a multi-part host store shards
    mesh=None,
    unroll: bool = False,
    segmented: bool | None = None,  # None = off (measured 2.7x slower
    # than stacked-view attention; see probe_decode_variants_r3)
    debug_hit_rate: float | None = None,  # BENCHMARK-ONLY forced
    debug_hit_layout: str = "scatter",  # selection (RuntimeConfig)
    hysteresis: float = 0.0,  # selection hysteresis
    # (RuntimeConfig.selection_hysteresis, core/selection.py)
):
    """One sparse decode step (reference models/base.py:315-341 decode
    branch; see SURVEY.md §3.3 for the kernel-by-kernel mapping).

    ``mesh``: optional (dp, tp) jax.sharding.Mesh. The XLA decode path
    needs none (GSPMD partitions it from the operand NamedShardings,
    tests/test_mesh.py) but the Pallas paths (ring_gather / use_kernel)
    do — their pallas_calls run inside shard_map islands with B on dp
    and KV heads on tp (see shadow_decode_layer).

    ``v_host`` is the V store resident in pinned host DRAM (the cache's
    v_full leaf is then a zero-chunk placeholder): the ring-gather
    kernel DMAs selected chunks host->HBM (the direct analogue of the
    reference's pinned-memory gather, kv_cache.py:554-563 + gather_copy
    kernels). Input-only — host-memory leaves must not ride jit
    outputs.

    Only the mutable buffers (k_buf/v_buf/cached_ids) ride the layer-scan
    carry; the read-only factor/landmark/V-store state stays outside the
    loop so XLA doesn't copy it into while-carry buffers every step (see
    ShadowStatic docstring)."""
    from shadowkv_tpu.cache.shadow import split_cache

    # Measured on chip (probe_decode_variants_r3): segmented decode is
    # 59.8 ms/step vs 22.1 for the stacked-view path at b4/122K — the
    # premise (slice-feeding-dot copies dominating) was wrong; the
    # three-einsum split loses more than the view copies cost. Default
    # stays OFF; the knob remains for future layouts.
    if segmented is None:
        segmented = False
    segmented = segmented and not use_kernel

    b, qn = tokens.shape
    x = wquant.take_rows(params.embed, tokens, model.dtype)
    # Per-slot generation lengths (continuous batching,
    # serving.ContinuousBatcher): gen_len is a [B] vector and every
    # slot sits at its own position; positions/cos/sin get a batch dim
    # and the gen-region writes go to per-slot rows (cache/shadow.py
    # _append_gen_rows).
    if cache.gen_len.ndim == 1:
        positions = cache.kv_len[:, None] + jnp.arange(qn)[None]
    else:
        positions = cache.kv_len + jnp.arange(qn)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    static, mut = split_cache(cache)
    layout, gen_len = cache.layout, cache.gen_len
    inv_freq_full = (
        rope_lib.inv_freq_full_neox(model) if use_kernel else None
    )

    def body(carry, inputs):
        x, mut = carry
        layer, lp = inputs
        q, k_r, _, v = _layer_qkv(model, lp, x, cos, sin)
        k_view, v_view, valid_len, mut = shadow_decode_layer(
            model, layout, static, mut, gen_len, layer, q, k_r, v,
            cos_table, sin_table, use_kernel=use_kernel,
            inv_freq_full=inv_freq_full, v_store=v_store,
            approx_topk=approx_topk, ring_gather=ring_gather,
            v_host=v_host, v_host_axis=v_host_axis, mesh=mesh,
            segmented=segmented,
            debug_hit_rate=debug_hit_rate,
            debug_hit_layout=debug_hit_layout,
            hysteresis=hysteresis,
        )
        if segmented:
            ctx = decode_attention_segments(q, k_view, valid_len)
        else:
            ctx = decode_attention_hm(q, k_view, v_view, valid_len)
        return (_layer_tail(lp, model, x, ctx), mut), None

    if unroll:
        # Trace-time unroll with CONSTANT layer indices (see
        # _scan_layers): XLA folds every per-layer dynamic slice —
        # weights, landmarks, the committed-buffer attention views —
        # into zero-copy static slices/bitcasts, removing several
        # GB/step of copy traffic the rolled scan body pays.
        carry = (x, mut)
        for l in range(model.num_layers):
            lp = jax.tree.map(lambda a, _l=l: a[_l], params.layers)
            carry, _ = body(carry, (jnp.int32(l), lp))
        (x, mut) = carry
    else:
        xs = (jnp.arange(model.num_layers), params.layers)
        (x, mut), _ = jax.lax.scan(body, (x, mut), xs)
    cache = cache.replace(
        k_buf=mut.k_buf,
        v_buf=mut.v_buf,
        cached_ids=mut.cached_ids,
        gen_len=gen_len + qn,
    )
    logits = _finalize(model, params, x, last_only=True)
    return logits, cache
