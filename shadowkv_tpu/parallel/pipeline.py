"""Pipeline-parallel (pp) sparse decode: layers sharded over a 'pp'
mesh axis, activations flowing chip-to-chip through a circular
microbatch pipeline.

The reference has no model parallelism at all (SURVEY §2.4); tensor
(tp) and sequence (sp) sharding are implemented in mesh.py/forward.py.
pp completes the set for models whose WEIGHTS outgrow one chip: chip p
holds layers [p*L/pp, (p+1)*L/pp) — weights, low-rank factors,
landmarks, compact buffers and the V store all shard their leading L
axis, so per-chip memory is 1/pp of everything layer-shaped.

Schedule (GPipe-style circular pipeline, the standard TPU inference
pipelining recipe): the batch splits into M microbatches; at clock
tick t chip p runs its local layers on microbatch (t - p) and
`ppermute`s the activation to chip p+1. All chips stay busy once the
pipeline fills; the fill/drain bubble is (pp-1)/(M+pp-1) of the step.

Scope (v1): HBM shadow cache, XLA gather decode path (the Pallas
ring/refresh kernels and host-offload stores keep their (dp, tp)
shard_map islands; composing them with pp is future work). BOTH phases
are pipelined: prefill_shadow_pp stages the prefill layer body (each
stage writes its local cache slices; embedding happens inside stage 0
so whole-batch [B, S, D] activations never materialize), and
decode_shadow_pp pipelines the decode step. Greedy tokens are
bit-identical to the single-device engine (tests/test_pp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from shadowkv_tpu.cache.shadow import (
    ShadowCache,
    ShadowMut,
    ShadowStatic,
    shadow_decode_layer,
    split_cache,
)


def ShadowStaticSpecs(cs: ShadowCache) -> ShadowStatic:
    """Project a ShadowCache-shaped spec tree onto the static split."""
    return ShadowStatic(
        u=cs.u, sv=cs.sv, landmarks=cs.landmarks,
        landmark_mask=cs.landmark_mask, v_full=cs.v_full,
        lm_scale=cs.lm_scale,
    )


def ShadowMutSpecs(cs: ShadowCache) -> ShadowMut:
    return ShadowMut(
        k_buf=cs.k_buf, v_buf=cs.v_buf, cached_ids=cs.cached_ids
    )
from shadowkv_tpu.config import ModelConfig
from shadowkv_tpu.core import wquant
from shadowkv_tpu.core.attention import decode_attention_hm
from shadowkv_tpu.core.layers import ModelParams


def _slice_b(tree, lo, size, axis):
    """dynamic_slice a microbatch out of every leaf's batch axis."""
    def f(x):
        return jax.lax.dynamic_slice_in_dim(x, lo, size, axis=axis)

    return jax.tree.map(f, tree)


def _unslice_b(full, part, lo, axis):
    def f(a, b):
        idx = [0] * a.ndim
        idx[axis] = lo
        return jax.lax.dynamic_update_slice(a, b.astype(a.dtype), idx)

    return jax.tree.map(f, full, part)


def prefill_shadow_pp(
    model: ModelConfig,
    rt,
    params: ModelParams,
    cache: ShadowCache,
    input_ids: jnp.ndarray,  # [B, S]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    mesh,
    use_flash: bool = False,
):
    """Whole-batch shadow prefill with layers pipelined over 'pp'.

    Same circular schedule as decode_shadow_pp; each stage runs the
    prefill layer body (SVD, landmarks, outliers, seeding —
    forward.prefill_shadow_into) for its local layers and writes the
    LOCAL cache slices in place. Microbatching doubles as the
    activation bound (the reference's sub-batch prefill,
    models/base.py:533-543): each stage holds one microbatch's
    [uB, S, D] activations. Embedding happens inside stage 0 on the
    replicated (int8-quantizable) table so the [B, S, D] activations
    are never materialized whole-batch.
    """
    from shadowkv_tpu.core.layers import rms_norm
    from shadowkv_tpu.models.forward import make_shadow_prefill_body
    from shadowkv_tpu.parallel import mesh as mesh_lib

    pp = mesh.shape["pp"]
    dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
    tp = mesh.shape["tp"] if "tp" in mesh.axis_names else 1
    b, s = input_ids.shape
    layout = cache.layout
    assert s == layout.prefill_len
    assert rt.minference_layer_patterns is None, (
        "per-layer MInference tables are not supported under pp (v1)"
    )
    assert b % dp == 0, (b, dp)
    b_l = b // dp  # per-dp-shard batch; the pipeline is fully local
    n_micro = pp if b_l % pp == 0 else (b_l if b_l < pp else None)
    assert n_micro is not None, (
        f"per-dp-shard batch {b_l} must be divisible by pp={pp} "
        "(or smaller than it)"
    )
    ub = b_l // n_micro
    n_layers = model.num_layers
    assert n_layers % pp == 0, (n_layers, pp)
    lp_n = n_layers // pp

    positions = jnp.arange(s)
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    ticks = n_micro + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def rep(x):
        return P(*([None] * x.ndim))

    bdim = "dp" if dp > 1 else None
    # Manual-tp composition: see decode_shadow_pp (weights arrive
    # packed-dim-permuted; the body runs on a head-scaled config and
    # _layer_tail psums the Megatron partial sums over "tp").
    model_l = model
    tp_axis = None
    if tp > 1:
        import dataclasses

        assert layout.quant == "none", (
            "pp x tp serves kv_quant='none' (global-head scale trailer)"
        )
        model_l = dataclasses.replace(
            model,
            num_heads=model.num_heads // tp,
            num_kv_heads=model.num_kv_heads // tp,
        )
        tp_axis = "tp"
        lay_spec = mesh_lib.param_pspecs_pp(params, tp=True).layers
        cache_spec = mesh_lib.shadow_cache_pspecs_pp(cache, tp=True)
    else:
        def pp0(x):
            return P("pp", *([None] * (x.ndim - 1)))

        lay_spec = jax.tree.map(pp0, params.layers)
        cache_spec = mesh_lib.shadow_cache_pspecs_pp(cache, dp=dp > 1)
    embed_head = (params.embed, params.final_norm, params.lm_head)
    eh_spec = jax.tree.map(rep, embed_head)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(lay_spec, cache_spec, P(bdim, None), P(None, None),
                  P(None, None), eh_spec),
        out_specs=(P(bdim, None, None), cache_spec),
        # both axes manual (see decode_shadow_pp)
        axis_names=frozenset(mesh.axis_names),
        check_vma=False,  # axis_index-gated writes carry no vma
    )
    def run(layers_local, cache_local, input_ids, cos, sin, embed_head):
        p = jax.lax.axis_index("pp")
        embed_tbl, final_norm, lm_head = embed_head
        d = model.hidden_size

        def run_stage(x_cur, m, cache_local):
            lo = m * ub

            def from_embed():
                ids_m = jax.lax.dynamic_slice(
                    input_ids, (lo, 0), (ub, s)
                )
                return wquant.take_rows(embed_tbl, ids_m, model.dtype)

            x_in = jax.lax.cond(
                p == 0, from_embed, lambda: x_cur
            )

            # the SAME layer body as the sub-batch prefill
            # (forward.make_shadow_prefill_body) — new prefill
            # patterns / cache slices stay in sync automatically
            body = make_shadow_prefill_body(
                model_l, rt, layout, cos, sin, use_flash, lo,
                tp_axis=tp_axis, tp_size=tp,
            )
            xs = (jnp.arange(lp_n), layers_local, None)
            (y, cache_local), _ = jax.lax.scan(
                body, (x_in, cache_local), xs
            )
            return y, cache_local

        def tick(carry, t):
            x_cur, cache_local, outs = carry
            m = t - p
            valid = jnp.logical_and(m >= 0, m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            y, cache_new = jax.lax.cond(
                valid,
                lambda ops: run_stage(*ops),
                lambda ops: (ops[0], ops[2]),
                (x_cur, mc, cache_local),
            )
            last = y[:, -1:]  # only the final token's hidden leaves
            written = jax.lax.dynamic_update_slice(
                outs, last[None].astype(outs.dtype), (mc, 0, 0, 0)
            )
            outs = jnp.where(
                jnp.logical_and(valid, p == pp - 1), written, outs
            )
            x_next = jax.lax.ppermute(y, "pp", perm)
            return (x_next, cache_new, outs), None

        x0 = jnp.zeros((ub, s, d), model.dtype)
        outs0 = jnp.zeros((n_micro, ub, 1, d), model.dtype)
        (_, cache_local, outs), _ = jax.lax.scan(
            tick, (x0, cache_local, outs0), jnp.arange(ticks)
        )
        hidden = outs.reshape(b_l, 1, d)
        hidden = rms_norm(hidden, final_norm, model.rms_norm_eps)
        logits = wquant.mat(
            hidden, lm_head, preferred_element_type=jnp.float32
        )
        logits = jnp.where(p == pp - 1, logits, jnp.zeros_like(logits))
        return jax.lax.psum(logits, "pp"), cache_local

    logits, cache = run(
        params.layers, cache, jnp.asarray(input_ids, jnp.int32),
        cos, sin, embed_head,
    )
    return logits, cache


def decode_shadow_pp(
    model: ModelConfig,
    params: ModelParams,
    cache: ShadowCache,
    tokens: jnp.ndarray,  # [B, 1]
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    mesh,
    approx_topk: bool = False,
):
    """One sparse decode step with layers pipelined over mesh axis
    'pp'. Math identical to forward.decode_shadow's XLA path — the
    layer body is the same; only the execution schedule differs."""
    from shadowkv_tpu.core.layers import rms_norm
    from shadowkv_tpu.models.forward import _layer_qkv, _layer_tail

    pp = mesh.shape["pp"]
    dp = mesh.shape["dp"] if "dp" in mesh.axis_names else 1
    tp = mesh.shape["tp"] if "tp" in mesh.axis_names else 1
    b, qn = tokens.shape
    assert qn == 1, "pp decode steps one token at a time"
    assert b % dp == 0, (b, dp)
    b_l = b // dp  # per-dp-shard batch; all pipeline math is local
    n_micro = pp if b_l % pp == 0 else (b_l if b_l < pp else None)
    assert n_micro is not None, (
        f"per-dp-shard batch {b_l} must be divisible by pp={pp} "
        "(or smaller than it)"
    )
    ub = b_l // n_micro
    n_layers = model.num_layers
    assert n_layers % pp == 0, (n_layers, pp)
    lp_n = n_layers // pp

    # per-slot positions (continuous batching keeps gen_len as a [B]
    # vector; normalize so microbatch slicing is uniform)
    gen_vec = (
        cache.gen_len
        if cache.gen_len.ndim == 1
        else jnp.broadcast_to(cache.gen_len, (b,))
    )
    static, mut = split_cache(cache)
    layout = cache.layout

    ticks = n_micro + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    bdim = "dp" if dp > 1 else None

    def rep(x):
        return P(*([None] * x.ndim))

    # Manual-tp composition (round-1 weak #8 resolved): BOTH axes are
    # manual, so the Megatron psums are explicit lax.psum("tp") calls
    # in _layer_tail — every rank traces the identical program and the
    # collective ids match by construction (the GSPMD-auto tp attempt
    # deadlocked on divergent instance ids inside the tick scan, commit
    # 2772c9e). Weights arrive with their packed projection dims
    # PERMUTED per rank (mesh_lib.permute_packed_for_tp) so the plain
    # block shard below is exactly one Megatron slice; the body then
    # runs the unmodified layer code on a head-scaled ModelConfig.
    model_l = model
    tp_axis = None
    if tp > 1:
        import dataclasses

        from shadowkv_tpu.parallel import mesh as mesh_lib

        assert layout.quant == "none", (
            "pp x tp serves kv_quant='none' (the int8 scale trailer is "
            "packed per GLOBAL head; the XLA scale reads assume local "
            "head count)"
        )
        model_l = dataclasses.replace(
            model,
            num_heads=model.num_heads // tp,
            num_kv_heads=model.num_kv_heads // tp,
        )
        tp_axis = "tp"
        lay_spec = mesh_lib.param_pspecs_pp(params, tp=True).layers
        cache_sp = mesh_lib.shadow_cache_pspecs_pp(cache, tp=True)
        static_spec = ShadowStaticSpecs(cache_sp)
        mut_spec = ShadowMutSpecs(cache_sp)
    else:
        def pp0(x):
            return P("pp", *([None] * (x.ndim - 1)))

        def pp_b(x):  # layer axis on pp, batch axis on dp
            return P("pp", bdim, *([None] * (x.ndim - 2)))

        lay_spec = jax.tree.map(pp0, params.layers)
        static_spec = jax.tree.map(pp_b, static)
        mut_spec = jax.tree.map(pp_b, mut)
    eh = (params.embed, params.final_norm, params.lm_head)
    eh_spec = jax.tree.map(rep, eh)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(lay_spec, static_spec, mut_spec, P(bdim, None),
                  P(bdim), eh_spec, P(None, None), P(None, None)),
        out_specs=(P(bdim, None, None), mut_spec),
        # BOTH axes are manual: dp rows are fully local to their chips
        # (no GSPMD in the body — auto-axis collectives interleaved
        # with the pipeline's ppermute deadlock, see the engine guard)
        axis_names=frozenset(mesh.axis_names),
        check_vma=False,  # axis_index-gated writes carry no vma
    )
    def run(layers_local, static_local, mut_local, tokens_l, gen_vec,
            eh, cos_table, sin_table):
        p = jax.lax.axis_index("pp")
        embed_tbl, final_norm, lm_head = eh
        x = wquant.take_rows(embed_tbl, tokens_l, model.dtype)
        kv_len = layout.prefill_len + gen_vec  # [b_l]
        positions = kv_len[:, None] + jnp.arange(qn)[None]
        cos_all = jnp.take(cos_table, positions, axis=0)
        sin_all = jnp.take(sin_table, positions, axis=0)
        x_parts = x.reshape(n_micro, ub, qn, -1)

        def run_stage(x_in, m, mut_local):
            lo = m * ub
            one = n_micro == 1  # static: whole batch is one microbatch
            # NOTE: per-tick slices of the read-only static state (u /
            # sv / landmarks / v_full) lean on XLA fusing the slice
            # into the downstream per-chunk gathers; with a single
            # microbatch no slice exists at all. If profiling shows
            # materialized slices, thread a batch offset through
            # shadow_decode_layer instead.
            mut_m = mut_local if one else _slice_b(mut_local, lo, ub, 1)
            static_m = (
                static_local if one else _slice_b(static_local, lo, ub, 1)
            )
            gen_m = jax.lax.dynamic_slice(gen_vec, (lo,), (ub,))
            cos_m = jax.lax.dynamic_slice_in_dim(cos_all, lo, ub, axis=0)
            sin_m = jax.lax.dynamic_slice_in_dim(sin_all, lo, ub, axis=0)

            def body(carry, inputs):
                xx, mm = carry
                layer, lpar = inputs
                q, k_r, _, v = _layer_qkv(model_l, lpar, xx, cos_m, sin_m)
                k_view, v_view, valid_len, mm = shadow_decode_layer(
                    model_l, layout, static_m, mm, gen_m, layer, q, k_r,
                    v, cos_table, sin_table, approx_topk=approx_topk,
                )
                ctx = decode_attention_hm(q, k_view, v_view, valid_len)
                return (
                    _layer_tail(lpar, model_l, xx, ctx, tp_axis), mm
                ), None

            xs = (jnp.arange(lp_n), layers_local)
            (y, mut_m), _ = jax.lax.scan(body, (x_in, mut_m), xs)
            if one:
                return y, mut_m
            return y, _unslice_b(mut_local, mut_m, lo, axis=1)

        def tick(carry, t):
            x_cur, mut_local, outs = carry
            m = t - p
            valid = jnp.logical_and(m >= 0, m < n_micro)
            mc = jnp.clip(m, 0, n_micro - 1)
            x_in = jnp.where(
                p == 0,
                jax.lax.dynamic_slice_in_dim(
                    x_parts, jnp.clip(t, 0, n_micro - 1), 1, axis=0
                )[0],
                x_cur,
            )

            y, mut_new = jax.lax.cond(
                valid,
                lambda ops: run_stage(*ops),
                lambda ops: (ops[0], ops[2]),
                (x_in, mc, mut_local),
            )
            written = jax.lax.dynamic_update_slice(
                outs, y[None].astype(outs.dtype), (mc, 0, 0, 0)
            )
            outs = jnp.where(
                jnp.logical_and(valid, p == pp - 1), written, outs
            )
            x_next = jax.lax.ppermute(y, "pp", perm)
            return (x_next, mut_new, outs), None

        outs0 = jnp.zeros((n_micro, ub, qn, x_parts.shape[-1]),
                          x_parts.dtype)
        (_, mut_local, outs), _ = jax.lax.scan(
            tick, (x_parts[0], mut_local, outs0), jnp.arange(ticks)
        )
        hidden = outs.reshape(b_l, qn, -1)
        hidden = rms_norm(hidden, final_norm, model.rms_norm_eps)
        logits = wquant.mat(
            hidden, lm_head, preferred_element_type=jnp.float32
        )
        logits = jnp.where(p == pp - 1, logits, jnp.zeros_like(logits))
        return jax.lax.psum(logits, "pp"), mut_local

    logits, mut = run(
        params.layers, static, mut, jnp.asarray(tokens, jnp.int32),
        gen_vec.astype(jnp.int32), eh, cos_table, sin_table,
    )
    cache = cache.replace(
        k_buf=mut.k_buf,
        v_buf=mut.v_buf,
        cached_ids=mut.cached_ids,
        gen_len=cache.gen_len + qn,
    )
    return logits, cache
