"""Device mesh construction and sharding rules.

The reference's only parallelism is NCCL data-parallel evaluation
(SURVEY §2.4). The TPU rebuild goes further (per BASELINE.json): a
(dp, tp) mesh where

- dp shards the batch,
- tp shards GQA KV heads — and with them the SV factors, landmark
  tables, compact buffers, and the V store. Chunk selection is per
  kv-head, so the entire sparse pipeline needs NO cross-chip
  communication; only the attention-output projection reduces over tp
  (one psum per layer, inserted by GSPMD from the shardings below).
- U is batch-sharded but replicated across tp (it is shared across
  heads, kv_cache.py:278-317), exactly as SURVEY §7.0 prescribes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shadowkv_tpu.cache.full import FullCache
from shadowkv_tpu.cache.shadow import ShadowCache
from shadowkv_tpu.core.layers import LayerParams, ModelParams


def build_mesh(dp: int, tp: int, sp: int = 1, devices=None) -> Mesh:
    """(dp, tp) mesh; sp > 1 inserts an 'sp' axis between them for
    sequence-parallel prefill (RuntimeConfig.sp). At decode the cache's
    batch dim shards over the ("dp", "sp") tuple (see
    shadow_cache_pspecs), so the same devices serve dp*sp batch shards.
    """
    devices = devices if devices is not None else jax.devices()
    n = dp * sp * tp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if sp > 1:
        arr = np.asarray(devices[:n]).reshape(dp, sp, tp)
        return Mesh(arr, ("dp", "sp", "tp"))
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def build_mesh_pp(
    pp: int, tp: int = 1, dp: int = 1, devices=None
) -> Mesh:
    """('pp',) / ('pp', 'dp') mesh for layer-pipelined decode
    (parallel/pipeline.py) — both axes are MANUAL in the pipeline's
    shard_map (dp shards the batch; every microbatch slice is local).
    The ('pp', 'tp') form exists for when partial-manual collective
    sequencing works (see the engine's pp x tp guard)."""
    devices = devices if devices is not None else jax.devices()
    n = pp * tp * dp
    assert tp == 1 or dp == 1
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    if dp > 1:
        return Mesh(
            np.asarray(devices[:n]).reshape(pp, dp), ("pp", "dp")
        )
    if tp > 1:
        return Mesh(
            np.asarray(devices[:n]).reshape(pp, tp), ("pp", "tp")
        )
    return Mesh(np.asarray(devices[:pp]), ("pp",))


def _pp0(leaf):
    return P("pp", *([None] * (leaf.ndim - 1)))


def permute_packed_for_tp(params: ModelParams, model, tp: int) -> ModelParams:
    """Reorder the PACKED projection dims so a contiguous 1/tp block is
    exactly one Megatron shard.

    wqkv is packed [D, q(H*Dh) | k(K*Dh) | v(K*Dh)] and w_gate_up
    [D, gate(I) | up(I)]; a plain block-shard of those dims would hand
    rank 0 nothing but query heads. MANUAL-tp shard_map (the pp x tp
    pipeline) sees raw block shards, so the columns are permuted ONCE at
    engine init into per-rank groups [q_r | k_r | v_r] / [gate_r | up_r]
    — inside the shard the layout is again the standard packed form for
    the LOCAL head/ffn counts, and qkv_proj/swiglu_mlp work unchanged on
    a head-scaled ModelConfig. wo / w_down shard their INPUT dim, whose
    row order (by head / ffn block) is already contiguous per rank.

    (The GSPMD tp path never needs this: auto-sharding repartitions the
    packed-dim splits itself.)
    """
    import jax.numpy as jnp

    from shadowkv_tpu.core.wquant import QTensor

    h, kh, dh = model.num_heads, model.num_kv_heads, model.head_dim
    i = model.intermediate_size
    assert h % tp == 0 and kh % tp == 0 and i % tp == 0, (h, kh, i, tp)
    hl, kl, il = h // tp, kh // tp, i // tp

    def ranges(*sections):
        # sections: (offset, per_rank_width) in the packed dim
        idx = []
        for r in range(tp):
            for off, w in sections:
                idx.append(off + r * w + jnp.arange(w))
        return jnp.concatenate(idx)

    qkv_idx = ranges(
        (0, hl * dh), (h * dh, kl * dh), ((h + kh) * dh, kl * dh)
    )
    gu_idx = ranges((0, il), (i, il))

    def take_last(leaf, idx):
        if leaf is None:
            return None
        if isinstance(leaf, QTensor):
            return QTensor(
                q=jnp.take(leaf.q, idx, axis=-1),
                s=jnp.take(leaf.s, idx, axis=-1),
            )
        return jnp.take(leaf, idx, axis=-1)

    lay = params.layers
    return params._replace(
        layers=lay._replace(
            wqkv=take_last(lay.wqkv, qkv_idx),
            bqkv=take_last(lay.bqkv, qkv_idx),
            w_gate_up=take_last(lay.w_gate_up, gu_idx),
        )
    )


def param_pspecs_pp(params: ModelParams, tp: bool = False) -> ModelParams:
    """Layer-stacked leaves shard their leading L axis over pp; the
    embedding/head/final-norm are replicated (QTensor-aware). With a
    tp axis present, the Megatron dims shard over tp exactly as in
    param_pspecs — GSPMD partitions them inside the pipeline body."""
    t = "tp" if tp else None
    lay = params.layers
    layer_specs = LayerParams(
        attn_norm=P("pp", None),
        wqkv=_wspec(lay.wqkv, P("pp", None, t)),
        bqkv=P("pp", t) if lay.bqkv is not None else None,
        wo=_wspec(lay.wo, P("pp", t, None)),
        mlp_norm=P("pp", None),
        w_gate_up=_wspec(lay.w_gate_up, P("pp", None, t)),
        w_down=_wspec(lay.w_down, P("pp", t, None)),
    )
    return ModelParams(
        embed=_wspec(params.embed, P(None, None), reduce_axis=-1),
        layers=layer_specs,
        final_norm=P(None),
        lm_head=_wspec(params.lm_head, P(None, t)),
    )


def shadow_cache_pspecs_pp(
    cache: ShadowCache, tp: bool = False, dp: bool = False
) -> ShadowCache:
    """Every [L, ...] cache leaf shards its layer axis over pp (each
    pipeline stage holds its own layers' factors, landmarks, buffers
    and V store); with tp, the KV-head dims shard over tp exactly as
    in shadow_cache_pspecs (U stays tp-replicated — shared across
    heads)."""
    assert not (tp and dp)
    t = "tp" if tp else None
    b = "dp" if dp else None

    def hd(leaf, head_axis):
        dims = [None] * leaf.ndim
        dims[0] = "pp"
        dims[1] = b
        dims[head_axis] = t
        return P(*dims)

    def pb(leaf):  # pp on layers, dp on batch, heads unsharded
        dims = [None] * leaf.ndim
        dims[0] = "pp"
        dims[1] = b
        return P(*dims)

    return ShadowCache(
        u=pb(cache.u),  # shared across heads -> tp-replicated
        sv=hd(cache.sv, 2),
        landmarks=hd(cache.landmarks, 2),
        landmark_mask=hd(cache.landmark_mask, 2),
        k_buf=hd(cache.k_buf, 2),
        v_buf=hd(cache.v_buf, 2),
        v_full=hd(cache.v_full, 2),
        cached_ids=hd(cache.cached_ids, 2),
        gen_len=(
            P()
            if cache.gen_len.ndim == 0
            else (P("dp") if dp else P(None))
        ),
        lm_scale=(
            None if cache.lm_scale is None else hd(cache.lm_scale, 2)
        ),
        layout=cache.layout,
    )


def _batch_axes(mesh: Mesh | None):
    """The mesh axes the batch dim shards over: ("dp", "sp") when the
    mesh carries a sequence-parallel axis (decode repurposes sp chips
    as extra batch shards), else "dp"."""
    if mesh is not None and "sp" in mesh.axis_names:
        return ("dp", "sp")
    return "dp"


def _wspec(leaf, spec: P, reduce_axis: int = -2):
    """Spec for a weight leaf: plain arrays keep ``spec``; QTensor
    leaves (int8 weight-only quantization, core/wquant.py) pair it with
    the scale's spec — the contracted dim the scale collapsed is
    dropped. A tp-sharded input dim (wo / w_down) simply vanishes: the
    per-output scale is replicated, which is exactly what makes the
    scale-after-psum math exact."""
    from shadowkv_tpu.core.wquant import QTensor

    if isinstance(leaf, QTensor):
        dims = list(spec)
        del dims[reduce_axis]
        return QTensor(q=spec, s=P(*dims))
    return spec


def param_pspecs(params: ModelParams) -> ModelParams:
    """Megatron-style tensor-parallel PartitionSpecs for the weights.

    QKV / gate-up shard their output (head / ffn) dim on tp; wo and
    w_down shard their input dim so the following matmul produces a
    partial sum that GSPMD turns into one psum per layer.
    """
    lay = params.layers
    layer_specs = LayerParams(
        attn_norm=P(None, None),
        wqkv=_wspec(lay.wqkv, P(None, None, "tp")),
        bqkv=P(None, "tp") if lay.bqkv is not None else None,
        wo=_wspec(lay.wo, P(None, "tp", None)),
        mlp_norm=P(None, None),
        w_gate_up=_wspec(lay.w_gate_up, P(None, None, "tp")),
        w_down=_wspec(lay.w_down, P(None, "tp", None)),
    )
    return ModelParams(
        embed=_wspec(params.embed, P(None, None), reduce_axis=-1),
        layers=layer_specs,
        final_norm=P(None),
        lm_head=_wspec(params.lm_head, P(None, "tp")),
    )


def full_cache_pspecs(cache: FullCache, mesh: Mesh | None = None) -> FullCache:
    b = _batch_axes(mesh)
    return FullCache(
        k=P(None, b, "tp", None, None),
        v=P(None, b, "tp", None, None),
        length=P(),
    )


def shadow_cache_pspecs(
    cache: ShadowCache, mesh: Mesh | None = None
) -> ShadowCache:
    b = _batch_axes(mesh)
    return ShadowCache(
        u=P(None, b, None, None),  # shared across heads -> tp-replicated
        sv=P(None, b, "tp", None, None),
        landmarks=P(None, b, "tp", None, None),
        landmark_mask=P(None, b, "tp", None),
        k_buf=P(None, b, "tp", None, None),
        v_buf=P(None, b, "tp", None, None),
        v_full=P(None, b, "tp", None, None),
        cached_ids=P(None, b, "tp", None),
        gen_len=P(),
        lm_scale=(
            None if cache.lm_scale is None else P(None, b, "tp", None)
        ),
        layout=cache.layout,
    )


def shard_pytree(mesh: Mesh, tree, pspecs):
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, spec: (
            x if x is None else jax.device_put(x, NamedSharding(mesh, spec))
        ),
        tree,
        pspecs,
        is_leaf=lambda x: x is None,
    )
