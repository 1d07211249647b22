"""Parameter initialization and HF safetensors loading.

The reference streams HF weights per layer to GPU and frees the torch
module (models/llama.py:303-352). Here weights load from safetensors
shards directly into stacked [L, ...] jnp arrays (no torch in the
path), fusing wq/wk/wv -> wqkv and gate/up -> w_gate_up the way the
reference's weight containers do (models/llama.py:59-152).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.config import ModelConfig
from shadowkv_tpu.core.layers import LayerParams, ModelParams


def init_synthetic_params(
    cfg: ModelConfig, key: jax.Array, scale: float = 0.02
) -> ModelParams:
    """Random weights with the right shapes (benchmarks / tests)."""
    keys = jax.random.split(key, 8)
    l, d = cfg.num_layers, cfg.hidden_size
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    dt = cfg.dtype

    def rnd(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    layers = LayerParams(
        attn_norm=jnp.ones((l, d), dt),
        wqkv=rnd(keys[0], (l, d, qkv_out)),
        bqkv=jnp.zeros((l, qkv_out), dt) if cfg.qkv_bias else None,
        wo=rnd(keys[1], (l, cfg.q_size, d)),
        mlp_norm=jnp.ones((l, d), dt),
        w_gate_up=rnd(keys[2], (l, d, 2 * cfg.intermediate_size)),
        w_down=rnd(keys[3], (l, cfg.intermediate_size, d)),
    )
    embed = rnd(keys[4], (cfg.vocab_size, d))
    return ModelParams(
        embed=embed,
        layers=layers,
        final_norm=jnp.ones((d,), dt),
        lm_head=embed.T if cfg.tie_word_embeddings else rnd(keys[5], (d, cfg.vocab_size)),
    )


def save_params_npz(params: ModelParams, path: str) -> None:
    """Flat npz snapshot of a ModelParams pytree (bf16 leaves saved as
    uint16 bit-patterns — np.savez has no native bfloat16). Used by the
    bench-shape locality trainer (scripts/train_bench_weights.py) so
    bench.py can run on TRAINED weights (BENCH_WEIGHTS=dir)."""
    flat = {
        "embed": params.embed,
        "final_norm": params.final_norm,
        "lm_head": params.lm_head,
    }
    for f in LayerParams._fields:
        v = getattr(params.layers, f)
        if v is not None:
            flat[f"layers.{f}"] = v
    out = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            out[k + ".bf16"] = a.view(np.uint16)
        else:
            out[k] = a
    np.savez(path, **out)


def load_params_npz(
    path: str, weight_quant: str = "none"
) -> ModelParams:
    """Load a save_params_npz snapshot; ``weight_quant='int8'``
    quantizes matmul weights host-side during the load (per-channel,
    bit-identical to core/wquant) so the device never holds the bf16
    copy — the disk-side analogue of the in-loader quant that cost
    ~150 s of prefill budget at bench r2."""
    from shadowkv_tpu.core.wquant import QTensor

    z = np.load(path)
    flat = {}
    for k in z.files:
        if k.endswith(".bf16"):
            flat[k[:-5]] = z[k].view(jnp.bfloat16)
        else:
            flat[k] = z[k]
    q8 = weight_quant == "int8"

    def leaf(name, mat=False, reduce_axis=-2):
        v = flat.get(name)
        if v is None:
            return None
        if mat and q8:
            return QTensor(*map(
                jnp.asarray,
                _quantize_np(v.astype(np.float32), reduce_axis),
            ))
        return jnp.asarray(v)

    layers = LayerParams(
        attn_norm=leaf("layers.attn_norm"),
        wqkv=leaf("layers.wqkv", mat=True),
        bqkv=leaf("layers.bqkv"),
        wo=leaf("layers.wo", mat=True),
        mlp_norm=leaf("layers.mlp_norm"),
        w_gate_up=leaf("layers.w_gate_up", mat=True),
        w_down=leaf("layers.w_down", mat=True),
    )
    return ModelParams(
        embed=leaf("embed", mat=True, reduce_axis=-1),
        layers=layers,
        final_norm=leaf("final_norm"),
        lm_head=leaf("lm_head", mat=True),
    )


# ---------------------------------------------------------------------------
# HF safetensors loading (no torch dependency)
# ---------------------------------------------------------------------------


def _open_shards(model_dir: str):
    from safetensors import safe_open

    index_path = os.path.join(model_dir, "model.safetensors.index.json")
    shard_of: dict[str, str] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            shard_of = json.load(f)["weight_map"]
    else:
        single = os.path.join(model_dir, "model.safetensors")
        with safe_open(single, framework="np") as f:
            for k in f.keys():
                shard_of[k] = "model.safetensors"
    handles: dict[str, object] = {}

    def get(name: str) -> np.ndarray:
        shard = shard_of[name]
        if shard not in handles:
            handles[shard] = safe_open(
                os.path.join(model_dir, shard), framework="np"
            )
        return handles[shard].get_tensor(name)

    return get, shard_of


def init_synthetic_params_host(
    cfg: ModelConfig, seed: int = 0, weight_quant: str = "none",
    scale: float = 0.02,
) -> ModelParams:
    """Synthetic weights staged in HOST numpy, each leaf converted to
    its final dtype (cfg.dtype or int8 QTensor) before touching the
    device — required for 8B-scale bench models, where a device bf16
    init would fill the 16 GB chip before quantization could run."""
    from shadowkv_tpu.core.wquant import QTensor

    rng = np.random.default_rng(seed)
    np_dt = np.dtype(cfg.dtype)
    q8 = weight_quant == "int8"
    l, d = cfg.num_layers, cfg.hidden_size
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim

    def w(shape, reduce_axis=-2):
        x = (rng.standard_normal(shape, np.float32) * scale)
        if q8:
            return QTensor(*map(
                jnp.asarray, _quantize_np(x, reduce_axis=reduce_axis)
            ))
        return jnp.asarray(x.astype(np_dt))

    layers = LayerParams(
        attn_norm=jnp.ones((l, d), cfg.dtype),
        wqkv=w((l, d, qkv_out)),
        bqkv=jnp.zeros((l, qkv_out), cfg.dtype) if cfg.qkv_bias else None,
        wo=w((l, cfg.q_size, d)),
        mlp_norm=jnp.ones((l, d), cfg.dtype),
        w_gate_up=w((l, d, 2 * cfg.intermediate_size)),
        w_down=w((l, cfg.intermediate_size, d)),
    )
    return ModelParams(
        embed=w((cfg.vocab_size, d), reduce_axis=-1),
        layers=layers,
        final_norm=jnp.ones((d,), cfg.dtype),
        lm_head=w((d, cfg.vocab_size)),
    )


def _quantize_np(w: np.ndarray, reduce_axis: int = -2):
    """Host-side mirror of core/wquant.quantize_weight (same math so
    loader-quantized and jit-quantized params are bit-identical)."""
    amax = np.max(np.abs(w), axis=reduce_axis)
    s = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(
        np.round(w / np.expand_dims(s, reduce_axis)), -127, 127
    ).astype(np.int8)
    return q, s.astype(np.float32)


def load_hf_params(
    model_dir: str, cfg: ModelConfig, weight_quant: str = "none"
) -> ModelParams:
    """Load an HF safetensors checkpoint into stacked params.

    Handles the reference model zoo's weight layouts (reference
    models/llama.py:303-352, qwen.py, phi3.py:116-121, glm.py:117-118):

    - llama-3/3.1 / Yi / Qwen2 / GLM-4(hf): separate q/k/v projections
      (biases when cfg.qkv_bias), separate gate/up MLP;
    - Phi-3: pre-fused ``qkv_proj`` and ``gate_up_proj``.

    HF stores projections as [out, in]; we transpose to [in, out] for
    x @ W matmuls and fuse along the output dim.

    All staging happens in HOST numpy: per-layer tensors convert to
    their final dtype (cfg.dtype, or int8 QTensors when
    ``weight_quant='int8'``) before anything touches the device, so
    the device peak is the final params — quantize-after-load would
    put bf16 AND int8 copies of an 8B model on a 16 GB chip at once,
    and the old per-layer f32 device staging alone was 2x the model.
    """
    from shadowkv_tpu.core.wquant import QTensor

    get, shard_of = _open_shards(model_dir)
    np_dt = np.dtype(cfg.dtype)
    q8 = weight_quant == "int8"
    assert weight_quant in ("none", "int8"), weight_quant

    def t(name):
        return get(name).astype(np.float32)

    def has(name):
        return name in shard_of

    def w_final(w: np.ndarray):
        """f32 [in, out] host weight -> final-dtype host leaf."""
        return _quantize_np(w) if q8 else w.astype(np_dt)

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        if has(p + "self_attn.qkv_proj.weight"):  # phi3-style fused
            wqkv = t(p + "self_attn.qkv_proj.weight").T
            bqkv = (
                t(p + "self_attn.qkv_proj.bias")
                if has(p + "self_attn.qkv_proj.bias")
                else None
            )
        else:
            wqkv = np.concatenate(
                [
                    t(p + "self_attn.q_proj.weight").T,
                    t(p + "self_attn.k_proj.weight").T,
                    t(p + "self_attn.v_proj.weight").T,
                ],
                axis=-1,
            )
            bqkv = None
            if cfg.qkv_bias and has(p + "self_attn.q_proj.bias"):
                bqkv = np.concatenate(
                    [
                        t(p + "self_attn.q_proj.bias"),
                        t(p + "self_attn.k_proj.bias"),
                        t(p + "self_attn.v_proj.bias"),
                    ],
                    axis=-1,
                )
        if has(p + "mlp.gate_up_proj.weight"):  # phi3/glm fused
            w_gate_up = t(p + "mlp.gate_up_proj.weight").T
        else:
            w_gate_up = np.concatenate(
                [
                    t(p + "mlp.gate_proj.weight").T,
                    t(p + "mlp.up_proj.weight").T,
                ],
                axis=-1,
            )
        layers.append(
            LayerParams(
                attn_norm=t(p + "input_layernorm.weight").astype(np_dt),
                wqkv=w_final(wqkv),
                bqkv=None if bqkv is None else bqkv.astype(np_dt),
                mlp_norm=t(
                    p + "post_attention_layernorm.weight"
                ).astype(np_dt),
                wo=w_final(t(p + "self_attn.o_proj.weight").T),
                w_gate_up=w_final(w_gate_up),
                w_down=w_final(t(p + "mlp.down_proj.weight").T),
            )
        )

    # stack per-leaf on host ((q, s) tuples stack leaf-wise), then one
    # device transfer per leaf
    stacked = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs)), *layers
    )
    if q8:
        stacked = LayerParams(
            attn_norm=stacked.attn_norm,
            wqkv=QTensor(*stacked.wqkv),
            bqkv=stacked.bqkv,
            wo=QTensor(*stacked.wo),
            mlp_norm=stacked.mlp_norm,
            w_gate_up=QTensor(*stacked.w_gate_up),
            w_down=QTensor(*stacked.w_down),
        )
    embed_np = t("model.embed_tokens.weight")
    if cfg.tie_word_embeddings or not has("lm_head.weight"):
        lm_head_np = embed_np.T
    else:
        lm_head_np = t("lm_head.weight").T
    if q8:
        embed = QTensor(
            *map(jnp.asarray, _quantize_np(embed_np, reduce_axis=-1))
        )
        lm_head = QTensor(*map(jnp.asarray, _quantize_np(lm_head_np)))
    else:
        embed = jnp.asarray(embed_np.astype(np_dt))
        lm_head = jnp.asarray(lm_head_np.astype(np_dt))
    return ModelParams(
        embed=embed,
        layers=stacked,
        final_norm=jnp.asarray(t("model.norm.weight").astype(np_dt)),
        lm_head=lm_head,
    )
