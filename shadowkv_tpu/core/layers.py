"""Transformer layer building blocks (pure functions over param pytrees).

The reference delegates these to flashinfer/vllm custom CUDA ops
(rmsnorm: models/tensor_op.py:34-39; silu_and_mul: models/llama.py:418).
On TPU these are elementwise/VPU ops XLA fuses into adjacent matmuls,
so plain jnp IS the idiomatic fast path.

Parameters for all layers are stacked along a leading layer axis so the
forward pass can ``lax.scan`` over layers (one compiled layer body
instead of the reference's eager per-layer Python loop,
models/base.py:147).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LayerParams(NamedTuple):
    """Weights for one transformer block (or stacked [L, ...] for scan).

    Fused projections mirror the reference's weight containers
    (models/llama.py:59-152 fuses wqkv and gate_up_proj).
    """

    attn_norm: jnp.ndarray  # [D]
    wqkv: jnp.ndarray  # [D, (H + 2K) * Dh]
    bqkv: Optional[jnp.ndarray]  # [(H + 2K) * Dh] or None
    wo: jnp.ndarray  # [H * Dh, D]
    mlp_norm: jnp.ndarray  # [D]
    w_gate_up: jnp.ndarray  # [D, 2 * I]
    w_down: jnp.ndarray  # [I, D]


class ModelParams(NamedTuple):
    embed: jnp.ndarray  # [V, D]
    layers: LayerParams  # leaves stacked [L, ...]
    final_norm: jnp.ndarray  # [D]
    lm_head: jnp.ndarray  # [D, V]


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm in fp32 accumulation, output in x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(x.dtype)


def qkv_proj(
    x: jnp.ndarray,
    layer: LayerParams,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused QKV projection.

    Args:
      x: [B, S, D] (already normed).
    Returns:
      q: [B, S, H, Dh], k: [B, S, K, Dh], v: [B, S, K, Dh]
    """
    from shadowkv_tpu.core.wquant import mat, wslice

    q_size = num_heads * head_dim
    kv_size = num_kv_heads * head_dim
    b, s = x.shape[:2]
    if b * s > 4 * MLP_CHUNK_TOKENS:
        # Long prefill: three dots against static weight slices. The
        # fused form materializes the [S, (H+2K)*Dh] output AND the
        # three slice copies (~3.8 GB/layer at 244K — the prefill HBM
        # peak); split, only q/k/v themselves exist. Identical math —
        # same contraction, the weight slice is static. The extra
        # weight reads are noise next to S-sized activations.
        splits = []
        for lo_, hi in (
            (0, q_size),
            (q_size, q_size + kv_size),
            (q_size + kv_size, q_size + 2 * kv_size),
        ):
            part = mat(x, wslice(layer.wqkv, lo_, hi))
            if layer.bqkv is not None:
                part = part + layer.bqkv[lo_:hi].astype(part.dtype)
            splits.append(part)
        q, k, v = splits
    else:
        qkv = mat(x, layer.wqkv)
        if layer.bqkv is not None:
            qkv = qkv + layer.bqkv.astype(qkv.dtype)
        q = qkv[..., :q_size]
        k = qkv[..., q_size : q_size + kv_size]
        v = qkv[..., q_size + kv_size :]
    return (
        q.reshape(b, s, num_heads, head_dim),
        k.reshape(b, s, num_kv_heads, head_dim),
        v.reshape(b, s, num_kv_heads, head_dim),
    )


def o_proj(attn_out: jnp.ndarray, layer: LayerParams) -> jnp.ndarray:
    """[B, S, H, Dh] -> [B, S, D]."""
    from shadowkv_tpu.core.wquant import mat

    b, s = attn_out.shape[:2]
    flat = attn_out.reshape(b, s, -1)
    return mat(flat, layer.wo)


MLP_CHUNK_TOKENS = 16384  # token-block size for the chunked long-prefill MLP


def _swiglu(x: jnp.ndarray, layer: LayerParams) -> jnp.ndarray:
    from shadowkv_tpu.core.wquant import mat

    gate_up = mat(x, layer.w_gate_up)
    gate, up = jnp.split(gate_up, 2, axis=-1)
    hidden = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return mat(hidden, layer.w_down)


def swiglu_mlp(x: jnp.ndarray, layer: LayerParams) -> jnp.ndarray:
    """SwiGLU MLP with fused gate/up projection.

    Matches reference post_attention_compute (models/llama.py:397-427).
    Above ~64K tokens the gate/up intermediate is chunked over token
    blocks exactly like the reference (models/base.py:351-364): XLA
    materializes the [S, 2I] intermediate otherwise (2.8 GB per layer
    at 122K — measured as the prefill-OOM margin on a 16 GB chip).
    """
    b, s, d = x.shape
    if b * s <= 4 * MLP_CHUNK_TOKENS:
        return _swiglu(x, layer)
    from shadowkv_tpu.core.wquant import QTensor

    if isinstance(layer.w_gate_up, QTensor) or isinstance(
        layer.w_down, QTensor
    ):
        # Dequantize ONCE before the chunk scan: XLA re-materializes the
        # int8->bf16 weight cast inside every scan iteration otherwise
        # (~8 x 69 MB per layer at 122K — measured as wq8's 2.6x prefill
        # blowup, logs/bench_wq8). One bf16 copy per layer is ~69 MB
        # transient vs the 2.8 GB intermediate this chunking avoids.
        def _deq(w):
            return (
                (w.q.astype(x.dtype) * w.s.astype(x.dtype))
                if isinstance(w, QTensor)
                else w
            )

        layer = layer._replace(
            w_gate_up=_deq(layer.w_gate_up), w_down=_deq(layer.w_down)
        )
    blk = MLP_CHUNK_TOKENS
    s_pad = ((s + blk - 1) // blk) * blk
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad != s else x
    nb = s_pad // blk
    xb = xp.reshape(b, nb, blk, d).transpose(1, 0, 2, 3)

    def body(_, xi):
        return None, _swiglu(xi, layer)

    _, yb = jax.lax.scan(body, None, xb)
    y = yb.transpose(1, 0, 2, 3).reshape(b, s_pad, d)
    return y[:, :s]
