"""Weight-only int8 quantization for the dense compute path.

Beyond-reference capability (the reference keeps bf16 weights on an
80 GB A100; a v5e chip has 16 GB): per-output-channel symmetric int8
weights halve the HBM bytes of every weight read. Decode is
weight-bandwidth-bound, so this directly buys decode latency AND it is
what lets the real Llama-3-8B shape (16 GB of bf16 weights) fit on one
chip next to the shadow KV state.

Design: a ``QTensor`` pytree leaf-pair (int8 values + f32 per-output
scale). The matmul dequantizes by casting int8 -> activation dtype
inside the dot (XLA fuses the convert into the dot's operand read, so
HBM traffic stays int8) and scales the OUTPUT columns: for a
per-column scale s_j,  x @ (q * s) == (x @ q) * s.  That identity is
also what makes tensor-parallel partial sums correct: scaling before
or after the GSPMD-inserted psum is the same number.

Everything here is pure jnp; the QTensor leaves ride ``lax.scan`` over
layers and ``NamedSharding`` pytrees unchanged (see
``parallel/mesh.py::param_pspecs``).
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from shadowkv_tpu.core.layers import LayerParams, ModelParams


class QTensor(NamedTuple):
    """int8 weight + per-output-channel f32 scale.

    ``q`` keeps the original weight shape; ``s`` drops the contracted
    (input) dim — for a [in, out] weight it is [out], for stacked
    [L, in, out] it is [L, out].
    """

    q: jnp.ndarray
    s: jnp.ndarray


Weight = Union[jnp.ndarray, QTensor]


def quantize_weight(w: jnp.ndarray, reduce_axis: int = -2) -> QTensor:
    """Symmetric per-output-channel int8 quantization.

    ``reduce_axis`` is the contracted (input) dim that the scale
    collapses; the default -2 fits [.., in, out] matmul weights. Use
    ``reduce_axis=-1`` for row-quantized tables (embeddings).
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=reduce_axis)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(wf / jnp.expand_dims(s, reduce_axis))
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return QTensor(q=q, s=s)


def mat(x: jnp.ndarray, w: Weight, preferred_element_type=None) -> jnp.ndarray:
    """``jnp.dot`` that transparently serves QTensor weights."""
    if isinstance(w, QTensor):
        y = jnp.dot(
            x,
            w.q.astype(x.dtype),
            preferred_element_type=preferred_element_type or x.dtype,
        )
        return (y * w.s.astype(y.dtype)).astype(y.dtype)
    return jnp.dot(
        x, w, preferred_element_type=preferred_element_type or x.dtype
    )


def wslice(w: Weight, lo: int, hi: int) -> Weight:
    """Static slice of the OUTPUT dim (last axis of q / of a plain w)."""
    if isinstance(w, QTensor):
        return QTensor(
            q=jax.lax.slice_in_dim(w.q, lo, hi, axis=-1),
            s=jax.lax.slice_in_dim(w.s, lo, hi, axis=-1),
        )
    return jax.lax.slice_in_dim(w, lo, hi, axis=-1)


def take_rows(table: Weight, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Embedding lookup serving plain [V, D] or row-quantized QTensor."""
    if isinstance(table, QTensor):
        rows = jnp.take(table.q, ids, axis=0).astype(dtype)
        scale = jnp.take(table.s, ids, axis=0).astype(dtype)
        return rows * scale[..., None]
    return jnp.take(table, ids, axis=0).astype(dtype)


def quantize_params(
    params: ModelParams, quantize_embed: bool = True
) -> ModelParams:
    """Quantize every matmul weight of a ModelParams pytree to int8.

    Norm weights and biases stay in their float dtype (they are [D]
    vectors — no memory to win, and norms are precision-sensitive).
    The embedding table is row-quantized (per-token scale) unless
    ``quantize_embed=False``.
    """
    lay = params.layers
    qlayers = LayerParams(
        attn_norm=lay.attn_norm,
        wqkv=quantize_weight(lay.wqkv),
        bqkv=lay.bqkv,
        wo=quantize_weight(lay.wo),
        mlp_norm=lay.mlp_norm,
        w_gate_up=quantize_weight(lay.w_gate_up),
        w_down=quantize_weight(lay.w_down),
    )
    return ModelParams(
        embed=(
            quantize_weight(params.embed, reduce_axis=-1)
            if quantize_embed
            else params.embed
        ),
        layers=qlayers,
        final_norm=params.final_norm,
        lm_head=quantize_weight(params.lm_head),
    )
