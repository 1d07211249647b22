"""Rotary position embeddings, TPU-first.

The reference uses vllm custom CUDA ops during prefill
(``models/llama.py:296``) and bespoke decode/push-cache kernels
(``kernels/rope_new.cu``). On TPU, RoPE is a handful of elementwise ops
that XLA fuses into the surrounding matmuls, so the base implementation
is plain jnp; the fused reconstruction Pallas kernel re-implements the
same math in-register (see shadowkv_tpu/kernels/reconstruct.py).

Two styles are supported, matching the reference model zoo:

- 'neox' (llama / yi / qwen2 / phi3): rotate-half over the full head
  dim, cos/sin each of size head_dim with the half-frequencies repeated
  (reference models/tensor_op.py:120-151).
- 'glm' (GLM-4): interleaved (even, odd) pairs over only the first 64
  dims; the remaining dims pass through unchanged (reference
  models/glm.py:261-273, kernels/rope_new.cu:429-534).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import ModelConfig


def _llama3_scale_inv_freq(inv_freq, scaling: dict):
    """Llama-3.1 NTK-by-parts frequency scaling (HF semantics).

    Computed in float64 numpy at trace time: jnp fp32 transcendentals
    drift ~1e-5 relative vs torch fp32, which amplifies to O(1e-2) logit
    deviation at long range; float64 then a single cast matches HF's
    fp32 tables to 1 ulp.
    """
    import numpy as np

    inv_freq = np.asarray(inv_freq, np.float64)
    factor = scaling["factor"]
    low_freq_factor = scaling.get("low_freq_factor", 1.0)
    high_freq_factor = scaling.get("high_freq_factor", 4.0)
    old_max = scaling.get("original_max_position_embeddings", 8192)

    low_freq_wavelen = old_max / low_freq_factor
    high_freq_wavelen = old_max / high_freq_factor
    wavelen = 2 * math.pi / inv_freq

    scaled = np.where(wavelen > low_freq_wavelen, inv_freq / factor, inv_freq)
    smooth = (old_max / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
    is_medium = (wavelen <= low_freq_wavelen) & (wavelen >= high_freq_wavelen)
    return np.where(is_medium, smoothed, scaled)


def compute_inv_freq(cfg: ModelConfig) -> jnp.ndarray:
    """[rope_dim // 2] inverse frequencies in fp32 (float64 internally
    for parity with HF tables; see _llama3_scale_inv_freq)."""
    import numpy as np

    dim = cfg.rope_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim)
    )
    scaling = cfg.rope_scaling_dict
    if scaling and scaling.get("rope_type") in ("llama3", "llama3.1"):
        inv_freq = _llama3_scale_inv_freq(inv_freq, scaling)
    return jnp.asarray(inv_freq, jnp.float32)


def compute_cos_sin(
    cfg: ModelConfig, max_len: int, dtype=jnp.float32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute (cos, sin), each [max_len, rope_dim // 2].

    Stored at half width: 'neox' repeats halves at apply time, 'glm'
    interleaves pairs. Keeping the table half-width is what the
    reference's fused cache does (models/llama.py:322-332 keeps only the
    first 64 columns of each).
    """
    inv_freq = compute_inv_freq(cfg)
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_len, rope_dim//2]
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def inv_freq_full_neox(cfg: ModelConfig) -> jnp.ndarray:
    """[1, head_dim] per-lane inverse frequencies for the fused refresh
    kernel's in-register RoPE (kernels/reconstruct.py):

    - 'neox': the half-table duplicated (lane l pairs with l +- Dh/2);
    - 'glm' (interleaved partial): lane l < rope_dim uses invf[l // 2],
      lanes past rope_dim get 0 (cos=1/sin=0 -> pass-through).
    """
    invf = compute_inv_freq(cfg)  # [rope_dim // 2]
    if cfg.rope_style == "neox":
        assert cfg.rope_dim == cfg.head_dim
        return jnp.concatenate([invf, invf])[None]
    full = jnp.zeros((cfg.head_dim,), jnp.float32)
    full = full.at[: cfg.rope_dim].set(jnp.repeat(invf, 2))
    return full[None]


def apply_rope(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    style: str = "neox",
) -> jnp.ndarray:
    """Apply rotary embedding.

    Args:
      x: [B, seq, H, head_dim] queries or keys (BSHD layout).
      cos/sin: [seq, rope_dim // 2] gathered for these positions, or
        [B, seq, rope_dim // 2] when positions differ per batch row
        (continuous batching: per-slot generation lengths).
      style: 'neox' or 'glm'.
    """
    orig_dtype = x.dtype
    half = cos.shape[-1]
    # bf16 inputs rotate in bf16: upcasting the bulk array materializes
    # a full f32 copy (960 MB per layer at 122K prefill — the single
    # biggest HBM temp in the program), for ~2^-8 relative output error
    # either way after the cast back. f32 models keep f32 math (HF
    # parity tests compare exactly).
    xf = x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)
    # Broadcast tables over (batch, heads): [1|B, seq, 1, half]
    if cos.ndim == 3:
        shape = (cos.shape[0], cos.shape[1], 1, half)
    else:
        shape = (1, cos.shape[0], 1, half)
    c = cos.reshape(shape).astype(xf.dtype)
    s = sin.reshape(shape).astype(xf.dtype)

    if style == "neox":
        assert 2 * half == x.shape[-1]
        # Full-width rotate-half with the sign folded into the SIN
        # table: rot(x) = concat([-x2, x1]) = roll(x, half) * [-1|+1],
        # so out = x * [c|c] + roll(x, half) * [-s|s]. Any half-width
        # [.., 64] bf16 temp pads 2x in lanes (2 x 480 MB per layer at
        # 122K prefill); the roll keeps everything at [.., dim] and the
        # sign lives in the (sequence-sized, loop-hoisted) table.
        cf = jnp.concatenate([c, c], axis=-1)
        sf = jnp.concatenate([-s, s], axis=-1)
        out = xf * cf + jnp.roll(xf, half, axis=-1) * sf
    elif style == "glm":
        rot = 2 * half  # rotated prefix (64 for GLM-4)
        xr = xf[..., :rot]
        x_pass = xf[..., rot:]
        x_even = xr[..., 0::2]
        x_odd = xr[..., 1::2]
        r_even = x_even * c - x_odd * s
        r_odd = x_odd * c + x_even * s
        rotated = jnp.stack([r_even, r_odd], axis=-1).reshape(xr.shape)
        out = jnp.concatenate([rotated, x_pass], axis=-1)
    else:
        raise ValueError(f"unknown rope style: {style}")
    return out.astype(orig_dtype)


def apply_rope_chunked(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    style: str = "neox",
    max_chunks: int = 8,
) -> jnp.ndarray:
    """apply_rope with HBM temps bounded by a lax.map over sequence
    chunks.

    At 122K prefill the one-shot rotation keeps ~3 full [B, S, H, Dh]
    temporaries live (the roll's slice pair plus the output) — ~1.4 GB
    per layer for Q — which is what stands between batch 3 and batch 4
    on a 16 GB chip. Chunking turns all but the output buffer into
    1/n_chunks-sized loop temps; RoPE is bandwidth-bound so the loop
    costs nothing. Only the B == 1 sub-batch layout reshapes freely to
    chunk-major, so other shapes fall back to the fused form.
    """
    b, s = x.shape[0], x.shape[1]
    n = next((c for c in range(max_chunks, 1, -1) if s % c == 0), 1)
    if b != 1 or n <= 1 or s < 16384:
        return apply_rope(x, cos, sin, style)
    cs = s // n
    xc = x.reshape((n, cs) + x.shape[2:])
    cc = cos.reshape(n, cs, -1)
    sc = sin.reshape(n, cs, -1)
    out = jax.lax.map(
        lambda args: apply_rope(args[0][None], args[1], args[2], style)[0],
        (xc, cc, sc),
    )
    return out.reshape(x.shape)


def rotate_with_tables(
    x: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    style: str = "neox",
) -> jnp.ndarray:
    """Core rotation with pre-gathered tables.

    Args:
      x: [..., head_dim]; cos/sin: [..., rope_dim // 2] broadcastable
        against x's leading dims.
    """
    orig_dtype = x.dtype
    half = cos.shape[-1]
    xf = x.astype(jnp.float32)
    c = cos.astype(jnp.float32)
    s = sin.astype(jnp.float32)
    if c.ndim < x.ndim:
        c = jnp.expand_dims(c, tuple(range(x.ndim - c.ndim)))
        s = jnp.expand_dims(s, tuple(range(x.ndim - s.ndim)))
    if style == "neox":
        x1 = xf[..., :half]
        x2 = xf[..., half:]
        out = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    elif style == "glm":
        rot = 2 * half
        xr = xf[..., :rot]
        x_pass = xf[..., rot:]
        x_even = xr[..., 0::2]
        x_odd = xr[..., 1::2]
        r_even = x_even * c - x_odd * s
        r_odd = x_odd * c + x_even * s
        rotated = jnp.stack([r_even, r_odd], axis=-1).reshape(xr.shape)
        out = jnp.concatenate([rotated, x_pass], axis=-1)
    else:
        raise ValueError(f"unknown rope style: {style}")
    return out.astype(orig_dtype)


def apply_rope_at(
    x: jnp.ndarray,
    positions: jnp.ndarray,
    cos_table: jnp.ndarray,
    sin_table: jnp.ndarray,
    style: str = "neox",
) -> jnp.ndarray:
    """Apply RoPE at arbitrary (possibly non-contiguous) positions.

    Used by the K-reconstruction path, where selected chunks carry their
    original absolute positions (reference kv_cache.py:447-470 applies
    ``rope_func(result, position_ids)`` after the U x SV matmul).

    Args:
      x: [..., n, head_dim]
      positions: [..., n] int32 absolute positions, broadcastable against
        x's leading dims.
      cos_table/sin_table: [max_len, rope_dim // 2].
    """
    cos = jnp.take(cos_table, positions, axis=0)
    sin = jnp.take(sin_table, positions, axis=0)
    return rotate_with_tables(x, cos, sin, style)
