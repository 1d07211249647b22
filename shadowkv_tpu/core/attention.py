"""Attention primitives (jnp reference implementations).

The reference uses flash-attn / flashinfer CUDA kernels
(models/base.py:308-341). Here the jnp versions are the semantic
reference and the CPU-testable path; the Pallas flash-decode kernel over
the compact ShadowKV buffer lives in shadowkv_tpu/kernels/ and is tested
against these.

Conventions: q is [B, S, H, Dh], k/v are [B, T, K, Dh] with GQA
(H = K * G). Softmax is computed in fp32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gqa_scores(q: jnp.ndarray, k: jnp.ndarray, scale: float) -> jnp.ndarray:
    """q [B,S,K,G,Dh] x k [B,T,K,Dh] -> scores [B,K,G,S,T] fp32."""
    return jnp.einsum(
        "bskgd,btkd->bkgst",
        q,
        k,
        preferred_element_type=jnp.float32,
    ) * scale


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Plain (masked) GQA attention. mask broadcasts against [B,K,G,S,T]."""
    b, s, h, dh = q.shape
    kheads = k.shape[2]
    g = h // kheads
    scale = scale if scale is not None else dh**-0.5
    qg = q.reshape(b, s, kheads, g, dh)
    scores = _gqa_scores(qg, k, scale)
    if mask is not None:
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,btkd->bskgd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, s, h, dh).astype(q.dtype)


def causal_prefill_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 512,
    offset=None,
) -> jnp.ndarray:
    """Blockwise causal self-attention for prefill.

    Memory-bounded analogue of the reference's
    flash_attn_with_kvcache(causal=True) prefill call
    (models/base.py:308): queries are processed in blocks of ``block_q``
    via lax.scan so peak score memory is [B,H,block_q,T] instead of
    [B,H,S,S].

    ``offset`` is the absolute position of q's first row (may be a
    traced scalar — the sequence-parallel path passes each shard's
    global row offset). Defaults to t - s (q = the last s rows).
    """
    b, s, h, dh = q.shape
    t = k.shape[1]
    scale = scale if scale is not None else dh**-0.5
    if offset is None:
        offset = t - s  # history before this prefill chunk
    if s <= block_q:
        pos_q = offset + jnp.arange(s)
        pos_k = jnp.arange(t)
        mask = pos_q[:, None] >= pos_k[None, :]
        return mha(q, k, v, mask=mask[None, None, None], scale=scale)

    # Pad queries to a block multiple; padded rows attend to position 0
    # only (mask degenerates) and are sliced off at the end.
    s_pad = ((s + block_q - 1) // block_q) * block_q
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    nblocks = s_pad // block_q
    qb = q.reshape(b, nblocks, block_q, h, dh).transpose(1, 0, 2, 3, 4)

    def body(carry, inputs):
        i, qi = inputs
        pos_q = offset + i * block_q + jnp.arange(block_q)
        pos_k = jnp.arange(t)
        mask = pos_q[:, None] >= pos_k[None, :]
        out = mha(qi, k, v, mask=mask[None, None, None], scale=scale)
        return carry, out

    _, outs = jax.lax.scan(body, None, (jnp.arange(nblocks), qb))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, s_pad, h, dh)
    return out[:, :s]


def causal_prefill_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    head_major: bool = False,
) -> jnp.ndarray:
    """Causal prefill via the Pallas TPU flash-attention kernel.

    The blockwise-jnp fallback attends every q-block to ALL keys and
    masks — O(S^2) wasted work that makes a 122K prefill one >100 s XLA
    program (long enough to trip the device watchdog). The flash kernel
    skips fully-masked key blocks (true causal O(S^2/2) with tile
    skipping) and runs the softmax online in VMEM.

    Args:
      q: [B, S, H, Dh]. k/v: [B, T, K, Dh] (or [B, K, T, Dh] when
        head_major). GQA heads are expanded to H for the kernel.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, s, h, dh = q.shape
    scale = scale if scale is not None else dh**-0.5
    qh = q.transpose(0, 2, 1, 3)  # [B, H, S, Dh]
    if head_major:
        kh_, t = k.shape[1], k.shape[2]
        k_bh, v_bh = k, v
    else:
        kh_, t = k.shape[2], k.shape[1]
        k_bh = k.transpose(0, 2, 1, 3)
        v_bh = v.transpose(0, 2, 1, 3)
    g = h // kh_
    if g > 1:
        k_bh = jnp.repeat(k_bh, g, axis=1)
        v_bh = jnp.repeat(v_bh, g, axis=1)
    blk = min(512, s, t)
    sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = flash_attention(
        qh, k_bh, v_bh, causal=True, sm_scale=scale, block_sizes=sizes
    )  # [B, H, S, Dh]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def sparse_prefill_splash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    window: int,
    sink: int,
    scale: float | None = None,
    head_major: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sparse prefill attention: attention-sink + sliding-window causal.

    TPU counterpart of the reference's MInference sparse-prefill option
    (reference models/tensor_op.py:68-117, --minference flag): where the
    reference dispatches per-head calibrated CUDA patterns
    {stream_llm, vertical_and_slash, block_sparse}, this applies the
    streamLLM-style sink+local pattern uniformly through the Pallas
    splash-attention kernel, which SKIPS fully-masked tiles — prefill
    cost drops from O(S^2) to O(S * (window + sink)).

    Args:
      q: [B, S, H, Dh]; k/v: [B, S, K, Dh] (or [B, K, S, Dh] when
        head_major). S must equal the KV length (square causal prefill).
    """
    import numpy as np
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    class SinkLocalMask(sm._ComputableMask):
        """causal AND (kv < sink OR q - kv < window)."""

        def __init__(self, shape, window_size, sink_size):
            def fn(q_ids, kv_ids):
                # Called with numpy ids at mask-build time AND with
                # traced arrays inside the kernel (partial tiles): use
                # operators that work on both.
                return (kv_ids <= q_ids) & (
                    (kv_ids < sink_size)
                    | (q_ids - kv_ids < window_size)
                )

            super().__init__(shape=shape, mask_function=fn)
            self._window = window_size
            self._sink = sink_size

        def __eq__(self, other):
            return (
                isinstance(other, SinkLocalMask)
                and self.shape == other.shape
                and self._window == other._window
                and self._sink == other._sink
            )

        def __hash__(self):
            return hash(
                (type(self), self.shape, self._window, self._sink)
            )

    b, s, h, dh = q.shape
    mask_fn = lambda g: [SinkLocalMask((s, s), window, sink)] * g
    return _splash_mqa(q, k, v, mask_fn, scale, head_major, interpret)


def causal_prefill_splash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    head_major: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Dense causal prefill via the splash MQA kernel.

    Same math as causal_prefill_flash, but the kernel consumes GQA K/V
    natively ([S, Dh] shared across the group) instead of requiring
    them repeated to H heads — the flash path's jnp.repeat materializes
    two [B, H, S, Dh] copies (2 x 480 MB per layer at 122K) that set
    the prefill HBM peak and block batch 4 on a 16 GB chip. Measured
    ~20 % slower prefill than flash at 122K; decode batch is the bench
    metric, prefill is one-time per sequence.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    s = q.shape[1]
    mask_fn = lambda g: [sm.CausalMask((s, s))] * g
    return _splash_mqa(q, k, v, mask_fn, scale, head_major, interpret)


def _splash_mqa(q, k, v, mask_fn, scale, head_major, interpret):
    """Shared splash-MQA driver: q [B, S, H, Dh], k/v [B, S, K, Dh]
    (or [B, K, S, Dh] when head_major); mask_fn(g) -> per-q-head masks
    for one KV group."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    b, s, h, dh = q.shape
    scale = scale if scale is not None else dh**-0.5
    # splash has no sm_scale arg; scale K rather than Q — identical
    # scores, but K is half the size under GQA and the scalar mul fuses
    # into the head-major transpose copy, where scaling Q costs a
    # second full [B, H, S, Dh] buffer at the 122K-prefill HBM peak.
    if head_major:
        kh_ = k.shape[1]
        k_bh, v_bh = k * scale, v
    else:
        kh_ = k.shape[2]
        k_bh = k.transpose(0, 2, 1, 3) * scale
        v_bh = v.transpose(0, 2, 1, 3)
    g = h // kh_
    qh = q.transpose(0, 2, 1, 3)
    qg = qh.reshape(b, kh_, g, s, dh)

    mask = sm.MultiHeadMask(mask_fn(g))
    # Large blocks keep the per-(q-block, kv-block) mask metadata under
    # the 1 MB SMEM budget: a DENSE causal mask at 122K with the
    # default blocks needs ~2 MB of prefetched active-block lists
    # (metadata shrinks quadratically with block size).
    blk = min(1024, s)
    block_sizes = sk.BlockSizes(
        block_q=blk, block_kv=blk, block_kv_compute=min(512, s)
    )
    kernel = sk.make_splash_mqa_single_device(
        mask=mask, block_sizes=block_sizes, interpret=interpret
    )
    # vmap over batch, then over KV heads (MQA kernel: q [G, S, Dh],
    # k/v [S, Dh] shared across the group).
    out = jax.vmap(jax.vmap(kernel))(qg, k_bh, v_bh)  # [B, K, G, S, Dh]
    return (
        out.reshape(b, h, s, dh).transpose(0, 2, 1, 3).astype(q.dtype)
    )


def causal_prefill_attention_hm(
    q: jnp.ndarray,
    k_hm: jnp.ndarray,
    v_hm: jnp.ndarray,
    end: jnp.ndarray | int,
    scale: float | None = None,
    block_q: int = 512,
) -> jnp.ndarray:
    """Blockwise causal attention against a HEAD-MAJOR cache.

    Used by the full-attention prefill over the [L, B, K, T, Dh] cache:
    contracting directly against the cache's native layout keeps XLA on
    one layout for the donated buffer (see cache/full.py docstring).

    Args:
      q: [B, S, H, Dh] the current prefill chunk's queries.
      k_hm/v_hm: [B, K, T_cap, Dh] cache (already containing this chunk).
      end: total valid tokens including this chunk (queries occupy
        positions [end - S, end)).
    """
    b, s, h, dh = q.shape
    kheads, t = k_hm.shape[1], k_hm.shape[2]
    g = h // kheads
    scale = scale if scale is not None else dh**-0.5
    s_pad = ((s + block_q - 1) // block_q) * block_q
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0), (0, 0)))
    nblocks = s_pad // block_q
    qb = q.reshape(b, nblocks, block_q, kheads, g, dh).transpose(
        1, 0, 2, 3, 4, 5
    )
    offset = end - s  # absolute position of the first query row

    def body(carry, inputs):
        i, qi = inputs
        pos_q = offset + i * block_q + jnp.arange(block_q)
        pos_k = jnp.arange(t)
        mask = pos_q[:, None] >= pos_k[None, :]  # [block_q, T]
        scores = jnp.einsum(
            "bskgd,bktd->bkgst", qi, k_hm,
            preferred_element_type=jnp.float32,
        ) * scale
        scores = jnp.where(
            mask[None, None, None], scores, jnp.finfo(jnp.float32).min
        )
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum(
            "bkgst,bktd->bskgd", probs.astype(v_hm.dtype), v_hm,
            preferred_element_type=jnp.float32,
        ).astype(qi.dtype)
        return carry, out

    _, outs = jax.lax.scan(
        body, None, (jnp.arange(nblocks), qb)
    )  # [nblocks, B, block_q, K, G, Dh]
    out = outs.transpose(1, 0, 2, 3, 4, 5).reshape(b, s_pad, h, dh)
    return out[:, :s]


def decode_attention_hm(
    q: jnp.ndarray,
    k_hm: jnp.ndarray,
    v_hm: jnp.ndarray,
    kv_len: jnp.ndarray | int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Decode attention over a HEAD-MAJOR cache [B, K, T, Dh].

    The ShadowKV compact buffer is stored head-major; transposing it to
    seq-major per step costs a multi-MB shuffle per layer on TPU, so the
    einsums here contract directly against the native layout.

    Args:
      q: [B, S_new, H, Dh]; k_hm/v_hm: [B, K, T_cap, Dh];
      kv_len: scalar or [B] valid rows (incl. the S_new new tokens).
    """
    b, s_new, h, dh = q.shape
    kheads, t = k_hm.shape[1], k_hm.shape[2]
    g = h // kheads
    scale = scale if scale is not None else dh**-0.5
    kv_len = jnp.asarray(kv_len)
    if kv_len.ndim == 0:
        kv_len = jnp.full((b,), kv_len)
    qg = q.reshape(b, s_new, kheads, g, dh)
    scores = jnp.einsum(
        "bskgd,bktd->bkgst", qg, k_hm, preferred_element_type=jnp.float32
    ) * scale
    pos_k = jnp.arange(t)
    q_abs = kv_len[:, None] - s_new + jnp.arange(s_new)[None, :]  # [B,S]
    mask = pos_k[None, None, :] <= q_abs[:, :, None]  # [B,S,T]
    scores = jnp.where(
        mask[:, None, None], scores, jnp.finfo(jnp.float32).min
    )
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bkgst,bktd->bskgd", probs.astype(v_hm.dtype), v_hm,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, s_new, h, dh).astype(q.dtype)


def decode_attention_segments(
    q: jnp.ndarray,
    segments,
    kv_len: jnp.ndarray | int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Decode attention over a SEGMENTED head-major cache.

    Same math as decode_attention_hm over the concatenation of the
    segments, without ever materializing that concatenation: scores are
    computed per segment, softmax runs over the concatenated score rows
    (tiny — [B,K,G,S,T] f32), and the context is the sum of per-segment
    probability @ V dots. Built to avoid the per-layer cap-row view
    copies of the stacked [L,B,K,cap,Dh] buffers, but MEASURED SLOWER
    on v5e (59.8 vs 22.1 ms/step at b4/122K,
    benchmarks/probe_decode_variants.py): the 3-segment einsum split +
    prefix/gen slices cost more than the single view copy they avoid.
    Kept (off by default) for cache layouts where the view copies
    dominate; token-identical to decode_attention_hm
    (tests/test_segmented.py).

    Args:
      q: [B, S_new, H, Dh].
      segments: iterable of (k_hm, v_hm, base, masked): k/v [B,K,T_s,Dh]
        at absolute buffer rows [base, base+T_s); masked=False asserts
        every row is valid (static prefix / sparse region), masked=True
        applies the kv_len validity mask (gen region).
      kv_len: scalar or [B] total valid rows (incl. the S_new tokens).
    """
    b, s_new, h, dh = q.shape
    kheads = segments[0][0].shape[1]
    g = h // kheads
    scale = scale if scale is not None else dh**-0.5
    kv_len = jnp.asarray(kv_len)
    if kv_len.ndim == 0:
        kv_len = jnp.full((b,), kv_len)
    qg = q.reshape(b, s_new, kheads, g, dh)
    q_abs = kv_len[:, None] - s_new + jnp.arange(s_new)[None, :]  # [B,S]

    scores = []
    for k_hm, v_hm, base, masked in segments:
        s = jnp.einsum(
            "bskgd,bktd->bkgst", qg, k_hm,
            preferred_element_type=jnp.float32,
        ) * scale
        if masked:
            pos_k = base + jnp.arange(k_hm.shape[2])
            mask = pos_k[None, None, :] <= q_abs[:, :, None]  # [B,S,T]
            s = jnp.where(
                mask[:, None, None], s, jnp.finfo(jnp.float32).min
            )
        scores.append(s)
    probs = jax.nn.softmax(jnp.concatenate(scores, axis=-1), axis=-1)
    out = None
    off = 0
    for k_hm, v_hm, base, masked in segments:
        t = k_hm.shape[2]
        p = jax.lax.slice_in_dim(probs, off, off + t, axis=-1)
        o = jnp.einsum(
            "bkgst,bktd->bskgd", p.astype(v_hm.dtype), v_hm,
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
        off += t
    return out.reshape(b, s_new, h, dh).astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_len: jnp.ndarray | int,
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention for decode: new queries attend to cache[:kv_len].

    Mirrors flash_attn_with_kvcache over the compact buffer
    (models/base.py:341): keys are position-scrambled (RoPE already
    applied at absolute positions) so only a validity mask is needed —
    attention is permutation-invariant over keys, and every cached token
    precedes the query.

    Args:
      q: [B, S_new, H, Dh] (S_new small, usually 1).
      k/v: [B, T_cap, K, Dh] compact buffer.
      kv_len: scalar or [B] number of valid rows in the buffer,
        *including* the S_new new tokens (causally masked among
        themselves at the tail).
    """
    b, s_new, h, dh = q.shape
    t = k.shape[1]
    scale = scale if scale is not None else dh**-0.5
    kv_len = jnp.asarray(kv_len)
    if kv_len.ndim == 0:
        kv_len = jnp.full((b,), kv_len)
    pos_k = jnp.arange(t)
    # Valid = within length; new tokens at positions [len - s_new, len)
    # are causal among themselves.
    q_abs = kv_len[:, None] - s_new + jnp.arange(s_new)[None, :]  # [B,S]
    mask = pos_k[None, None, :] <= q_abs[:, :, None]  # [B,S,T]
    mask = mask[:, None, None]  # [B,1,1,S,T]
    return mha(q, k, v, mask=mask, scale=scale)


def sp_causal_prefill_attention(
    mesh,
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int = 512,
) -> jnp.ndarray:
    """Causal prefill attention with the sequence dim sharded over the
    mesh's 'sp' axis (sequence/context parallelism).

    The blockwise-scan attention serializes under GSPMD (a lax.scan's
    loop dim cannot be partitioned), so sequence parallelism needs an
    explicit island: each sp shard all-gathers K/V over 'sp' (rides
    ICI) and runs the blockwise causal kernel on its LOCAL 1/sp of the
    query rows at its global row offset. Per-chip compute drops to
    S/sp query rows; the K/V gather is one [B, S, K, Dh] per layer —
    the same working set dense prefill already holds on one chip.

    The reference has no sequence parallelism (SURVEY §2.4 — long
    context is handled algorithmically only); this is the TPU-native
    scaling axis for prefill latency (SURVEY §5.7 rebuild note).

    Args:
      q: [B, S, H, Dh] sharded ('dp', 'sp', 'tp', None).
      k/v: [B, S, K, Dh] sharded the same way.
    """
    from jax.sharding import PartitionSpec as P

    def local(qi, ki, vi):
        s_loc = qi.shape[1]
        k_all = jax.lax.all_gather(ki, "sp", axis=1, tiled=True)
        v_all = jax.lax.all_gather(vi, "sp", axis=1, tiled=True)
        offset = jax.lax.axis_index("sp") * s_loc
        return causal_prefill_attention(
            qi, k_all, v_all, scale=scale,
            block_q=min(block_q, s_loc), offset=offset,
        )

    spec = P("dp", "sp", "tp", None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # axis_index-dependent masks carry no vma
    )(q, k, v)
