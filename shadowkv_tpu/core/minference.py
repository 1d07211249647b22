"""MInference-style dynamic sparse prefill: vertical_and_slash and
block_sparse per-head patterns.

TPU rebuild of the reference's MInference prefill dispatch
(reference models/tensor_op.py:68-117 ``minference_prefill_kernel`` /
``gather_last_q_vertical_slash_topk_v4``), which calls into the external
MInference CUDA/Triton kernels {vertical_slash_sparse_attention,
block_sparse_attention, streaming_forward}. Here the three per-head
pattern types become one representation:

- Estimation (this module, plain XLA): the last 64 queries attend all
  keys; a softmax's column sums score VERTICAL token columns and its
  diagonal sums score SLASH diagonals; top-k of each picks the pattern
  (exact reference estimation recipe, models/tensor_op.py:85-100,
  including the forced first-30 verticals and last-100 slashes).
- Block conversion (this module): token verticals/slashes are rounded
  to attention blocks. The active block set has the closed form
      active[qb, kb] = causal & (col_flag[kb] | diag_flag[qb - kb])
  so per-head metadata is two tiny 1-D sets (column blocks + diagonal
  offsets), not a [nQ, nK] mask — small enough for SMEM scalar
  prefetch in the kernel at 122K+ context.
- Execution: the Pallas kernel in kernels/vs_sparse.py walks, per
  query block, only the active key blocks (flash accumulation, DMA
  double-buffered); ``vs_attention_reference`` here is the jnp oracle
  (and the CPU path).

The sink+local ``stream_llm`` pattern is a special case of the same
metadata (verticals = sink blocks, slashes = window diagonals), which is
how mixed per-head patterns run in one kernel launch. The uniform-stream
fast path stays in core/attention.py::sparse_prefill_splash.

Granularity note: MInference's CUDA kernel attends token-granular
vertical columns; the TPU kernel attends the 1-2 blocks containing them
(a superset of the reference's attended set — strictly more context per
selected vertical). Slashes are block-granular in both (MInference pads
each slash diagonal to its covering blocks the same way).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

LAST_Q = 64
_NEG = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class HeadPattern:
    """Per-q-head sparse-prefill pattern (reference minference_parttern
    entries: a dict head -> (type, vertical_size, slash_size, _)).

    kind: 'vertical_and_slash' | 'stream_llm' | 'block_sparse' | 'dense'
    """

    kind: str = "vertical_and_slash"
    vertical_size: int = 1000
    slash_size: int = 6144


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class VSMeta:
    """Active-block metadata for one (batch, head) set, block granular.

    col_ids:  [BH, nK] int32, active column-block ids sorted ascending,
              padded with nK (one past the last valid block).
    col_cnt:  [BH, nQ] int32, #active column blocks with kb <= qb.
    col_flag: [BH, nK] int32 0/1 membership (kernel-side dedup of
              blocks active as both a column and a diagonal).
    diag_ids: [BH, nQ] int32, active diagonal offsets sorted ascending,
              padded with nQ.
    diag_cnt: [BH, nQ] int32, #active diagonals with delta <= qb.
    """

    col_ids: jnp.ndarray
    col_cnt: jnp.ndarray
    col_flag: jnp.ndarray
    diag_ids: jnp.ndarray
    diag_cnt: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.col_ids, self.col_cnt, self.col_flag, self.diag_ids,
             self.diag_cnt),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def estimate_vertical_slash(
    q: jnp.ndarray,  # [B, S, H, Dh] roped queries
    k: jnp.ndarray,  # [B, S, K, Dh] roped keys
    scale: Optional[float] = None,
    last_q: int = LAST_Q,
    head_kv: Optional[Sequence[int]] = None,  # kv head per q row of
    # ``q`` (defaults to contiguous GQA h // g; needed when q carries a
    # subset of the model's heads)
):
    """Vertical/slash importance scores from the last ``last_q`` queries.

    Exact reference estimation (models/tensor_op.py:85-100): fp32
    softmax of the last 64 queries vs all keys (causally masked on the
    trailing square), summed over query rows for verticals and over
    diagonals for slashes. Returns (vertical [B, H, S], slash [B, H, S])
    where slash index d scores the diagonal at distance d (d = 0 is the
    main diagonal); the forced regions (first 30 verticals, nearest 100
    slashes) are set to +inf exactly as the reference does.

    Heads are processed sequentially (lax.map) so the [last_q, S] fp32
    score temp stays per-head (~30 MB at 122K) instead of x H.
    """
    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    lq = min(last_q, s)
    scale = scale if scale is not None else dh**-0.5
    q_t = q[:, -lq:].transpose(0, 2, 1, 3)  # [B, H, lq, Dh]
    k_t = k.transpose(0, 2, 1, 3)  # [B, K, S, Dh]

    # Causal mask on the trailing [lq, lq] square (reference
    # LAST_Q_MASK): query row i (absolute position s - lq + i) may not
    # attend key columns s - lq + j for j > i.
    ii = jnp.arange(lq)
    tail_mask = ii[:, None] >= ii[None, :]  # [lq, lq]

    kv_of = (
        jnp.asarray(head_kv, jnp.int32)
        if head_kv is not None
        else jnp.arange(h, dtype=jnp.int32) // g
    )

    def per_head(hh):
        qk = jnp.einsum(
            "bld,bsd->bls", q_t[:, hh], k_t[:, kv_of[hh]],
            preferred_element_type=jnp.float32,
        ) * scale  # [B, lq, S]
        tail = jnp.where(tail_mask, qk[:, :, s - lq:], _NEG)
        qk = qk.at[:, :, s - lq:].set(tail)
        p = jax.nn.softmax(qk, axis=-1)  # fp32
        vertical = p.sum(axis=1)  # [B, S]
        # Slash scores slash[d] = sum_i p[i, (s-lq)+i-d] are diagonal
        # sums. A take_along_axis gather here is catastrophically
        # latency-bound on TPU (measured 1.29 s/layer at 122K,
        # benchmarks/logs/prof_vs_kernel.log); the shear below is pure
        # pad/reshape/slice data movement instead: reverse each row,
        # right-pad by lq, and re-view the flat buffer with row stride
        # (w-1) so row i lands shifted by (lq-1-i) — then diagonal sums
        # become plain column sums. Out-of-range diagonals read the
        # zero padding, so no validity mask is needed.
        pr = jnp.flip(p, axis=-1)
        w = s + lq
        pr = jnp.pad(pr, ((0, 0), (0, 0), (0, lq)))  # [B, lq, w]
        flat = pr.reshape(b, lq * w)
        sheared = jax.lax.slice_in_dim(
            flat, lq - 1, lq - 1 + lq * (w - 1), axis=1
        ).reshape(b, lq, w - 1)
        slash = sheared[:, :, :s].sum(axis=1)
        return vertical, slash

    vertical, slash = jax.lax.map(per_head, jnp.arange(h))
    vertical = vertical.transpose(1, 0, 2)  # [B, H, S]
    slash = slash.transpose(1, 0, 2)
    inf = jnp.float32(jnp.inf)
    vertical = vertical.at[:, :, : min(30, s)].set(inf)
    slash = slash.at[:, :, : min(100, s)].set(inf)
    return vertical, slash


def sim_vs_scores(
    regime: str,
    vertical: jnp.ndarray,
    slash: jnp.ndarray,
    salt=0,
):
    """BENCHMARK-ONLY pattern simulation (RuntimeConfig.vs_sim).

    Synthetic bench weights produce top-k-of-noise patterns whose diag
    blocks scatter across the whole context (960 blocks/head at 122K),
    while real model weights produce diagonal-decaying slashes + a few
    hundred hot vertical tokens (the regime MInference is built for;
    reference models/tensor_op.py:85-117 estimates exactly these).
    This replaces the estimated SCORES with that realistic structure —
    slashes decay exponentially from the diagonal, verticals are
    zipf-ish hot tokens — so the full e2e VS pipeline can be measured
    at the operating point a real checkpoint reaches (clustered: 57
    diag blocks/head at 122K, prof_vs_kernel meta122). The original
    estimates stay in the dataflow at epsilon weight so the estimation
    cost is still paid and timed exactly as a real run pays it.
    """
    if regime != "clustered":
        raise ValueError(
            f"unknown vs_sim regime {regime!r} (supported: 'clustered')"
        )
    b, hm, s = slash.shape
    # salt (typically the traced layer index) varies the simulated
    # pattern per layer the way real checkpoints do; distinct split
    # keys decorrelate the hot-token draw from the uniform base.
    kv, ks, ku = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(0), salt), 3
    )
    d = jnp.arange(s, dtype=jnp.float32)
    sl = -d / 2048.0 + 0.2 * jax.random.normal(ks, (b, hm, s))
    hot = jax.random.randint(kv, (b, hm, 512), 0, s)
    vt = jax.random.uniform(ku, (b, hm, s)) * 0.1
    bi = jnp.arange(b)[:, None, None]
    hi = jnp.arange(hm)[None, :, None]
    vt = vt.at[bi, hi, hot].add(1.0)
    # The estimates' +inf forced regions (first 30 verticals, nearest
    # 100 slashes) survive the epsilon blend as +inf — the simulated
    # scores force exactly the rows the reference forces.
    return vt + 1e-12 * vertical, sl + 1e-12 * slash


def _compact_flags(flags: jnp.ndarray, pad_value: int):
    """[..., N] 0/1 flags -> ids of set positions sorted ascending,
    unset positions padded with ``pad_value`` at the tail."""
    n = flags.shape[-1]
    iota = jnp.arange(n, dtype=jnp.int32)
    masked = jnp.where(flags > 0, iota, jnp.int32(pad_value))
    return jnp.sort(masked, axis=-1)


def _scatter_flags(idx: jnp.ndarray, n: int):
    """[..., M] indices -> [..., N] 0/1 int32 flags (duplicates fold)."""
    one_hot = (idx[..., None] == jnp.arange(n, dtype=idx.dtype)).any(-2)
    return one_hot.astype(jnp.int32)


def meta_from_flags(
    col_flag: jnp.ndarray, diag_flag: jnp.ndarray
) -> VSMeta:
    """Build the kernel metadata (sorted id lists + causal prefix
    counts) from 0/1 activity flags."""
    n_blk = col_flag.shape[-1]
    return VSMeta(
        col_ids=_compact_flags(col_flag, n_blk),
        col_cnt=jnp.cumsum(col_flag, axis=-1).astype(jnp.int32),
        col_flag=col_flag,
        diag_ids=_compact_flags(diag_flag, n_blk),
        diag_cnt=jnp.cumsum(diag_flag, axis=-1).astype(jnp.int32),
    )


def build_vs_meta(
    v_idx: jnp.ndarray,  # [BH, Nv] vertical token indices
    s_idx: jnp.ndarray,  # [BH, Ns] slash token distances
    seq_len: int,
    block: int,
) -> VSMeta:
    """Convert token-granular vertical/slash selections to block
    metadata (the reference's MInference kernel does the analogous
    conversion on the fly when building its block-sparse CSR)."""
    n_blk = (seq_len + block - 1) // block
    return meta_from_flags(*vs_flags(v_idx, s_idx, n_blk, block))


def vs_flags(
    v_idx: jnp.ndarray, s_idx: jnp.ndarray, n_blk: int, block: int
):
    """Block activity flags from token-granular selections. Entries
    >= n_blk * block act as padding (no block set)."""
    col_flag = _scatter_flags(v_idx // block, n_blk)
    # A slash at token distance d crosses block-diagonals floor(d/B)
    # and ceil(d/B) (band of width B over the block grid).
    d1 = s_idx // block
    d2 = (s_idx + block - 1) // block
    diag_flag = _scatter_flags(
        jnp.concatenate([d1, d2], axis=-1), n_blk
    )
    # The main block diagonal always attends (holds the causal
    # frontier; the estimation's forced nearest-slashes imply it).
    diag_flag = diag_flag.at[..., 0].set(1)
    return col_flag, diag_flag


def stream_flags(
    bh: int, seq_len: int, block: int, sink: int, window: int
):
    """stream_llm (sink + sliding window) as block activity flags:
    verticals = the sink blocks, slashes = the window diagonals."""
    n_blk = (seq_len + block - 1) // block
    kb = jnp.arange(n_blk, dtype=jnp.int32)
    col_flag = jnp.broadcast_to(
        (kb * block < sink).astype(jnp.int32), (bh, n_blk)
    )
    diag_flag = jnp.broadcast_to(
        (kb * block < window + block).astype(jnp.int32), (bh, n_blk)
    )
    return col_flag, diag_flag


def stream_meta(
    bh: int, seq_len: int, block: int, sink: int, window: int
) -> VSMeta:
    """The stream_llm pattern expressed as VS block metadata. Used when
    per-head patterns mix types in one launch."""
    return meta_from_flags(
        *stream_flags(bh, seq_len, block, sink, window)
    )


def vs_meta_from_scores(
    vertical: jnp.ndarray,  # [BH, S]
    slash: jnp.ndarray,  # [BH, S]
    vertical_size: int,
    slash_size: int,
    seq_len: int,
    block: int,
    grid_len: Optional[int] = None,  # padded length sizing the block
    # grid (defaults to seq_len; must be a block multiple for the kernel)
) -> VSMeta:
    """Top-k the scores (reference clamps: vertical >= 30, slash >= 50,
    both <= q_len; models/tensor_op.py:86) and build block metadata."""
    vsize = min(seq_len, max(vertical_size, 30))
    ssize = min(seq_len, max(slash_size, 50))
    _, v_idx = jax.lax.top_k(vertical, vsize)
    _, s_idx = jax.lax.top_k(slash, ssize)
    return build_vs_meta(v_idx, s_idx, grid_len or seq_len, block)


def expand_block_mask(meta: VSMeta, n_blk: int) -> jnp.ndarray:
    """[BH, nQ, nK] boolean active-block mask from metadata (oracle)."""
    qb = jnp.arange(n_blk)[:, None]
    kb = jnp.arange(n_blk)[None, :]
    causal = kb <= qb
    col = meta.col_flag[:, None, :] > 0  # [BH, 1, nK]
    delta = jnp.clip(qb - kb, 0, n_blk - 1)  # [nQ, nK]
    bh = meta.diag_ids.shape[0]
    diag_flag = (
        meta.diag_ids[..., None] == jnp.arange(n_blk)[None, None, :]
    ).any(-2)  # [BH, nK(=delta)]
    diag = jnp.take_along_axis(
        jnp.broadcast_to(diag_flag[:, None, :], (bh, n_blk, n_blk)),
        jnp.broadcast_to(delta[None], (bh, n_blk, n_blk)),
        axis=-1,
    )
    return causal[None] & (col | diag)


def vs_attention_reference(
    q: jnp.ndarray,  # [BH, S, Dh] flat per-head queries
    k: jnp.ndarray,  # [BKV, S, Dh] flat per-kv-head keys
    v: jnp.ndarray,  # [BKV, S, Dh]
    meta: VSMeta,  # arrays shaped [BH, ...]
    kv_map: jnp.ndarray,  # [BH] int32: q-head row -> kv row
    block: int,
    scale: Optional[float] = None,
    seq_len: Optional[int] = None,
) -> jnp.ndarray:
    """jnp oracle for the VS kernel (same flat interface): token mask =
    expanded block mask AND causal. Materializes [BH, S, S] — tests /
    CPU path only. Returns [BH, S, Dh]."""
    bh, s, dh = q.shape
    seq_len = s if seq_len is None else seq_len
    scale = scale if scale is not None else dh**-0.5
    n_blk = s // block
    assert s % block == 0
    bm = expand_block_mask(meta, n_blk)  # [BH, nQ, nK]
    token = jnp.repeat(jnp.repeat(bm, block, axis=1), block, axis=2)
    pos = jnp.arange(s)
    causal = pos[None, :] <= pos[:, None]
    mask = token & causal[None] & (pos[None, None, :] < seq_len)
    k_g = k[kv_map]  # [BH, S, Dh]
    v_g = v[kv_map]
    scores = jnp.einsum(
        "hqd,hkd->hqk", q, k_g, preferred_element_type=jnp.float32
    ) * scale
    scores = jnp.where(mask, scores, _NEG)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "hqk,hkd->hqd", probs.astype(v.dtype), v_g,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# --------------------------------------------------------------------------
# block_sparse pattern (reference models/tensor_op.py:104-106 ->
# MInference block_sparse_attention(q, k, v, topk=100))
# --------------------------------------------------------------------------


def block_sparse_attention(
    q: jnp.ndarray,  # [B, S, H, Dh]
    k: jnp.ndarray,  # [B, S, K, Dh]
    v: jnp.ndarray,  # [B, S, K, Dh]
    topk_blocks: int = 100,
    block: int = 64,
    scale: Optional[float] = None,
    chunk_q_blocks: int = 16,
    head_kv: Optional[Sequence[int]] = None,  # kv head per q-head
    # (defaults to contiguous GQA h // g; needed when q carries a
    # subset of the model's heads)
) -> jnp.ndarray:
    """Block-granular top-k sparse attention (MInference
    ``block_sparse_attention`` semantics): q and k are mean-pooled into
    ``block``-token blocks, each query block attends its top-k scoring
    key blocks (the causal frontier block always included), with exact
    causal masking inside the frontier.

    XLA implementation: per (head, q-chunk) gather of the selected key
    blocks + dense attention over the gathered set, mapped sequentially
    over heads to bound the gathered temporaries. This is the parity
    path for the rare block_sparse heads in MInference pattern configs;
    the dominant vertical_and_slash heads use the Pallas kernel.
    """
    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = max(1, h // kh) if head_kv is None else None
    head_kv = (
        jnp.asarray(head_kv, jnp.int32)
        if head_kv is not None
        else jnp.arange(h, dtype=jnp.int32) // g
    )
    scale = scale if scale is not None else dh**-0.5
    s_real = s
    if s % block:
        # Zero-pad to a block multiple: padded KEY columns sit at
        # positions >= s_real and are causally masked for every real
        # query row; padded query rows are sliced off below. (The last
        # key block's mean-pooled score dilutes slightly — that block
        # is still force-included for its own frontier rows.)
        padlen = block - s % block
        q = jnp.pad(q, ((0, 0), (0, padlen), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, padlen), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, padlen), (0, 0), (0, 0)))
        s = s + padlen
    nb = s // block
    tk = min(topk_blocks, nb)
    # q-chunking must tile nb exactly (lax.map over equal chunks).
    chunk_q_blocks = max(
        d for d in range(1, min(chunk_q_blocks, nb) + 1) if nb % d == 0
    )
    q_t = q.transpose(0, 2, 1, 3)  # [B, H, S, Dh]
    k_t = k.transpose(0, 2, 1, 3)  # [B, K, S, Dh]
    v_t = v.transpose(0, 2, 1, 3)
    q_blk = q_t.reshape(b, h, nb, block, dh).mean(axis=3)
    k_blk = k_t.reshape(b, kh, nb, block, dh).mean(axis=3)

    qb_ids = jnp.arange(nb)
    kb_ids = jnp.arange(nb)
    causal_blk = kb_ids[None, :] <= qb_ids[:, None]  # [nb, nb]

    def per_head(hh):
        scores = jnp.einsum(
            "bqd,bkd->bqk", q_blk[:, hh], k_blk[:, head_kv[hh]],
            preferred_element_type=jnp.float32,
        )  # [B, nb, nb]
        scores = jnp.where(causal_blk[None], scores, _NEG)
        # frontier block always attends (causal diagonal)
        scores = jnp.where(
            (kb_ids[None, :] == qb_ids[:, None])[None], jnp.inf, scores
        )
        _, sel = jax.lax.top_k(scores, tk)  # [B, nb, tk]

        def q_chunk(c0):
            qb_sl = jax.lax.dynamic_slice_in_dim(
                jnp.arange(nb), c0, chunk_q_blocks
            )  # [cq]
            sel_c = jax.lax.dynamic_slice_in_dim(
                sel, c0, chunk_q_blocks, axis=1
            )  # [B, cq, tk]
            k_g = k_t[:, head_kv[hh]][
                jnp.arange(b)[:, None, None, None],
                (sel_c[..., None] * block + jnp.arange(block)),
            ]  # [B, cq, tk, block, Dh]
            v_g = v_t[:, head_kv[hh]][
                jnp.arange(b)[:, None, None, None],
                (sel_c[..., None] * block + jnp.arange(block)),
            ]
            qq = q_t[:, hh].reshape(b, nb, block, dh)[
                jnp.arange(b)[:, None], qb_sl
            ]  # [B, cq, block, Dh]
            sc = jnp.einsum(
                "bcqd,bctkd->bcqtk", qq, k_g,
                preferred_element_type=jnp.float32,
            ) * scale  # [B, cq, block, tk, block]
            # causal mask at token granularity over gathered blocks
            q_pos = qb_sl[:, None] * block + jnp.arange(block)[None]
            k_pos = sel_c[..., None] * block + jnp.arange(block)
            m = (
                k_pos[:, :, None, :, :] <= q_pos[None, :, :, None, None]
            )  # [B, cq, block, tk, block]
            sc = jnp.where(m, sc, _NEG)
            p = jax.nn.softmax(
                sc.reshape(b, chunk_q_blocks, block, tk * block), axis=-1
            )
            out = jnp.einsum(
                "bcqt,bctd->bcqd",
                p.astype(v_g.dtype),
                v_g.reshape(b, chunk_q_blocks, tk * block, dh),
                preferred_element_type=jnp.float32,
            )
            return out  # [B, cq, block, Dh]

        n_chunks = (nb + chunk_q_blocks - 1) // chunk_q_blocks
        outs = jax.lax.map(
            q_chunk, jnp.arange(n_chunks) * chunk_q_blocks
        )  # [nc, B, cq, block, Dh]
        return outs.transpose(1, 0, 2, 3, 4).reshape(b, s, dh)

    out = jax.lax.map(per_head, jnp.arange(h))  # [H, B, S, Dh]
    out = out.transpose(1, 2, 0, 3).astype(q.dtype)  # [B, S, H, Dh]
    return out[:, :s_real]


# --------------------------------------------------------------------------
# Top-level per-head dispatch (reference minference_prefill_kernel,
# models/tensor_op.py:68-81: per-head pattern table -> kernel choice)
# --------------------------------------------------------------------------


def resolve_patterns(
    patterns: Optional[Sequence], num_heads: int,
    vertical_size: int, slash_size: int,
) -> tuple:
    """Normalize a per-head pattern spec to ``num_heads`` tuples of
    (kind, vertical_size, slash_size). ``patterns`` entries may be
    HeadPattern, (kind, vsize, ssize) tuples, or bare kind strings."""
    if patterns is None:
        return tuple(
            ("vertical_and_slash", vertical_size, slash_size)
            for _ in range(num_heads)
        )
    assert len(patterns) == num_heads, (len(patterns), num_heads)
    out = []
    for p in patterns:
        if isinstance(p, HeadPattern):
            out.append((p.kind, p.vertical_size, p.slash_size))
        elif isinstance(p, str):
            out.append((p, vertical_size, slash_size))
        else:
            kind, vs, ss = p[0], p[1], p[2]
            out.append((kind, vs, ss))
    kinds = {
        "vertical_and_slash", "stream_llm", "block_sparse", "dense"
    }
    for kind, *_ in out:
        assert kind in kinds, kind
    return tuple(out)


def minference_prefill(
    q: jnp.ndarray,  # [B, S, H, Dh] roped queries
    k: jnp.ndarray,  # [B, S, K, Dh] roped keys
    v: jnp.ndarray,  # [B, S, K, Dh]
    *,
    patterns: Optional[Sequence] = None,
    vertical_size: int = 1000,
    slash_size: int = 6144,
    block: int = 128,
    stream_sink: int = 1024,
    stream_window: int = 8192,
    bs_topk_blocks: int = 100,
    bs_block: int = 64,
    use_kernel: bool = True,
    interpret: bool = False,
    scale: Optional[float] = None,
    sim: Optional[str] = None,  # benchmark-only: sim_vs_scores regime
    sim_salt=0,  # per-layer pattern variation for the simulation
) -> jnp.ndarray:
    """Per-head dynamic sparse prefill attention (the reference's
    ``--minference`` path). Heads run their configured pattern:
    vertical_and_slash / stream_llm / dense unify through the VS block
    metadata and execute in ONE Pallas kernel launch
    (kernels/vs_sparse.py); block_sparse heads take the XLA
    gather path. Returns [B, S, H, Dh].
    """
    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = scale if scale is not None else dh**-0.5
    pats = resolve_patterns(patterns, h, vertical_size, slash_size)

    meta_heads = [i for i, p in enumerate(pats) if p[0] != "block_sparse"]
    bs_heads = [i for i, p in enumerate(pats) if p[0] == "block_sparse"]

    s_pad = ((s + block - 1) // block) * block
    pad = s_pad - s

    # Estimation runs ONLY for the vertical_and_slash heads (each
    # head's [last_q, S] fp32 score temp is real prefill latency).
    vs_heads = [
        i for i in meta_heads if pats[i][0] == "vertical_and_slash"
    ]
    if vs_heads:
        vertical, slash = estimate_vertical_slash(
            q[:, :, vs_heads], k, scale,
            head_kv=[i // g for i in vs_heads],
        )
        if sim is not None:
            vertical, slash = sim_vs_scores(
                sim, vertical, slash, salt=sim_salt
            )
        vs_pos = {hh: j for j, hh in enumerate(vs_heads)}

    # Group meta-pattern heads by config so each group's top-k is one
    # vectorized call; remember the head order for the final scatter.
    groups: dict = {}
    for i in meta_heads:
        groups.setdefault(pats[i], []).append(i)

    out = jnp.zeros(q.shape, q.dtype)

    if meta_heads:
        order: list = []
        metas: list = []
        for cfg, heads in groups.items():
            kind, vsize, ssize = cfg
            hg = len(heads)
            order.extend(heads)
            if kind == "vertical_and_slash":
                rows = [vs_pos[hh] for hh in heads]
                vert = vertical[:, rows].reshape(b * hg, s)
                sl = slash[:, rows].reshape(b * hg, s)
                metas.append(
                    vs_meta_from_scores(
                        vert, sl, vsize, ssize, s, block, grid_len=s_pad
                    )
                )
            elif kind == "stream_llm":
                metas.append(
                    stream_meta(b * hg, s_pad, block, stream_sink,
                                stream_window)
                )
            else:  # dense: every diagonal active == full causal
                metas.append(
                    stream_meta(b * hg, s_pad, block, 0, s_pad * block)
                )
        # Interleave group metas back to [B, Hm] row order: group rows
        # are [B, hg]; concatenate per-B via reshape trickery.
        hm = len(order)

        def cat(field):
            parts = [
                getattr(m, field).reshape(b, len(heads), -1)
                for m, heads in zip(metas, groups.values())
            ]
            return jnp.concatenate(parts, axis=1).reshape(b * hm, -1)

        meta = VSMeta(
            col_ids=cat("col_ids"),
            col_cnt=cat("col_cnt"),
            col_flag=cat("col_flag"),
            diag_ids=cat("diag_ids"),
            diag_cnt=cat("diag_cnt"),
        )
        import numpy as _np

        kv_map = jnp.asarray(
            (
                _np.arange(b)[:, None] * kh
                + _np.asarray([hh // g for hh in order])[None, :]
            ).reshape(-1),
            jnp.int32,
        )
        q_sub = q[:, :, order]  # [B, S, Hm, Dh] (static head gather)
        if pad:
            q_sub = jnp.pad(q_sub, ((0, 0), (0, pad), (0, 0), (0, 0)))
            k_p = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v_p = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        else:
            k_p, v_p = k, v
        q_f = q_sub.transpose(0, 2, 1, 3).reshape(b * hm, s_pad, dh)
        k_f = k_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
        v_f = v_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
        if use_kernel:
            from shadowkv_tpu.kernels.vs_sparse import vs_sparse_attention

            # One kernel launch PER BATCH ELEMENT: the five metadata
            # arrays ride in SMEM scalar prefetch, and a [B*H, nK]
            # footprint at 122K would exceed the ~1 MB SMEM budget for
            # B > 1 (per-batch rows are contiguous: index b0*hm + j).
            parts = []
            for b0 in range(b):
                hs = slice(b0 * hm, (b0 + 1) * hm)
                ks_ = slice(b0 * kh, (b0 + 1) * kh)
                parts.append(
                    vs_sparse_attention(
                        q_f[hs], k_f[ks_], v_f[ks_],
                        meta.col_ids[hs], meta.col_cnt[hs],
                        meta.col_flag[hs], meta.diag_ids[hs],
                        meta.diag_cnt[hs],
                        kv_map[hs] - b0 * kh,
                        block=block, scale=scale, seq_len=s,
                        interpret=interpret,
                    )
                )
            o_f = (
                parts[0] if b == 1 else jnp.concatenate(parts, axis=0)
            )
        else:
            o_f = vs_attention_reference(
                q_f, k_f, v_f, meta, kv_map, block,
                scale=scale, seq_len=s,
            )
        o_meta = (
            o_f.reshape(b, hm, s_pad, dh)[:, :, :s]
            .transpose(0, 2, 1, 3)
            .astype(q.dtype)
        )
        out = out.at[:, :, order].set(o_meta)

    if bs_heads:
        o_bs = block_sparse_attention(
            q[:, :, bs_heads], k, v,
            topk_blocks=bs_topk_blocks, block=bs_block, scale=scale,
            head_kv=[hh // g for hh in bs_heads],
        )
        out = out.at[:, :, bs_heads].set(o_bs.astype(q.dtype))

    return out


def diag_flags_from_slash(s_idx: jnp.ndarray, n_blk: int, block: int):
    """Block-diagonal activity flags from token-granular slash
    distances (the diag half of vs_flags; the main block diagonal is
    always forced on — it holds the causal frontier)."""
    d1 = s_idx // block
    d2 = (s_idx + block - 1) // block
    flags = _scatter_flags(jnp.concatenate([d1, d2], axis=-1), n_blk)
    return flags.at[..., 0].set(1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def minference_prefill_tile(
    q: jnp.ndarray,  # [B, S, H, Dh] roped queries
    k: jnp.ndarray,  # [B, S, K, Dh] roped keys
    v: jnp.ndarray,  # [B, S, K, Dh]
    *,
    patterns: Optional[Sequence] = None,
    vertical_size: int = 1000,
    slash_size: int = 6144,
    block: int = 128,
    stream_sink: int = 1024,
    stream_window: int = 8192,
    bs_topk_blocks: int = 100,
    bs_block: int = 64,
    tile: int = 512,
    interpret: bool = False,
    use_kernel: bool = True,
    scale: Optional[float] = None,
    sim: Optional[str] = None,  # benchmark-only: sim_vs_scores regime
    sim_salt=0,  # per-layer pattern variation for the simulation
) -> jnp.ndarray:
    """Per-head sparse prefill via the DECOMPOSED kernel
    (kernels/vs_tile.py): verticals token-granular (exact reference
    MInference semantics — the walk kernel's block-expanded columns
    destroyed sparsity at 122K, prof_vs_kernel.log), slashes as
    512-row diagonal-group tiles. All non-block_sparse kinds unify:

      vertical_and_slash: v_idx = top-k vertical tokens,
                          diag = covering blocks of top-k slashes
      stream_llm:         v_idx = the sink TOKENS (reference
                          streaming_forward's sink is token-granular),
                          diag = the window's block diagonals
      dense:              diag = every block diagonal

    block_sparse heads take the XLA gather path as before. Returns
    [B, S, H, Dh].
    """
    from shadowkv_tpu.kernels.vs_tile import (
        vs_tile_attention,
        vs_tok_attention_reference,
    )

    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = scale if scale is not None else dh**-0.5
    pats = resolve_patterns(patterns, h, vertical_size, slash_size)

    meta_heads = [i for i, p in enumerate(pats) if p[0] != "block_sparse"]
    bs_heads = [i for i, p in enumerate(pats) if p[0] == "block_sparse"]

    s_pad = _round_up(s, max(block, tile))
    pad = s_pad - s
    n_blk = s_pad // block
    out = jnp.zeros(q.shape, q.dtype)

    if meta_heads:
        vs_heads = [
            i for i in meta_heads if pats[i][0] == "vertical_and_slash"
        ]
        if vs_heads:
            vertical, slash = estimate_vertical_slash(
                q[:, :, vs_heads], k, scale,
                head_kv=[i // g for i in vs_heads],
            )
            if sim is not None:
                vertical, slash = sim_vs_scores(
                    sim, vertical, slash, salt=sim_salt
                )
            vs_pos = {hh: j for j, hh in enumerate(vs_heads)}

        # Uniform vertical capacity across the launch (kernel tiles are
        # static): max over heads of the kind's token count.
        nv_cap = tile
        for i in meta_heads:
            kind, vsize, _ = pats[i]
            want = (
                min(s, max(vsize, 30))
                if kind == "vertical_and_slash"
                else (min(stream_sink, s) if kind == "stream_llm" else 1)
            )
            nv_cap = max(nv_cap, _round_up(want, tile))

        pad_tok = jnp.int32(2 * s_pad)
        v_rows, d_rows = [], []
        for i in meta_heads:
            kind, vsize, ssize = pats[i]
            if kind == "vertical_and_slash":
                vsz = min(s, max(vsize, 30))
                ssz = min(s, max(ssize, 50))
                _, v_idx = jax.lax.top_k(
                    vertical[:, vs_pos[i]], vsz
                )  # [B, vsz]
                v_idx = jnp.pad(
                    v_idx, ((0, 0), (0, nv_cap - vsz)),
                    constant_values=2 * s_pad,
                )
                _, s_idx = jax.lax.top_k(slash[:, vs_pos[i]], ssz)
                dflag = diag_flags_from_slash(s_idx, n_blk, block)
            elif kind == "stream_llm":
                sink = min(stream_sink, s)
                v_idx = jnp.broadcast_to(
                    jnp.where(
                        jnp.arange(nv_cap, dtype=jnp.int32) < sink,
                        jnp.arange(nv_cap, dtype=jnp.int32),
                        pad_tok,
                    )[None],
                    (b, nv_cap),
                )
                kb = jnp.arange(n_blk, dtype=jnp.int32)
                dflag = jnp.broadcast_to(
                    (kb * block < stream_window + block).astype(
                        jnp.int32
                    )[None],
                    (b, n_blk),
                )
            else:  # dense
                v_idx = jnp.full((b, nv_cap), pad_tok, jnp.int32)
                dflag = jnp.ones((b, n_blk), jnp.int32)
            v_rows.append(v_idx)
            d_rows.append(dflag)

        hm = len(meta_heads)
        v_idx_all = jnp.stack(v_rows, 1).reshape(b * hm, nv_cap)
        dflag_all = jnp.stack(d_rows, 1).reshape(b * hm, n_blk)

        import numpy as _np

        kv_rows = _np.asarray([i // g for i in meta_heads])
        if pad:
            q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
            k_p = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
            v_p = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        else:
            q_p, k_p, v_p = q, k, v
        q_f = (
            q_p[:, :, meta_heads]
            .transpose(0, 2, 1, 3)
            .reshape(b * hm, s_pad, dh)
        )
        k_f = k_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
        v_f = v_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
        # ONE launch for the whole [b*hm] row space (round 5): the
        # kernel's metadata now rides per-row SMEM blocks, so the old
        # per-batch python loop (SMEM-budget workaround, b kernel
        # invocations per layer) is gone; kv_map addresses the global
        # [b*kh] k/v row space directly.
        kv_map = jnp.asarray(
            (
                _np.arange(b)[:, None] * kh + kv_rows[None, :]
            ).reshape(-1),
            jnp.int32,
        )
        fn = vs_tile_attention if use_kernel else (
            lambda *a, tq=None, tk=None, **kw:
            vs_tok_attention_reference(*a, **kw)
        )
        o_f = fn(
            q_f, k_f, v_f, v_idx_all, dflag_all, kv_map,
            block=block, scale=scale, seq_len=s,
            tq=tile, tk=tile,
            **({"interpret": interpret} if use_kernel else {}),
        )
        o_meta = (
            o_f.reshape(b, hm, s_pad, dh)[:, :, :s]
            .transpose(0, 2, 1, 3)
            .astype(q.dtype)
        )
        out = out.at[:, :, meta_heads].set(o_meta)

    if bs_heads:
        o_bs = block_sparse_attention(
            q[:, :, bs_heads], k, v,
            topk_blocks=bs_topk_blocks, block=bs_block, scale=scale,
            head_kv=[hh // g for hh in bs_heads],
        )
        out = out.at[:, :, bs_heads].set(o_bs.astype(q.dtype))

    return out


# --------------------------------------------------------------------------
# Per-layer (traced-pattern) path: the reference's MInference JSONs vary
# patterns per LAYER (models/base.py:291 indexes minference_parttern by
# layer_idx). The prefill layer loop here is a lax.scan, so per-layer
# tables cannot be static — this variant takes the pattern table as
# TRACED arrays riding the scan xs.
# --------------------------------------------------------------------------

KIND_IDS = {"vertical_and_slash": 0, "stream_llm": 1, "dense": 2}


def patterns_to_arrays(
    layer_patterns: Sequence,  # [L] entries, each a per-head table
    num_heads: int,
    num_layers: int,
    vertical_size: int,
    slash_size: int,
):
    """Normalize a per-layer pattern table to numpy arrays
    (kind_ids [L, H], vertical [L, H], slash [L, H]) for the scan xs,
    plus the static top-k caps (max sizes over the table).

    ``block_sparse`` heads are rejected: the per-layer path unifies
    patterns through one metadata representation and block_sparse is
    not expressible in it (arbitrary per-query-block sets). MInference's
    shipped configs are overwhelmingly vertical_and_slash; calibrate
    without block_sparse candidates for per-layer tables, or use the
    uniform-table path (``minference_patterns``) which supports it.
    """
    import numpy as _np

    assert len(layer_patterns) == num_layers, (
        len(layer_patterns), num_layers
    )
    kinds = _np.zeros((num_layers, num_heads), _np.int32)
    vs = _np.zeros((num_layers, num_heads), _np.int32)
    ss = _np.zeros((num_layers, num_heads), _np.int32)
    for li, table in enumerate(layer_patterns):
        pats = resolve_patterns(
            table, num_heads, vertical_size, slash_size
        )
        for hh, (kind, vsize, ssize) in enumerate(pats):
            if kind == "block_sparse":
                raise ValueError(
                    "per-layer pattern tables do not support "
                    f"block_sparse (layer {li}, head {hh}); see "
                    "patterns_to_arrays docstring"
                )
            kinds[li, hh] = KIND_IDS[kind]
            vs[li, hh] = vsize
            ss[li, hh] = ssize
    vs_heads = kinds == 0
    v_cap = int(vs[vs_heads].max()) if vs_heads.any() else 30
    s_cap = int(ss[vs_heads].max()) if vs_heads.any() else 50
    return kinds, vs, ss, max(v_cap, 30), max(s_cap, 50)


def dynamic_vs_flags(
    vertical: jnp.ndarray,  # [BH, S] scores
    slash: jnp.ndarray,  # [BH, S]
    vsize: jnp.ndarray,  # [BH] traced per-head counts
    ssize: jnp.ndarray,  # [BH]
    seq_len: int,
    block: int,
    grid_len: int,
    v_cap: int,  # static caps >= any per-head count
    s_cap: int,
):
    """Block activity flags with TRACED per-head top-k counts: top-k to
    the static cap, then mask entries past each head's dynamic count to
    the pad id (top-k's prefix property makes top-``n`` of top-``cap``
    identical to a direct top-``n``). Same clamps as the static path
    (vertical >= 30, slash >= 50, both <= seq_len)."""
    n_blk = grid_len // block
    v_cap = min(seq_len, v_cap)
    s_cap = min(seq_len, s_cap)
    _, v_idx = jax.lax.top_k(vertical, v_cap)
    vs_n = jnp.clip(jnp.maximum(vsize, 30), 0, seq_len)[:, None]
    v_idx = jnp.where(
        jnp.arange(v_cap)[None] < vs_n, v_idx, jnp.int32(grid_len)
    )
    _, s_idx = jax.lax.top_k(slash, s_cap)
    sl_n = jnp.clip(jnp.maximum(ssize, 50), 0, seq_len)[:, None]
    s_idx = jnp.where(
        jnp.arange(s_cap)[None] < sl_n, s_idx, jnp.int32(grid_len)
    )
    return vs_flags(v_idx, s_idx, n_blk, block)


def minference_prefill_dynamic(
    q: jnp.ndarray,  # [B, S, H, Dh] roped queries
    k: jnp.ndarray,  # [B, S, K, Dh] roped keys
    v: jnp.ndarray,  # [B, S, K, Dh]
    kind_ids: jnp.ndarray,  # [H] traced, KIND_IDS values
    vsize: jnp.ndarray,  # [H] traced
    ssize: jnp.ndarray,  # [H] traced
    *,
    v_cap: int,
    s_cap: int,
    block: int = 128,
    stream_sink: int = 1024,
    stream_window: int = 8192,
    use_kernel: bool = True,
    interpret: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Per-head sparse prefill with a TRACED pattern assignment — the
    per-layer path (this layer's [H] rows ride the prefill scan's xs).
    All three kinds unify through block activity flags selected per
    head by kind id; one kernel launch per batch element, exactly like
    the static path. Estimation runs for every head (kind is traced, so
    stream/dense heads cannot statically skip it — the per-layer cost
    of per-layer tables). Returns [B, S, H, Dh]."""
    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = scale if scale is not None else dh**-0.5
    s_pad = ((s + block - 1) // block) * block
    pad = s_pad - s
    n_blk = s_pad // block

    vertical, slash = estimate_vertical_slash(q, k, scale)  # [B, H, S]
    vert_f = vertical.reshape(b * h, s)
    slash_f = slash.reshape(b * h, s)
    kind_r = jnp.tile(kind_ids, b)[:, None]  # [BH, 1]
    vs_col, vs_diag = dynamic_vs_flags(
        vert_f, slash_f, jnp.tile(vsize, b), jnp.tile(ssize, b),
        s, block, s_pad, v_cap, s_cap,
    )
    st_col, st_diag = stream_flags(
        b * h, s_pad, block, stream_sink, stream_window
    )
    col_flag = jnp.where(
        kind_r == 0, vs_col, jnp.where(kind_r == 1, st_col, 0)
    )
    diag_flag = jnp.where(
        kind_r == 0, vs_diag, jnp.where(kind_r == 1, st_diag, 1)
    )
    meta = meta_from_flags(col_flag, diag_flag)

    import numpy as _np

    kv_map = jnp.asarray(
        (
            _np.arange(b)[:, None] * kh
            + (_np.arange(h) // g)[None, :]
        ).reshape(-1),
        jnp.int32,
    )
    if pad:
        q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k_p = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_p = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        q_p, k_p, v_p = q, k, v
    q_f = q_p.transpose(0, 2, 1, 3).reshape(b * h, s_pad, dh)
    k_f = k_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
    v_f = v_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
    if use_kernel:
        from shadowkv_tpu.kernels.vs_sparse import vs_sparse_attention

        parts = []
        for b0 in range(b):
            hs = slice(b0 * h, (b0 + 1) * h)
            ks_ = slice(b0 * kh, (b0 + 1) * kh)
            parts.append(
                vs_sparse_attention(
                    q_f[hs], k_f[ks_], v_f[ks_],
                    meta.col_ids[hs], meta.col_cnt[hs],
                    meta.col_flag[hs], meta.diag_ids[hs],
                    meta.diag_cnt[hs],
                    kv_map[hs] - b0 * kh,
                    block=block, scale=scale, seq_len=s,
                    interpret=interpret,
                )
            )
        o_f = parts[0] if b == 1 else jnp.concatenate(parts, axis=0)
    else:
        o_f = vs_attention_reference(
            q_f, k_f, v_f, meta, kv_map, block,
            scale=scale, seq_len=s,
        )
    return (
        o_f.reshape(b, h, s_pad, dh)[:, :, :s]
        .transpose(0, 2, 1, 3)
        .astype(q.dtype)
    )


def minference_prefill_dynamic_tile(
    q: jnp.ndarray,  # [B, S, H, Dh] roped queries
    k: jnp.ndarray,  # [B, S, K, Dh] roped keys
    v: jnp.ndarray,  # [B, S, K, Dh]
    kind_ids: jnp.ndarray,  # [H] traced, KIND_IDS values
    vsize: jnp.ndarray,  # [H] traced
    ssize: jnp.ndarray,  # [H] traced
    *,
    v_cap: int,
    s_cap: int,
    block: int = 128,
    stream_sink: int = 1024,
    stream_window: int = 8192,
    tile: int = 512,
    use_kernel: bool = True,
    interpret: bool = False,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Per-layer traced-pattern variant of minference_prefill_tile:
    this layer's [H] kind/size rows ride the prefill scan's xs, so
    every selection is a traced where() over the three kinds. Verticals
    stay token-granular (top-k to the static cap, entries past the
    head's dynamic count demoted to padding)."""
    from shadowkv_tpu.kernels.vs_tile import (
        vs_tile_attention,
        vs_tok_attention_reference,
    )

    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = scale if scale is not None else dh**-0.5
    s_pad = _round_up(s, max(block, tile))
    pad = s_pad - s
    n_blk = s_pad // block
    pad_tok = jnp.int32(2 * s_pad)

    vertical, slash = estimate_vertical_slash(q, k, scale)  # [B, H, S]
    vert_f = vertical.reshape(b * h, s)
    slash_f = slash.reshape(b * h, s)
    kind_r = jnp.tile(kind_ids, b)[:, None]  # [BH, 1]
    vs_n = jnp.clip(jnp.maximum(jnp.tile(vsize, b), 30), 0, s)[:, None]
    sl_n = jnp.clip(jnp.maximum(jnp.tile(ssize, b), 50), 0, s)[:, None]

    nv_cap = max(
        tile,
        _round_up(min(s, v_cap), tile),
        _round_up(min(s, stream_sink), tile),
    )
    vc = min(s, v_cap, nv_cap)
    _, v_top = jax.lax.top_k(vert_f, vc)  # [BH, vc]
    v_top = jnp.pad(
        v_top, ((0, 0), (0, nv_cap - vc)), constant_values=2 * s_pad
    )
    lanes = jnp.arange(nv_cap, dtype=jnp.int32)[None]
    v_vs = jnp.where(lanes < vs_n, v_top, pad_tok)
    v_stream = jnp.where(
        lanes < min(stream_sink, s), lanes, pad_tok
    ).astype(jnp.int32)
    v_idx = jnp.where(
        kind_r == 0, v_vs,
        jnp.where(kind_r == 1, v_stream, pad_tok),
    )

    sc = min(s, s_cap)
    _, s_top = jax.lax.top_k(slash_f, sc)
    s_top = jnp.where(
        jnp.arange(sc)[None] < sl_n, s_top, jnp.int32(2 * s_pad)
    )
    d_vs = diag_flags_from_slash(s_top, n_blk, block)
    kb = jnp.arange(n_blk, dtype=jnp.int32)
    d_stream = jnp.broadcast_to(
        (kb * block < stream_window + block).astype(jnp.int32)[None],
        (b * h, n_blk),
    )
    dflag = jnp.where(
        kind_r == 0, d_vs, jnp.where(kind_r == 1, d_stream, 1)
    )

    import numpy as _np

    kv_rows = jnp.asarray(_np.arange(h) // g, jnp.int32)
    if pad:
        q_p = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k_p = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v_p = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        q_p, k_p, v_p = q, k, v
    q_f = q_p.transpose(0, 2, 1, 3).reshape(b * h, s_pad, dh)
    k_f = k_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
    v_f = v_p.transpose(0, 2, 1, 3).reshape(b * kh, s_pad, dh)
    # ONE launch over [b*h] rows (see the per-row-SMEM note at the
    # first call site): kv_map spans the global [b*kh] k/v row space.
    kv_map = (
        jnp.arange(b, dtype=jnp.int32)[:, None] * kh + kv_rows[None, :]
    ).reshape(-1)
    fn = vs_tile_attention if use_kernel else (
        lambda *a, tq=None, tk=None, **kw:
        vs_tok_attention_reference(*a, **kw)
    )
    o_f = fn(
        q_f, k_f, v_f, v_idx, dflag, kv_map,
        block=block, scale=scale, seq_len=s,
        tq=tile, tk=tile,
        **({"interpret": interpret} if use_kernel else {}),
    )
    return (
        o_f.reshape(b, h, s_pad, dh)[:, :, :s]
        .transpose(0, 2, 1, 3)
        .astype(q.dtype)
    )
