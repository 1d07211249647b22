"""Decomposed vertical+slash sparse prefill attention (122K-scale path).

Round-2 measurement (benchmarks/logs/prof_vs_kernel.log) refuted the
per-128-block walk design of kernels/vs_sparse.py at production scale:
blockifying 1000 vertical TOKENS activates ~625 of 960 column BLOCKS
(sparsity destroyed), and the [128,128]-tile walk costs ~0.41 us per
active block — 2.3 s/layer vs dense splash's 0.448 s. This module is
the redesign that wins:

- VERTICALS are token-granular (the reference MInference semantic,
  minference vertical_slash_sparse_attention): the top-Nv vertical K/V
  rows are gathered ONCE per head (XLA gather, ~256 KB) and attended as
  dense [TQ, Nv] MXU tiles — 1000 tokens cost 1000 columns, not
  625*128.
- SLASHES stay block(128)-granular but execute as [TQ=512, TK=512]
  tiles: a q tile visits only the 512-wide diagonal GROUPS containing
  an active 128-diagonal. In-tile masking reconstructs the exact
  128-granular diagonal set from 8 scalar flags; tiles whose 8 bands
  are all active (the interior of contiguous slash runs — the common
  case, since top-slash distances cluster) skip mask construction
  entirely.
- Both phases share ONE flash accumulation per q tile (no two-pass
  softmax merge): phase 1 walks diagonal groups excluding
  vertical-selected tokens (dedup), phase 2 walks the gathered vertical
  tiles masked only by causality. Every active (q, k) token pair is
  visited exactly once:

      active(q, k) = causal & (diag_flag[(q-k)//128] | vert_flag[k])

Reference anchor: models/tensor_op.py:101 ->
minference.vertical_slash_sparse_attention (their Triton kernel builds
a per-q-block CSR; the TPU shape of the same math is group tiles +
scalar-prefetch metadata).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _vs_tile_kernel(
    # scalar prefetch (whole arrays in SMEM; per-row SMEM BlockSpecs
    # are REJECTED by the TPU lowering — block leading dims must be
    # 8-divisible or equal the array dim, so (1, nG) blocks cannot
    # exist. Budget at the bench scale: [64 rows] x (nG 240 + nT 240 +
    # nK 960 + 1) x 4 B ~= 368 KB, compile-probed on chip)
    group_ids_ref,  # [BH, nG] active diagonal-group offsets, ascending
    group_cnt_ref,  # [BH, nT] #active groups with offset <= t
    diag_ref,  # [BH, nK] 128-granular diagonal flags (0/1)
    kv_map_ref,  # [BH] q-head -> kv row
    # tensors
    q_ref,  # [1, TQ, Dh] VMEM (this program's q tile)
    k_hbm,  # [BKV, S_pad, Dh] ANY
    v_hbm,  # [BKV, S_pad, Dh] ANY
    ksel_hbm,  # [BH, NV, Dh] ANY (gathered vertical keys)
    vsel_hbm,  # [BH, NV, Dh] ANY
    vflag_hbm,  # [BH, nTK, 8, TK] f32 vertical-membership per kv token
    # (row 0 is the data; rows 1-7 pad the DMA unit to a full 8-sublane
    # tile — single-sublane HBM->VMEM copies are the one shape here
    # with no hardware-proven precedent in this repo)
    vpos_hbm,  # [BH, NVT, 8, TK] f32 vertical token positions (pad >= S)
    # outputs
    o_ref,  # [1, TQ, Dh] VMEM
    # scratch
    k_tile,  # [2, TK, Dh]
    v_tile,  # [2, TK, Dh]
    f_tile,  # [2, 8, TK] f32 (row 0: vflag / vt positions)
    mask_tile,  # [TQ, TK] f32 (runtime mask staging)
    k_sems,
    v_sems,
    f_sems,
    *,
    tq: int,
    tk: int,
    block: int,
    scale: float,
    seq_len: int,
    nvt: int,  # static number of vertical tiles (NV // tk)
):
    bh = pl.program_id(0)
    t = pl.program_id(1)
    kv = kv_map_ref[bh]
    n_g = group_cnt_ref[bh, t]
    n = n_g + nvt
    f = tk // block  # 128-bands per group (4)
    nk = diag_ref.shape[1]

    def _group_dmas(i, slot):
        """Phase-1 descriptors (diagonal group at offset G)."""
        gg = group_ids_ref[bh, jnp.minimum(i, n_g - 1)]
        row = (t - gg) * tk
        return (
            pltpu.make_async_copy(
                k_hbm.at[kv, pl.ds(row, tk), :],
                k_tile.at[slot], k_sems.at[slot],
            ),
            pltpu.make_async_copy(
                v_hbm.at[kv, pl.ds(row, tk), :],
                v_tile.at[slot], v_sems.at[slot],
            ),
            pltpu.make_async_copy(
                vflag_hbm.at[bh, t - gg],
                f_tile.at[slot], f_sems.at[slot],
            ),
        )

    def _vert_dmas(i, slot):
        """Phase-2 descriptors (gathered vertical tile j = i - n_g)."""
        j = jnp.maximum(i - n_g, 0)
        return (
            pltpu.make_async_copy(
                ksel_hbm.at[bh, pl.ds(j * tk, tk), :],
                k_tile.at[slot], k_sems.at[slot],
            ),
            pltpu.make_async_copy(
                vsel_hbm.at[bh, pl.ds(j * tk, tk), :],
                v_tile.at[slot], v_sems.at[slot],
            ),
            pltpu.make_async_copy(
                vpos_hbm.at[bh, j],
                f_tile.at[slot], f_sems.at[slot],
            ),
        )

    def start(i, slot):
        @pl.when(i < n_g)
        def _():
            for d in _group_dmas(i, slot):
                d.start()

        @pl.when(i >= n_g)
        def _():
            for d in _vert_dmas(i, slot):
                d.start()

    def wait(i, slot):
        @pl.when(i < n_g)
        def _():
            for d in _group_dmas(i, slot):
                d.wait()

        @pl.when(i >= n_g)
        def _():
            for d in _vert_dmas(i, slot):
                d.wait()

    @pl.when(n > 0)
    def _():
        start(0, 0)

    @pl.when(n > 1)
    def _():
        start(1, 1)

    q = q_ref[0]  # [TQ, Dh]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    q_pos = t * tq + rows

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2
        wait(i, slot)

        s = jax.lax.dot_general(
            q, k_tile[slot],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [TQ, TK]

        fv = f_tile[slot, 0:1]  # [1, TK] f32 (row 0 of the 8-row tile)

        @pl.when(i < n_g)
        def _():
            # Diagonal-group tile at offset G: kv rows (t-G)*tk.
            # delta = q_pos - k_pos spans 128-bands [f*G - f, f*G + f-1];
            # reconstruct the exact 128-granular mask from the 2f
            # scalar diagonal flags. Interior tiles of contiguous slash
            # runs have every band set — skip mask construction and
            # keep only causality (G=0) + vertical exclusion.
            gg = group_ids_ref[bh, jnp.minimum(i, n_g - 1)]
            delta = gg * tk + rows - cols
            base = f * gg - f

            def band_flag(j):
                bd = base + j
                ok = (bd >= 0) & (bd < nk)
                return jnp.where(
                    ok, diag_ref[bh, jnp.clip(bd, 0, nk - 1)], bd < 0
                )

            flags = [band_flag(j) for j in range(2 * f)]
            # bands with bd < 0 count as "set": they are causally dead
            # (delta < 0) so the allset fast path stays correct.
            allset = flags[0]
            for fl in flags[1:]:
                allset = allset & fl

            @pl.when(allset)
            def _():
                mask_tile[...] = jnp.ones((tq, tk), jnp.float32)

            @pl.when(jnp.logical_not(allset))
            def _():
                bd_t = delta >> 7 if block == 128 else delta // block
                mk = jnp.zeros((tq, tk), jnp.bool_)
                for j in range(2 * f):
                    mk = mk | ((bd_t == base + j) & (flags[j] != 0))
                mask_tile[...] = mk.astype(jnp.float32)

            mask = (
                (mask_tile[...] > 0)
                & (delta >= 0)
                & (fv == 0.0)  # vertical tokens handled in phase 2
            )
            kp = (t - gg) * tk + cols
            if seq_len % tk or True:
                mask = mask & (kp < seq_len)
            mask_tile[...] = mask.astype(jnp.float32)

        @pl.when(i >= n_g)
        def _():
            # Vertical tile: fv carries the selected tokens' absolute
            # positions (pad entries >= S_pad kill themselves).
            mask = (fv <= q_pos.astype(jnp.float32)) & (
                fv < float(seq_len)
            )
            mask_tile[...] = mask.astype(jnp.float32)

        s = jnp.where(mask_tile[...] > 0, s, _NEG)

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_tile.dtype), v_tile[slot],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(i + 2 < n)
        def _():
            start(i + 2, slot)

        return m_new, l, acc

    m0 = jnp.full((tq, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    acc0 = jnp.zeros((tq, q.shape[-1]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    l = jnp.where(l == 0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "block", "scale", "seq_len", "tq", "tk", "interpret"
    ),
)
def vs_tile_attention(
    q: jnp.ndarray,  # [BH, S_pad, Dh]
    k: jnp.ndarray,  # [BKV, S_pad, Dh]
    v: jnp.ndarray,  # [BKV, S_pad, Dh]
    v_idx: jnp.ndarray,  # [BH, NV] vertical token indices (pad >= seq)
    diag_flag: jnp.ndarray,  # [BH, nK] 128-granular diagonal 0/1 flags
    kv_map: jnp.ndarray,  # [BH] int32
    *,
    block: int = 128,
    scale: float,
    seq_len: int,
    tq: int = 512,
    tk: int = 512,
    interpret: bool = False,
):
    """Token-granular-vertical + block-granular-slash flash attention.

    active(q, kt) = causal & (diag_flag[(q-kt)//block] | kt in v_idx).
    Returns [BH, S_pad, Dh] (rows past seq_len are garbage). NV and
    S_pad must be multiples of tk; tq == tk (group offsets index both
    grids).
    """
    bh, s_pad, dh = q.shape
    assert tq == tk, "diagonal groups assume tq == tk"
    assert s_pad % tq == 0 and tk % block == 0
    nv = v_idx.shape[1]
    assert nv % tk == 0, (nv, tk)
    n_t = s_pad // tq
    nk = diag_flag.shape[1]
    assert nk == s_pad // block, (nk, s_pad, block)
    f = tk // block

    # --- XLA-side metadata ------------------------------------------------
    # Active 512-groups: group G is visited when any 128-band
    # [f*G - f, f*G + f - 1] is active.
    dpad = jnp.pad(diag_flag, ((0, 0), (f, f - 1)))
    gf = functools.reduce(
        jnp.maximum,
        [dpad[:, j::f][:, :n_t] for j in range(2 * f)],
    )  # [BH, nG]
    iota = jnp.arange(n_t, dtype=jnp.int32)
    group_ids = jnp.sort(
        jnp.where(gf > 0, iota, jnp.int32(n_t)), axis=-1
    )
    group_cnt = jnp.cumsum(gf, axis=-1).astype(jnp.int32)

    # Dedup vertical indices (duplicates would double-count a token in
    # the softmax): sort ascending, demote repeats to pad. top_k
    # callers are already distinct; this keeps the contract local.
    v_sorted = jnp.sort(v_idx.astype(jnp.int32), axis=-1)
    dup = jnp.concatenate(
        [
            jnp.zeros((bh, 1), jnp.bool_),
            v_sorted[:, 1:] == v_sorted[:, :-1],
        ],
        axis=-1,
    )
    v_idx = jnp.where(dup, jnp.int32(2 * s_pad), v_sorted)

    # Vertical gathers (256 B rows; one-shot per layer, XLA gather).
    idx_c = jnp.minimum(v_idx, s_pad - 1).astype(jnp.int32)
    k_sel = jnp.take_along_axis(
        k[kv_map], idx_c[..., None], axis=1
    )  # [BH, NV, Dh]
    v_sel = jnp.take_along_axis(v[kv_map], idx_c[..., None], axis=1)
    # Membership flags per kv token (phase-1 dedup), shaped for [1, TK]
    # DMA tiles; and the positions themselves for phase-2 masking.
    vflag = (
        jnp.zeros((bh, s_pad), jnp.float32)
        .at[
            jnp.arange(bh, dtype=jnp.int32)[:, None],
            idx_c,
        ]
        .max(jnp.where(v_idx < seq_len, 1.0, 0.0))
        .reshape(bh, n_t, 1, tk)
    )
    vflag = jnp.pad(vflag, ((0, 0), (0, 0), (0, 7), (0, 0)))
    vpos = (
        jnp.where(v_idx < seq_len, v_idx, 2 * s_pad)
        .astype(jnp.float32)
        .reshape(bh, nv // tk, 1, tk)
    )
    vpos = jnp.pad(
        vpos, ((0, 0), (0, 0), (0, 7), (0, 0)),
        constant_values=float(2 * s_pad),
    )

    kernel = functools.partial(
        _vs_tile_kernel,
        tq=tq,
        tk=tk,
        block=block,
        scale=scale,
        seq_len=seq_len,
        nvt=nv // tk,
    )
    # ONE pallas_call for the whole [B*H] row space (round 5; the old
    # per-batch python launch loop is gone). Metadata rides whole-array
    # scalar prefetch: per-row SMEM BlockSpecs are rejected by the TPU
    # lowering (leading block dims must be 8-divisible or equal the
    # array dim), and the budget holds — ~368 KB at the bench scale
    # (compile-probed, benchmarks/probe_vs_smem.py).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bh, n_t),
        in_specs=[
            pl.BlockSpec((1, tq, dh), lambda i, j, *_: (i, j, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # k
            pl.BlockSpec(memory_space=pl.ANY),  # v
            pl.BlockSpec(memory_space=pl.ANY),  # ksel
            pl.BlockSpec(memory_space=pl.ANY),  # vsel
            pl.BlockSpec(memory_space=pl.ANY),  # vflag
            pl.BlockSpec(memory_space=pl.ANY),  # vpos
        ],
        out_specs=pl.BlockSpec((1, tq, dh), lambda i, j, *_: (i, j, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tk, dh), k.dtype),
            pltpu.VMEM((2, tk, dh), v.dtype),
            pltpu.VMEM((2, 8, tk), jnp.float32),
            pltpu.VMEM((tq, tk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(
        group_ids.astype(jnp.int32),
        group_cnt,
        diag_flag.astype(jnp.int32),
        kv_map.astype(jnp.int32),
        q,
        k,
        v,
        k_sel,
        v_sel,
        vflag,
        vpos,
    )


def vs_tok_attention_reference(
    q, k, v, v_idx, diag_flag, kv_map, *, block=128, scale=None,
    seq_len=None,
):
    """jnp oracle for vs_tile_attention (materializes [BH, S, S]; tests
    and the CPU path only)."""
    bh, s, dh = q.shape
    seq_len = s if seq_len is None else seq_len
    scale = scale if scale is not None else dh**-0.5
    pos = jnp.arange(s)
    vert = jnp.zeros((bh, s), jnp.bool_).at[
        jnp.arange(bh)[:, None], jnp.minimum(v_idx, s - 1)
    ].max(v_idx < seq_len)
    delta_b = jnp.clip(
        (pos[:, None] - pos[None, :]) // block, 0, diag_flag.shape[1] - 1
    )
    diag = diag_flag[:, delta_b] > 0  # [BH, S, S]
    mask = (
        (pos[None, None, :] <= pos[None, :, None])
        & (pos[None, None, :] < seq_len)
        & (diag | vert[:, None, :])
    )
    k_g = k[kv_map]
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
