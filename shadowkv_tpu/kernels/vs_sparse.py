"""Dynamic block-sparse flash attention for MInference-style prefill.

Executes the vertical_and_slash / stream_llm / dense per-head patterns
of core/minference.py: for each (head, query-block) the kernel walks
ONLY the active key blocks — the union of the head's vertical column
blocks and its slash diagonal blocks — with flash (online-softmax)
accumulation and double-buffered HBM DMAs.

This is the TPU replacement for MInference's Triton
``vertical_slash_sparse_attention`` (dispatched by the reference at
models/tensor_op.py:101): where the CUDA side builds a block-sparse CSR
on the fly, here the active set has the closed form

    active[qb, kb] = causal & (col_flag[kb] | diag_flag[qb - kb])

so the metadata rides in SMEM scalar prefetch (two sorted id lists +
prefix counts per head, built in XLA by core/minference.py) and the
kernel needs no dynamic-length lists: per q-block it walks
``col_cnt[qb]`` column blocks then ``diag_cnt[qb]`` diagonal blocks,
masking blocks that are both (dedup via ``col_flag``) so each active
block contributes exactly once.

Unlike splash attention the mask is RUNTIME DATA (estimated from q/k
inside the prefill program), which static splash masks cannot express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _vs_kernel(
    # scalar prefetch
    col_ids_ref,  # [BH, nK]
    col_cnt_ref,  # [BH, nQ]
    col_flag_ref,  # [BH, nK]
    diag_ids_ref,  # [BH, nQ]
    diag_cnt_ref,  # [BH, nQ]
    kv_map_ref,  # [BH] q-head -> kv row in k/v
    # tensors
    q_ref,  # [1, B, Dh] VMEM (this program's query block)
    k_hbm,  # [BKV, S_pad, Dh] ANY
    v_hbm,  # [BKV, S_pad, Dh] ANY
    # outputs
    o_ref,  # [1, B, Dh] VMEM
    # scratch
    k_tile,  # [2, B, Dh]
    v_tile,  # [2, B, Dh]
    k_sems,
    v_sems,
    *,
    block: int,
    scale: float,
    seq_len: int,  # real (unpadded) sequence length
    n_kb: int,
):
    bh = pl.program_id(0)
    qb = pl.program_id(1)
    kv = kv_map_ref[bh]
    n1 = col_cnt_ref[bh, qb]
    n2 = diag_cnt_ref[bh, qb]
    n = n1 + n2
    b = block

    def kb_of(i):
        ci = jnp.minimum(i, n_kb - 1)
        di = jnp.clip(i - n1, 0, diag_ids_ref.shape[1] - 1)
        kb = jnp.where(
            i < n1, col_ids_ref[bh, ci], qb - diag_ids_ref[bh, di]
        )
        # The metadata invariants (col_cnt/diag_cnt are cumsums over the
        # sorted id lists) keep kb in [0, qb] — but if they were ever
        # violated, an out-of-range kb becomes an out-of-bounds DMA that
        # hard-faults the device (and wedges the remote chip for
        # minutes). Clamp defensively: a fault becomes at worst a wrong
        # (oracle-testable) block, never a dead chip.
        return jnp.clip(kb, 0, n_kb - 1)

    def k_dma(i, slot):
        kb = kb_of(i)
        return pltpu.make_async_copy(
            k_hbm.at[kv, pl.ds(kb * b, b), :],
            k_tile.at[slot],
            k_sems.at[slot],
        )

    def v_dma(i, slot):
        kb = kb_of(i)
        return pltpu.make_async_copy(
            v_hbm.at[kv, pl.ds(kb * b, b), :],
            v_tile.at[slot],
            v_sems.at[slot],
        )

    @pl.when(n > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    @pl.when(n > 1)
    def _():
        k_dma(1, 1).start()
        v_dma(1, 1).start()

    q = q_ref[0]  # [B, Dh]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    q_pos = qb * b + rows

    def body(i, carry):
        m, l, acc = carry
        slot = i % 2
        k_dma(i, slot).wait()
        v_dma(i, slot).wait()
        kb = kb_of(i)

        s = jax.lax.dot_general(
            q, k_tile[slot],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [B, B]

        k_pos = kb * b + cols
        mask = k_pos <= q_pos
        if seq_len % b:
            mask = mask & (k_pos < seq_len)
        # dedup: a block reached via a diagonal that is also an active
        # column was already visited in the column pass.
        valid = (i < n1) | (col_flag_ref[bh, jnp.clip(kb, 0, n_kb - 1)] == 0)
        s = jnp.where(mask & valid, s, _NEG)

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
            k_dma(i + 2, slot).start()
            v_dma(i + 2, slot).start()

        return m_new, l, acc

    m0 = jnp.full((b, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((b, 1), jnp.float32)
    acc0 = jnp.zeros((b, q.shape[-1]), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, acc0))
    l = jnp.where(l == 0, 1.0, l)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block", "scale", "seq_len", "interpret"),
)
def vs_sparse_attention(
    q: jnp.ndarray,  # [BH, S_pad, Dh]
    k: jnp.ndarray,  # [BKV, S_pad, Dh]
    v: jnp.ndarray,  # [BKV, S_pad, Dh]
    col_ids: jnp.ndarray,  # [BH, nK] int32
    col_cnt: jnp.ndarray,  # [BH, nQ] int32
    col_flag: jnp.ndarray,  # [BH, nK] int32
    diag_ids: jnp.ndarray,  # [BH, nQ] int32
    diag_cnt: jnp.ndarray,  # [BH, nQ] int32
    kv_map: jnp.ndarray,  # [BH] int32
    *,
    block: int,
    scale: float,
    seq_len: int,
    interpret: bool = False,
):
    """Flash attention over the runtime block mask. Returns [BH, S_pad,
    Dh] (rows past ``seq_len`` are garbage — callers slice them off)."""
    bh, s_pad, dh = q.shape
    assert s_pad % block == 0, (s_pad, block)
    n_blk = s_pad // block
    assert col_ids.shape == (bh, n_blk), (col_ids.shape, (bh, n_blk))
    assert diag_ids.shape == (bh, n_blk)

    kernel = functools.partial(
        _vs_kernel,
        block=block,
        scale=scale,
        seq_len=seq_len,
        n_kb=n_blk,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(bh, n_blk),
        in_specs=[
            pl.BlockSpec(
                (1, block, dh), lambda i, j, *_: (i, j, 0)
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, block, dh), lambda i, j, *_: (i, j, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, block, dh), k.dtype),
            pltpu.VMEM((2, block, dh), v.dtype),
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
        col_ids.astype(jnp.int32),
        col_cnt.astype(jnp.int32),
        col_flag.astype(jnp.int32),
        diag_ids.astype(jnp.int32),
        diag_cnt.astype(jnp.int32),
        kv_map.astype(jnp.int32),
        q,
        k,
        v,
    )
