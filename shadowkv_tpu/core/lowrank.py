"""Low-rank factorization of the pre-RoPE key cache.

The reference calls ``torch.svd`` on the fp32 pre-RoPE K flattened to
[bsz, seq, kv_heads * head_dim] and keeps ``U[:, :, :rank]`` and
``SV = diag(s[:rank]) @ v[:rank]`` (models/kv_cache.py:278-317, 666-737)
so that ``K ~= U @ SV`` with U *shared across KV heads*.

TPU-first design: instead of a full SVD (O(seq * d^2) but poorly mapped
to the MXU by general-purpose SVD algorithms), we compute the truncated
SVD through the d x d Gram matrix:

    G = K^T K = V S^2 V^T           (one [d, seq] x [seq, d] matmul)
    eigh(G) -> V, S^2               (d = 1024: trivial)

followed by one subspace-refinement pass (the classic power-iteration
step of randomized SVD, with the Gram eigvecs as the sketch):

    Y = K V_r ; Q = qr(Y).Q         (tall-skinny QR, O(seq * r^2))
    B = Q^T K ; svd(B) -> Ub, S, Vt (tiny [r, d] SVD)
    U = Q Ub ; SV = diag(S) Vt

The refinement removes the fp32 condition-squaring of the Gram matrix,
so the result matches the optimal rank-r SVD to fp32 accuracy while
every heavy step is a large dense matmul on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lowrank_kv_factors(
    k_pre_rope: jnp.ndarray,
    rank: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factor pre-RoPE keys K ~= U @ SV.

    Args:
      k_pre_rope: [B, S, K * Dh] or [B, S, K, Dh] pre-RoPE keys.
      rank: number of singular directions kept (reference default 160).

    Returns:
      U:  [B, S, rank] in ``dtype`` (shared across KV heads).
      SV: [B, K, rank, Dh] in ``dtype``, laid out per head so
          reconstruction is ``U[rows] @ SV[h]`` (kv_cache.py:447-470).
    """
    b = k_pre_rope.shape[0]
    s = k_pre_rope.shape[1]
    d = num_kv_heads * head_dim
    kf = k_pre_rope.reshape(b, s, d).astype(jnp.float32)

    gram = jnp.einsum("bsd,bse->bde", kf, kf, preferred_element_type=jnp.float32)
    _, eigvecs = jnp.linalg.eigh(gram)  # ascending eigenvalues
    top_vecs = eigvecs[:, :, ::-1][:, :, :rank]  # [B, d, r]

    # Subspace refinement: orthonormalize K V_r, then an exact small SVD.
    y = jnp.einsum(
        "bsd,bdr->bsr", kf, top_vecs, preferred_element_type=jnp.float32
    )
    q, _ = jnp.linalg.qr(y)  # [B, S, r]
    b_small = jnp.einsum(
        "bsr,bsd->brd", q, kf, preferred_element_type=jnp.float32
    )
    ub, sing, vt = jnp.linalg.svd(b_small, full_matrices=False)
    u = jnp.einsum("bsr,brt->bst", q, ub, preferred_element_type=jnp.float32)
    sv = sing[:, :, None] * vt  # [B, r, d]
    sv = sv.reshape(b, rank, num_kv_heads, head_dim).transpose(0, 2, 1, 3)
    return u.astype(dtype), sv.astype(dtype)


def reconstruct_keys(
    u: jnp.ndarray,
    sv: jnp.ndarray,
    positions: jnp.ndarray,
) -> jnp.ndarray:
    """Gather U rows and reconstruct pre-RoPE keys for selected positions.

    jnp reference for the fused Pallas reconstruction kernel
    (kernels/reconstruct.py); mirrors kv_cache.py:447-470 /
    tensor_op.py:201-238 minus the RoPE (applied by the caller at the
    gathered absolute positions).

    Args:
      u: [B, S, r]; sv: [B, K, r, Dh]; positions: [B, K, N] int32 rows.
    Returns:
      [B, K, N, Dh] pre-RoPE keys.
    """
    u_rows = jnp.take_along_axis(
        u[:, None], positions[..., None].astype(jnp.int32), axis=2
    )  # [B, K, N, r]
    return jnp.einsum(
        "bknr,bkrd->bknd", u_rows, sv, preferred_element_type=jnp.float32
    ).astype(u.dtype)
