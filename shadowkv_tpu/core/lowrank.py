"""Low-rank factorization of the pre-RoPE key cache.

The reference calls ``torch.svd`` on the fp32 pre-RoPE K flattened to
[bsz, seq, kv_heads * head_dim] and keeps ``U[:, :, :rank]`` and
``SV = diag(s[:rank]) @ v[:rank]`` (models/kv_cache.py:278-317, 666-737)
so that ``K ~= U @ SV`` with U *shared across KV heads*.

TPU-first design: general-purpose SVD/QR map terribly onto the MXU
(XLA lowers them to sequential Householder/Jacobi iterations — measured
~50 s per 32K-token layer stack on v5e). Pre-RoPE K is near-low-rank by
ShadowKV's core observation, so a randomized subspace iteration
(Halko-Martinsson-Tropp) with CholeskyQR2 orthogonalization gets the
same factors to fp32 accuracy using only:

    - three large dense matmuls over K per power iteration (MXU),
    - [r+p, r+p] Cholesky / eigh (trivial at r+p = 192).

``method='gram'`` keeps the previous Gram-eigh + QR route as a
cross-check; tests compare both against jnp.linalg.svd.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _orth(y: jnp.ndarray, psum_axis: str | None = None) -> jnp.ndarray:
    """Orthonormalize tall-skinny [B, S, p] by symmetric whitening.

    Q = Y W diag(1/sqrt(lam)) from eigh(Y^T Y) — one Gram matmul plus a
    tiny [p, p] eigh, all MXU/parallel-friendly (XLA's Householder QR is
    a sequential loop, measured ~seconds for [32K, 192] on v5e).
    Rank-deficient directions are clamped, not amplified: their columns
    come out with near-zero norm and drop out of the downstream
    projection. Two passes restore fp32 orthogonality.

    ``psum_axis``: when the S rows are sharded over a MANUAL mesh axis
    (the pp x tp pipeline shards the feature axis of the half-step
    bases), the Gram is a partial sum — psum it so every rank whitens
    with the GLOBAL Gram and local rows stay rows of one global Q.
    """
    g = jnp.einsum("bsp,bsq->bpq", y, y, preferred_element_type=jnp.float32)
    if psum_axis is not None:
        g = jax.lax.psum(g, psum_axis)
    lam, w = jnp.linalg.eigh(g)
    # Directions below fp32 Gram noise are dropped (zeroed), NOT
    # clamped: 1/sqrt(clamped) would blow numerical junk up into O(1)
    # non-orthogonal columns.
    good = lam > jnp.maximum(lam[:, -1:], 1e-30) * 1e-6
    inv_s = jnp.where(good, jax.lax.rsqrt(jnp.maximum(lam, 1e-30)), 0.0)
    return jnp.einsum(
        "bsp,bpq->bsq", y, w * inv_s[:, None, :],
        preferred_element_type=jnp.float32,
    )


def _orth2(y: jnp.ndarray) -> jnp.ndarray:
    return _orth(_orth(y))


def _finish_from_basis(kf, q, rank, psum_axis: str | None = None):
    """Given an orthonormal range basis Q [B, S, p], return the top-rank
    factors U [B, S, r], SV [B, r, d] of K ~= U @ SV.

    Under a manual tp axis, kf's d columns are a head shard: b_small is
    the LOCAL column block of the global projection, its Gram is a
    partial sum (psum), and the returned SV is exactly this rank's head
    slice while U (built from the replicated q and the psum'd Gram's
    eigvecs) is bit-identical on every rank."""
    b_small = jnp.einsum(
        "bsp,bsd->bpd", q, kf, preferred_element_type=jnp.float32
    )  # [B, p, d]
    g = jnp.einsum(
        "bpd,bqd->bpq", b_small, b_small, preferred_element_type=jnp.float32
    )
    if psum_axis is not None:
        g = jax.lax.psum(g, psum_axis)
    eigval, eigvec = jnp.linalg.eigh(g)  # ascending, p x p (tiny)
    top = eigvec[:, :, ::-1][:, :, :rank]  # [B, p, r]
    u = jnp.einsum(
        "bsp,bpr->bsr", q, top, preferred_element_type=jnp.float32
    )
    sv = jnp.einsum(
        "bpr,bpd->brd", top, b_small, preferred_element_type=jnp.float32
    )
    return u, sv


@partial(jax.jit, static_argnames=(
    "rank", "num_kv_heads", "head_dim", "dtype", "method", "oversample",
    "tp_axis", "tp_size",
))
def lowrank_kv_factors(
    k_pre_rope: jnp.ndarray,
    rank: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    method: str = "randomized",
    oversample: int = 32,
    tp_axis: str | None = None,
    tp_size: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Factor pre-RoPE keys K ~= U @ SV.

    Args:
      k_pre_rope: [B, S, K * Dh] or [B, S, K, Dh] pre-RoPE keys.
      rank: number of singular directions kept (reference default 160).
      method: 'randomized' (default; subspace iteration, MXU-only) or
        'gram' (Gram eigvecs sketch + one refinement pass).

    Returns:
      U:  [B, S, rank] in ``dtype`` (shared across KV heads).
      SV: [B, K, rank, Dh] in ``dtype``, laid out per head so
          reconstruction is ``U[rows] @ SV[h]`` (kv_cache.py:447-470).
    """
    b = k_pre_rope.shape[0]
    s = k_pre_rope.shape[1]
    d = num_kv_heads * head_dim
    kf = k_pre_rope.reshape(b, s, d).astype(jnp.float32)

    if method == "randomized":
        # Manual-tp distribution (pp x tp pipeline): kf holds a HEAD
        # SLICE of the global feature axis (d_local = d_global / tp).
        # Every d-contraction psums; every d-sharded Gram psums inside
        # _orth; each rank draws ITS rows of one GLOBAL omega, so U
        # comes out bit-identical everywhere and SV comes out exactly
        # head-sliced — matching the tp cache pspecs.
        d_g = d * tp_size
        p = min(d_g, rank + oversample)
        omega = jax.random.normal(
            jax.random.PRNGKey(7), (d_g, p), jnp.float32
        )
        if tp_axis is not None:
            omega = jax.lax.dynamic_slice(
                omega, (jax.lax.axis_index(tp_axis) * d, 0), (d, p)
            )
        y = jnp.einsum(
            "bsd,dp->bsp", kf, omega, preferred_element_type=jnp.float32
        )
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        q = _orth(y)
        # One power iteration, re-orthonormalizing after each half-step
        # so the sketch's spectrum never gets squared/cubed in fp32.
        # Pre-RoPE K's spectrum decays fast (the ShadowKV premise), so
        # one pass reaches fp32 agreement with the exact truncated SVD.
        z = jnp.einsum(
            "bsd,bsp->bdp", kf, q, preferred_element_type=jnp.float32
        )
        z = _orth(z, psum_axis=tp_axis)
        y = jnp.einsum(
            "bsd,bdp->bsp", kf, z, preferred_element_type=jnp.float32
        )
        if tp_axis is not None:
            y = jax.lax.psum(y, tp_axis)
        q = _orth(_orth(y))
    elif method == "gram":
        assert tp_axis is None, "method='gram' is single-shard only"
        gram = jnp.einsum(
            "bsd,bse->bde", kf, kf, preferred_element_type=jnp.float32
        )
        _, eigvecs = jnp.linalg.eigh(gram)  # ascending
        top_vecs = eigvecs[:, :, ::-1][:, :, : rank + 2]
        y = jnp.einsum(
            "bsd,bdr->bsr", kf, top_vecs, preferred_element_type=jnp.float32
        )
        q = _orth2(y)
    else:
        raise ValueError(f"unknown lowrank method '{method}'")

    u, sv = _finish_from_basis(kf, q, rank, psum_axis=tp_axis)
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
