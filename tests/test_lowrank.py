"""Low-rank SVD factorization tests (Gram-matrix truncated SVD)."""

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.core.lowrank import lowrank_kv_factors, reconstruct_keys


def _make_lowrank_k(key, b, s, d, true_rank):
    ka, kb = jax.random.split(key)
    left = jax.random.normal(ka, (b, s, true_rank), jnp.float32)
    right = jax.random.normal(kb, (b, true_rank, d), jnp.float32)
    return jnp.einsum("bsr,brd->bsd", left, right)


def test_exact_recovery_when_rank_sufficient(rng):
    b, s, kh, dh = 2, 256, 2, 32
    d = kh * dh
    k = _make_lowrank_k(rng, b, s, d, true_rank=16)
    u, sv = lowrank_kv_factors(k, rank=32, num_kv_heads=kh, head_dim=dh,
                               dtype=jnp.float32)
    recon = jnp.einsum(
        "bsr,bkrd->bksd", u, sv
    ).transpose(0, 2, 1, 3).reshape(b, s, d)
    err = jnp.linalg.norm(recon - k) / jnp.linalg.norm(k)
    assert err < 1e-3, f"relative error {err}"


def test_truncation_error_matches_numpy_svd(rng):
    """Rank-r Gram-based factors must match numpy's optimal rank-r SVD."""
    b, s, kh, dh = 1, 128, 2, 16
    d = kh * dh
    k = jax.random.normal(rng, (b, s, d), jnp.float32)
    rank = 8
    u, sv = lowrank_kv_factors(k, rank, kh, dh, dtype=jnp.float32)
    recon = jnp.einsum("bsr,bkrd->bksd", u, sv)
    recon = recon.transpose(0, 2, 1, 3).reshape(b, s, d)
    ours = float(jnp.linalg.norm(recon - k))

    kn = np.asarray(k[0])
    un, sn, vn = np.linalg.svd(kn, full_matrices=False)
    best = un[:, :rank] @ np.diag(sn[:rank]) @ vn[:rank]
    optimal = float(np.linalg.norm(best - kn))
    assert ours <= optimal * 1.01 + 1e-4, (ours, optimal)


def test_reconstruct_keys_gathers_rows(rng):
    b, s, kh, dh = 2, 64, 2, 16
    d = kh * dh
    k = _make_lowrank_k(rng, b, s, d, true_rank=8)
    u, sv = lowrank_kv_factors(k, 16, kh, dh, dtype=jnp.float32)
    pos = jax.random.randint(rng, (b, kh, 10), 0, s)
    got = reconstruct_keys(u, sv, pos)
    # Reference: gather K rows directly, per head.
    k_h = k.reshape(b, s, kh, dh).transpose(0, 2, 1, 3)  # [B,K,S,Dh]
    want = jnp.take_along_axis(k_h, pos[..., None], axis=2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-2, atol=1e-2
    )
