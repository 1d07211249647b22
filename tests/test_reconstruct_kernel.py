"""Interpret-mode tests for the fused sparse-refresh Pallas kernel
against a pure-jnp reference (SURVEY.md §7.1 M4 test contract)."""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.kernels.reconstruct import compact_misses, sparse_refresh

L, B, K, C, CS, R, DH = 3, 2, 4, 24, 8, 32, 128
S = 8  # select_sets
SPARSE_START = 16
CAP = SPARSE_START + S * CS + 8


def _mk(key):
    ks = jax.random.split(key, 8)
    u = jax.random.normal(ks[0], (L, B, C, CS, R), jnp.float32)
    sv = jax.random.normal(ks[1], (L, B, K, R, DH), jnp.float32)
    v_full = jax.random.normal(ks[2], (L, B, K, C, CS, DH), jnp.float32)
    k_buf = jax.random.normal(ks[3], (L, B, K, CAP, DH), jnp.float32)
    v_buf = jax.random.normal(ks[4], (L, B, K, CAP, DH), jnp.float32)
    slot_ids = jax.random.randint(ks[5], (B, K, S), 0, C)
    stay = jax.random.bernoulli(ks[6], 0.5, (B, K, S))
    return u, sv, v_full, k_buf, v_buf, slot_ids, stay


def _inv_freq_full(theta=10000.0):
    half = DH // 2
    invf = 1.0 / theta ** (np.arange(0, DH, 2, dtype=np.float64) / DH)
    return jnp.asarray(
        np.concatenate([invf, invf])[None], jnp.float32
    )  # [1, DH]


def _rope_ref(x, positions, inv_freq_full):
    # x: [..., n, DH]; neox rotate-half with duplicated-table trig.
    ang = positions[..., None] * inv_freq_full[0]
    half = DH // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return x * jnp.cos(ang) + rot * jnp.sin(ang)


def _reference(layer, u, sv, v_full, k_buf, v_buf, slot_ids, stay, invf):
    k_buf, v_buf = np.array(k_buf), np.array(v_buf)
    for b in range(B):
        for k in range(K):
            for s in range(S):
                if stay[b, k, s]:
                    continue
                cid = int(slot_ids[b, k, s])
                row = SPARSE_START + s * CS
                v_buf[layer, b, k, row : row + CS] = v_full[
                    layer, b, k, cid
                ]
                k_rec = u[layer, b, cid] @ sv[layer, b, k]  # [CS, DH]
                pos = cid * CS + jnp.arange(CS, dtype=jnp.float32)
                k_buf[layer, b, k, row : row + CS] = np.array(
                    _rope_ref(k_rec, pos, invf)
                )
    return k_buf, v_buf


@pytest.mark.parametrize("layer", [0, 2])
def test_sparse_refresh_matches_reference(rng, layer):
    u, sv, v_full, k_buf, v_buf, slot_ids, stay = _mk(rng)
    invf = _inv_freq_full()
    miss_chunk, miss_slot, miss_cnt = compact_misses(slot_ids, stay)

    k_out, v_out = sparse_refresh(
        jnp.asarray(layer, jnp.int32),
        miss_chunk, miss_slot, miss_cnt,
        u, sv, v_full, invf, k_buf, v_buf,
        chunk_size=CS, sparse_start=SPARSE_START, rope_dim=DH,
        interpret=True,
    )
    k_ref, v_ref = _reference(
        layer, u, sv, v_full, k_buf, v_buf, slot_ids, stay, invf
    )
    np.testing.assert_allclose(np.array(v_out), v_ref, atol=1e-6)
    np.testing.assert_allclose(np.array(k_out), k_ref, rtol=2e-4,
                               atol=2e-4)


def test_compact_misses():
    slot_ids = jnp.array([[[5, 9, 3, 7]]], jnp.int32)
    stay = jnp.array([[[True, False, True, False]]])
    mc, ms, cnt = compact_misses(slot_ids, stay)
    assert int(cnt[0, 0]) == 2
    assert list(np.array(ms[0, 0, :2])) == [1, 3]
    assert list(np.array(mc[0, 0, :2])) == [9, 7]


def test_sparse_refresh_glm_partial_rope(rng):
    """GLM variant: interleaved (even, odd) pairs on the first half of
    the head dim, rest passed through (reference rope_new.cu:429-534)."""
    from shadowkv_tpu.core.rope import rotate_with_tables

    rope_dim = DH // 2
    u, sv, v_full, k_buf, v_buf, slot_ids, stay = _mk(rng)
    half = rope_dim // 2
    invf_half = 1.0 / 1e4 ** (np.arange(0, rope_dim, 2) / rope_dim)
    invf_full = np.zeros(DH)
    invf_full[:rope_dim] = np.repeat(invf_half, 2)
    invf = jnp.asarray(invf_full[None], jnp.float32)
    mc, ms, cnt = compact_misses(slot_ids, stay)

    k_out, _ = sparse_refresh(
        jnp.asarray(1, jnp.int32), mc, ms, cnt,
        u, sv, v_full, invf, k_buf, v_buf,
        chunk_size=CS, sparse_start=SPARSE_START, rope_dim=rope_dim,
        rope_style="glm", interpret=True,
    )
    # jnp reference: rotate_with_tables(style='glm') at the positions.
    cos_t = jnp.cos(
        jnp.arange(4096)[:, None] * jnp.asarray(invf_half)[None]
    )
    sin_t = jnp.sin(
        jnp.arange(4096)[:, None] * jnp.asarray(invf_half)[None]
    )
    k_ref = np.array(k_buf)
    for b in range(B):
        for k in range(K):
            for s in range(S):
                if stay[b, k, s]:
                    continue
                cid = int(slot_ids[b, k, s])
                row = SPARSE_START + s * CS
                k_rec = u[1, b, cid] @ sv[1, b, k]
                pos = cid * CS + np.arange(CS)
                k_ref[1, b, k, row : row + CS] = np.array(
                    rotate_with_tables(
                        k_rec, cos_t[pos], sin_t[pos], style="glm"
                    )
                )
    np.testing.assert_allclose(
        np.array(k_out), k_ref, rtol=2e-4, atol=2e-4
    )


def test_sparse_refresh_int8_matches_dequant_reference(rng):
    """Tiled int8 stores: the kernel's in-VMEM dequant (mask-reduce
    scale-lane picks + fold into the matmul output / V column multiply)
    must reproduce the jnp unpack path within bf16 scale rounding."""
    from shadowkv_tpu.core.quant import (
        SCALE_LANES,
        pack_shadow_int8,
        unpack_u_int8,
        unpack_v_int8,
    )

    u, sv, v_full, k_buf, v_buf, slot_ids, stay = _mk(rng)
    invf = _inv_freq_full()
    # int8 mode reserves SCALE_LANES tail lanes: pad rank 32 -> 128.
    rp = ((R + SCALE_LANES + 127) // 128) * 128
    u_pad = jnp.pad(u, ((0, 0),) * 3 + ((0, 0), (0, rp - R)))
    sv_pad = jnp.pad(sv, ((0, 0),) * 3 + ((0, rp - R), (0, 0)))
    u_p, v_p = pack_shadow_int8(u_pad, v_full)
    assert u_p.shape == (L, B, C // 4, 32, rp)
    assert v_p.shape == (L, B, K, C // 4, 32, DH)
    mc, ms, cnt = compact_misses(slot_ids, stay)
    layer = 1

    k_out, v_out = sparse_refresh(
        jnp.asarray(layer, jnp.int32), mc, ms, cnt,
        u_p, sv_pad, v_p, invf, k_buf, v_buf,
        chunk_size=CS, sparse_start=SPARSE_START, rope_dim=DH,
        interpret=True,
    )
    # Reference: dequantize with the jnp path, then the refresh
    # reference on the dequantized stores.
    u_dq = unpack_u_int8(u_p, CS, rp, jnp.float32)
    v_dq = unpack_v_int8(v_p, u_p, CS, rp, DH, jnp.float32)
    k_ref, v_ref = _reference(
        layer, u_dq, sv_pad, v_dq, k_buf, v_buf, slot_ids, stay, invf
    )
    # kernel dequantizes U operands in bf16 (the jnp path folds the
    # scale into the f32 output) -> ~2^-9 relative operand rounding.
    np.testing.assert_allclose(np.array(v_out), v_ref, rtol=1e-2,
                               atol=1e-2)
    np.testing.assert_allclose(np.array(k_out), k_ref, rtol=2e-2,
                               atol=2e-1)


def test_sparse_refresh_all_hits_noop(rng):
    u, sv, v_full, k_buf, v_buf, slot_ids, _ = _mk(rng)
    stay = jnp.ones((B, K, S), bool)
    invf = _inv_freq_full()
    mc, ms, cnt = compact_misses(slot_ids, stay)
    k_out, v_out = sparse_refresh(
        jnp.asarray(0, jnp.int32), mc, ms, cnt,
        u, sv, v_full, invf, k_buf, v_buf,
        chunk_size=CS, sparse_start=SPARSE_START, rope_dim=DH,
        interpret=True,
    )
    np.testing.assert_array_equal(np.array(k_out), np.array(k_buf))
    np.testing.assert_array_equal(np.array(v_out), np.array(v_buf))
