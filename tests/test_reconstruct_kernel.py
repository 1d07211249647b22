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


@pytest.mark.parametrize("quant", [False, True])
def test_sparse_refresh_batched_contiguous_writes(rng, quant):
    """Miss-heavy regime with a buffer large enough for the batched
    write-back (cap >= GROUP*cs = 128 rows): full groups of consecutive
    miss slots must take the single-DMA path and still match the
    reference — plus a mixed case (one hit breaks one group's
    contiguity) exercising batched and per-miss groups side by side."""
    from shadowkv_tpu.core.quant import pack_shadow_int8, scale_lanes_for

    l, b, kh, c, cs, dh = 2, 1, 2, 80, 8, 128
    s_sets = 40  # 40 slots -> groups of 16: 2 full + 1 partial
    sparse_start = 16
    cap = sparse_start + s_sets * cs + 16  # 352 >= 128
    rank = 32
    rp = rank + (scale_lanes_for(kh) if quant else 0)
    ks = jax.random.split(rng, 8)
    u = jax.random.normal(ks[0], (l, b, c, cs, rp), jnp.float32)
    u = u.at[..., rank:].set(0.0)  # scale-trailer lanes stay clear
    sv = jax.random.normal(ks[1], (l, b, kh, rp, dh), jnp.float32)
    sv = sv.at[:, :, :, rank:, :].set(0.0) if quant else sv
    v_full = jax.random.normal(ks[2], (l, b, kh, c, cs, dh), jnp.float32)
    k_buf = jax.random.normal(ks[3], (l, b, kh, cap, dh), jnp.float32)
    v_buf = jax.random.normal(ks[4], (l, b, kh, cap, dh), jnp.float32)
    slot_ids = jax.random.randint(ks[5], (b, kh, s_sets), 0, c)
    # head 0: ALL miss (contiguous groups); head 1: one hit at slot 20
    stay = jnp.zeros((b, kh, s_sets), bool).at[:, 1, 20].set(True)
    invf = _inv_freq_full()
    miss_chunk, miss_slot, miss_cnt = compact_misses(slot_ids, stay)

    if quant:
        u_in, v_in = pack_shadow_int8(u, v_full, rank=rank)
    else:
        u_in, v_in = u, v_full

    k_out, v_out = sparse_refresh(
        jnp.asarray(1, jnp.int32),
        miss_chunk, miss_slot, miss_cnt,
        u_in, sv, v_in, invf, k_buf, v_buf,
        chunk_size=cs, sparse_start=sparse_start, rope_dim=dh,
        interpret=True,
    )

    # jnp reference on the DEQUANTIZED store
    if quant:
        from shadowkv_tpu.core.quant import unpack_u_int8, unpack_v_int8

        u_ref = unpack_u_int8(u_in, cs, rp, jnp.float32)[..., :rank]
        v_ref_full = unpack_v_int8(v_in, u_in, cs, rp, dh, jnp.float32)
    else:
        u_ref, v_ref_full = u, v_full
    k_exp, v_exp = np.array(k_buf), np.array(v_buf)
    for bb in range(b):
        for kk in range(kh):
            for ss in range(s_sets):
                if bool(stay[bb, kk, ss]):
                    continue
                cid = int(slot_ids[bb, kk, ss])
                row = sparse_start + ss * cs
                v_exp[1, bb, kk, row : row + cs] = np.asarray(
                    v_ref_full
                ).reshape(l, b, kh, c, cs, dh)[1, bb, kk, cid]
                k_rec = (
                    np.asarray(u_ref).reshape(l, b, c, cs, rank)[
                        1, bb, cid
                    ]
                    @ np.asarray(sv)[1, bb, kk, :rank]
                )
                pos = cid * cs + jnp.arange(cs, dtype=jnp.float32)
                k_exp[1, bb, kk, row : row + cs] = np.array(
                    _rope_ref(jnp.asarray(k_rec), pos, invf)
                )
    tol = 0.06 if quant else 1e-5
    np.testing.assert_allclose(np.array(v_out), v_exp, atol=tol)
    np.testing.assert_allclose(
        np.array(k_out), k_exp, rtol=0.05, atol=tol
    )


@pytest.mark.parametrize("quant", [False, True])
def test_sparse_refresh_batched_contiguous_fetch(rng, quant):
    """Contiguous CHUNK-ID runs (the post-round-3 flat row-space fetch
    batching): all-miss with chunk ids ascending runs per (b, k) — the
    full groups take the single-fetch-DMA path (U always; V int8 via
    the chunk run; V bf16 direct via chunk+slot runs) and must match
    the per-chunk reference. A second head starts mid-run so group
    boundaries and the partial tail group are exercised too."""
    from shadowkv_tpu.core.quant import pack_shadow_int8, scale_lanes_for

    l, b, kh, c, cs, dh = 2, 1, 2, 80, 8, 128
    s_sets = 40
    sparse_start = 16
    cap = sparse_start + s_sets * cs + 16
    rank = 32
    rp = rank + (scale_lanes_for(kh) if quant else 0)
    ks = jax.random.split(rng, 8)
    u = jax.random.normal(ks[0], (l, b, c, cs, rp), jnp.float32)
    u = u.at[..., rank:].set(0.0)
    sv = jax.random.normal(ks[1], (l, b, kh, rp, dh), jnp.float32)
    sv = sv.at[:, :, :, rank:, :].set(0.0) if quant else sv
    v_full = jax.random.normal(ks[2], (l, b, kh, c, cs, dh), jnp.float32)
    k_buf = jax.random.normal(ks[3], (l, b, kh, cap, dh), jnp.float32)
    v_buf = jax.random.normal(ks[4], (l, b, kh, cap, dh), jnp.float32)
    # head 0: run starting at chunk 0 (tile-aligned); head 1: at 13
    # (misaligned with the int8 pt-tile, still one flat row run)
    slot_ids = jnp.stack(
        [
            jnp.arange(0, s_sets, dtype=jnp.int32),
            jnp.arange(13, 13 + s_sets, dtype=jnp.int32),
        ]
    )[None]
    stay = jnp.zeros((b, kh, s_sets), bool)
    invf = _inv_freq_full()
    miss_chunk, miss_slot, miss_cnt = compact_misses(slot_ids, stay)
    if quant:
        u_in, v_in = pack_shadow_int8(u, v_full, rank=rank)
    else:
        u_in, v_in = u, v_full
    k_out, v_out = sparse_refresh(
        jnp.asarray(1, jnp.int32),
        miss_chunk, miss_slot, miss_cnt,
        u_in, sv, v_in, invf, k_buf, v_buf,
        chunk_size=cs, sparse_start=sparse_start, rope_dim=dh,
        interpret=True,
    )
    if quant:
        from shadowkv_tpu.core.quant import unpack_u_int8, unpack_v_int8

        u_ref = unpack_u_int8(u_in, cs, rp, jnp.float32)[..., :rank]
        v_ref_full = unpack_v_int8(v_in, u_in, cs, rp, dh, jnp.float32)
    else:
        u_ref, v_ref_full = u, v_full
    k_exp, v_exp = np.array(k_buf), np.array(v_buf)
    for bb in range(b):
        for kk in range(kh):
            for ss in range(s_sets):
                cid = int(slot_ids[bb, kk, ss])
                row = sparse_start + ss * cs
                v_exp[1, bb, kk, row : row + cs] = np.asarray(
                    v_ref_full
                ).reshape(l, b, kh, c, cs, dh)[1, bb, kk, cid]
                k_rec = (
                    np.asarray(u_ref).reshape(l, b, c, cs, rank)[
                        1, bb, cid
                    ]
                    @ np.asarray(sv)[1, bb, kk, :rank]
                )
                pos = cid * cs + jnp.arange(cs, dtype=jnp.float32)
                k_exp[1, bb, kk, row : row + cs] = np.array(
                    _rope_ref(jnp.asarray(k_rec), pos, invf)
                )
    tol = 0.06 if quant else 1e-5
    np.testing.assert_allclose(np.array(v_out), v_exp, atol=tol)
    np.testing.assert_allclose(
        np.array(k_out), k_exp, rtol=0.05, atol=tol
    )
