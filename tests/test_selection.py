"""Landmark/outlier computation, top-k selection, hits-first reorder."""

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.core.selection import (
    chunk_ids_to_positions,
    compute_landmarks_outliers,
    reorder_hits_first,
    score_and_select,
)


def test_landmarks_are_chunk_means(rng):
    b, kh, c, cs, dh = 1, 2, 16, 8, 32
    k = jax.random.normal(rng, (b, kh, c, cs, dh), jnp.float32)
    lm = compute_landmarks_outliers(k, outlier_chunks=4)
    assert lm.landmarks.shape == (b, kh, c, dh)
    assert lm.landmark_mask.shape == (b, kh, c)
    means = np.asarray(k.mean(axis=-2))
    np.testing.assert_allclose(
        np.asarray(lm.landmarks), means, rtol=1e-5
    )
    # mask is False exactly at the outlier chunks
    mask = np.asarray(lm.landmark_mask)
    for h in range(kh):
        assert mask[0, h].sum() == c - 4
        for cid in np.asarray(lm.outlier_idx)[0, h]:
            assert not mask[0, h, cid]


def test_outliers_have_lowest_min_cosine(rng):
    b, kh, c, cs, dh = 1, 1, 12, 4, 16
    k = jax.random.normal(rng, (b, kh, c, cs, dh), jnp.float32)
    # Make chunk 5 maximally incoherent: one row anti-parallel to the
    # mean (cos = -1 beats any random chunk's minimum).
    v = jnp.ones((dh,))
    spike = jnp.stack([v, v, v, -v]) * 10
    k = k.at[0, 0, 5].set(spike)
    lm = compute_landmarks_outliers(k, outlier_chunks=2)
    assert 5 in np.asarray(lm.outlier_idx)[0, 0]


def test_score_and_select_prefers_matching_landmark(rng):
    b, kh, g, dh = 1, 2, 2, 32
    c = 8
    landmarks = jax.random.normal(rng, (b, kh, c, dh), jnp.float32)
    mask = jnp.ones((b, kh, c), bool)
    # Query aligned with landmark 6 for every head.
    q = jnp.broadcast_to(landmarks[:, :, 6], (b, kh, dh))
    q = q[:, :, None, None] * 5.0  # [B,K,G=1,Q=1,Dh] -> broadcast G
    q = jnp.broadcast_to(q, (b, kh, g, 1, dh))
    sel = score_and_select(q, landmarks, mask, select_sets=2)
    assert sel.shape == (b, kh, 2)
    assert np.all(np.asarray(sel)[..., 0] == 6)


def test_score_and_select_never_picks_masked(rng):
    b, kh, g, dh, c = 1, 1, 1, 16, 10
    landmarks = jax.random.normal(rng, (b, kh, c, dh), jnp.float32)
    mask = jnp.ones((b, kh, c), bool).at[0, 0, 3].set(False)
    q = jnp.broadcast_to(
        landmarks[:, :, 3][:, :, None, None], (b, kh, g, 1, dh)
    ) * 10.0  # strongly aligned with the MASKED chunk
    sel = score_and_select(q, landmarks, mask, select_sets=4)
    assert 3 not in np.asarray(sel)


def test_reorder_hits_first_properties(rng):
    b, kh, s = 2, 2, 8
    prev = jnp.array(
        np.random.RandomState(0).choice(100, (b, kh, s), replace=False)
    )
    # New selection: half overlap with prev, half fresh.
    new = prev.at[..., ::2].add(1000)
    ro = reorder_hits_first(prev, new)
    ids = np.asarray(ro.ids)
    hit = np.asarray(ro.hit_mask)
    cnt = np.asarray(ro.hit_count)
    # Same multiset as the raw selection.
    np.testing.assert_array_equal(
        np.sort(ids, axis=-1), np.sort(np.asarray(new), axis=-1)
    )
    # Hits packed first.
    for bi in range(b):
        for hi in range(kh):
            c = cnt[bi, hi]
            assert hit[bi, hi, :c].all()
            assert not hit[bi, hi, c:].any()
            # Every hit id is in prev and src_slot points at it.
            for j in range(c):
                slot = np.asarray(ro.src_slot)[bi, hi, j]
                assert np.asarray(prev)[bi, hi, slot] == ids[bi, hi, j]
    assert (cnt == s // 2).all()


def test_reorder_all_hits_and_all_misses():
    prev = jnp.arange(8).reshape(1, 1, 8)
    ro = reorder_hits_first(prev, prev[..., ::-1])
    assert int(ro.hit_count[0, 0]) == 8
    ro2 = reorder_hits_first(prev, prev + 100)
    assert int(ro2.hit_count[0, 0]) == 0


def test_chunk_ids_to_positions():
    ids = jnp.array([[[2, 0]]], jnp.int32)
    pos = chunk_ids_to_positions(ids, 4)
    np.testing.assert_array_equal(
        np.asarray(pos)[0, 0], [8, 9, 10, 11, 0, 1, 2, 3]
    )


def test_assign_slots_stable_properties():
    from shadowkv_tpu.core.selection import assign_slots_stable

    rs = np.random.RandomState(3)
    prev = jnp.array(rs.choice(100, (2, 2, 8), replace=False).reshape(2, 2, 8))
    new = prev.at[..., ::2].add(1000)  # half evicted, half stay
    asg = assign_slots_stable(prev, new)
    slot_ids = np.asarray(asg.slot_ids)
    stay = np.asarray(asg.stay_mask)
    # Occupancy equals the new selection as a set.
    np.testing.assert_array_equal(
        np.sort(slot_ids, -1), np.sort(np.asarray(new), -1)
    )
    # Staying chunks keep their exact slot.
    prev_np = np.asarray(prev)
    for b in range(2):
        for k in range(2):
            for j in range(8):
                if stay[b, k, j]:
                    assert slot_ids[b, k, j] == prev_np[b, k, j]
    assert (np.asarray(asg.stay_count) == 4).all()

    # All-stay: nothing moves even if top-k order changed.
    asg2 = assign_slots_stable(prev, prev[..., ::-1])
    np.testing.assert_array_equal(np.asarray(asg2.slot_ids), prev_np)
    assert np.asarray(asg2.stay_mask).all()

    # All-miss: every slot replaced; incoming chunks land in ASCENDING
    # chunk-id order (slot order == chunk order for each step's
    # misses — the property the refresh kernel's run-batched fetch
    # DMAs rely on; attention is permutation-invariant over slots).
    asg3 = assign_slots_stable(prev, prev + 500)
    assert not np.asarray(asg3.stay_mask).any()
    np.testing.assert_array_equal(
        np.asarray(asg3.slot_ids), np.sort(np.asarray(prev + 500), -1)
    )
