"""Prefilled-state checkpoint roundtrip (utils/checkpoint.py).

A context prefetched by one Engine must resume bit-identically in a
fresh Engine (fresh process stand-in) via save_state/load_state +
generate(cont=True) — including the offload mode, whose V rows live
outside the cache pytree in host memory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def _mk_engine(mode="shadow", quant="none", ring=False):
    cfg = toy_config(dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode=mode, max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, kv_quant=quant,
    )
    rt = RuntimeConfig(prefill_block_q=64, ring_gather=ring)
    return Engine(cfg, cc, rt, params), cfg


@pytest.mark.parametrize(
    "mode,quant,ring",
    [
        ("shadow", "none", False),
        pytest.param("shadow", "int8", False, marks=pytest.mark.slow),
        pytest.param(  # io_callback offload
            "shadow_offload", "none", False, marks=pytest.mark.slow
        ),
        pytest.param(  # pinned-host ring offload (nightly; the
            # segmented-offload tests cover ring round-trips daily)
            "shadow_offload", "int8", True, marks=pytest.mark.slow
        ),
    ],
)
def test_checkpoint_roundtrip_resume(tmp_path, mode, quant, ring):
    eng, cfg = _mk_engine(mode, quant, ring)
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (2, 256))
    path = str(tmp_path / "ctx.npz")

    # Reference run: one uninterrupted generate.
    out_ref, _ = eng.generate(ids, gen_len=10)

    # Checkpointed run: prefill + 2 greedy steps, save, resume in a
    # FRESH engine and teacher-force the same 2 tokens via cont=True.
    eng2, _ = _mk_engine(mode, quant, ring)
    out_a, _ = eng2.generate(ids, gen_len=2)
    eng2.save_state(path)

    eng3, _ = _mk_engine(mode, quant, ring)
    eng3.load_state(path)
    out_b, _ = eng3.generate(out_a[:, 1:], gen_len=8, cont=True)

    got = np.concatenate([out_a, out_b], axis=1)
    np.testing.assert_array_equal(got, out_ref)


@pytest.mark.parametrize(
    "src,dst",
    [
        # hbm -> io_callback offload and back (store crosses the
        # pytree/HostVStore boundary), and io_callback -> ring (store
        # crosses into pinned host memory). Layouts must match, so the
        # pairs keep quant/kernel_store equal.
        pytest.param(
            ("shadow", "none", False), ("shadow_offload", "none", False),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            ("shadow_offload", "none", False), ("shadow", "none", False),
            marks=pytest.mark.slow,
        ),
        (
            ("shadow_offload", "none", False),
            ("shadow_offload", "none", True),
        ),
    ],
)
def test_checkpoint_cross_variant_load(tmp_path, src, dst):
    """A checkpoint written by one V-placement variant resumes
    bit-identically in an engine using a different placement."""
    eng, cfg = _mk_engine(*src)
    ids = np.random.RandomState(3).randint(0, cfg.vocab_size, (2, 256))
    path = str(tmp_path / "ctx.npz")

    out_ref, _ = eng.generate(ids, gen_len=10)

    eng2, _ = _mk_engine(*src)
    out_a, _ = eng2.generate(ids, gen_len=2)
    eng2.save_state(path)

    eng3, _ = _mk_engine(*dst)
    eng3.load_state(path)
    out_b, _ = eng3.generate(out_a[:, 1:], gen_len=8, cont=True)

    got = np.concatenate([out_a, out_b], axis=1)
    np.testing.assert_array_equal(got, out_ref)


def test_checkpoint_layout_mismatch_rejected(tmp_path):
    """Loading into an engine whose static layout differs (here: int8
    store vs bf16) must fail loudly, not corrupt silently."""
    eng, cfg = _mk_engine("shadow", "none")
    ids = np.random.RandomState(4).randint(0, cfg.vocab_size, (1, 256))
    eng.prefill(ids)
    path = str(tmp_path / "ctx.npz")
    eng.save_state(path)

    eng2, _ = _mk_engine("shadow", "int8")
    with pytest.raises(AssertionError, match="does not match"):
        eng2.load_state(path)


def test_checkpoint_preserves_dtypes_and_layout(tmp_path):
    from shadowkv_tpu.utils.checkpoint import (
        load_shadow_state,
        save_shadow_state,
    )

    eng, cfg = _mk_engine("shadow", "int8")
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 256))
    _, cache = eng.prefill(ids)
    path = str(tmp_path / "ctx.npz")
    save_shadow_state(cache, path)
    loaded, host_v = load_shadow_state(path)
    assert host_v is None
    assert loaded.layout == cache.layout
    for leaf_a, leaf_b in zip(
        jax.tree.leaves(cache), jax.tree.leaves(loaded)
    ):
        assert leaf_a.dtype == leaf_b.dtype
        np.testing.assert_array_equal(
            np.asarray(leaf_a), np.asarray(leaf_b)
        )


@pytest.mark.parametrize(
    "dst",
    [
        ("shadow", "none", False),
        pytest.param(
            ("shadow_offload", "none", False), marks=pytest.mark.slow
        ),
    ],
)
def test_checkpoint_from_ring_dealigns(tmp_path, dst):
    """Saving FROM a ring engine must persist the RAW chunk layout:
    the toy f32 store's 1024-B chunk unit gets host-ALIGNED (4 chunks
    per 4096-B unit, chunk-tile axis zero-padded) in the pinned store,
    and a checkpoint in that layout silently mis-shapes a
    cross-placement load (advisor round 2, low #4)."""
    src = ("shadow_offload", "none", True)
    eng, cfg = _mk_engine(*src)
    ids = np.random.RandomState(6).randint(0, cfg.vocab_size, (2, 256))
    path = str(tmp_path / "ctx.npz")

    out_ref, _ = eng.generate(ids, gen_len=10)

    eng2, _ = _mk_engine(*src)
    out_a, _ = eng2.generate(ids, gen_len=2)
    eng2.save_state(path)

    eng3, _ = _mk_engine(*dst)
    eng3.load_state(path)
    out_b, _ = eng3.generate(out_a[:, 1:], gen_len=8, cont=True)

    got = np.concatenate([out_a, out_b], axis=1)
    np.testing.assert_array_equal(got, out_ref)


@pytest.mark.slow
def test_checkpoint_after_segmented_prefill(tmp_path):
    """save_state after a layer-segmented offload prefill: the host
    store is LAYER-sharded parts, which must fold on axis 0 (a batch-
    axis concatenate silently corrupts the checkpoint — advisor round
    2, medium #3). Resume in a plain ring engine."""
    cfg = toy_config(num_layers=4, dtype=jnp.float32)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    cc = CacheConfig(
        mode="shadow_offload", max_length=512, sparse_budget=64,
        rank=32, outlier_chunks=4,
    )
    ids = np.random.RandomState(8).randint(0, cfg.vocab_size, (1, 256))
    path = str(tmp_path / "ctx.npz")

    def mk(segments):
        return Engine(
            cfg, cc,
            RuntimeConfig(
                prefill_block_q=64, ring_gather=True,
                offload_prefill_segments=segments,
            ),
            params,
        )

    out_ref, _ = mk(2).generate(ids, gen_len=10)

    eng2 = mk(2)
    out_a, _ = eng2.generate(ids, gen_len=2)
    assert eng2._host_axis == "layer"
    eng2.save_state(path)

    eng3 = mk(1)
    eng3.load_state(path)
    out_b, _ = eng3.generate(out_a[:, 1:], gen_len=8, cont=True)

    got = np.concatenate([out_a, out_b], axis=1)
    np.testing.assert_array_equal(got, out_ref)


def test_save_state_after_prefill_only(tmp_path):
    eng, cfg = _mk_engine()
    ids = np.random.RandomState(2).randint(0, cfg.vocab_size, (1, 256))
    eng.prefill(ids)
    path = str(tmp_path / "ctx.npz")
    eng.save_state(path)  # must not require a generate() first
