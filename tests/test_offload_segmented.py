"""Layer-segmented offload prefill (RuntimeConfig.offload_prefill_segments).

The prefill layer scan is split into cond-gated segments sharing one
compiled program; each segment's V buffer is evicted to the pinned-host
store as a LAYER-sharded part before the next segment runs (the
reference's per-layer V->pinned-CPU copy during prefill,
kv_cache.py:825-828 — and the only host-store assembly this platform
supports: direct device_puts, no in-place pinned updates). The ring
gather kernel selects the owning part per DMA with statically-unrolled
guards. Greedy tokens must match the HBM shadow engine bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def _cfg():
    return toy_config(num_layers=4, dtype=jnp.float32)


def _cc(mode, quant="none"):
    return CacheConfig(
        mode=mode, max_length=512, sparse_budget=64, rank=32,
        outlier_chunks=4, gen_capacity=32, kv_quant=quant,
    )


@pytest.mark.parametrize(
    "quant,segments",
    [("none", 2), pytest.param("int8", 4, marks=pytest.mark.slow)],
)
def test_segmented_offload_matches_hbm(quant, segments):
    cfg = _cfg()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(3).randint(1, cfg.vocab_size, (1, 512))

    eng_hbm = Engine(
        cfg, _cc("shadow", quant),
        RuntimeConfig(prefill_block_q=128, ring_gather=True), params,
    )
    out_h, _ = eng_hbm.generate(ids, gen_len=8)

    eng_seg = Engine(
        cfg, _cc("shadow_offload", quant),
        RuntimeConfig(
            prefill_block_q=128, ring_gather=True,
            offload_prefill_segments=segments,
        ),
        params,
    )
    out_s, _ = eng_seg.generate(ids, gen_len=8)
    np.testing.assert_array_equal(out_h, out_s)
    # the host store really is layer-sharded parts
    assert isinstance(eng_seg._host_v, tuple)
    assert len(eng_seg._host_v) == segments
    assert eng_seg._host_axis == "layer"


def test_segmented_rejects_slot_admission():
    cfg = _cfg()
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    eng = Engine(
        cfg, _cc("shadow_offload"),
        RuntimeConfig(
            prefill_block_q=128, ring_gather=True,
            offload_prefill_segments=2,
        ),
        params,
    )
    ids = np.random.RandomState(3).randint(1, cfg.vocab_size, (1, 512))
    eng.generate(ids, gen_len=2)
    with pytest.raises(AssertionError, match="layer-sharded"):
        eng.admit_slot(eng._cache, ids[0], 0)
