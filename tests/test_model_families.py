"""Engine-level shadow coverage for the non-llama model families.

The reference supports four weight layouts (SURVEY §2.1 P2-P5): llama
(GQA, neox RoPE), GLM-4 (MQA, partial interleaved RoPE, qkv bias),
Qwen2 (GQA with qkv bias), Phi-3 (MHA, head_dim 96 — not a lane
multiple). tests/test_hf_parity.py pins logit parity for each; these
tests pin the part HF parity can't see: the ShadowKV sparse pipeline
(SVD factors, landmarks, selection, reconstruction) running on each
family's shape through the real engine, with the full-attention engine
as the greedy-token oracle (the reference's accuracy criterion,
SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


def _agreement_case(cfg, rank):
    """Full-coverage shadow budget must reproduce full attention's
    greedy tokens exactly (sparse == dense when every landmark chunk
    fits the budget and rank == kv hidden size)."""
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    ids = np.random.RandomState(7).randint(1, cfg.vocab_size, (1, 256))
    eng_full = Engine(
        cfg, CacheConfig(mode="full", max_length=512),
        RuntimeConfig(prefill_block_q=64), params,
    )
    # prefill 256, cs 8: 24 chunks after 8-rounding -> 4 outliers + 20
    # landmarks; budget 160 covers all 20 selected sets.
    eng_shadow = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=160,
            rank=rank, outlier_chunks=4,
        ),
        RuntimeConfig(prefill_block_q=64), params,
    )
    out_f, _ = eng_full.generate(ids, gen_len=6)
    out_s, _ = eng_shadow.generate(ids, gen_len=6)
    np.testing.assert_array_equal(out_f, out_s)


def test_phi_family_mha_odd_head_dim():
    # Phi-3 shape in miniature: MHA (kv heads == heads) and a head_dim
    # that is NOT a multiple of the 128-lane tile (96 -> 24 here).
    cfg = toy_config(
        name="toy-phi", num_heads=4, num_kv_heads=4, head_dim=24,
        hidden_size=96, intermediate_size=192, dtype=jnp.float32,
    )
    _agreement_case(cfg, rank=4 * 24)


def test_qwen_family_gqa_with_bias():
    # Qwen2 shape: GQA with non-zero qkv biases flowing through the
    # pre-RoPE K that the SVD factorizes.
    cfg = toy_config(
        name="toy-qwen", num_heads=4, num_kv_heads=2, head_dim=32,
        hidden_size=128, qkv_bias=True, dtype=jnp.float32,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    # Synthetic biases default to zero; make them real.
    bqkv = jax.random.normal(
        jax.random.PRNGKey(3), params.layers.bqkv.shape, jnp.float32
    ) * 0.1
    params = params._replace(layers=params.layers._replace(bqkv=bqkv))
    ids = np.random.RandomState(7).randint(1, cfg.vocab_size, (1, 256))
    eng_full = Engine(
        cfg, CacheConfig(mode="full", max_length=512),
        RuntimeConfig(prefill_block_q=64), params,
    )
    eng_shadow = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=160,
            rank=2 * 32, outlier_chunks=4,
        ),
        RuntimeConfig(prefill_block_q=64), params,
    )
    out_f, _ = eng_full.generate(ids, gen_len=6)
    out_s, _ = eng_shadow.generate(ids, gen_len=6)
    np.testing.assert_array_equal(out_f, out_s)


def test_glm_family_partial_interleaved_rope():
    # GLM-4 shape: MQA-style few kv heads, qkv bias, interleaved RoPE
    # on only the first rope_partial_dim dims — exercises the glm
    # variant of the decode-side K reconstruction (RoPE re-applied
    # after the U x SV gather).
    cfg = toy_config(
        name="toy-glm", num_heads=4, num_kv_heads=2, head_dim=32,
        hidden_size=128, qkv_bias=True, rope_style="glm",
        rope_partial_dim=16, dtype=jnp.float32,
    )
    _agreement_case(cfg, rank=2 * 32)


def test_int8_accepts_mha_head_counts():
    # Round-1 capped int8 KV at 15 heads (32 scale lanes); the trailer
    # now widens with the head count (scale_lanes_for) so MHA shapes
    # like Phi-3 quantize instead of being rejected (VERDICT weak #7).
    cfg = toy_config(
        name="toy-mha16", num_heads=16, num_kv_heads=16, head_dim=8,
        hidden_size=128, dtype=jnp.float32,
    )
    params = init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)
    eng = Engine(
        cfg,
        CacheConfig(
            mode="shadow", max_length=512, sparse_budget=64,
            rank=32, outlier_chunks=4, kv_quant="int8",
        ),
        RuntimeConfig(prefill_block_q=64), params,
    )
    ids = np.random.RandomState(0).randint(1, cfg.vocab_size, (1, 256))
    toks, _ = eng.generate(ids, gen_len=2)
    assert toks.shape == (1, 2)
