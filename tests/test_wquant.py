"""Weight-only int8 quantization (core/wquant.py).

Beyond-reference capability: the reference keeps bf16 weights
(80 GB A100); the TPU rebuild's QTensor path halves weight-read bytes
and fits 8B-scale weights on a 16 GB chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadowkv_tpu.config import CacheConfig, RuntimeConfig
from shadowkv_tpu.core.layers import LayerParams
from shadowkv_tpu.core.wquant import (
    QTensor,
    mat,
    quantize_params,
    quantize_weight,
    take_rows,
    wslice,
)
from shadowkv_tpu.models.engine import Engine
from shadowkv_tpu.models.params import init_synthetic_params
from shadowkv_tpu.models.registry import toy_config


@pytest.fixture(scope="module")
def toy_params():
    cfg = toy_config(dtype=jnp.float32)
    return cfg, init_synthetic_params(cfg, jax.random.PRNGKey(0), scale=0.2)


def test_quantize_dequantize_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 96), jnp.float32)
    qt = quantize_weight(w)
    assert qt.q.dtype == jnp.int8 and qt.s.shape == (96,)
    deq = qt.q.astype(jnp.float32) * qt.s[None, :]
    # symmetric per-column int8: max error <= s/2 per element
    err = jnp.abs(deq - w)
    assert (err <= qt.s[None, :] * 0.5 + 1e-7).all()


def test_mat_matches_dequantized_dot():
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 96), jnp.float32)
    qt = quantize_weight(w)
    got = mat(x, qt)
    want = x @ (qt.q.astype(jnp.float32) * qt.s[None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_wslice_consistent_with_full_dot():
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 96), jnp.float32)
    qt = quantize_weight(w)
    full = mat(x, qt)
    part = mat(x, wslice(qt, 32, 80))
    np.testing.assert_allclose(
        np.asarray(full[:, 32:80]), np.asarray(part), rtol=1e-5
    )


def test_take_rows_quantized_embed():
    table = jax.random.normal(jax.random.PRNGKey(6), (50, 32), jnp.float32)
    qt = quantize_weight(table, reduce_axis=-1)
    ids = jnp.asarray([[0, 7, 49]])
    got = take_rows(qt, ids, jnp.float32)
    want = jnp.take(table, ids, axis=0)
    assert jnp.max(jnp.abs(got - want)) <= jnp.max(qt.s) * 0.5 + 1e-7


def test_quantize_params_structure(toy_params):
    _, params = toy_params
    qp = quantize_params(params)
    assert isinstance(qp.layers.wqkv, QTensor)
    assert isinstance(qp.layers.wo, QTensor)
    assert isinstance(qp.embed, QTensor)
    assert qp.layers.attn_norm is params.layers.attn_norm
    # stacked layer leading dim preserved
    assert qp.layers.wqkv.q.shape == params.layers.wqkv.shape
    assert qp.layers.wqkv.s.shape == (
        params.layers.wqkv.shape[0], params.layers.wqkv.shape[2],
    )


def _greedy(cfg, params, mode, ids, gen_len=8):
    cache_cfg = (
        CacheConfig(mode="full", max_length=512)
        if mode == "full"
        else CacheConfig(
            mode="shadow", max_length=512, sparse_budget=160, rank=64,
            outlier_chunks=4,
        )
    )
    eng = Engine(cfg, cache_cfg, RuntimeConfig(prefill_block_q=64), params)
    out, _ = eng.generate(ids, gen_len=gen_len)
    return out


@pytest.mark.parametrize(
    "mode", [pytest.param("full", marks=pytest.mark.slow), "shadow"]
)
def test_quantized_engine_generates_and_tracks_fp(toy_params, mode):
    """int8-weight generation runs end-to-end and the logits stay close
    enough that greedy argmax matches fp weights for several steps on a
    toy model (int8 per-channel keeps >99% logit fidelity)."""
    cfg, params = toy_params
    qp = jax.jit(quantize_params)(params)
    ids = np.random.RandomState(7).randint(0, cfg.vocab_size, (2, 256))
    out_q = _greedy(cfg, qp, mode, ids)
    assert out_q.shape == (2, 8)
    assert (out_q >= 0).all() and (out_q < cfg.vocab_size).all()
    out_f = _greedy(cfg, params, mode, ids)
    # Quantization can flip near-tie argmaxes; require most steps equal.
    agree = (out_q == out_f).mean()
    assert agree >= 0.75, (out_q, out_f)


def test_quantized_logit_error_small(toy_params):
    """Direct logit comparison on the full path (tighter oracle than
    token agreement)."""
    from shadowkv_tpu.models import forward
    from shadowkv_tpu.cache.full import FullCache
    from shadowkv_tpu.core import rope as rope_lib

    cfg, params = toy_params
    qp = quantize_params(params)
    rt = RuntimeConfig(prefill_block_q=64)
    ids = jnp.asarray(
        np.random.RandomState(8).randint(0, cfg.vocab_size, (1, 128))
    )
    cos, sin = rope_lib.compute_cos_sin(cfg, 512, dtype=jnp.float32)

    def logits(p):
        cache = FullCache.init(cfg, CacheConfig(mode="full", max_length=512), 1)
        lg, _ = forward.prefill_full(cfg, rt, p, cache, ids, 0, cos, sin)
        return lg

    lf = np.asarray(logits(params), np.float32).ravel()
    lq = np.asarray(logits(qp), np.float32).ravel()
    denom = max(1e-6, float(np.abs(lf).max()))
    rel = float(np.abs(lf - lq).max()) / denom
    assert rel < 0.08, rel
    # and the argmax token agrees
    assert lf.argmax() == lq.argmax()


@pytest.mark.slow
def test_quantized_params_shard_over_mesh(toy_params):
    """QTensor leaves ride param_pspecs/shard_pytree over a (dp, tp)
    mesh; sharded quantized generation matches unsharded quantized."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, params = toy_params
    qp = quantize_params(params)
    ids = np.random.RandomState(9).randint(0, cfg.vocab_size, (2, 256))
    base = _greedy(cfg, qp, "shadow", ids)

    cache_cfg = CacheConfig(
        mode="shadow", max_length=512, sparse_budget=160, rank=64,
        outlier_chunks=4,
    )
    eng = Engine(
        cfg, cache_cfg,
        RuntimeConfig(prefill_block_q=64, dp=2, tp=2), qp,
    )
    out, _ = eng.generate(ids, gen_len=8)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out))


def test_loader_quantization_matches_jit_quantization(tmp_path):
    """load_hf_params(weight_quant='int8') (host-side numpy quantize,
    the memory-safe path for real 8B checkpoints) must produce
    bit-identical QTensors to quantize_params on the bf16-loaded
    params."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from shadowkv_tpu.config import ModelConfig
    from shadowkv_tpu.models.params import load_hf_params

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False,
    )
    LlamaForCausalLM(hf_cfg).eval().save_pretrained(
        tmp_path, safe_serialization=True
    )
    cfg = ModelConfig(
        name="tiny-llama", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=112,
        vocab_size=128, rope_theta=10000.0, dtype=jnp.float32,
    )
    base = load_hf_params(str(tmp_path), cfg)
    want = quantize_params(base)
    got = load_hf_params(str(tmp_path), cfg, weight_quant="int8")

    def leaves(t):
        return jax.tree.leaves(t)

    for a, b in zip(leaves(got), leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
