"""Logit parity vs HuggingFace transformers on tiny local checkpoints.

Creates tiny randomly-initialized HF models in tmp dirs (no network),
saves them as safetensors, loads them through our loader, and compares
full-attention prefill logits against the HF forward pass in fp32.
This is the weight-loading + forward-math oracle the reference lacks
(SURVEY.md §4: its only oracle is end-to-end RULER accuracy).
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from shadowkv_tpu.cache.full import FullCache  # noqa: E402
from shadowkv_tpu.config import CacheConfig, ModelConfig, RuntimeConfig  # noqa: E402
from shadowkv_tpu.core.rope import compute_cos_sin  # noqa: E402
from shadowkv_tpu.models import forward  # noqa: E402
from shadowkv_tpu.models.params import load_hf_params  # noqa: E402

SEQ = 24
BATCH = 2


def _run_ours(cfg: ModelConfig, model_dir: str, ids: np.ndarray):
    params = load_hf_params(model_dir, cfg)
    rt = RuntimeConfig(prefill_block_q=SEQ)
    cache_cfg = CacheConfig(mode="full", max_length=SEQ + 8)
    cache = FullCache.init(cfg, cache_cfg, BATCH)
    cos, sin = compute_cos_sin(cfg, SEQ + 8)
    logits, _ = jax.jit(
        forward.prefill_full, static_argnums=(0, 1, 5, 8)
    )(cfg, rt, params, cache, jnp.asarray(ids), 0, cos, sin, 0)
    return np.asarray(logits[:, -1], np.float32)


def _run_hf(hf_model, ids: np.ndarray):
    import torch

    with torch.no_grad():
        out = hf_model(torch.from_numpy(ids))
    return out.logits[:, -1].float().numpy()


def _compare(cfg, model_dir, hf_model, vocab):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, vocab, (BATCH, SEQ)).astype(np.int32)
    ours = _run_ours(cfg, model_dir, ids)
    theirs = _run_hf(hf_model, ids.astype(np.int64))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_llama_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        attention_bias=False,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = ModelConfig(
        name="tiny-llama", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=112, vocab_size=128,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    _compare(cfg, str(tmp_path), hf, 128)


def test_llama31_rope_scaling_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    scaling = dict(
        rope_type="llama3", factor=8.0, low_freq_factor=1.0,
        high_freq_factor=4.0, original_max_position_embeddings=64,
    )
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rope_scaling=dict(scaling), tie_word_embeddings=False,
        rms_norm_eps=1e-5,
    )
    hf = LlamaForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = ModelConfig(
        name="tiny-llama31", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=112, vocab_size=128,
        rope_theta=10000.0, rope_scaling=scaling, dtype=jnp.float32,
    )
    _compare(cfg, str(tmp_path), hf, 128)


def test_qwen2_parity(tmp_path):
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = ModelConfig(
        name="tiny-qwen", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=112, vocab_size=128,
        rope_theta=10000.0, qkv_bias=True, rms_norm_eps=1e-6,
        dtype=jnp.float32,
    )
    _compare(cfg, str(tmp_path), hf, 128)


def test_phi3_parity(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hf = Phi3ForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = ModelConfig(
        name="tiny-phi", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=4, head_dim=16, intermediate_size=112, vocab_size=128,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    _compare(cfg, str(tmp_path), hf, 128)


def test_glm_parity(tmp_path):
    from transformers import GlmConfig, GlmForCausalLM

    hf_cfg = GlmConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        rms_norm_eps=1e-5, partial_rotary_factor=0.5,
        attention_bias=True, tie_word_embeddings=False,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    hf = GlmForCausalLM(hf_cfg).eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    cfg = ModelConfig(
        name="tiny-glm", num_layers=2, hidden_size=64, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=112, vocab_size=128,
        rope_theta=10000.0, rope_style="glm", rope_partial_dim=8,
        qkv_bias=True, dtype=jnp.float32,
    )
    _compare(cfg, str(tmp_path), hf, 128)
