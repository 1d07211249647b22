"""Model registry.

Mirrors the reference's name-substring dispatch
(models/__init__.py:26-39): 'yi' maps onto the Llama family, 'glm',
'qwen', 'phi' pick their adapters. Everything resolves to a
(ModelConfig, weight-loader) pair consumed by the shared Engine.
"""

from __future__ import annotations

from shadowkv_tpu.models.registry import choose_model_config, register_model

__all__ = ["choose_model_config", "register_model"]
