"""shadowkv-tpu: a TPU-native long-context LLM inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of ShadowKV
(arXiv 2410.21465, reference CUDA implementation surveyed in SURVEY.md):

- the pre-RoPE key cache is stored as a low-rank SVD factorization
  (``U`` [seq, rank] x ``SV`` [kv_heads, rank, head_dim]) in HBM,
- the full value cache is offloaded to host DRAM (JAX ``pinned_host``
  memory kind) and fetched per decode step by a chunk gather,
- decoding runs sparse attention over a small budget of chunks chosen by
  landmark/outlier scoring with a hits-first reuse policy.

The compute path is jit/Pallas; parallelism is expressed over a
``jax.sharding.Mesh`` (dp x tp over GQA KV heads and low-rank factors).
"""

__version__ = "0.1.0"

from shadowkv_tpu.config import CacheConfig, ModelConfig, RuntimeConfig

__all__ = [
    "CacheConfig",
    "ModelConfig",
    "RuntimeConfig",
    "__version__",
]
