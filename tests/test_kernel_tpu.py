"""Compiled-kernel tests that need a real TPU (skipped on CPU).

Run manually in the default (axon TPU) env:
    python -m pytest tests/test_kernel_tpu.py -q -p no:cacheprovider
(the shared conftest forces the CPU platform for the main suite, so
these use a subprocess-free skip guard instead).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadowkv_tpu.kernels.reconstruct import compact_misses, sparse_refresh

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="needs a TPU backend (conftest forces CPU for the main suite)",
)

L, B, K, C, CS, R, DH = 2, 2, 2, 32, 8, 128, 128
S = 8
SPARSE_START = 16
CAP = SPARSE_START + S * CS + 16


def test_sparse_refresh_compiled_matches_interpret():
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    u = jax.random.normal(ks[0], (L, B, C, CS, R), jnp.bfloat16)
    sv = jax.random.normal(ks[1], (L, B, K, R, DH), jnp.bfloat16)
    v_full = jax.random.normal(ks[2], (L, B, K, C, CS, DH), jnp.bfloat16)
    k_buf = jnp.zeros((L, B, K, CAP, DH), jnp.bfloat16)
    v_buf = jnp.zeros((L, B, K, CAP, DH), jnp.bfloat16)
    slot_ids = jax.random.randint(ks[5], (B, K, S), 0, C)
    stay = jax.random.bernoulli(ks[6], 0.5, (B, K, S))
    invf = jnp.asarray(
        np.concatenate([1.0 / 1e4 ** (np.arange(0, DH, 2) / DH)] * 2)[None],
        jnp.float32,
    )
    mc, ms, cnt = compact_misses(slot_ids, stay)
    args = (jnp.asarray(0, jnp.int32), mc, ms, cnt, u, sv, v_full, invf)
    kw = dict(chunk_size=CS, sparse_start=SPARSE_START, rope_dim=DH)
    k_c, v_c = sparse_refresh(*args, k_buf, v_buf, **kw)
    k_i, v_i = sparse_refresh(*args, k_buf, v_buf, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(v_c), np.asarray(v_i))
    np.testing.assert_allclose(
        np.asarray(k_c, np.float32), np.asarray(k_i, np.float32),
        rtol=0.05, atol=0.05,  # bf16 accumulate differences
    )
