"""Micro-probe: decode-step U/V gather + repack variants on chip.

The grouped trace at b4/122K (prof_trace_decode, op_table) shows the
XLA decode step (18.07 ms) spending:

  - 4.55 ms  U chunk-row gather     (shadow.py:807, 266 GB/s)
  - 1.83 ms  U slice+repack         (shadow.py:808, 587 GB/s)
  - 1.84 ms  V chunk-row gather     (shadow.py:815, 147 GB/s)

~8.2 ms/step of pure data movement at well below the 819 GB/s HBM
peak. This probe times isolated variants to find what the gather
bottleneck actually is (row width? index order? the repack's lane
split?) before touching the production path.

Usage: python benchmarks/prof_gather_variants.py  (TPU; ~2 min)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=30, warmup=5):
    f = jax.jit(fn)
    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    # bench-shape single-layer slabs (L folded out: the decode gathers
    # one layer at a time inside the unrolled loop)
    B, K, S, C = 4, 8, 128, 7672
    cs, rp, dh = 16, 256, 128
    W_u, W_v = cs * rp, cs * dh
    key = jax.random.PRNGKey(0)
    u = jax.random.randint(key, (B, C, W_u), -127, 127, jnp.int8)
    v = jax.random.randint(key, (B, K, C, W_v), -127, 127, jnp.int8)
    ids = jax.random.randint(key, (B, K, S), 0, C, jnp.int32)
    ids_sorted = jnp.sort(ids, axis=-1)
    bi = jnp.arange(B).reshape(B, 1, 1)
    ki = jnp.arange(K).reshape(1, K, 1)
    sv = jax.random.normal(key, (B, K, rp, dh), jnp.bfloat16)

    def u_gather(u, ids):
        return u[bi, ids]  # [B,K,S,W_u]

    def u_gather_repack(u, ids):
        rows = u[bi, ids]
        return rows[..., : cs * rp].reshape(B, K, S * cs, rp)

    def u_full_chain(u, ids, sv):
        q = u_gather_repack(u, ids)
        return jnp.einsum(
            "bknr,bkrd->bknd", q.astype(jnp.bfloat16), sv,
            preferred_element_type=jnp.float32,
        )

    def u_chain_5d(u, ids, sv):
        rows = u[bi, ids].reshape(B, K, S, cs, rp)
        out = jnp.einsum(
            "bkscr,bkrd->bkscd", rows.astype(jnp.bfloat16), sv,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(B, K, S * cs, dh)

    def v_gather(v, ids):
        return v[bi, ki, ids]  # [B,K,S,W_v]

    t = bench(u_gather, u, ids)
    print(f"u gather random         : {t:7.3f} ms "
          f"({B*K*S*W_u/1e9/(t/1e3):6.1f} GB/s useful)", flush=True)
    t2 = bench(u_gather, u, ids_sorted)
    print(f"u gather sorted         : {t2:7.3f} ms", flush=True)
    t3 = bench(u_gather_repack, u, ids)
    print(f"u gather+repack         : {t3:7.3f} ms", flush=True)
    t4 = bench(u_full_chain, u, ids, sv)
    print(f"u gather+repack+einsum  : {t4:7.3f} ms", flush=True)
    t5 = bench(u_chain_5d, u, ids, sv)
    print(f"u gather+5d einsum      : {t5:7.3f} ms", flush=True)
    tv = bench(v_gather, v, ids)
    print(f"v gather random         : {tv:7.3f} ms "
          f"({B*K*S*W_v/1e9/(tv/1e3):6.1f} GB/s useful)", flush=True)
    tv2 = bench(v_gather, v, ids_sorted)
    print(f"v gather sorted         : {tv2:7.3f} ms", flush=True)

    # dense-read upper bound: how fast can the chip even stream the
    # slabs the gathers touch?
    def u_dense(u):
        return u.astype(jnp.bfloat16).sum(axis=(1, 2))

    td = bench(u_dense, u)
    print(f"u dense slab read       : {td:7.3f} ms "
          f"({B*C*W_u/1e9/(td/1e3):6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
