"""Profile ONE layer's prefill attention: dense splash vs stream splash.

CLAUDE.md records stream (sink+window) prefill as measured SLOWER than
dense splash end-to-end at 122K (12.5 s vs 10.2 s warm per sequence),
which contradicts the tile-skipping model (~7 active kv blocks per q
block row vs ~60 for causal). This isolates the attention call itself
from the rest of prefill (RoPE/SVD/landmarks are shared) and sweeps
block sizes so the fix — if it's block config — is measured directly.

Run on the real chip:  python benchmarks/prof_prefill_attn.py
Env: PROF_S (seq len, default 122880), PROF_B (batch, default 1).

Output: one line per config with warm seconds/call.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def splash_call(q, k, v, kind, blk_q, blk_kv, blk_kvc, window, sink):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )
    from shadowkv_tpu.core.attention import sparse_prefill_splash

    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    if kind == "stream":
        # reuse the production mask class via the module-level helper,
        # but with explicit block sizes
        import shadowkv_tpu.core.attention as att

        # build masks exactly as sparse_prefill_splash does
        class _M(sm._ComputableMask):
            def __init__(self):
                def fn(q_ids, kv_ids):
                    return (kv_ids <= q_ids) & (
                        (kv_ids < sink) | (q_ids - kv_ids < window)
                    )

                super().__init__(shape=(s, s), mask_function=fn)

            def __eq__(self, other):
                return isinstance(other, _M) and self.shape == other.shape

            def __hash__(self):
                return hash((type(self), self.shape))

        masks = [_M()] * g
    else:
        masks = [sm.CausalMask((s, s))] * g
    mask = sm.MultiHeadMask(masks)
    block_sizes = sk.BlockSizes(
        block_q=blk_q, block_kv=blk_kv, block_kv_compute=blk_kvc
    )
    kernel = sk.make_splash_mqa_single_device(
        mask=mask, block_sizes=block_sizes
    )
    scale = dh**-0.5

    @jax.jit
    def run(q, k, v):
        qg = q.transpose(0, 2, 1, 3).reshape(b, kh, g, s, dh)
        k_bh = k.transpose(0, 2, 1, 3) * scale
        v_bh = v.transpose(0, 2, 1, 3)
        return jax.vmap(jax.vmap(kernel))(qg, k_bh, v_bh)

    return run


def main():
    s = int(os.environ.get("PROF_S", 122880))
    b = int(os.environ.get("PROF_B", 1))
    h, kh, dh = 16, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, dh), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, kh, dh), jnp.bfloat16)
    v = jax.random.normal(key, (b, s, kh, dh), jnp.bfloat16)
    log(f"devices: {jax.devices()}  S={s} B={b}")

    window, sink = 6144, 1024
    configs = [
        ("dense", 1024, 1024, 512),
        ("dense", 1024, 1024, 1024),
        ("stream", 1024, 1024, 512),
        ("stream", 1024, 1024, 1024),
        ("stream", 2048, 2048, 1024),
        ("stream", 512, 1024, 512),
        ("stream", 1024, 2048, 1024),
    ]
    for kind, bq, bkv, bkvc in configs:
        try:
            t0 = time.perf_counter()
            run = splash_call(q, k, v, kind, bq, bkv, bkvc, window, sink)
            sec = timeit(run, q, k, v)
            print(
                f"{kind:7s} block_q={bq:5d} block_kv={bkv:5d} "
                f"kv_compute={bkvc:5d}: {sec:.3f} s/call "
                f"(setup+compile {time.perf_counter() - t0:.1f}s)",
                flush=True,
            )
        except Exception as e:
            print(
                f"{kind:7s} block_q={bq} block_kv={bkv} "
                f"kv_compute={bkvc}: FAIL {type(e).__name__}: {e}",
                flush=True,
            )


if __name__ == "__main__":
    main()
