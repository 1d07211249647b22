"""VS sparse-prefill kernel: staged hardware probe (round-3 task #1).

Round 2's one real bench_vs run faulted the device (logs/bench_vs.log)
and the kernel has never produced a 122K timing. This probe climbs the
ladder bottom-up so a fault pinpoints its stage:

  1. parity4k   — compiled kernel vs jnp oracle at 4K (chip sanity +
                  numerics, mirrors tests/test_kernel_tpu.py).
  2. meta122    — metadata stats at 122K for two regimes:
                  'clustered' (real-weight-like: slashes decay from the
                  diagonal, verticals zipf-clustered) and 'random' (what
                  the bench's synthetic weights produce: top-k of noise).
  3. kern122    — kernel s/call at 122K, b=1, bench head geometry
                  (h=16, kh=8, dh=128), both regimes x block sizes.
                  Baselines (prof_prefill_attn.log, same shapes):
                  dense splash 0.448 s/call, stream 0.064 s/call.
  4. estim122   — estimate_vertical_slash cost at 122K (the engine's
                  vs path pays it per layer).

Run: python benchmarks/prof_vs_kernel.py [stages...]
Env: PROF_S, PROF_B, PROF_ITERS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def parity4k():
    from shadowkv_tpu.core import minference as mi
    from shadowkv_tpu.kernels.vs_sparse import vs_sparse_attention

    s, block, h, kh, dh = 4096, 128, 4, 2, 128
    g = h // kh
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(ks[0], (h, s, dh), jnp.bfloat16)
    k = jax.random.normal(ks[1], (kh, s, dh), jnp.bfloat16)
    v = jax.random.normal(ks[2], (kh, s, dh), jnp.bfloat16)
    v_idx = jax.random.randint(ks[3], (h, 128), 0, s)
    s_idx = jax.random.randint(ks[3], (h, 64), 0, s)
    meta = mi.build_vs_meta(v_idx, s_idx, s, block)
    kv_map = jnp.asarray([hh // g for hh in range(h)], jnp.int32)
    out = vs_sparse_attention(
        q, k, v, meta.col_ids, meta.col_cnt, meta.col_flag,
        meta.diag_ids, meta.diag_cnt, kv_map,
        block=block, scale=dh**-0.5, seq_len=s,
    )
    ref = mi.vs_attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), meta, kv_map, block,
    )
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref))
    )
    log(f"parity4k: max_abs_err={err:.4f} (tol 3e-2 scale)")
    assert err < 0.06, err


def _meta_for(regime, bh, s, block, vsize, ssize, key):
    """Synthesize vertical/slash scores whose top-k mimics the regime,
    then run the production metadata build."""
    from shadowkv_tpu.core import minference as mi

    kv, ks_ = jax.random.split(key)
    if regime == "clustered":
        # slashes: exponential decay from the diagonal (real attention
        # locality); verticals: zipf-ish mass on a few hundred tokens.
        d = jnp.arange(s, dtype=jnp.float32)
        slash = -d / 2048.0 + 0.2 * jax.random.normal(ks_, (bh, s))
        hot = jax.random.randint(kv, (bh, 512), 0, s)
        vert = jax.random.uniform(kv, (bh, s)) * 0.1
        vert = vert.at[jnp.arange(bh)[:, None], hot].add(1.0)
    else:  # random: top-k of pure noise (synthetic-weight bench)
        slash = jax.random.normal(ks_, (bh, s))
        vert = jax.random.normal(kv, (bh, s))
    return mi.vs_meta_from_scores(
        vert, slash, vsize, ssize, s, block, grid_len=s
    )


def meta_stats(meta, n_blk):
    n1 = np.asarray(meta.col_cnt[:, -1])
    # diag_cnt[:, qb] counts diagonals <= qb; last row = total
    n2 = np.asarray(meta.diag_cnt[:, -1])
    # average active blocks per q row = mean over qb of cnt(qb)
    avg = float(
        np.mean(np.asarray(meta.col_cnt) + np.asarray(meta.diag_cnt))
    )
    return int(n1.mean()), int(n2.mean()), avg


def meta122(s, blocks=(128, 256)):
    h = 16
    for regime in ("clustered", "random"):
        for block in blocks:
            n_blk = s // block
            meta = _meta_for(
                regime, h, s, block, 1000, 6144, jax.random.PRNGKey(0)
            )
            n1, n2, avg = meta_stats(meta, n_blk)
            dense_avg = (n_blk + 1) / 2
            log(
                f"meta122 {regime:9s} block={block:4d}: cols={n1} "
                f"diags={n2} avg_active/qrow={avg:.0f} of {n_blk} "
                f"(dense avg {dense_avg:.0f}, ratio "
                f"{dense_avg / max(avg, 1):.2f}x)"
            )


def kern122(s, b):
    from shadowkv_tpu.kernels.vs_sparse import vs_sparse_attention

    h, kh, dh = 16, 8, 128
    g = h // kh
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (h, s, dh), jnp.bfloat16)
    k = jax.random.normal(key, (kh, s, dh), jnp.bfloat16)
    v = jax.random.normal(key, (kh, s, dh), jnp.bfloat16)
    kv_map = jnp.asarray([hh // g for hh in range(h)], jnp.int32)
    iters = int(os.environ.get("PROF_ITERS", 3))
    for regime in ("clustered", "random"):
        for block in (128, 256):
            if s % block:
                continue
            meta = _meta_for(
                regime, h, s, block, 1000, 6144, jax.random.PRNGKey(0)
            )
            n1, n2, avg = meta_stats(meta, s // block)
            t0 = time.perf_counter()
            try:
                sec = timeit(
                    lambda q, k, v, m=meta, blk=block: vs_sparse_attention(
                        q, k, v, m.col_ids, m.col_cnt, m.col_flag,
                        m.diag_ids, m.diag_cnt, kv_map,
                        block=blk, scale=dh**-0.5, seq_len=s,
                    ),
                    q, k, v, iters=iters,
                )
                n_iter = avg * (s // block) * h
                gb = n_iter * 2 * block * dh * 2 / 1e9
                log(
                    f"kern122 {regime:9s} block={block:4d}: {sec:.3f} "
                    f"s/call (compile {time.perf_counter() - t0:.0f}s) "
                    f"avg_active={avg:.0f} iters={n_iter / 1e6:.2f}M "
                    f"-> {sec / n_iter * 1e6:.2f} us/blk, "
                    f"{gb / sec:.0f} GB/s eff"
                )
            except Exception as e:
                log(
                    f"kern122 {regime} block={block}: FAIL "
                    f"{type(e).__name__}: {str(e)[:200]}"
                )
                raise


def tilec122(s):
    """Compile-only probe of the decomposed kernel at 122K (AOT via the
    chipless remote compiler; a hang here = op-fusion pathology, split
    the program per CLAUDE.md)."""
    import functools as ft

    from shadowkv_tpu.kernels.vs_tile import vs_tile_attention

    h, kh, dh, block, nv = 16, 8, 128, 128, 1024
    nk = s // block
    fn = ft.partial(
        vs_tile_attention, block=block, scale=dh**-0.5, seq_len=s,
        tq=512, tk=512,
    )
    shapes = (
        jax.ShapeDtypeStruct((h, s, dh), jnp.bfloat16),
        jax.ShapeDtypeStruct((kh, s, dh), jnp.bfloat16),
        jax.ShapeDtypeStruct((kh, s, dh), jnp.bfloat16),
        jax.ShapeDtypeStruct((h, nv), jnp.int32),
        jax.ShapeDtypeStruct((h, nk), jnp.int32),
        jax.ShapeDtypeStruct((h,), jnp.int32),
    )
    t0 = time.perf_counter()
    compiled = jax.jit(fn).lower(*shapes).compile()
    log(
        f"tilec122: compiled in {time.perf_counter() - t0:.1f}s; "
        f"mem={compiled.memory_analysis()}"
    )


def tile122(s, nv_pad=1024, vsize=1000, ssize=6144):
    """The decomposed (token-vertical + group-slash) kernel at 122K."""
    from shadowkv_tpu.core import minference as mi
    from shadowkv_tpu.kernels.vs_tile import vs_tile_attention

    h, kh, dh, block = 16, 8, 128, 128
    g = h // kh
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (h, s, dh), jnp.bfloat16)
    k = jax.random.normal(key, (kh, s, dh), jnp.bfloat16)
    v = jax.random.normal(key, (kh, s, dh), jnp.bfloat16)
    kv_map = jnp.asarray([hh // g for hh in range(h)], jnp.int32)
    iters = int(os.environ.get("PROF_ITERS", 3))
    for regime in ("clustered", "random"):

        @jax.jit  # eager (per-op) dispatch compiles one remote program
        # PER PRIMITIVE through the tunnel — minutes of pure compile
        def build_meta(key):
            kv_, ks_ = jax.random.split(key)
            if regime == "clustered":
                d = jnp.arange(s, dtype=jnp.float32)
                slash = -d / 2048.0 + 0.2 * jax.random.normal(
                    ks_, (h, s)
                )
                hot = jax.random.randint(kv_, (h, 512), 0, s)
                vert = jax.random.uniform(kv_, (h, s)) * 0.1
                vert = vert.at[jnp.arange(h)[:, None], hot].add(1.0)
            else:
                slash = jax.random.normal(ks_, (h, s))
                vert = jax.random.normal(kv_, (h, s))
            _, v_idx = jax.lax.top_k(vert, vsize)
            v_idx = jnp.pad(
                v_idx, ((0, 0), (0, nv_pad - vsize)),
                constant_values=2 * s,
            )
            _, s_idx = jax.lax.top_k(slash, ssize)
            return v_idx, mi.diag_flags_from_slash(
                s_idx, s // block, block
            )

        v_idx, diag_flag = build_meta(jax.random.PRNGKey(1))
        nd = int(np.asarray(diag_flag.sum(-1)).mean())
        t0 = time.perf_counter()
        sec = timeit(
            lambda q, k, v, vi=v_idx, df=diag_flag: vs_tile_attention(
                q, k, v, vi, df, kv_map,
                block=block, scale=dh**-0.5, seq_len=s,
            ),
            q, k, v, iters=iters,
        )
        log(
            f"tile122 {regime:9s}: {sec:.3f} s/call "
            f"(compile {time.perf_counter() - t0:.0f}s) "
            f"diag_blocks/head={nd} nv={vsize} "
            f"[dense splash 0.448, stream 0.064]"
        )


def disp122(s):
    """Attribute the bench_vs per-layer overhead beyond the kernel:
    time the full dispatcher, then estimation / top-k / flags
    separately (plus approx_max_k alternatives). bench_vs_r3 left an
    ~83 s residual (207.6 total - 53.7 non-attn - 71.2 kernel) =
    ~1.29 s/(layer*batch-elem) unexplained."""
    import functools as ft

    from shadowkv_tpu.core import minference as mi
    from shadowkv_tpu.core.minference import minference_prefill_tile

    b, h, kh, dh = 1, 16, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, dh), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, kh, dh), jnp.bfloat16)
    v = jax.random.normal(key, (b, s, kh, dh), jnp.bfloat16)

    # 1. estimation alone
    fn_e = jax.jit(lambda q, k: mi.estimate_vertical_slash(q, k, dh**-0.5))
    sec_e = timeit(fn_e, q, k)
    log(f"disp122 estimation: {sec_e:.3f} s/call")
    vert, sl = fn_e(q, k)
    vert_f = jnp.asarray(vert.reshape(b * h, s))
    sl_f = jnp.asarray(sl.reshape(b * h, s))

    # 2. top-k alone (exact vs approx)
    fn_tv = jax.jit(lambda x: jax.lax.top_k(x, 1000)[1])
    fn_ts = jax.jit(lambda x: jax.lax.top_k(x, 6144)[1])
    sec_tv = timeit(fn_tv, vert_f)
    sec_ts = timeit(fn_ts, sl_f)
    log(f"disp122 top_k exact: vert(1000) {sec_tv:.3f} "
        f"slash(6144) {sec_ts:.3f} s/call")
    fn_av = jax.jit(
        lambda x: jax.lax.approx_max_k(x, 1000, recall_target=0.95)[1]
    )
    fn_as = jax.jit(
        lambda x: jax.lax.approx_max_k(x, 6144, recall_target=0.95)[1]
    )
    sec_av = timeit(fn_av, vert_f)
    sec_as = timeit(fn_as, sl_f)
    log(f"disp122 approx_max_k: vert {sec_av:.3f} slash {sec_as:.3f}")

    # 3. diag flags from slash ids
    s_idx = fn_ts(sl_f)
    fn_f = jax.jit(
        lambda i: mi.diag_flags_from_slash(i, s // 128, 128)
    )
    sec_f = timeit(fn_f, s_idx)
    log(f"disp122 diag_flags: {sec_f:.3f} s/call")

    # 4. block-sum slash selection (block-granular alternative)
    def blocksum(slf):
        bs = slf.reshape(b * h, s // 128, 128).sum(-1)
        return jax.lax.top_k(bs, 64)[1]

    sec_bs = timeit(jax.jit(blocksum), sl_f)
    log(f"disp122 slash block-sum top64: {sec_bs:.3f} s/call")

    # 5. full dispatcher
    fn = jax.jit(
        ft.partial(
            minference_prefill_tile,
            vertical_size=1000, slash_size=6144, block=128,
            use_kernel=True,
        )
    )
    t0 = time.perf_counter()
    sec = timeit(fn, q, k, v, iters=int(os.environ.get("PROF_ITERS", 3)))
    log(
        f"disp122 full: {sec:.3f} s/call (compile "
        f"{time.perf_counter() - t0:.0f}s) [kernel-only random 1.113, "
        f"dense splash 0.448]"
    )


def estim122(s):
    from shadowkv_tpu.core.minference import estimate_vertical_slash

    b, h, kh, dh = 1, 16, 8, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, dh), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, kh, dh), jnp.bfloat16)
    fn = jax.jit(lambda q, k: estimate_vertical_slash(q, k))
    sec = timeit(fn, q, k)
    log(f"estim122: {sec:.3f} s/call (per layer per batch elem)")


def main():
    stages = sys.argv[1:] or ["parity4k", "meta122", "kern122", "estim122"]
    s = int(os.environ.get("PROF_S", 122880))
    b = int(os.environ.get("PROF_B", 1))
    log(f"devices: {jax.devices()}  S={s}")
    for st in stages:
        t0 = time.perf_counter()
        globals()[st](
            *([s, b] if st == "kern122" else [s] if st != "parity4k" else [])
        )
        log(f"== {st} done ({time.perf_counter() - t0:.1f}s)")


if __name__ == "__main__":
    main()
