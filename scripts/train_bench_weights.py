"""Train the EXACT bench-shape 1.4B model just far enough to produce
ORGANIC decode-time selection locality (round-5 task #2).

Every reference throughput number embeds ~60 % temporal hit reuse that
comes from REAL model weights (/root/reference/index.html:326 — the
hit/miss machinery in kernels/map.cuh:755-796 exists because real
attention is temporally stable). The repo's synthetic-weight bench
churns selection fully (~3 % slot stay), so the fused Pallas kernel's
e2e wins have so far required BENCH_HIT_RATE forcing. This script
closes that gap the honest way: a few hundred steps of training at the
bench model's exact geometry (16L/2048h/16H/8KV/dh128/vocab 32768,
rope theta 5e5 — bench.py's `sbench-1.4b-llama`) on dense associative
-recall data (the curriculum that cracked the tiny oracles,
scripts/train_tiny_model.py), then an npz snapshot + a long recall-
style prompt stream that bench.py consumes via BENCH_WEIGHTS=<dir>.

Retrieval COMPETENCE is not the bar — temporally-stable attention is.
Even partially-formed heads (sinks, locals, induction) score landmark
chunks consistently across adjacent decode steps, which is all the
slot-stable selection needs for hits.

Memory plan for the 16 GB chip: bf16 params (2.8 GB) + bf16 grads +
adafactor's factored f32 stats (~MBs, not adam's 11 GB) + checkpointed
chunked attention; ctx ramps 512->2048 with batch shrinking to bound
the [B, S, V] logits term (f32 [2, 2048, 32768] = 0.5 GB).

Usage (TPU, ~15-30 min):
  python scripts/train_bench_weights.py --out checkpoints/bench1p4b
CPU smoke: --steps 2 --ctx 256 --batch 1 --smoke
"""

from __future__ import annotations

import argparse
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


def bench_model_config(smoke: bool = False):
    """The bench 1.4B llama shape, EXACTLY as bench.py builds it (any
    divergence would make the trained weights silently wrong for the
    bench's RoPE tables / head layout)."""
    from shadowkv_tpu.models.registry import toy_config

    if smoke:
        return toy_config(
            name="sbench-smoke", num_layers=2, hidden_size=256,
            num_heads=4, num_kv_heads=2, head_dim=64,
            intermediate_size=512, vocab_size=32768,
            rope_theta=500000.0, dtype=jnp.float32,
        )
    return toy_config(
        name="sbench-1.4b-llama",
        num_layers=16, hidden_size=2048, num_heads=16, num_kv_heads=8,
        head_dim=128, intermediate_size=5632, vocab_size=32768,
        rope_theta=500000.0, dtype=jnp.bfloat16,
    )


def build_prompt_stream(tokenizer, n_tokens: int, seed: int) -> np.ndarray:
    """One long HETEROGENEOUS token stream for the bench prompt.

    Real long-context workloads are regionally diverse (different
    documents, topics, formats), which is what makes chunk rankings
    STABLE under selection: chunks differ systematically, so the top-S
    set barely moves between adjacent decode steps (the reference's
    ~60 % reuse regime). A first attempt used homogeneous needle lines
    everywhere — every chunk looked alike, scores near-tied, and the
    measured organic locality was only 0.32. Here the stream rotates
    through topic sections, each drawing from a DISJOINT word-pool
    slice with its own format, with needle/query lines woven in.
    """
    import random

    from shadowkv_tpu.data.wordlists import adjective_noun_words

    words = adjective_noun_words()
    rng = random.Random(seed)
    # disjoint word pools = systematically distinct section content
    n_pools = 16
    pools = [words[i::n_pools] for i in range(n_pools)]
    fmts = [
        "The {a} {b} considered the {c} near the {d}.\n",
        "- item {v}: {a} {b} ({c})\n",
        "{a}={v}; {b}={v2}; note: {c} {d}\n",
        "In chapter {v}, the {a} {b} travelled to the {c} {d}.\n",
        "One of the special magic numbers for {a}-{b} is: {v}.\n",
    ]
    toks: list[int] = []
    pairs: list[tuple[str, str]] = []
    while len(toks) < n_tokens:
        pool = pools[rng.randrange(n_pools)]
        fmt = fmts[rng.randrange(len(fmts))]
        section = []
        for _ in range(rng.randint(8, 20)):
            a, b, c, d = (rng.choice(pool) for _ in range(4))
            v, v2 = rng.randint(1000, 9999999), rng.randint(10, 999)
            line = fmt.format(a=a, b=b, c=c, d=d, v=v, v2=v2)
            if "magic" in line:
                pairs.append((f"{a}-{b}", str(v)))
            section.append(line)
        if pairs and rng.random() < 0.2:
            k, v = rng.choice(pairs)
            section.append(
                f"What is the special magic number for {k} mentioned "
                "in the provided text? The special magic number for "
                f"{k} mentioned in the provided text is {v}.\n"
            )
        toks.extend(tokenizer.encode(
            "".join(section), add_special_tokens=False
        ))
    return np.asarray(toks[:n_tokens], np.int32)


def main():
    from shadowkv_tpu.utils.compile_cache import enable as _cc

    _cc()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="checkpoints/bench1p4b")
    ap.add_argument("--steps", type=int, default=400,
                    help="max steps PER PHASE (phases early-advance "
                         "on the dense-recall probe)")
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2)
    # 3e-4: the r4 oracle found LR couples to width (7e-4 never formed
    # the retrieval circuit at width 1024; 3e-4 did). The r5 first
    # attempt at width 2048 with 1e-3 plateaued at ans~6 (no circuit)
    # and measured only 0.32 organic locality at 122K.
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prompt-tokens", type=int, default=262144)
    ap.add_argument("--smoke", action="store_true", default=False)
    args = ap.parse_args()

    import optax

    from scripts.make_tiny_checkpoint import build_tiny_checkpoint
    from scripts.train_tiny_model import full_logits, make_samples_dense
    from shadowkv_tpu.core import rope as rope_lib
    from shadowkv_tpu.models.params import (
        init_synthetic_params, save_params_npz,
    )

    from transformers import AutoTokenizer

    tok_dir = build_tiny_checkpoint("/tmp/tiny-llama-trained")
    tokenizer = AutoTokenizer.from_pretrained(tok_dir)

    cfg = bench_model_config(args.smoke)
    params = init_synthetic_params(cfg, jax.random.PRNGKey(args.seed))
    cos_t, sin_t = rope_lib.compute_cos_sin(
        cfg, args.ctx, dtype=jnp.float32
    )

    warm = max(2, args.steps // 8)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warm, warm + 4 * args.steps,
        end_value=args.lr * 0.1,
    )
    # adafactor: the only optimizer whose state fits next to 1.4B bf16
    # params on 16 GB (adam moments are 11 GB f32)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adafactor(
            learning_rate=sched, min_dim_size_to_factor=128,
            multiply_by_parameter_scale=False, clipping_threshold=None,
        ),
    )
    opt_state = opt.init(params)

    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
    def train_step(params, opt_state, ids, mask, s):
        def loss_fn(p):
            logits = full_logits(
                cfg, p, ids[:, : s - 1], cos_t[: s - 1], sin_t[: s - 1]
            )
            tgt = ids[:, 1:s]
            m = mask[:, 1:s]
            ll = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), tgt
            )
            w_ans = (m == 2).astype(jnp.float32)
            w_fill = (m == 1).astype(jnp.float32)
            ans = (ll * w_ans).sum() / jnp.maximum(w_ans.sum(), 1.0)
            fill = (ll * w_fill).sum() / jnp.maximum(w_fill.sum(), 1.0)
            return ans + 0.3 * fill, (ans, fill)

        (_, (ans, fill)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, ans, fill

    @functools.partial(jax.jit, static_argnums=(2,))
    def probe_step(params, ids, s):
        logits = full_logits(
            cfg, params, ids[:, : s - 1], cos_t[: s - 1], sin_t[: s - 1]
        )
        return jnp.argmax(logits, axis=-1)

    def dense_acc(params, n, ctx, seed):
        """Per-answer-token accuracy on held-out dense-recall samples —
        the signal that the retrieval circuit actually FORMED (losses
        alone plateaued at ans~6 in the r5 first attempt while fill
        kept falling)."""
        ids, mask = make_samples_dense(tokenizer, n, ctx, seed=seed)
        pred = np.asarray(probe_step(params, jnp.asarray(ids), ctx))
        ok = tot = 0
        for i in range(n):
            for p in np.nonzero(mask[i] == 2)[0]:
                ok += int(pred[i, p - 1] == ids[i, p])
                tot += 1
        return ok / max(tot, 1)

    if args.smoke:
        phases = [(args.ctx, args.batch, args.steps, 0.5)]
    else:
        phases = [
            (512, args.batch * 4, args.steps * 2, 0.5),
            (1024, args.batch * 2, args.steps, 0.45),
            (args.ctx, args.batch, args.steps, 0.4),
        ]
    rng = np.random.RandomState(args.seed)
    # heterogeneous-LM side stream (the prompt distribution): the model
    # must learn to DISCRIMINATE topic sections for selection scores to
    # separate chunks — dense-recall-only training left every chunk
    # looking alike (organic locality 0.32, r5 first attempt)
    het = build_prompt_stream(
        tokenizer, 400_000, seed=args.seed + 17
    )

    def het_batch(batch, ctx):
        starts = rng.randint(0, len(het) - ctx, batch)
        ids = np.stack([het[s : s + ctx] for s in starts])
        return ids, np.ones_like(ids)

    t0 = time.time()
    step = 0
    for ctx, batch, n_steps, bar in phases:
        print(f"-- phase ctx={ctx} batch={batch} steps<={n_steps} "
              f"bar={bar}", flush=True)
        for i_phase in range(n_steps):
            if i_phase % 2 == 1:
                ids, mask = het_batch(batch, ctx)
            else:
                ids, mask = make_samples_dense(
                    tokenizer, batch, ctx, seed=int(rng.randint(0, 2**31))
                )
            params, opt_state, ans, fill = train_step(
                params, opt_state, jnp.asarray(ids),
                jnp.asarray(mask), ctx,
            )
            if step % 20 == 0:
                print(
                    f"step {step:5d} ans {float(ans):.4f} "
                    f"fill {float(fill):.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            step += 1
            if i_phase and i_phase % 50 == 0:
                acc = dense_acc(
                    params, 8, ctx, seed=9_000_000 + step
                )
                print(f"  dense-acc@{ctx}: {acc:.3f}", flush=True)
                if acc >= bar:
                    print(f"  phase {ctx} done early at {step}",
                          flush=True)
                    break

    os.makedirs(args.out, exist_ok=True)
    # free the optimizer state before the host pull: params (2.8 GB)
    # come back through the 0.07 GB/s tunnel leaf-by-leaf anyway
    del opt_state
    params = jax.device_get(params)
    save_params_npz(params, os.path.join(args.out, "params.npz"))
    prompt = build_prompt_stream(
        tokenizer, args.prompt_tokens, seed=args.seed + 1
    )
    np.save(os.path.join(args.out, "prompt.npy"), prompt)
    print(f"saved {args.out}/params.npz + prompt.npy "
          f"({prompt.shape[0]} toks, {time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
