"""Train the tiny llama to ACTUALLY DO retrieval (round-3 task #3).

The round-2 eval harness ran end-to-end on a real checkpoint, but that
model was random-weight and scores ~0 by design — so "shadow score ==
full score", the claim the whole system rests on (reference Table 2,
SURVEY §4), had never been checked with a model that can do the task.
No 8B checkpoint exists on this machine; this script trains the tiny
4-layer llama (scripts/make_tiny_checkpoint.py geometry) to
copy/retrieval competence on RULER niah-style data, then saves it as a
standard HF safetensors checkpoint so entry/eval_acc.py + the tests
drive it through the SAME loader path as a production model.

Training data comes from the repo's own RULER generator
(data/ruler/generate.py) with the repo's own trained tokenizer — the
distribution the eval harness scores. The model must learn induction
(find "One of the special magic numbers for <key> is: <digits>" and
copy the digits when <key> is queried) — the capability that makes a
real slot-hit-rate and a real shadow-vs-full accuracy gap measurable.

Usage:
  python scripts/train_tiny_model.py [--out /tmp/tiny-llama-trained]
      [--steps 1500] [--ctx 4096] [--batch 2] [--lr 1e-3]

CPU smoke: --steps 5 --ctx 512 works on the 1-core box (~2 min).
Real run: the TPU trains 1-2k steps in minutes.
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


# ---------------------------------------------------------------------------
# data
# ---------------------------------------------------------------------------


def make_samples_dense(tokenizer, n: int, ctx: int, seed: int):
    """DENSE associative recall in RULER's exact phrasing: many
    "One of the special magic numbers for {k} is: {v}." lines, then
    several query lines each teacher-forcing its value. One RULER
    niah sample carries ~4 answer tokens per 4K context — far too
    sparse a gradient for the retrieval circuit to form (r3/r4
    trainers plateaued at format-only answer loss); here every sample
    carries dozens of retrieval targets, and the learned circuit
    transfers to the sparse single-needle eval distribution (phase-B
    fine-tuning below).

    Returns (ids [n, ctx], mask [n, ctx]) with mask 2 on query-answer
    tokens, 1 elsewhere (light LM loss), 0 on padding.
    """
    import random

    from shadowkv_tpu.data.wordlists import adjective_noun_words

    words = adjective_noun_words()
    rng = random.Random(seed)
    ids = np.zeros((n, ctx), np.int32)
    mask = np.zeros((n, ctx), np.int32)
    for i in range(n):
        pairs = []
        toks: list = []
        marks: list = []

        def put(text, answer=False):
            t = tokenizer.encode(text, add_special_tokens=False)
            toks.extend(t)
            marks.extend([2 if answer else 1] * len(t))

        while True:
            # a few needle lines, then a query over a random one
            fresh = []
            for _ in range(rng.randint(2, 4)):
                k = rng.choice(words)
                v = str(rng.randint(1000000, 9999999))
                fresh.append((k, v))
                put(
                    f"One of the special magic numbers for {k} is: "
                    f"{v}.\n"
                )
            pairs.extend(fresh)
            k, v = rng.choice(pairs)
            put(
                f"What is the special magic number for {k} mentioned "
                "in the provided text? The special magic number for "
                f"{k} mentioned in the provided text is"
            )
            put(" " + v, answer=True)
            put(tokenizer.eos_token + "\n")
            if len(toks) > ctx - 40:
                break
        seq = toks[:ctx]
        ids[i, : len(seq)] = seq
        mask[i, : len(seq)] = marks[: len(seq)]
    return ids, mask


def make_samples(tokenizer, n: int, ctx: int, seed: int, task="niah_single_1"):
    """RULER samples packed to exactly ``ctx`` tokens: returns
    (ids [n, ctx], mask [n, ctx]) with mask 2 on ANSWER tokens, 1 on
    the prompt (light LM loss), 0 on padding. Answer and filler losses
    are normalized SEPARATELY in the train step — with a single
    weighted mean the ~4 answer tokens carried ~2 % of the gradient
    against ~4K filler tokens and the model learned the answer format
    but zero retrieval (round-3 train_tiny: loss 0.12, eval 0.0)."""
    from shadowkv_tpu.data.ruler.generate import generate_task

    rows = generate_task(
        task, tokenizer, num_samples=n, max_seq_length=ctx - 8,
        seed=seed,
    )
    ids = np.zeros((n, ctx), np.int32)
    mask = np.zeros((n, ctx), np.int32)
    for i, r in enumerate(rows):
        prompt = tokenizer.encode(r["input"], add_special_tokens=False)
        # teacher-force the first reference answer + eos
        ans = tokenizer.encode(
            " " + r["outputs"][0] + tokenizer.eos_token,
            add_special_tokens=False,
        )
        seq = (prompt + ans)[:ctx]
        ids[i, : len(seq)] = seq
        a0 = min(len(prompt), ctx)
        mask[i, :a0] = 1
        mask[i, a0 : len(seq)] = 2
    return ids, mask


# ---------------------------------------------------------------------------
# differentiable forward (repo layer math, chunked causal attention)
# ---------------------------------------------------------------------------


def _causal_attn(q, k, v, chunk=512):
    """Differentiable causal GQA attention, q chunked to bound the
    [B, H, c, S] score temp (the repo's inference flash kernels are not
    used here — training needs a VJP)."""
    b, s, h, dh = q.shape
    kh = k.shape[2]
    g = h // kh
    scale = dh**-0.5
    qg = q.reshape(b, s, kh, g, dh)
    nc = (s + chunk - 1) // chunk
    s_pad = nc * chunk
    if s_pad != s:
        qg = jnp.pad(qg, ((0, 0), (0, s_pad - s), (0, 0), (0, 0), (0, 0)))
    qc = qg.reshape(b, nc, chunk, kh, g, dh).transpose(1, 0, 2, 3, 4, 5)
    pos_k = jnp.arange(s)

    @jax.checkpoint
    def one(c0, qi):  # qi [B, chunk, K, G, Dh]
        sc = jnp.einsum(
            "bqkgd,bskd->bkgqs", qi, k,
            preferred_element_type=jnp.float32,
        ) * scale
        pos_q = c0 + jnp.arange(chunk)
        m = pos_k[None, :] <= pos_q[:, None]
        sc = jnp.where(m[None, None, None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum(
            "bkgqs,bskd->bqkgd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    out = jax.lax.map(
        lambda args: one(args[0], args[1]),
        (jnp.arange(nc) * chunk, qc),
    )  # [nc, B, chunk, K, G, Dh]
    out = out.transpose(1, 0, 2, 3, 4, 5).reshape(b, s_pad, kh, g, dh)
    return out[:, :s].reshape(b, s, h, dh)


def full_logits(model_cfg, params, ids, cos, sin):
    from shadowkv_tpu.core import wquant
    from shadowkv_tpu.models.forward import (
        _finalize, _layer_qkv, _layer_tail,
    )

    x = wquant.take_rows(params.embed, ids, model_cfg.dtype)

    def body(x, inputs):
        _li, lp = inputs
        q, k_r, _, v = _layer_qkv(model_cfg, lp, x, cos, sin)
        ctx = _causal_attn(q, k_r, v)
        return _layer_tail(lp, model_cfg, x, ctx), None

    x, _ = jax.lax.scan(
        body, x, (jnp.arange(model_cfg.num_layers), params.layers)
    )
    return _finalize(model_cfg, params, x, last_only=False)


# ---------------------------------------------------------------------------
# HF export (inverse of models/params.py::load_hf_params)
# ---------------------------------------------------------------------------


def save_hf_checkpoint(params, cfg, out_dir: str):
    """Write trained ModelParams back as HF llama safetensors (the
    exact names load_hf_params reads, so eval drives the trained model
    through the production loader)."""
    import torch
    from safetensors.torch import save_file

    h, kh, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def t(x):  # [in, out] -> HF [out, in]
        return torch.from_numpy(np.asarray(x, np.float32).T.copy())

    def v1(x):
        return torch.from_numpy(np.asarray(x, np.float32).copy())

    sd = {
        "model.embed_tokens.weight": v1(params.embed),
        "model.norm.weight": v1(params.final_norm),
        "lm_head.weight": t(params.lm_head),
    }
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params.layers)
        p = f"model.layers.{i}."
        qd, kd = h * dh, kh * dh
        sd[p + "self_attn.q_proj.weight"] = t(lp.wqkv[:, :qd])
        sd[p + "self_attn.k_proj.weight"] = t(lp.wqkv[:, qd : qd + kd])
        sd[p + "self_attn.v_proj.weight"] = t(lp.wqkv[:, qd + kd :])
        sd[p + "self_attn.o_proj.weight"] = t(lp.wo)
        ii = lp.w_gate_up.shape[-1] // 2
        sd[p + "mlp.gate_proj.weight"] = t(lp.w_gate_up[:, :ii])
        sd[p + "mlp.up_proj.weight"] = t(lp.w_gate_up[:, ii:])
        sd[p + "mlp.down_proj.weight"] = t(lp.w_down)
        sd[p + "input_layernorm.weight"] = v1(lp.attn_norm)
        sd[p + "post_attention_layernorm.weight"] = v1(lp.mlp_norm)
    save_file(sd, os.path.join(out_dir, "model.safetensors"))


# ---------------------------------------------------------------------------
# training loop
# ---------------------------------------------------------------------------


def main():
    from shadowkv_tpu.utils.compile_cache import enable as _cc

    _cc()
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tiny-llama-trained")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--ctx", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-every", type=int, default=500)
    ap.add_argument("--fresh", action="store_true", default=False,
                    help="wipe and rebuild the base checkpoint "
                         "(tokenizer + init) before training")
    args = ap.parse_args()

    from scripts.make_tiny_checkpoint import build_tiny_checkpoint

    # tokenizer + config + init
    out = build_tiny_checkpoint(args.out, fresh=args.fresh)
    from transformers import AutoTokenizer

    import optax

    from shadowkv_tpu.core import rope as rope_lib
    from shadowkv_tpu.models.params import load_hf_params
    from shadowkv_tpu.models.registry import config_from_hf_dir

    tokenizer = AutoTokenizer.from_pretrained(out)
    cfg = config_from_hf_dir(out, dtype=jnp.float32)
    params = load_hf_params(out, cfg)
    cos_t, sin_t = rope_lib.compute_cos_sin(
        cfg, args.ctx, dtype=jnp.float32
    )

    # Decay over the worst-case total step count (phase budgets sum to
    # ~2x args.steps with the early-advance curriculum below); a
    # nonzero floor keeps late phases learning even when every phase
    # runs its full budget.
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, min(200, args.steps // 5 + 1),
        2 * args.steps, end_value=args.lr * 0.1,
    )
    opt = optax.chain(
        optax.clip_by_global_norm(1.0), optax.adamw(sched)
    )
    opt_state = opt.init(params)

    @functools.partial(jax.jit, static_argnums=(4,))
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
            # retrieval is the task; filler LM is regularization only
            return ans + 0.1 * fill, (ans, fill)

        (loss, (ans, fill)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (
            optax.apply_updates(params, updates), opt_state,
            loss, ans, fill,
        )

    @functools.partial(jax.jit, static_argnums=(2,))
    def probe_step(params, ids, s):
        """Teacher-forced greedy prediction at every position: the
        host picks out each sample's first-answer-token slot (causal
        attention makes trailing padding harmless)."""
        logits = full_logits(
            cfg, params, ids[:, : s - 1], cos_t[: s - 1], sin_t[: s - 1]
        )
        return jnp.argmax(logits, axis=-1)  # [n, s-1] token ids

    def retrieval_acc(params, n, ctx, seed, kind="ruler"):
        """kind='ruler': teacher-forced FULL-answer exact match per
        sample (the tightest cheap proxy for the eval harness's greedy
        string score). kind='dense': per-answer-token accuracy over
        the many query answers of the dense recall samples."""
        mk = make_samples_dense if kind == "dense" else make_samples
        ids, mask = mk(tokenizer, n, ctx, seed=seed)
        pred = np.asarray(probe_step(params, jnp.asarray(ids), ctx))
        if kind == "dense":
            ok = tot = 0
            for i in range(n):
                for p in np.nonzero(mask[i] == 2)[0]:
                    ok += int(pred[i, p - 1] == ids[i, p])
                    tot += 1
            return ok / max(tot, 1)
        hits = 0
        for i in range(n):
            ans_pos = np.nonzero(mask[i] == 2)[0]
            hits += int(
                all(pred[i, p - 1] == ids[i, p] for p in ans_pos)
            )
        return hits / n

    # Two-stage curriculum. Stage A ("dense"): dense associative
    # recall in RULER phrasing — dozens of retrieval targets per
    # sample, the gradient density the circuit needs to FORM (one
    # needle per 4K gave ~4 answer tokens/sample; the r3/r4 runs
    # plateaued at format-only answer loss and never retrieved; the
    # pure-copy CPU probe showed zero induction signal at that
    # sparsity too). Stage B ("ruler"): the actual single-needle eval
    # distribution — the formed circuit only needs to generalize to
    # diluted context. Phases early-advance on their probes.
    if args.ctx > 1024:
        phases = [
            ("dense", 256, args.batch * 16, max(1, args.steps // 2)),
            ("dense", 512, args.batch * 8, max(1, args.steps // 2)),
        ]
        # Geometric RULER ladder up to the target context (round 5
        # extends the oracle to 16K+: the long-range selection regime
        # with thousands of landmarks per head, VERDICT r4 #5). Batch
        # shrinks with context so the [B, chunk, S] attention temps and
        # the [B, S, V] logits stay bounded on the 16 GB chip.
        c = 1024
        while True:
            bsz = max(1, (args.batch * 4096) // c)
            frac = 2 if c <= 2048 else 3
            phases.append(
                ("ruler", min(c, args.ctx), bsz,
                 max(1, args.steps // frac))
            )
            if c >= args.ctx:
                break
            c *= 2
    else:
        phases = [("ruler", args.ctx, args.batch, args.steps)]

    rng = np.random.RandomState(args.seed)
    t0 = time.time()
    step = 0
    for kind, ctx, batch, n_steps in phases:
        print(
            f"-- phase {kind} ctx={ctx} batch={batch} steps<={n_steps}",
            flush=True,
        )
        mk = make_samples_dense if kind == "dense" else make_samples
        bar = 0.8 if kind == "dense" else 0.9
        for i_phase in range(n_steps):
            ids, mask = mk(
                tokenizer, batch, ctx,
                seed=int(rng.randint(0, 2**31)),
            )
            params, opt_state, loss, ans, fill = train_step(
                params, opt_state, jnp.asarray(ids), jnp.asarray(mask),
                ctx,
            )
            if step % 25 == 0:
                print(
                    f"step {step:5d} ans {float(ans):.4f} "
                    f"fill {float(fill):.4f} ({time.time() - t0:.0f}s)",
                    flush=True,
                )
            if args.ckpt_every and step and step % args.ckpt_every == 0:
                save_hf_checkpoint(params, cfg, out)
                print(f"  checkpointed at step {step}", flush=True)
            step += 1
            if i_phase and i_phase % 100 == 0:
                acc = retrieval_acc(
                    params, 16, ctx, seed=7_000_000 + step, kind=kind
                )
                print(f"  retrieval[{kind}]@{ctx}: {acc:.2f}",
                      flush=True)
                if acc >= bar:
                    print(
                        f"  phase {kind}@{ctx} done early at step "
                        f"{step}", flush=True,
                    )
                    break
    save_hf_checkpoint(params, cfg, out)
    print(f"trained checkpoint at {out}")

    # held-out self-test at the full context
    acc = retrieval_acc(params, 16, args.ctx, seed=999)
    print(f"self-test retrieval@{args.ctx}: {acc:.2f} "
          f"({'OK' if acc >= 0.5 else 'MISS'})")


if __name__ == "__main__":
    main()
