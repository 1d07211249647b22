"""End-to-end decode-throughput benchmark entry point.

TPU counterpart of the reference harness (reference test/e2e.py:33-168):
run the full-attention baseline at its best batch, then ShadowKV at its
(larger) batch, on ruler/qa_2 prompts truncated to the target length,
and report tokens/s + speedup.

The per-(model, length) config table mirrors the reference
(test/e2e.py:35-116) with batch sizes rescaled from 80 GB A100 to the
local chip's HBM (16 GB on v5e): the *ratios* (ShadowKV batch ~5-6x the
baseline batch, sparse_budget scaling with length) are the reference's.
Scale override via --baseline_bsz/--shadowkv_bsz.
"""

from __future__ import annotations

import argparse
import gc
import json
import sys

# (sparse_budget, prompt_len, baseline_bsz, shadowkv_bsz) per datalen,
# scaled to one 16 GB v5e chip with an ~8B model; reference values for
# 80 GB A100 in comments (test/e2e.py:35-116).
CONFIGS = {
    "default": {
        "60k": dict(sparse_budget=1024, min_prompt_len=1024 * 60,
                    baseline_bsz=1, shadowkv_bsz=6),  # A100: 8 / 48
        "122k": dict(sparse_budget=2048, min_prompt_len=1024 * 122,
                     baseline_bsz=1, shadowkv_bsz=4),  # A100: 4 / 24
        "244k": dict(sparse_budget=4096, min_prompt_len=1024 * 244,
                     baseline_bsz=1, shadowkv_bsz=2),  # A100: 2 / 12
    },
}


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model_name", type=str,
        default="meta-llama/Meta-Llama-3.1-8B-Instruct",
    )
    p.add_argument("--datalen", type=str, default="122k",
                   choices=["60k", "122k", "244k"])
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--baseline_bsz", type=int, default=None)
    p.add_argument("--shadowkv_bsz", type=int, default=None)
    p.add_argument("--gen_len", type=int, default=100)
    # int8 weight-only dense path (core/wquant.py): on a 16 GB chip an
    # 8B model's bf16 weights alone fill HBM — int8 weights are what
    # make the full-attention baseline feasible at all at 60K.
    p.add_argument("--weight_quant", type=str, default="none",
                   choices=["none", "int8"])
    return p.parse_args()


def main():
    args = parse_args()
    cfg = CONFIGS.get(args.model_name, CONFIGS["default"])[args.datalen]
    if args.baseline_bsz:
        cfg["baseline_bsz"] = args.baseline_bsz
    if args.shadowkv_bsz:
        cfg["shadowkv_bsz"] = args.shadowkv_bsz
    temperature = 0.6
    min_len = cfg["min_prompt_len"]

    import numpy as np

    from shadowkv_tpu.data.dataset import Dataset
    from shadowkv_tpu.models.llm import LLM

    def make_inputs(llm, bsz):
        dataset = Dataset(
            "ruler/qa_2", llm.tokenizer, 256 * 1024, max(20, bsz),
        )
        rows = [dataset.tokenized_prompts[i][:min_len] for i in range(bsz)]
        assert all(len(r) == min_len for r in rows), (
            "qa_2 prompts shorter than target length"
        )
        return np.stack(rows)

    # --- full-attention baseline (reference test/e2e.py:140-150) ---
    llm = LLM(
        model_name=args.model_name, batch_size=cfg["baseline_bsz"],
        max_length=min_len + args.gen_len + 28, attn_mode="full",
        sparse_budget=cfg["sparse_budget"], model_dir=args.model_dir,
        weight_quant=args.weight_quant,
    )
    input_ids = make_inputs(llm, cfg["baseline_bsz"])
    _, tps_baseline = llm.batch_generate(
        input_ids, gen_len=args.gen_len, temperature=temperature,
        benchmark=True,
    )
    print(f"[Baseline] Throughput: {tps_baseline:.2f} tokens/s",
          file=sys.stderr)
    del llm
    gc.collect()

    # --- ShadowKV (reference test/e2e.py:159-168) ---
    llm = LLM(
        model_name=args.model_name, batch_size=cfg["shadowkv_bsz"],
        max_length=min_len + args.gen_len + 28, attn_mode="shadow",
        sparse_budget=cfg["sparse_budget"], model_dir=args.model_dir,
        weight_quant=args.weight_quant,
    )
    input_ids = make_inputs(llm, cfg["shadowkv_bsz"])
    _, tps_shadow = llm.batch_generate(
        input_ids, gen_len=args.gen_len, temperature=temperature,
        benchmark=True,
    )
    print(f"[ShadowKV] Throughput: {tps_shadow:.2f} tokens/s",
          file=sys.stderr)
    print(f"Speedup: {tps_shadow / tps_baseline:.2f}x", file=sys.stderr)
    print(json.dumps({
        "datalen": args.datalen,
        "baseline_tokens_per_sec": round(tps_baseline, 2),
        "shadowkv_tokens_per_sec": round(tps_shadow, 2),
        "speedup": round(tps_shadow / tps_baseline, 3),
    }))


if __name__ == "__main__":
    main()
