"""Build RULER validation.jsonl files ahead of time.

Counterpart of the reference dataset builder (reference
data/ruler/prepare.py:100-143 + create_dataset.sh): writes
``data/ruler/data/<template_family>/<datalen>/<task>/validation.jsonl``
so the Dataset loader finds prebuilt files instead of generating on the
fly.

    python -m shadowkv_tpu.data.ruler.prepare \
        --model_name meta-llama/Meta-Llama-3.1-8B-Instruct \
        --datalen 131072 --num_samples 96 \
        --tasks niah_single_1,vt,qa_2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from shadowkv_tpu.data.dataset import RULER_DATA_DIR
from shadowkv_tpu.data.ruler.generate import TASK_CONFIGS, generate_task
from shadowkv_tpu.models.prompt_templates import (
    CTX_TEMPLATES,
    template_family,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--datalen", type=int, default=131072)
    p.add_argument("--num_samples", type=int, default=96)
    p.add_argument(
        "--tasks", type=lambda s: s.split(","),
        default=list(TASK_CONFIGS.keys()),
    )
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", type=str, default=RULER_DATA_DIR)
    args = p.parse_args()

    from transformers import AutoTokenizer

    tok_src = args.model_dir or args.model_name
    tokenizer = AutoTokenizer.from_pretrained(tok_src, trust_remote_code=True)
    family = template_family(args.model_name)
    template = CTX_TEMPLATES[family]

    for task in args.tasks:
        out = os.path.join(
            args.out_dir, family, str(args.datalen), task,
            "validation.jsonl",
        )
        os.makedirs(os.path.dirname(out), exist_ok=True)
        print(f"[prepare] {task} @ {args.datalen} -> {out}",
              file=sys.stderr)
        samples = generate_task(
            task, tokenizer, args.datalen, args.num_samples,
            seed=args.seed, model_template=template,
        )
        with open(out, "w") as f:
            for s in samples:
                f.write(json.dumps(s, ensure_ascii=False) + "\n")


if __name__ == "__main__":
    main()
