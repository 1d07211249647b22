#!/usr/bin/env bash
# Build RULER validation.jsonl files ahead of evaluation (counterpart of
# the reference's data/ruler/create_dataset.sh: 96 samples per task at
# 64K/128K lengths). Requires a local tokenizer (HF checkpoint dir or
# cached model name).
set -euo pipefail

MODEL=${1:-meta-llama/Meta-Llama-3.1-8B-Instruct}
MODEL_DIR=${2:-}
SAMPLES=${NUM_SAMPLES:-96}

EXTRA=()
if [[ -n "$MODEL_DIR" ]]; then EXTRA+=(--model_dir "$MODEL_DIR"); fi

for LEN in 65536 131072; do
  python -m shadowkv_tpu.data.ruler.prepare \
    --model_name "$MODEL" --datalen "$LEN" --num_samples "$SAMPLES" \
    "${EXTRA[@]}"
done
