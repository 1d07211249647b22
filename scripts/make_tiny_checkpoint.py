"""Build a tiny REAL HF checkpoint + trained tokenizer for CPU e2e
tests of the accuracy harness (VERDICT round-1 missing #6: the eval
stack had only ever run against synthetic weights and a fake
tokenizer, leaving templating/stop-token/truncation integration
unprotected).

Produces, in --out (default /tmp/tiny-llama-ruler):
  - a REAL byte-level-BPE tokenizer trained here (tokenizers lib) on
    RULER-style text, saved in HF format (AutoTokenizer loads it),
  - a random-weight 4-layer LlamaForCausalLM saved as safetensors
    (the same loader path as a production checkpoint:
    models/params.py::load_hf_params).

Usage:  python scripts/make_tiny_checkpoint.py [--out DIR]
Also importable: build_tiny_checkpoint(out_dir) (used by
tests/test_eval_e2e.py via a session fixture).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _training_corpus():
    """RULER-flavored text: essay filler, number needles, word lists,
    a bit of chat-template punctuation — everything the e2e prompts
    contain, so the trained merges are realistic."""
    import random

    from shadowkv_tpu.data.wordlists import (
        ADJECTIVES,
        NOUNS,
        VERBS,
        adjective_noun_words,
    )

    rng = random.Random(0)
    filler = (
        "The grass is green. The sky is blue. The sun is yellow. "
        "Here we go. There and back again. "
    )
    # The RULER niah keys are adjective-noun pairs; without the word
    # lists in the corpus the 2048-token BPE splits each key into ~17
    # character-level pieces and the retrieval circuit cannot form
    # (round-3/4 train_tiny: answer loss plateaued at format-only
    # ~4.3). With the words as whole merges a key is ~3 tokens.
    words = adjective_noun_words()
    lines = []
    for i in range(2000):
        key = rng.choice(words)
        parts = [filler]
        parts.append(
            f"One of the special magic numbers for {key} is: "
            f"{rng.randint(1000000, 9999999)}."
        )
        parts.append(
            f"What is the special magic number for {key} mentioned in "
            "the provided text? The special magic number for "
            f"{key} mentioned in the provided text is "
            f"{rng.randint(1000000, 9999999)}"
        )
        lines.append(" ".join(parts))
    # whole-word coverage for every list word (keys mix all of them)
    for _ in range(20):
        lines.append(" ".join(NOUNS + ADJECTIVES + VERBS))
    lines.append("<|begin_of_text|> <|eot_id|> <|end_of_text|> "
                 "<|start_header_id|> <|end_header_id|> user assistant "
                 "system\n\n")
    return lines


def build_tiny_checkpoint(
    out_dir: str, vocab_size: int = 4096, fresh: bool = False
) -> str:
    """Train the tokenizer + save the tiny model. Idempotent: returns
    immediately if out_dir already holds a checkpoint (``fresh=True``
    wipes and rebuilds — the trainer uses it so a stale broken
    checkpoint can never short-circuit a retrain)."""
    if os.path.exists(os.path.join(out_dir, "model.safetensors")):
        if not fresh:
            return out_dir
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    from tokenizers import (
        Tokenizer,
        decoders,
        models,
        pre_tokenizers,
        trainers,
    )
    from transformers import PreTrainedTokenizerFast

    specials = [
        "<|begin_of_text|>", "<|end_of_text|>", "<|eot_id|>",
        "<|start_header_id|>", "<|end_header_id|>",
    ]
    tok = Tokenizer(models.BPE(unk_token=None, byte_fallback=True))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size,
        special_tokens=specials,
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(_training_corpus(), trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        bos_token="<|begin_of_text|>",
        eos_token="<|eot_id|>",
        additional_special_tokens=specials[3:],
    )
    fast.save_pretrained(out_dir)

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=fast.vocab_size,
        # 6 x 1024 with 8 HEADS x HEAD_DIM 128: head_dim must be 128
        # so the oracle exercises the SAME kernel contracts as
        # production (fused refresh + VS tile assume Dh % 128 == 0;
        # the first working dh-64 oracle could only validate the XLA
        # path), and EIGHT heads because the 4-head x 128 variant
        # failed to form the retrieval circuit under the identical
        # curriculum that cracked with 8 heads (train_tiny_r5 dense
        # acc 0.02-0.07 vs 0.10-0.16 — induction needs head roles).
        hidden_size=1024,
        intermediate_size=2048,
        num_hidden_layers=6,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=8192,
        # theta 10000 (not the llama-3 500000): both dh-128 oracle
        # attempts at theta 5e5 failed to form the retrieval circuit
        # under the curriculum that cracked at dh 64 — the flatter
        # rotation spectrum appears to starve position-matching heads
        # at small scale. 10000 is plenty for the 4K eval context and
        # changes nothing the engine cares about (theta is ModelConfig
        # data).
        rope_theta=10000.0,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        torch_dtype=torch.float32,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg)
    model.save_pretrained(out_dir, safe_serialization=True)
    return out_dir


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/tiny-llama-ruler")
    ap.add_argument("--vocab", type=int, default=4096)
    args = ap.parse_args()
    path = build_tiny_checkpoint(args.out, args.vocab)
    print(f"tiny checkpoint at {path}")
