"""End-to-end accuracy-harness integration on a REAL (tiny) HF
checkpoint + REAL trained tokenizer (VERDICT round-1 missing #6).

Exercises the full reference pipeline on CPU: AutoTokenizer load,
config.json-driven ModelConfig, safetensors weight loading, RULER task
generation + length calibration against the real tokenizer, prompt
templating, batched shadow prefill/decode, stop-token handling, metric
scoring, and the jsonl archive — none of which synthetic-weight tests
touch. A random-weight model scores ~0; the assertion is that every
stage RUNS and produces schema-correct scored records.
"""

from __future__ import annotations

import json
import os
import sys

import pytest


@pytest.fixture(scope="session")
def tiny_ckpt(tmp_path_factory):
    from scripts.make_tiny_checkpoint import build_tiny_checkpoint

    # /tmp cache shared across test sessions (build is ~20 s)
    return build_tiny_checkpoint("/tmp/tiny-llama-ruler")


@pytest.mark.slow
def test_eval_acc_ruler_niah_on_real_checkpoint(
    tiny_ckpt, tmp_path, monkeypatch
):
    monkeypatch.chdir(tmp_path)
    argv = [
        "eval_acc",
        "--model_name", "meta-llama/Llama-3-tiny",
        "--model_dir", tiny_ckpt,
        "--datalen", "4096",
        "--num_samples", "2",
        "--method", "shadow",
        "--sparse_budget", "512",
        "--rank", "32",
        "--chunk_size", "8",
        "--dataset_name", "ruler/niah_single_1",
        "--bucket", "512",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    from shadowkv_tpu.entry.eval_acc import main

    main()

    out = (
        tmp_path / "archive" / "Llama-3-tiny" /
        "ruler/niah_single_1_4096_shadow_512_32_8.jsonl"
    )
    assert out.exists(), list((tmp_path / "archive").rglob("*"))
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert len(recs) == 2
    for r in recs:
        # reference archive schema (test/eval_acc.py records the scored
        # prediction per sample)
        assert set(r) >= {"prediction", "ground_truth", "correct",
                          "avg_score"}, r.keys()
        assert 0.0 <= float(r["avg_score"]) <= 100.0
        assert r["prediction"] and r["ground_truth"]


def test_tokenizer_roundtrip_and_template(tiny_ckpt):
    """The trained tokenizer + llama3 chat template integrate: encode
    -> decode round-trips text, and the template's special tokens map
    to single ids (a fake-tokenizer suite can't check this)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tiny_ckpt)
    text = "One of the special magic numbers for key-7 is: 5309."
    ids = tok.encode(text, add_special_tokens=False)
    assert tok.decode(ids) == text
    eot = tok.convert_tokens_to_ids("<|eot_id|>")
    assert isinstance(eot, int) and eot >= 0
