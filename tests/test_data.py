"""Tests for the data layer: metrics, RULER generators, Dataset,
Evaluator plumbing. Runs tokenizer-free via a whitespace FakeTokenizer."""

from __future__ import annotations

import json

import numpy as np
import pytest

from shadowkv_tpu.data import metrics
from shadowkv_tpu.data.dataset import Dataset, middle_truncate
from shadowkv_tpu.data.ruler.generate import TASK_CONFIGS, generate_task
from shadowkv_tpu.eval.evaluator import DistConfig, Evaluator


class FakeTokenizer:
    """Reversible whitespace tokenizer for offline tests."""

    name_or_path = "fake-llama-3"

    def __init__(self):
        self.vocab: dict[str, int] = {}
        self.words: list[str] = []

    def encode(self, text, add_special_tokens=False, **kw):
        ids = []
        for w in text.split(" "):
            if w not in self.vocab:
                self.vocab[w] = len(self.words)
                self.words.append(w)
            ids.append(self.vocab[w])
        return ids

    def decode(self, ids, skip_special_tokens=False):
        return " ".join(self.words[i] for i in ids)


# -- metrics ---------------------------------------------------------------


def test_needle_score():
    assert metrics.needle_score("The number is 1234567.", "1234567") == 1.0
    assert metrics.needle_score("1234567 is it", "1234567") == 1.0
    assert metrics.needle_score("nope 999", "1234567") == 0.0


def test_string_match_part():
    assert metrics.string_match_part("Paris<|eot_id|>", ["paris"]) == 1.0
    assert metrics.string_match_part("It is Paris, yes", ["Paris"]) == 1.0
    assert metrics.string_match_part("London", ["Paris"]) == 0.0


def test_multi_number_and_words():
    assert metrics.multi_number("I saw 11 and 22", ["11", "22"]) == 1.0
    assert metrics.multi_number("only 11", ["11", "22"]) == 0.5
    assert metrics.multi_words("apple banana", ["apple", "kiwi"]) == 0.5


def test_metric_dispatch():
    assert metrics.metric_for("ruler/niah_multiquery") is metrics.multi_number
    assert metrics.metric_for("ruler/niah_single_1") is metrics.needle_score
    assert metrics.metric_for("ruler/qa_2") is metrics.string_match_part
    assert metrics.gen_len_for("ruler/vt") == 30
    assert metrics.gen_len_for("niah") == 10


# -- generators --------------------------------------------------------------


@pytest.mark.parametrize(
    "task", ["niah_single_1", "niah_multikey_1", "niah_multivalue",
             "niah_multiquery", "vt", "cwe", "fwe", "qa_1"]
)
def test_generator_fits_and_answers(task):
    tok = FakeTokenizer()
    samples = generate_task(task, tok, 2048, 3, seed=1)
    assert len(samples) == 3
    for s in samples:
        assert s["length"] <= 2048 + 64
        assert len(tok.encode(s["input"])) <= 2048
        outs = s["outputs"] if isinstance(s["outputs"], list) else [s["outputs"]]
        assert outs
        for ans in outs:
            assert str(ans) in s["input"], f"{task}: answer not embedded"


def test_generator_model_template():
    tok = FakeTokenizer()
    s = generate_task(
        "niah_single_1", tok, 1024, 1, seed=0,
        model_template="<U>{ctx}</U>",
    )[0]
    assert s["input"].startswith("<U>") and s["input"].endswith("</U>")


def test_all_task_configs_generate():
    tok = FakeTokenizer()
    for task in TASK_CONFIGS:
        samples = generate_task(task, tok, 512, 1, seed=0)
        assert samples and samples[0]["input"]


# -- dataset -----------------------------------------------------------------


def test_middle_truncate():
    ids = np.arange(10)
    out = middle_truncate(ids, 4)
    assert list(out) == [0, 1, 8, 9]
    assert list(middle_truncate(ids, 20)) == list(ids)


def test_dataset_ruler_generation_and_shard():
    tok = FakeTokenizer()
    ds = Dataset("ruler/niah_single_1", tok, 8192, num_samples=4,
                 bucket=0)
    assert len(ds) == 4
    assert ds.gen_len == 128
    ids, gt = ds[0]
    assert ids.dtype == np.int32
    ds.shard(0, 2)
    assert len(ds) == 2


def test_dataset_bucket():
    tok = FakeTokenizer()
    ds = Dataset("ruler/vt", tok, 8192, num_samples=2, bucket=512)
    for row in ds.tokenized_prompts:
        assert len(row) % 512 == 0


# -- evaluator ----------------------------------------------------------------


class EchoLLM:
    """Replies with the ground truth it is fed (by peeking the dataset)."""

    model_name = "echo"
    batch_size = 1

    def __init__(self, answers):
        self.answers = [
            a if isinstance(a, str) else " ".join(a) for a in answers
        ]
        self.calls = 0

    def generate(self, batch, gen_len=0, temperature=0.0, top_p=1.0):
        out = [self.answers[self.calls]]
        self.calls += 1
        return out


def test_evaluator_roundtrip(tmp_path):
    tok = FakeTokenizer()
    ds = Dataset("ruler/niah_single_1", tok, 8192, num_samples=3, bucket=0)
    llm = EchoLLM([g if isinstance(g, str) else g[0] for g in ds.gt])
    ev = Evaluator(DistConfig(False, 0, 1, True))
    out = tmp_path / "a.jsonl"
    score = ev.test(llm, ds, str(out))
    assert score == 1.0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 3
    table = ev.summarize()
    assert table and "1.0000" in table


def test_evaluator_resume_skips_completed_steps(tmp_path):
    """resume=True restores completed steps from the jsonl archive
    (dropping a torn tail line) and only generates the remainder."""
    tok = FakeTokenizer()
    ds = Dataset("ruler/niah_single_1", tok, 8192, num_samples=4, bucket=0)
    answers = [g if isinstance(g, str) else g[0] for g in ds.gt]
    ev = Evaluator(DistConfig(False, 0, 1, True))
    out = tmp_path / "a.jsonl"

    # First (interrupted) run: 2 of 4 steps archived, then a torn line.
    llm = EchoLLM(answers)
    full_ds = Dataset(
        "ruler/niah_single_1", tok, 8192, num_samples=2, bucket=0
    )
    full_ds.tokenized_prompts = ds.tokenized_prompts[:2]
    full_ds.gt = ds.gt[:2]
    ev.test(llm, full_ds, str(out))
    with open(out, "a") as f:
        f.write('{"prediction": ["torn')  # mid-write crash

    # Resumed run: EchoLLM must only be asked for steps 2 and 3.
    llm2 = EchoLLM(answers[2:])
    score = ev.test(llm2, ds, str(out), resume=True)
    assert llm2.calls == 2
    assert score == 1.0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 4

    # resume over a COMPLETE archive regenerates nothing.
    llm3 = EchoLLM([])
    score = ev.test(llm3, ds, str(out), resume=True)
    assert llm3.calls == 0 and score == 1.0


# -- longbench / infinibench templates ----------------------------------------


def test_infini_bench_prompt_assembly():
    from shadowkv_tpu.data.longbench import infini_bench_prompt

    p = infini_bench_prompt(
        dict(input='Find the key "abc123" here', context="{...json...}"),
        "kv_retrieval",
    )
    assert "abc123" in p and "{...json...}" in p
    p = infini_bench_prompt(
        dict(input="compute func_3(7) now", context="def func_3(x): ..."),
        "code_run",
    )
    assert "func_3(7)" in p
    p = infini_bench_prompt(
        dict(input="Q?", context="book", options=["a", "b", "c", "d"]),
        "longbook_choice_eng",
    )
    assert "A. a" in p and "D. d" in p


# -- niah grid + viz -----------------------------------------------------------


def test_niah_grid_and_viz(tmp_path):
    from shadowkv_tpu.data.niah import build_niah_grid
    from shadowkv_tpu.data.viz import load_grid, render

    tok = FakeTokenizer()
    samples = build_niah_grid(
        tok, max_context=2048, min_context=512,
        n_context_intervals=3, n_depth_intervals=3, seed=0,
    )
    assert len(samples) == 9
    for s in samples:
        assert s["outputs"] in s["input"]  # needle embedded
        assert "special magic" in s["input"]

    ds = Dataset.__new__(Dataset)  # assemble an evaluator record directly
    import json as _json

    arch = tmp_path / "niah.jsonl"
    with open(arch, "w") as f:
        f.write(_json.dumps({
            "context_length": [s["context_length"] for s in samples],
            "depth_percent": [s["depth_percent"] for s in samples],
            "correct": [1.0] * len(samples),
        }) + "\n")
    grid = load_grid(str(arch))
    assert len(grid) == 9 and all(v == 1.0 for v in grid.values())
    out = tmp_path / "h.png"
    render(str(arch), str(out))
    assert out.exists() and out.stat().st_size > 0
