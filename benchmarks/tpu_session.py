"""One-command TPU measurement session for everything hardware-gated.

Runs, SEQUENTIALLY (one TPU job at a time — concurrent processes OOM
each other through the axon tunnel), each pending measurement as a
subprocess and appends results to benchmarks/tpu_session_results.jsonl.
Skips stages already recorded (delete lines to re-run). Designed to be
resumable: the tunnel dying mid-session loses only the current stage.

    python benchmarks/tpu_session.py [--stages s1,s2,...] [--list]

Stages:
  probe_host     probe_host_dma.py — pinned_host + Pallas HOST operands
  probe_hostdus  probe_host_dus.py — host-space jit dus + pin bandwidths
                 (offload admission / incremental-prefill strategy)
  bench_xla      bench.py default (122K, int8, b1 full vs b4 shadow)
  bench_ring     bench.py BENCH_RING=1 (ring-DMA chunk gather)
  bench_pallas   bench.py BENCH_USE_PALLAS=1 (fused refresh kernel)
  bench_vs       bench.py BENCH_PREFILL=vs (MInference dynamic sparse
                 prefill — prefill-time comparison vs dense-splash)
  bench_offload_b6_ring    shadow_offload batch 6 + ring gather (host-V
                 batch enlargement past the b4 HBM ceiling)
  bench_offload_b8_ring    shadow_offload batch 8 + ring gather
  bench_offload_b6_pallas  shadow_offload batch 6 + fused refresh
  bench_serve    bench.py BENCH_MODE=serve (continuous batching)
  bench_serve_offload  serve + shadow_offload + ring gather (host V
                 store with admission slot updates)
  kernel_tests   SHADOWKV_TPU_TESTS=1 pytest tests/test_kernel_tpu.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benchmarks", "tpu_session_results.jsonl")

STAGES = {
    "probe_host": {
        "cmd": [sys.executable, "benchmarks/probe_host_dma.py"],
        "env": {},
        "timeout": 1800,
    },
    "probe_hostdus": {
        "cmd": [sys.executable, "benchmarks/probe_host_dus.py"],
        "env": {},
        "timeout": 1800,
    },
    "probe_host_layouts": {
        "cmd": [sys.executable, "benchmarks/probe_host_layouts.py"],
        "env": {},
        "timeout": 2400,
    },
    # Compile-only HBM-fit probes (AOT memory_analysis): ~1-2 min each
    # vs a failed 20-min bench. Run before their bench stages.
    "probe_mem_8b": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {"BENCH_MODEL": "8b", "BENCH_SHADOW_BATCH": "1"},
        "timeout": 2400,
    },
    "probe_mem_wq8_b5": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {"BENCH_WQUANT": "int8", "BENCH_SHADOW_BATCH": "5"},
        "timeout": 2400,
    },
    "probe_mem_244k": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {
            "BENCH_DATALEN": "249856",
            "BENCH_SHADOW_BATCH": "2",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 2400,
    },
    "bench_xla": {
        "cmd": [sys.executable, "bench.py"],
        "env": {},
        "timeout": 3600,
    },
    "bench_ring": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_RING": "1", "BENCH_MODE": "shadow"},
        "timeout": 3600,
    },
    "bench_pallas": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_USE_PALLAS": "1", "BENCH_MODE": "shadow"},
        "timeout": 3600,
    },
    # High-locality regime: greedy decoding on synthetic weights
    # converges to a repeating continuation, so chunk selection
    # stabilizes (~the reference's real-workload ~60-99 % hit regime,
    # index.html:326) — the fused kernel's hit-skip machinery should
    # WIN here, where bench_pallas (temp 0.6, ~3 % hits) loses.
    "bench_pallas_hot": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_USE_PALLAS": "1",
            "BENCH_MODE": "shadow",
            "BENCH_TEMP": "0",
        },
        "timeout": 3600,
    },
    "bench_xla_hot": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_TEMP": "0"},
        "timeout": 3600,
    },
    "bench_vs": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_PREFILL": "vs", "BENCH_MODE": "shadow"},
        "timeout": 3600,
    },
    # Batch enlargement via host offload (the reference's headline
    # mechanism, index.html:147): the int8 V store is ~2 GB per batch
    # element at 122K — moving it to pinned host DRAM frees HBM for
    # more slots. Net win depends on the measured host->HBM DMA
    # bandwidth (probe_host) vs the per-step miss traffic
    # (~2048*128B*8heads*16layers*B at the bench's ~3 % hit rate).
    "bench_offload_b6_ring": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_CACHE_MODE": "shadow_offload",
            "BENCH_RING": "1",
            "BENCH_SHADOW_BATCH": "6",
        },
        "timeout": 3600,
    },
    "bench_offload_b8_ring": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_CACHE_MODE": "shadow_offload",
            "BENCH_RING": "1",
            "BENCH_SHADOW_BATCH": "8",
        },
        "timeout": 4200,
    },
    "bench_offload_b6_pallas": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_CACHE_MODE": "shadow_offload",
            "BENCH_USE_PALLAS": "1",
            "BENCH_SHADOW_BATCH": "6",
        },
        "timeout": 3600,
    },
    # Weight-only int8 dense path (core/wquant.py): halves weight-read
    # bytes in weight-bound decode and frees ~1.4 GB of HBM on the
    # bench model — b5 probes whether that buys another batch slot
    # past the b4 prefill-peak ceiling.
    "bench_wq8": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_WQUANT": "int8"},
        "timeout": 3600,
    },
    "bench_wq8_b5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WQUANT": "int8",
            "BENCH_SHADOW_BATCH": "5",
        },
        "timeout": 3600,
    },
    # The reference's e2e table covers 60K/122K/244K (test/e2e.py:35-116,
    # index.html:180-260). 60K: full fits b2, shadow b6. 244K: full
    # attention cannot fit AT ALL on a 16 GB chip (bf16 KV alone is
    # 16 GB at b1) — shadow-only, which IS the story (context length
    # only shadow enables); int8 weights free headroom for b2.
    "bench_60k": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_DATALEN": "61440",
            "BENCH_FULL_BATCH": "2",
            "BENCH_SHADOW_BATCH": "6",
        },
        "timeout": 3600,
    },
    # 60K shadow headroom: a 60K slot is ~half a 122K slot, so the b4
    # 122K ceiling maps to ~b8 here (prefill is per-element
    # sub-batched; the store commit is what scales with B).
    "bench_60k_b8": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "8",
        },
        "timeout": 3600,
    },
    "bench_244k": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            # b2 does not fit HBM at 244K (probe_mem_244k: prefill_sub1
            # compile OOM) and the host-offload ring is blocked by the
            # platform's dynamic host-DMA constraint (probe_host_min:
            # sub-32-bit dynamic host fetches are unimplementable) —
            # b1 HBM is the feasible 244K row (round-1: 66.7 tok/s).
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "249856",
            "BENCH_SHADOW_BATCH": "1",
        },
        "timeout": 5400,
    },
    # THE north-star metric's model: exact Llama-3.1-8B dims at 122K
    # on one chip. bf16 weights alone are 16 GB — int8 weights + the
    # shadow cache are what make this runnable at all (full attention
    # has no feasible batch). Shadow-only, b1.
    "bench_8b": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_MODEL": "8b",
            "BENCH_SHADOW_BATCH": "1",
        },
        "timeout": 7200,
    },
    # 8B + host-offloaded V: the HBM-resident 8B config OOMs at
    # prefill even with int8 weights (round-2 probe) — moving the 4 GB
    # V store to pinned host DRAM is what makes the reference's model
    # scale fit a 16 GB chip at 122K (the ShadowKV headline mechanism).
    "bench_8b_offload": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_MODEL": "8b",
            "BENCH_CACHE_MODE": "shadow_offload",
            "BENCH_RING": "1",
            "BENCH_SHADOW_BATCH": "1",
            # evict V per 4-layer segment: whole-store (4 GB) and even
            # whole-sub-batch eviction still OOM'd 122K prefill next to
            # 8 GB of int8 weights (round-2 logs)
            "BENCH_OFFLOAD_SEGMENTS": "8",
        },
        "timeout": 9000,
    },
    # The reference's model scale on THIS chip: 8B (32L/4096d/32H/8KV)
    # at 60K, int8 weights. 122K needs tp=2 (prefill OOM, probe_mem_8b)
    # but 60K fits b1 — full-attention baseline AND shadow in one run
    # gives the 8B speedup ratio at the reference's model size.
    "probe_mem_8b_60k": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {
            "BENCH_MODEL": "8b",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "1",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 2400,
    },
    "bench_8b_60k": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODEL": "8b",
            "BENCH_DATALEN": "61440",
            "BENCH_FULL_BATCH": "1",
            "BENCH_SHADOW_BATCH": "1",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 7200,
    },
    # GLM-4 head layout (4 KV groups, partial interleaved RoPE, QKV
    # bias): half the KV state of the llama shape -> b6; exercises the
    # GLM reconstruction-kernel variant e2e (reference glm.py).
    "bench_glm": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_FAMILY": "glm",
            "BENCH_SHADOW_BATCH": "6",
        },
        "timeout": 3600,
    },
    "bench_serve": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100"},
        "timeout": 5400,
    },
    # Shared-context serving (prompt cache): every request = one
    # shared 122K document + a 16-token suffix; admissions clone the
    # context snapshot instead of re-prefilling. The static baseline
    # pays a full prefill per request — the gap IS the feature.
    "bench_serve_ctx": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "serve",
            "BENCH_CONTEXT": "1",
            "BENCH_DECODE_STEPS": "100",
            "BENCH_SHADOW_BATCH": "3",
        },
        "timeout": 7200,
    },
    "bench_serve_offload": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "serve",
            "BENCH_CACHE_MODE": "shadow_offload",
            "BENCH_RING": "1",
            "BENCH_DECODE_STEPS": "100",
        },
        "timeout": 7200,
    },
    "prof_prefill_attn": {
        "cmd": [sys.executable, "benchmarks/prof_prefill_attn.py"],
        "env": {},
        "timeout": 3600,
    },
    # Per-HLO-op decode attribution at the bench config: the targeting
    # data for the decode-step optimization round (VERDICT #4).
    "prof_trace_decode": {
        "cmd": [sys.executable, "benchmarks/prof_trace_decode.py"],
        "env": {},
        "timeout": 3600,
    },
    "prof_ablate": {
        "cmd": [sys.executable, "benchmarks/prof_ablate.py", "122880",
                "4"],
        "env": {},
        "timeout": 3600,
    },
    "kernel_tests": {
        "cmd": [
            sys.executable, "-m", "pytest", "tests/test_kernel_tpu.py",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 3600,
    },
    # ----- round 3 ---------------------------------------------------------
    # Kernel tests again on round-3 HEAD (adds the compiled vs_tile
    # parity test — run FIRST: small-scale validation before any 122K
    # launch of the new kernel).
    "kernel_tests_r3": {
        "cmd": [
            sys.executable, "-m", "pytest", "tests/test_kernel_tpu.py",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 3600,
    },
    # Decomposed VS kernel at 122K: s/call vs dense splash 0.448 /
    # stream 0.064 (prof_prefill_attn), clustered + random metadata.
    "prof_vs_tile": {
        "cmd": [
            sys.executable, "benchmarks/prof_vs_kernel.py",
            "tilec122", "tile122",
        ],
        "env": {},
        "timeout": 3600,
    },
    # MInference VS prefill end-to-end at 122K on the tile path (the
    # round-2 bench_vs faulted the device on the walk kernel).
    "bench_vs_r3": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_PREFILL": "vs", "BENCH_MODE": "shadow"},
        "timeout": 5400,
    },
    # Sink+window sparse prefill e2e (stream splash measured 7x faster
    # than dense PER CALL in prof_prefill_attn — round 2's slow e2e
    # number predates the current call form; re-measure).
    "bench_stream": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_PREFILL": "stream", "BENCH_MODE": "shadow"},
        "timeout": 5400,
    },
    # Round-3 baseline re-run (decode single-stacked-commit + estimator
    # changes ride along).
    "bench_xla_r3": {
        "cmd": [sys.executable, "bench.py"],
        "env": {},
        "timeout": 3600,
    },
    # wq8 prefill after the chunked-MLP dequant hoist (round 2: 238.5 s
    # vs 90.9 s dense — the fix should close most of the gap).
    "bench_wq8_r3": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_WQUANT": "int8"},
        "timeout": 3600,
    },
    # Serving with adaptive steps_per_dispatch (VERDICT #10).
    "bench_serve_r3": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100"},
        "timeout": 5400,
    },
    # Yi-9B-200K family row at bench scale (VERDICT #8).
    "bench_yi": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_FAMILY": "yi",
            "BENCH_SHADOW_BATCH": "6",
        },
        "timeout": 3600,
    },
    # Train the tiny retrieval model (VERDICT #3) — minutes on chip.
    "train_tiny": {
        "cmd": [
            sys.executable, "scripts/train_tiny_model.py",
            "--steps", "1500", "--ctx", "4096", "--batch", "2",
        ],
        "env": {},
        "timeout": 7200,
    },
    # Accuracy oracle on the TRAINED model: full vs shadow RULER
    # niah_single_1 at 4K; shadow also samples the real hit rate.
    "eval_tiny_full": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "full", "--bucket", "1024",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_shadow": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Ring decode one-step trace (VERDICT #7: find the 23 tok/s e2e
    # loss behind the 476 GB/s microbench).
    "prof_ring_decode": {
        "cmd": [sys.executable, "benchmarks/prof_ring_decode.py"],
        "env": {},
        "timeout": 3600,
    },
    # 8B@122K segmented-offload AOT byte accounting (VERDICT #6).
    "probe_8b_offload_aot": {
        "cmd": [sys.executable, "benchmarks/probe_8b_offload_aot.py"],
        "env": {},
        "timeout": 3600,
    },
    # 60K b8 regression diagnosis (VERDICT #4): decode trace at b6 / b8.
    "prof_decode_60k_b6": {
        "cmd": [sys.executable, "benchmarks/prof_trace_decode.py"],
        "env": {"PROF_DATALEN": "61440", "PROF_BATCH": "6"},
        "timeout": 3600,
    },
    "prof_decode_60k_b8": {
        "cmd": [sys.executable, "benchmarks/prof_trace_decode.py"],
        "env": {"PROF_DATALEN": "61440", "PROF_BATCH": "8"},
        "timeout": 3600,
    },
    # ----- round 3b --------------------------------------------------------
    # Ring-vs-XLA decode step isolated (VERDICT #7) — rewritten after
    # the 30 GiB-argument OOM (host-side leaf fill + donated cache).
    "prof_ring_decode_r3": {
        "cmd": [sys.executable, "benchmarks/prof_ring_decode.py"],
        "env": {},
        "timeout": 3600,
    },
    # 8B@122K segmented-offload AOT accounting (VERDICT #6) — fixed
    # cos-table shape + tiled ring store layout.
    "probe_8b_offload_aot_r3": {
        "cmd": [sys.executable, "benchmarks/probe_8b_offload_aot.py"],
        "env": {},
        "timeout": 3600,
    },
    # Kernel tests on top of f890691 (refresh kernel batched
    # write-backs) — that commit postdates kernel_tests_r3.
    "kernel_tests_r3b": {
        "cmd": [
            sys.executable, "-m", "pytest", "tests/test_kernel_tpu.py",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 3600,
    },
    # Warm-prefill decomposition: cold(=compile+run) vs warm prefill for
    # dense / stream / vs. Both sparse paths landed ~120 s over dense
    # one-shot despite 2-7x faster per-call kernels — hypothesis: the
    # sparse splash programs compile far slower through the tunnel.
    "bench_xla_warm": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1"},
        "timeout": 5400,
    },
    "bench_stream_warm": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_PREFILL": "stream", "BENCH_MODE": "shadow",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    "bench_vs_warm": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_PREFILL": "vs", "BENCH_MODE": "shadow",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # Retrain the tiny model with the answer-weighted curriculum
    # trainer (b2b3707 postdates the 0.0-scoring train_tiny run).
    "train_tiny_r2": {
        "cmd": [
            sys.executable, "scripts/train_tiny_model.py",
            "--steps", "2000", "--ctx", "4096", "--batch", "2",
        ],
        "env": {},
        "timeout": 7200,
    },
    "eval_tiny_full_r2": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "full", "--bucket", "1024",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_shadow_r2": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Serving after the scanned k-step decode chunk (b2b3707 postdates
    # bench_serve_r3's 3.7 tok/s).
    # ----- round 3c --------------------------------------------------------
    # Headline re-measurement after the segmented-attention regression
    # fix (f50f151): probe_decode_variants already shows 22.1 ms/step
    # restored; this records the bench-contract number (warm prefill).
    "bench_xla_r3c": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1"},
        "timeout": 5400,
    },
    # ApproxTopK recall at the new mult8 default (mult4 measured 0.944
    # < 0.95 in kernel_tests_r3b).
    "kernel_recall_r3c": {
        "cmd": [
            sys.executable, "-m", "pytest",
            "tests/test_kernel_tpu.py::test_approx_topk_recall",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 3600,
    },
    # VS prefill at the REALISTIC pattern operating point (VERDICT #1):
    # vs_sim=clustered replaces the estimated scores with the
    # diagonal-decaying structure real checkpoints produce (estimation
    # still runs/timed). Compare warm prefill vs bench_xla_r3c's dense.
    "bench_vs_sim": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_PREFILL": "vs", "BENCH_VS_SIM": "clustered",
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # Ring-vs-XLA decode isolated on CLEAN code: prof_ring_decode_r3's
    # 96/98.6 ms numbers ran with the segmented-attention regression in
    # the working tree (both paths 4x off); re-measure at the true
    # ~22 ms scale to answer VERDICT #7 (use ring if it wins).
    "prof_ring_decode_r3c": {
        "cmd": [sys.executable, "benchmarks/prof_ring_decode.py"],
        "env": {},
        "timeout": 3600,
    },
    # 60K re-baseline with the ApproxTopK mult8 override (the 2.7 ms
    # full-sort fallback at C=7680 was the largest single op in
    # prof_decode_60k_b6) — VERDICT #4's weak row.
    "bench_60k_r3c": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_DATALEN": "61440", "BENCH_FULL_BATCH": "2",
            "BENCH_SHADOW_BATCH": "6", "BENCH_MODE": "shadow",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    "bench_60k_b8_r3c": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_DATALEN": "61440", "BENCH_SHADOW_BATCH": "8",
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # chunk_size=16: same 2048-token budget in half the chunks —
    # doubles the latency-bound gathered row and halves selection
    # work (decode gathers ~5 ms + selection ~2.5 ms of the 22 ms
    # step are the two largest sparse-path items).
    "bench_cs16_r3c": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
            "BENCH_CHUNK_SIZE": "16",
        },
        "timeout": 5400,
    },
    # Decode-layer ablation, fixed to the bench's dense-splash prefill
    # (the 'dense' default OOM'd b4/122K) — VERDICT #4 decomposition.
    "prof_ablate_r3c": {
        "cmd": [sys.executable, "benchmarks/prof_ablate.py", "122880", "4"],
        "env": {},
        "timeout": 5400,
    },
    "bench_serve_r3b": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100"},
        "timeout": 5400,
    },
    # ----- round 4 ---------------------------------------------------------
    # Exact-vs-approx top-k A/B at the headline config (VERDICT #2):
    # the default flipped to EXACT (config.py approx_topk=False,
    # reference kv_cache.py:1031-1035); the pair records the tok/s
    # delta that justifies it.
    "bench_xla_exact_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1"},
        "timeout": 5400,
    },
    "bench_xla_approx_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
            "BENCH_APPROX_TOPK": "1",
        },
        "timeout": 5400,
    },
    # Kernel tests green at the new defaults (mult=0 stock approx).
    "kernel_tests_r4": {
        "cmd": [
            sys.executable, "-m", "pytest",
            "tests/test_kernel_tpu.py", "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 5400,
    },
    # Rebuild + retrain the oracle from scratch (r2 trainer still
    # plateaued at format-only answer loss ~4.3): word-covering
    # tokenizer (RULER keys ~3 tokens, not ~17 char pieces), 6x512
    # geometry, early-advance curriculum. --fresh wipes the stale
    # checkpoint so the idempotent builder cannot short-circuit.
    "train_tiny_r4": {
        "cmd": [
            sys.executable, "scripts/train_tiny_model.py",
            "--steps", "2000", "--ctx", "4096", "--batch", "2",
            "--fresh",
        ],
        "env": {},
        "timeout": 10800,
    },
    "eval_tiny_full_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "full", "--bucket", "1024",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_shadow_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Accuracy oracle variants (VERDICT #1): each lossy knob scored
    # against the trained tiny model. Require train_tiny_r4's
    # checkpoint at /tmp/tiny-llama-trained.
    "eval_tiny_stream_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            # sink+window cover ~27% of the 4K context — comparable
            # aggressiveness to 1K+8K at the 122K bench length
            "--minference", "stream",
            "--stream_sink", "64", "--stream_window", "1024",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_approx_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024", "--approx_topk", "1",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_int8_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--kv_quant", "int8",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_cs16_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "16",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Decode trace at the round-4 default config (cs16 + mult2): aim
    # the next optimization at the new per-term breakdown.
    "prof_trace_decode_r4": {
        "cmd": [
            sys.executable, "benchmarks/prof_trace_decode.py",
            "122880", "4",
        ],
        "env": {"BENCH_CHUNK_SIZE": "16"},
        "timeout": 5400,
    },
    # GLM/Yi shadow rows at the round-4 defaults (cs16 + mult2; the
    # r3 rows predate both).
    "bench_glm_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_FAMILY": "glm",
            "BENCH_SHADOW_BATCH": "6", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    "bench_yi_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_FAMILY": "yi",
            "BENCH_SHADOW_BATCH": "6", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # cs32: 8 KB gathered rows, 64 slots — the next point on the
    # chunk-granularity axis (cs16 measured +6.5% at equal oracle
    # accuracy); eval_tiny_cs32_r4 guards the accuracy side.
    "bench_cs32_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
            "BENCH_CHUNK_SIZE": "32",
        },
        "timeout": 5400,
    },
    "eval_tiny_cs32_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "32",
        ],
        "env": {},
        "timeout": 5400,
    },
    # 7th ablate attempt: whole-step jit now DONATES the cache (the
    # pass-through stores doubled without it — the r4c OOM).
    "prof_ablate_r4d": {
        "cmd": [
            sys.executable, "benchmarks/prof_ablate.py", "122880", "4",
        ],
        "env": {"BENCH_CHUNK_SIZE": "16"},
        "timeout": 5400,
    },
    # E2E decode at the reference's real-model locality (~60 % hits,
    # index.html:326) via BENCH_HIT_RATE forced selection: the fused
    # kernel's first e2e WIN (262.3 vs 215.1 tok/s measured 20:3x).
    "bench_kernel_hit60": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
            "BENCH_HIT_RATE": "0.6", "BENCH_USE_PALLAS": "1",
        },
        "timeout": 5400,
    },
    "bench_xla_hit60": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1",
            "BENCH_HIT_RATE": "0.6",
        },
        "timeout": 5400,
    },
    "bench_60k_kernel_hit60": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "6", "BENCH_PREFILL_WARM": "1",
            "BENCH_HIT_RATE": "0.6", "BENCH_USE_PALLAS": "1",
        },
        "timeout": 5400,
    },
    "bench_glm_kernel_hit60": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_FAMILY": "glm",
            "BENCH_SHADOW_BATCH": "6", "BENCH_PREFILL_WARM": "1",
            "BENCH_HIT_RATE": "0.6", "BENCH_USE_PALLAS": "1",
        },
        "timeout": 5400,
    },
    # 8th (successful) ablate: flat-chunk-row vs tiled store indexing
    # dispatched by ndim, no 8 GB reshape copy.
    "prof_ablate_r4e": {
        "cmd": [
            sys.executable, "benchmarks/prof_ablate.py", "122880", "4",
        ],
        "env": {"BENCH_CHUNK_SIZE": "16"},
        "timeout": 5400,
    },
    # Re-measures at the round-4 defaults (cs16 + mult2):
    "bench_244k_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_DATALEN": "249856",
            "BENCH_SHADOW_BATCH": "1", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    "bench_8b_60k_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODEL": "8b", "BENCH_DATALEN": "61440",
            "BENCH_MODE": "shadow", "BENCH_SHADOW_BATCH": "1",
            "BENCH_WQUANT": "int8", "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 7200,
    },
    # Serve at cs16 (run_serve previously hardcoded chunk_size 8).
    "bench_serve_cs16_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100",
            "BENCH_SERVE_CHUNK": "8",
        },
        "timeout": 5400,
    },
    # 6th ablate attempt: whole-step/dense first, engine freed before
    # the micro-ablation slices (the r4/r4b OOMs held both at once).
    "prof_ablate_r4c": {
        "cmd": [
            sys.executable, "benchmarks/prof_ablate.py", "122880", "4",
        ],
        "env": {},
        "timeout": 5400,
    },
    # bench_yi_r4 measured a physically impossible 12815 tok/s
    # (decode 0.047 s for 600 toks; warm prefill 13.1 s vs GLM's 101)
    # — re-measure greedy for diagnosis before quoting any r4 Yi row.
    "bench_yi_r4b": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow", "BENCH_FAMILY": "yi",
            "BENCH_SHADOW_BATCH": "6", "BENCH_PREFILL_WARM": "1",
            "BENCH_TEMP": "0",
        },
        "timeout": 5400,
    },
    # dh-128 oracle retrain (the dh-64 model cannot run the fused
    # refresh / VS kernels — Dh % 128 contracts) + the kernel-path
    # accuracy/auto rows it unlocks.
    "train_tiny_r5": {
        "cmd": [
            sys.executable, "scripts/train_tiny_model.py",
            "--steps", "2400", "--ctx", "4096", "--batch", "2",
            "--fresh", "--ckpt-every", "0", "--lr", "3e-4",
        ],
        "env": {},
        "timeout": 10800,
    },
    "eval5_full": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "full", "--bucket", "1024",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval5_shadow": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Fused-kernel decode accuracy (the reference ShadowKVCache
    # architecture end to end) at the bench's cs16/int8 regime.
    "eval5_kernel": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "16", "--kv_quant", "int8",
            "--use_pallas", "1",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval5_auto": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "16", "--kv_quant", "int8",
            "--use_pallas", "auto", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval5_vs": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--minference", "vs",
        ],
        "env": {},
        "timeout": 5400,
    },
    # The auto-path demonstration (round-2/3 open item "auto has never
    # flipped on hardware"): at cs16 the measured crossover is 0.45
    # and the trained oracle's locality is ~0.55 — the EMA should flip
    # the fused kernel ON mid-eval (kernel_now=True in the [hit-rate]
    # line, auto_switches >= 1).
    "eval_tiny_auto_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "16", "--kv_quant", "int8",
            "--use_pallas", "auto", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    "eval_tiny_vs_r4": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--minference", "vs",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Full-attention baselines for the GLM/Yi family rows (VERDICT #7):
    # 4 KV groups halve the dense cache, so b2 may fit — AOT-gated.
    "bench_glm_full_b2": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "glm",
            "BENCH_FULL_BATCH": "2",
        },
        "gate": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "glm",
            "BENCH_FULL_BATCH": "2",
        },
        "timeout": 5400,
    },
    "bench_glm_full_b1": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "glm",
            "BENCH_FULL_BATCH": "1",
        },
        "timeout": 5400,
    },
    "bench_yi_full_b2": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "yi",
            "BENCH_FULL_BATCH": "2",
        },
        "gate": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "yi",
            "BENCH_FULL_BATCH": "2",
        },
        "timeout": 5400,
    },
    "bench_yi_full_b1": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "full", "BENCH_FAMILY": "yi",
            "BENCH_FULL_BATCH": "1",
        },
        "timeout": 5400,
    },
    # Fused refresh kernel re-bench after the batched write-back DMAs
    # (f890691 — no on-chip number exists since; VERDICT #4).
    "bench_pallas_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_USE_PALLAS": "1", "BENCH_MODE": "shadow",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # Kernel-vs-XLA crossover over FORCED hit rates (debug_hit_rate):
    # the first direct measurement of WHERE the fused kernel starts
    # winning — at cs8 (bench default) and cs16 (halved DMA count per
    # byte; the candidate for pushing the crossover under the
    # tiny-model-measured 45.7 %).
    "prof_refresh_sweep": {
        "cmd": [sys.executable, "benchmarks/prof_refresh_sweep.py"],
        "env": {},
        "timeout": 7200,
    },
    "prof_refresh_sweep_cs16": {
        "cmd": [sys.executable, "benchmarks/prof_refresh_sweep.py"],
        "env": {"BENCH_CHUNK_SIZE": "16"},
        "timeout": 7200,
    },
    # Serve dispatch A/B under EQUAL compile-cache state (adjacent
    # stages): absolute serve numbers swung 4.6 -> 3.7 -> 3.5 across
    # rounds while the cold/warm compile state of the 122K programs
    # differed per run; chunk=1 vs chunk=8 back-to-back isolates the
    # scanned k-step dispatch (b2b3707) cleanly.
    "bench_serve_chunk1_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100",
            "BENCH_SERVE_CHUNK": "1",
        },
        "timeout": 5400,
    },
    "bench_serve_chunk8_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "serve", "BENCH_DECODE_STEPS": "100",
            "BENCH_SERVE_CHUNK": "8",
        },
        "timeout": 5400,
    },
    # Per-term decode ablation at the bench config (fixed for the
    # current cache API + flat row views; 4th attempt).
    "prof_ablate_r4": {
        "cmd": [
            sys.executable, "benchmarks/prof_ablate.py", "122880", "4",
        ],
        "env": {},
        "timeout": 5400,
    },
    # 5th attempt: closure-captured cos/sin/lm_scale tables were baked
    # into the jits as multi-GB constants (the r4 OOM); now args.
    "prof_ablate_r4b": {
        "cmd": [
            sys.executable, "benchmarks/prof_ablate.py", "122880", "4",
        ],
        "env": {},
        "timeout": 5400,
    },
    # Top-k variant recall/latency grid (exact 156.0 vs stock-approx
    # 188.4 vs mult8 201.7 tok/s at b4/122K): find the variant with
    # >=0.95 on-chip recall at BOTH bench scales and the least sort
    # time (two-stage candidates included).
    "probe_topk_recall": {
        "cmd": [sys.executable, "benchmarks/probe_topk_recall.py"],
        "env": {},
        "timeout": 3600,
    },
    # Headline at the FINAL selection default (approx + mult2): the
    # probe-picked recall/latency frontier point, expected ~201 tok/s
    # with green recall (probe_topk_recall).
    "bench_xla_mult2_r4": {
        "cmd": [sys.executable, "bench.py"],
        "env": {"BENCH_MODE": "shadow", "BENCH_PREFILL_WARM": "1"},
        "timeout": 5400,
    },
    # 60K b8 knee recovery attempt: the prof_decode_60k_b8 traces show
    # XLA rematerializing the int8 dequant chain past a memory knee
    # (README "60K batch-8 knee"); int8 weights free ~1.4 GB of
    # headroom — if the remat disappears, b8 should beat b6's 202.9.
    "bench_60k_b8_wq8": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "8",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 3600,
    },
    # Compiled validation of the run-batched fetch path (the two
    # tests added after kernel_tests_r4 ran).
    "kernel_tests_r4b": {
        "cmd": [
            sys.executable, "-m", "pytest",
            "tests/test_kernel_tpu.py::test_sparse_refresh_batched_runs_compiled",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 3600,
    },
    # ---- round 5 ----
    # Full compiled kernel suite at HEAD (reconstruct.py grew a debug
    # check and shadow.py's tiled-XLA gather was rewritten).
    "kernel_tests_r5": {
        "cmd": [
            sys.executable, "-m", "pytest", "tests/test_kernel_tpu.py",
            "-q", "--no-header",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 5400,
    },
    # ORGANIC locality (VERDICT r4 #2): trained bench-shape weights +
    # recall-style prompt (scripts/train_bench_weights.py), no
    # BENCH_HIT_RATE forcing. XLA path with hit-rate tracking first...
    "bench_trained_xla_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_TRACK_HIT": "1",
        },
        "timeout": 3600,
    },
    # ...then 'auto' in the same config: the EMA should flip the fused
    # kernel ON (cs16 crossover 0.45) and beat the XLA row above. The
    # b4/122K auto OOM is fixed (whole-tile gather; probe shows 13.4 G
    # peak, was 19.9 G).
    "bench_trained_auto_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_USE_PALLAS": "auto",
        },
        "timeout": 3600,
    },
    # Driver rehearsal at the EXACT driver config (both engines, warm
    # .jax_cache): BENCH_r05.json must parse (VERDICT r4 #1).
    "bench_r5_headline": {
        "cmd": [sys.executable, "bench.py"],
        "env": {},
        "timeout": 3600,
    },
    # VS/MInference prefill with patterns ESTIMATED FROM TRAINED
    # WEIGHTS at bench scale (VERDICT r4 #4: the vs_sim win must
    # become a real-pattern win). Warm prefill A/B vs dense-splash.
    "bench_vs_trained_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_PREFILL": "vs",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    "bench_dense_trained_warm_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_PREFILL_WARM": "1",
        },
        "timeout": 5400,
    },
    # 16K oracle (VERDICT r4 #5): curriculum to 16384, then full vs
    # shadow at the reference's 1.56 % budget ratio (256 @ 16K) —
    # selection over ~2K landmarks/head, the regime 4K never touches.
    "train_tiny16k_r5": {
        "cmd": [
            sys.executable, "scripts/train_tiny_model.py",
            "--steps", "2400", "--ctx", "16384", "--batch", "2",
            "--fresh", "--ckpt-every", "0", "--lr", "3e-4",
            "--out", "/tmp/tiny-llama-16k",
        ],
        "env": {},
        "timeout": 14400,
    },
    "eval16k_full": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-16k",
            "--model_dir", "/tmp/tiny-llama-16k",
            "--datalen", "16384", "--num_samples", "16",
            "--batch_size", "2",
            "--method", "full", "--bucket", "4096",
        ],
        "env": {},
        "timeout": 7200,
    },
    "eval16k_shadow": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-16k",
            "--model_dir", "/tmp/tiny-llama-16k",
            "--datalen", "16384", "--num_samples", "16",
            "--batch_size", "2",
            "--method", "shadow", "--sparse_budget", "256",
            "--rank", "64", "--bucket", "4096", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 7200,
    },
    "eval16k_kernel": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-16k",
            "--model_dir", "/tmp/tiny-llama-16k",
            "--datalen", "16384", "--num_samples", "16",
            "--batch_size", "2",
            "--method", "shadow", "--sparse_budget", "256",
            "--rank", "64", "--bucket", "4096",
            "--chunk_size", "16", "--kv_quant", "int8",
            "--use_pallas", "1", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 7200,
    },
    # Yi full-attention b2 feasibility PROOF (VERDICT r4 #6): the AOT
    # byte table that justifies (or retires) the b1-only baseline.
    "probe_mem_yi_full_b2": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {
            "BENCH_FAMILY": "yi", "BENCH_MODE": "full",
            "BENCH_FULL_BATCH": "2",
        },
        "timeout": 2400,
    },
    # 60K b8 knee, attempt 2 (VERDICT r4 #7): trained weights loaded
    # PRE-QUANTIZED from disk (load_params_npz int8 — no in-loader
    # bf16 copy, no quant jit) frees ~0.9 GB vs bf16 weights; if the
    # dequant remat disappears, b8 should finally beat b6.
    "bench_60k_b8_wq8disk_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "8",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 3600,
    },
    # Same knee test on a SYNTHETIC snapshot (checkpoints/ is
    # gitignored — trained weights don't survive a fresh checkout;
    # the knee is a speed question, trained-ness irrelevant).
    # Measured r5: 161.5 tok/s — the remat persists with the ~0.9 GB
    # freed by disk-side quant, falsifying the headroom hypothesis.
    "gen_bench_npz_syn": {
        "cmd": [sys.executable, "scripts/gen_bench_npz.py"],
        "env": {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
        "timeout": 1800,
    },
    "bench_60k_b8_wq8disk_syn_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "8",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b_syn",
            "BENCH_WQUANT": "int8",
        },
        "timeout": 3600,
    },
    # vs_tile compiled-kernel health alone (the r5 single-launch
    # redesign broke then fixed it; 1 test, ~2 min warm).
    "kernel_tests_vs_tile_r5": {
        "cmd": [
            sys.executable, "-m", "pytest",
            "tests/test_kernel_tpu.py", "-q", "-k", "vs_tile",
        ],
        "env": {"SHADOWKV_TPU_TESTS": "1"},
        "timeout": 1800,
    },
    # Re-time the VS tile kernel AFTER the single-launch redesign
    # (the 2.4x clustered-pattern win was measured on the per-batch
    # launch-loop version).
    "prof_vs_tile_r5": {
        "cmd": [
            sys.executable, "benchmarks/prof_vs_kernel.py",
            "tilec122", "tile122",
        ],
        "env": {},
        "timeout": 3600,
    },
    "bench_60k_b6_trained_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "6",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b",
            "BENCH_TRACK_HIT": "1",
        },
        "timeout": 3600,
    },
    # 8B b2 regime push (VERDICT r4 #8): AOT probe first, bench only
    # if it fits (cs16 + int8 KV + trimmed gen capacity).
    "probe_mem_8b_60k_b2": {
        "cmd": [sys.executable, "benchmarks/probe_memory.py"],
        "env": {
            "BENCH_MODEL": "8b", "BENCH_DATALEN": "61440",
            "BENCH_SHADOW_BATCH": "2", "BENCH_GEN_CAPACITY": "128",
        },
        "timeout": 2400,
    },
    # Selection hysteresis (round-5 beyond-reference mechanism):
    # accuracy validation on the trained oracle FIRST (score must
    # equal full's 0.65), then the organic-locality runs at bench
    # scale. h=0.3: a challenger must carry 30 % more attention mass
    # than a resident to evict it.
    "eval5_hyst": {
        "cmd": [
            sys.executable, "-m", "shadowkv_tpu.entry.eval_acc",
            "--model_name", "tiny-llama-trained",
            "--model_dir", "/tmp/tiny-llama-trained",
            "--datalen", "4096", "--num_samples", "20",
            "--batch_size", "4",
            "--method", "shadow", "--sparse_budget", "512",
            "--rank", "64", "--bucket", "1024",
            "--chunk_size", "16", "--kv_quant", "int8",
            "--hysteresis", "0.3", "--track_hit_rate",
        ],
        "env": {},
        "timeout": 5400,
    },
    "bench_trained_hyst_xla_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b_v2",
            "BENCH_TRACK_HIT": "1",
            "BENCH_HYSTERESIS": "0.3",
        },
        "timeout": 3600,
    },
    "bench_trained_hyst_auto_r5": {
        "cmd": [sys.executable, "bench.py"],
        "env": {
            "BENCH_MODE": "shadow",
            "BENCH_WEIGHTS": "checkpoints/bench1p4b_v2",
            "BENCH_USE_PALLAS": "auto",
            "BENCH_HYSTERESIS": "0.3",
        },
        "timeout": 3600,
    },
    # Step-anatomy trace at the r5 defaults with the grouped op_table
    # (the README quotes this).
    "prof_trace_r5": {
        "cmd": [
            sys.executable, "benchmarks/prof_trace_decode.py",
            "122880", "4",
        ],
        "env": {},
        "timeout": 5400,
    },
}


# Run order = value-per-tunnel-minute: cheap probes, then the headline
# decode metric and its likely improvements, then correctness (kernel
# tests), then the secondary regimes/lengths/serving, profiling last.
_ORDER = [
    "probe_host", "probe_hostdus", "probe_host_layouts",
    "probe_mem_8b", "probe_mem_wq8_b5", "probe_mem_244k",
    "bench_xla", "bench_wq8", "bench_8b",
    "bench_offload_b6_ring", "bench_8b_offload",
    "kernel_tests",
    "bench_ring", "bench_pallas", "bench_pallas_hot", "bench_xla_hot",
    "bench_vs",
    "bench_wq8_b5", "bench_offload_b8_ring", "bench_offload_b6_pallas",
    "bench_60k", "bench_60k_b8", "bench_244k", "bench_glm",
    "probe_mem_8b_60k", "bench_8b_60k",
    "bench_serve", "bench_serve_ctx", "bench_serve_offload",
    "prof_trace_decode", "prof_ablate", "prof_prefill_attn",
    # round 3 (kernel validation first, then the VS campaign, then the
    # re-baselines/fix validations, then the accuracy oracle + probes)
    "kernel_tests_r3", "prof_vs_tile", "bench_vs_r3",
    "bench_stream", "bench_xla_r3", "bench_wq8_r3",
    "train_tiny", "eval_tiny_full", "eval_tiny_shadow",
    "bench_serve_r3", "bench_yi",
    "probe_8b_offload_aot", "prof_ring_decode",
    "prof_decode_60k_b6", "prof_decode_60k_b8",
    # round 3b (fixed probes first, then kernel validation, then the
    # warm-prefill decomposition, then the trained-model oracle rerun)
    "prof_ring_decode_r3", "probe_8b_offload_aot_r3",
    "kernel_tests_r3b",
    "bench_xla_warm", "bench_stream_warm", "bench_vs_warm",
    "train_tiny_r2", "eval_tiny_full_r2", "eval_tiny_shadow_r2",
    "bench_serve_r3b",
    # round 3c (post-regression-fix headline first, then recall, then
    # the warm sparse-prefill comparison + oracle reruns ride the
    # still-pending 3b stages above)
    "bench_xla_r3c", "kernel_recall_r3c", "bench_vs_sim",
    "prof_ring_decode_r3c", "bench_60k_r3c", "bench_60k_b8_r3c",
    "bench_cs16_r3c", "prof_ablate_r3c",
    # round 4 (exact-topk A/B first — it revalidates the headline at
    # the new default — then kernel-test greenness, then the oracle
    # variants, then the family baselines + kernel re-bench)
    "bench_xla_exact_r4", "bench_xla_approx_r4", "kernel_tests_r4",
    "train_tiny_r4", "eval_tiny_full_r4", "eval_tiny_shadow_r4",
    "eval_tiny_stream_r4", "eval_tiny_approx_r4", "eval_tiny_int8_r4",
    "eval_tiny_cs16_r4",
    "bench_glm_full_b2", "bench_glm_full_b1",
    "bench_yi_full_b2", "bench_yi_full_b1",
    "bench_pallas_r4", "prof_refresh_sweep", "prof_refresh_sweep_cs16",
    "bench_serve_chunk1_r4", "bench_serve_chunk8_r4",
    "prof_ablate_r4", "kernel_tests_r4b", "bench_60k_b8_wq8",
    "probe_topk_recall", "bench_xla_mult2_r4", "eval_tiny_vs_r4",
    "bench_cs32_r4", "eval_tiny_cs32_r4", "bench_glm_r4", "bench_yi_r4",
    "prof_trace_decode_r4", "eval_tiny_auto_r4",
    "train_tiny_r5", "eval5_full", "eval5_shadow", "eval5_kernel",
    "eval5_auto", "eval5_vs", "prof_ablate_r4b", "bench_yi_r4b", "prof_ablate_r4c",
    "bench_244k_r4", "bench_8b_60k_r4", "bench_serve_cs16_r4",
    "prof_ablate_r4d", "prof_ablate_r4e",
    "bench_kernel_hit60", "bench_xla_hit60",
    "bench_60k_kernel_hit60", "bench_glm_kernel_hit60",
    # round 5 (kernel health first, then the organic-locality pair,
    # then the driver rehearsal, then the VS real-pattern A/B, the 16K
    # oracle campaign, the proofs, profiling last)
    "kernel_tests_r5",
    "bench_trained_xla_r5", "bench_trained_auto_r5",
    "bench_r5_headline",
    "bench_vs_trained_r5", "bench_dense_trained_warm_r5",
    "train_tiny16k_r5", "eval16k_full", "eval16k_shadow",
    "eval16k_kernel",
    "probe_mem_yi_full_b2", "bench_60k_b8_wq8disk_r5",
    "bench_60k_b6_trained_r5", "probe_mem_8b_60k_b2",
    "eval5_hyst", "bench_trained_hyst_xla_r5",
    "bench_trained_hyst_auto_r5",
    "prof_trace_r5",
    # round 5, fresh-checkout session: kernel health re-check,
    # synthetic-snapshot knee test, single-launch vs_tile re-time
    # (bench_yi_full_b2 re-ran from its r4 registration: 136.2 tok/s)
    "kernel_tests_vs_tile_r5",
    "gen_bench_npz_syn", "bench_60k_b8_wq8disk_syn_r5",
    "prof_vs_tile_r5",
]
assert set(_ORDER) == set(STAGES), (
    set(_ORDER) ^ set(STAGES)
)
STAGES = {k: STAGES[k] for k in _ORDER}


def tpu_up(timeout: int = 300) -> bool:
    """Quick tunnel probe in a subprocess (a hung jax.devices() must
    not hang the session)."""
    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print('TPU_UP', d)"],
            capture_output=True, text=True, timeout=timeout,
        )
        return "TPU_UP" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def wait_for_tpu(max_wait: float = float("inf")) -> bool:
    """Block until the tunnel answers; a stage must not burn its
    one recorded attempt on a downed tunnel."""
    t0 = time.time()
    while time.time() - t0 < max_wait:
        if tpu_up():
            return True
        print(f"== tunnel down, waiting (since {round(time.time()-t0)}s)",
              flush=True)
        time.sleep(180)
    return False


INFRA_MARKERS = (
    "UNAVAILABLE", "ABORTED", "DEADLINE_EXCEEDED", "failed to connect",
    "Connection reset",
)
# NOTE: a subprocess TIMEOUT is deliberately NOT an infra marker — a
# stage that deterministically exceeds its budget must not be retried
# on every session run (each retry would kill python mid-TPU-op after
# hours, the exact CLAUDE.md hazard). Delete its line from the results
# file to re-run it after raising the timeout.


def done_stages():
    """Stages with a recorded result. Infra-flap failures (tunnel died
    mid-stage) do NOT count as done — they retry on the next run.
    Neither does an ok-record whose tail shows a probe-stage FAIL:
    round 1 recorded harness crashes as ok (VERDICT weak #1), and a
    stage that half-crashed must re-run, not freeze a wrong answer."""
    if not os.path.exists(RESULTS):
        return set()
    out = set()
    with open(RESULTS) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except Exception:
                continue
            if not rec.get("ok") and rec.get("infra"):
                continue
            if rec.get("ok") and any(
                ln.startswith(("FAIL", "Traceback"))
                for ln in rec.get("tail", [])
            ):
                continue
            out.add(rec["stage"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    if args.list:
        for s in STAGES:
            print(s)
        return
    skip = set() if args.force else done_stages()
    for name in args.stages.split(","):
        name = name.strip()
        if not name:
            continue
        if name in skip:
            print(f"== {name}: already recorded, skipping", flush=True)
            continue
        # Cooperative pause: `touch /tmp/tpu_session_pause` makes the
        # session idle BETWEEN stages (never mid-TPU-op) so a one-off
        # probe can borrow the chip; rm the file to resume.
        while os.path.exists("/tmp/tpu_session_pause"):
            print("== paused (/tmp/tpu_session_pause)", flush=True)
            time.sleep(30)
        spec = STAGES[name]
        # Kernel-path precondition (VERDICT r4 weak #9): any stage that
        # drives the fused Pallas decode kernel auto-runs the compiled
        # kernel suite first, so HEAD-at-chip kernel health never
        # depends on someone remembering a session stage.
        if (
            spec["env"].get("BENCH_USE_PALLAS") in ("1", "auto")
            and "kernel_tests_r5" not in skip
            and name != "kernel_tests_r5"
        ):
            print(f"== {name}: kernel-path stage -> running "
                  "kernel_tests_r5 precondition first", flush=True)
            run_stage = STAGES["kernel_tests_r5"]
            kenv = dict(os.environ, **run_stage["env"])
            kenv["PYTHONPATH"] = ROOT + os.pathsep + kenv.get(
                "PYTHONPATH", ""
            )
            t0 = time.time()
            try:
                kp = subprocess.run(
                    run_stage["cmd"], cwd=ROOT, env=kenv,
                    capture_output=True, text=True,
                    timeout=run_stage["timeout"],
                )
                krec = {
                    "stage": "kernel_tests_r5",
                    "ok": kp.returncode == 0,
                    "seconds": round(time.time() - t0, 1),
                    "tail": kp.stdout.splitlines()[-4:],
                    "infra": False,
                }
            except subprocess.TimeoutExpired:
                krec = {
                    "stage": "kernel_tests_r5", "ok": False,
                    "seconds": round(time.time() - t0, 1),
                    "tail": ["precondition timeout"], "infra": True,
                }
            with open(RESULTS, "a") as f:
                f.write(json.dumps(krec) + "\n")
            skip.add("kernel_tests_r5")
            if not krec["ok"]:
                print(f"== {name}: SKIPPED (kernel_tests_r5 "
                      "precondition failed)", flush=True)
                continue
        env = dict(os.environ, **spec["env"])
        # Scripts run as `python benchmarks/x.py` — put the repo root on
        # sys.path so `import shadowkv_tpu` resolves.
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        wait_for_tpu()
        if "gate" in spec:
            # Cheap AOT memory gate (VERDICT r3 #10): a staged config
            # that cannot fit must never burn a full session slot. The
            # probe compiles (never runs) the stage's programs and
            # reports fits_16g per program.
            genv = dict(os.environ, **spec["gate"])
            genv["PYTHONPATH"] = env["PYTHONPATH"]
            print(f"== {name}: AOT gate {spec['gate']}", flush=True)
            t0 = time.time()
            try:
                g = subprocess.run(
                    [sys.executable, "benchmarks/probe_memory.py"],
                    cwd=ROOT, env=genv, capture_output=True, text=True,
                    timeout=2400,
                )
                glines = [
                    ln for ln in g.stdout.splitlines()
                    if ln.startswith("{")
                ]
                unfit = any('"fits_16g": false' in ln for ln in glines)
            except subprocess.TimeoutExpired:
                glines, unfit = ["GATE_TIMEOUT"], False
            if unfit:
                rec = {
                    "stage": name, "ok": False, "gated": True,
                    "seconds": round(time.time() - t0, 1),
                    "tail": ["AOT gate: does not fit 16G"] + glines[-6:],
                    "infra": False,
                }
                with open(RESULTS, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"== {name}: GATED (AOT says does not fit)",
                      flush=True)
                continue
        print(f"== {name}: {' '.join(spec['cmd'])} {spec['env']}",
              flush=True)
        t0 = time.time()
        try:
            # NOTE: generous timeouts on purpose — killing a python
            # mid-TPU-op through the axon tunnel can wedge the remote
            # worker for everyone (CLAUDE.md).
            p = subprocess.run(
                spec["cmd"], cwd=ROOT, env=env, capture_output=True,
                text=True, timeout=spec["timeout"],
            )
            ok = p.returncode == 0
            full = (p.stdout + "\n" + p.stderr).strip()
            tail = full.splitlines()[-25:]
            # Full output survives for post-hoc analysis (the 25-line
            # tail lost the memory-probe summaries in round 2).
            logdir = os.path.join(ROOT, "benchmarks", "logs")
            os.makedirs(logdir, exist_ok=True)
            with open(os.path.join(logdir, f"{name}.log"), "w") as lf:
                lf.write(full + "\n")
        except subprocess.TimeoutExpired:
            ok, tail = False, ["TIMEOUT"]
        rec = {
            "stage": name,
            "ok": ok,
            "seconds": round(time.time() - t0, 1),
            "tail": tail,
            "infra": (
                not ok
                and any(m in ln for ln in tail for m in INFRA_MARKERS)
            ),
        }
        with open(RESULTS, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("\n".join(tail), flush=True)
        print(f"== {name}: {'OK' if ok else 'FAIL'} "
              f"({rec['seconds']}s)", flush=True)


if __name__ == "__main__":
    main()
