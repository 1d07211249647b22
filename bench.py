"""End-to-end decode throughput benchmark: ShadowKV vs full attention.

TPU analogue of the reference's e2e harness (test/e2e.py:126-168): run a
full-attention baseline at the largest batch that fits, then the
ShadowKV engine at its (larger) batch, and report decode tokens/s and
the speedup. Prints ONE JSON line to stdout; diagnostics go to stderr.

Model: a llama-style ~1.4B config with synthetic weights (the real
reference hardware is 1xA100-80G with an 8B model; a single v5e chip
has 16 GB, so the bench model is scaled to keep the same regime:
KV-cache-bandwidth-bound full attention vs compact-buffer ShadowKV).

Env overrides: BENCH_DATALEN, BENCH_FULL_BATCH, BENCH_SHADOW_BATCH,
BENCH_DECODE_STEPS, BENCH_MODE (full|shadow|both|serve), BENCH_QUANT
(none|int8, the KV/U/landmark stores), BENCH_WQUANT (none|int8,
weight-only quantized dense path — core/wquant.py), BENCH_USE_PALLAS
(0|1|auto — fused refresh kernel / adaptive path; 'auto' needs ~0.5 GB
of headroom for the second decode executable), BENCH_HIT_RATE (float:
forced selection locality, measures the decode paths at real-model
hit rates), BENCH_RING (0|1, ring-DMA chunk gather on the decode path),
BENCH_CACHE_MODE (shadow|shadow_offload), BENCH_APPROX_TOPK (0|1,
default 1 = approx_max_k selection with the measured mult2 override;
0 = exact top-k).

Driver-robustness knobs (round 5): the headline shadow engine runs
FIRST and the full baseline only starts if it fits the remaining
wall-clock budget — BENCH_DEADLINE (s, default 1500) minus
BENCH_FULL_BUDGET (s, default 540); otherwise the JSON emits with
vs_baseline null instead of dying in the baseline's cold compile
(round-4's rc=124). A persistent XLA compilation cache at ./.jax_cache
(BENCH_NO_COMPILE_CACHE=1 disables) makes repeat runs warm-compile,
and SIGTERM flushes the partial result as the JSON line.

BENCH_MODE=serve measures continuous batching: BENCH_REQUESTS requests
(default 2x the shadow batch) with generation lengths staggered
BENCH_DECODE_STEPS/2 .. BENCH_DECODE_STEPS, served through
serving.ContinuousBatcher at BENCH_SHADOW_BATCH slots; reports
end-to-end served tokens/s (admission prefills included) vs the static
batch running every request to the LONGEST gen length (the reference's
batch_generate regime, where finished sequences pad out the batch).

Default configuration matches the BASELINE.json north star: 122K
context on one chip, full attention at its max feasible batch (1 on a
16 GB v5e) vs ShadowKV at its max feasible batch (4 with the int8
V/U/landmark stores + splash prefill + chunked RoPE) — the reference's
batch-enlargement story (index.html:147) on TPU terms.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_T_START = time.time()
# Partial results, so a deadline/SIGTERM can still emit the JSON line
# the driver parses (round-4's run died at rc=124 with nothing printed).
_PARTIAL = {"shadow": None, "full": None, "datalen": 122880}


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def _elapsed() -> float:
    return time.time() - _T_START


def _emit(shadow_tps, full_tps, datalen):
    value = shadow_tps if shadow_tps is not None else full_tps
    vs = round(shadow_tps / full_tps, 3) if (shadow_tps and full_tps) else None
    print(json.dumps({
        "metric": f"shadowkv_decode_tokens_per_sec_{datalen // 1024}k",
        "value": round(value, 1),
        "unit": "tokens/s",
        "vs_baseline": vs,
    }), flush=True)


def _on_term(sig, frame):  # pragma: no cover - driver timeout path
    # The driver runs `timeout N python bench.py`; GNU timeout sends
    # SIGTERM first. Flush whatever number we already measured so the
    # round still records a parsed result (even at rc=124).
    if _PARTIAL["shadow"] is not None or _PARTIAL["full"] is not None:
        log(f"[deadline] SIGTERM at {_elapsed():.0f}s - emitting partial")
        _emit(_PARTIAL["shadow"], _PARTIAL["full"], _PARTIAL["datalen"])
    os._exit(0)


def _enable_compile_cache():
    """Persistent compilation cache: cold 122K prefill compiles swung
    137.9 -> 417.9 s across rounds (no cache survives the process), and
    one slow compile starves the driver's timeout. Probe-verified on
    axon: executables serialize/deserialize through the tunnel fine."""
    if os.environ.get("BENCH_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover
        log(f"compile cache unavailable: {e}")


def run_engine(mode, cfg, cache_cfg, rt, params, datalen, batch, steps,
               prompt=None):
    # The axon tunnel occasionally aborts a request transiently
    # (ABORTED/UNAVAILABLE at trace-time transfers); one retry keeps a
    # one-shot scoring run alive without masking real failures.
    try:
        return _run_engine(mode, cfg, cache_cfg, rt, params, datalen,
                           batch, steps, prompt)
    except Exception as e:  # pragma: no cover - infra flake path
        err = f"{type(e).__name__}: {e}"
    # Retry OUTSIDE the except block: the exception's traceback pins
    # _run_engine's frame — and with it the whole Engine + cache — so a
    # retry inside the handler re-runs with attempt 1's multi-GB
    # buffers still alive and OOMs spuriously (seen at b8 offload).
    log(f"[{mode}] attempt 1 failed ({err}); retrying once")
    gc.collect()
    time.sleep(10)
    return _run_engine(mode, cfg, cache_cfg, rt, params, datalen,
                       batch, steps, prompt)


def _run_engine(mode, cfg, cache_cfg, rt, params, datalen, batch, steps,
                prompt=None):
    from shadowkv_tpu.models.engine import Engine

    eng = Engine(cfg, cache_cfg, rt, params)
    if prompt is not None:
        ids = np.broadcast_to(prompt[:datalen], (batch, datalen))
    else:
        ids = np.random.RandomState(0).randint(
            1, cfg.vocab_size, (batch, datalen)
        )
    if os.environ.get("BENCH_PREFILL_WARM", "") == "1":
        # Compile+run prefill once untimed so the timed run below
        # reports WARM prefill: XLA compiles through the axon tunnel
        # cost 20-40 s per program and the sparse-prefill programs
        # (stream/vs splash kernels inside the layer scan) compile far
        # slower than dense — a one-shot number measures the compiler,
        # not the mechanism. (batch_generate drops this cache before
        # its own prefill, so HBM never holds two caches.)
        tw = time.perf_counter()
        eng.prefill(ids)
        log(
            f"[{mode}] cold prefill (compile+run): "
            f"{time.perf_counter() - tw:.1f}s"
        )
    t0 = time.perf_counter()
    out, stats = eng.batch_generate(
        ids, gen_len=steps,
        temperature=float(os.environ.get("BENCH_TEMP", "0.6")),
        top_k=50, top_p=0.9,
        warmup_steps=3,
    )
    log(
        f"[{mode}] batch={batch} datalen={datalen} "
        f"prefill={stats.prefill_seconds:.1f}s "
        f"decode={stats.decode_seconds:.3f}s for {stats.decode_tokens} toks "
        f"-> {stats.decode_tokens_per_second:.1f} tok/s "
        f"(total {time.perf_counter() - t0:.1f}s)"
    )
    if rt.track_hit_rate or rt.use_pallas == "auto":
        ks = eng.kv_stats()
        log(
            f"[{mode}] hit-rate mean={ks.get('hit_rate_mean')} "
            f"ema={ks.get('hit_rate_ema')} "
            f"samples={ks.get('hit_samples')} "
            f"auto_switches={ks.get('auto_switches')} "
            f"kernel_now={getattr(eng, '_kernel_now', None)}"
        )
    return stats.decode_tokens_per_second


def run_serve(cfg, rt, params, datalen, slots, steps, quant, cache_mode):
    """Continuous-batching throughput vs the static-batch baseline on
    a variable-gen-length request stream."""
    from shadowkv_tpu.config import CacheConfig
    from shadowkv_tpu.models.engine import Engine
    from shadowkv_tpu.serving import ContinuousBatcher, Request

    n_req = int(os.environ.get("BENCH_REQUESTS", 2 * slots))
    # BENCH_CONTEXT=1: every request shares ONE long context (the
    # document) + a short random suffix (the question) — the
    # shared-prefix snapshot path. The static baseline still pays a
    # full prefill per request.
    shared_ctx = os.environ.get("BENCH_CONTEXT", "") == "1"
    suffix_len = int(os.environ.get("BENCH_SUFFIX", 16)) if shared_ctx else 0
    # canonical sparse settings, scaled down only for smoke-test
    # context lengths that cannot hold them
    budget = 2048 if datalen >= 8192 else max(64, datalen // 4)
    cache_cfg = CacheConfig(
        mode=cache_mode, max_length=datalen + 128, sparse_budget=budget,
        rank=160 if datalen >= 8192 else 32,
        chunk_size=int(os.environ.get("BENCH_CHUNK_SIZE", "16")),
        kv_quant=quant, gen_capacity=max(256, steps + suffix_len + 8),
    )
    rng = np.random.RandomState(0)
    if shared_ctx:
        prefix = rng.randint(1, cfg.vocab_size, datalen)
        ids = np.stack([
            np.concatenate(
                [prefix, rng.randint(1, cfg.vocab_size, suffix_len)]
            )
            for _ in range(n_req)
        ])
    else:
        ids = rng.randint(1, cfg.vocab_size, (n_req, datalen))
    gen_lens = [
        steps // 2 + (i * (steps // 2)) // max(1, n_req - 1)
        for i in range(n_req)
    ]
    reqs = [
        Request(
            uid=i, input_ids=ids[i], gen_len=gen_lens[i],
            context_id=0 if shared_ctx else None,
            context_len=datalen if shared_ctx else None,
        )
        for i in range(n_req)
    ]

    # Static-batch baseline FIRST (fresh process memory — both engines
    # prefill at the chip ceiling and round-2 showed the second engine
    # OOMs on the first's not-yet-reclaimed reservations): every
    # request decodes to the LONGEST gen length in its fixed batch
    # (batch_generate has no per-slot exit), useful tokens are only
    # each request's gen_len.
    eng2 = Engine(cfg, cache_cfg, rt, params)
    useful = 0.0
    t0 = time.perf_counter()
    for r0 in range(0, n_req, slots):
        batch = reqs[r0 : r0 + slots]
        longest = max(r.gen_len for r in batch)
        # The baseline prefills the BUCKETED prefix only (the jitted
        # splash prefill is built for the bucket length; suffix tokens
        # would change the compile shape) — it skips the suffix work
        # the batcher teacher-forces, slightly flattering the baseline.
        _, stats = eng2.batch_generate(
            np.stack([r.input_ids[:datalen] for r in batch]),
            gen_len=longest, temperature=0.6, warmup_steps=0,
        )
        useful += sum(r.gen_len for r in batch)
    static_wall = time.perf_counter() - t0
    static_tps = useful / static_wall
    log(
        f"[static] the stream in fixed batches of {slots}: "
        f"{useful:.0f} useful toks in {static_wall:.1f}s -> "
        f"{static_tps:.1f} tok/s"
    )
    eng2._cache = None
    del eng2
    gc.collect()
    jax.clear_caches()
    gc.collect()

    eng = Engine(cfg, cache_cfg, rt, params)
    cb = ContinuousBatcher(
        eng, slots=slots, temperature=0.6, top_k=50, top_p=0.9,
        steps_per_dispatch=(
            lambda c: "auto" if c == "auto" else int(c)
        )(os.environ.get("BENCH_SERVE_CHUNK", "auto")),
    )
    results, st = cb.run(reqs)
    assert st.completed_requests == n_req
    served_tps = st.tokens_per_second
    log(
        f"[serve] {n_req} reqs x {datalen} ctx, slots={slots}: "
        f"{st.completed_tokens} toks in {st.wall_seconds:.1f}s wall "
        f"({st.admission_seconds:.1f}s admissions, "
        f"{st.decode_steps} steps) -> {served_tps:.1f} tok/s served, "
        f"{st.decode_tokens_per_second:.1f} tok/s decode-only"
        + (
            f"; ctx hits {st.context_hits}/{st.admissions + slots}, "
            f"{st.forced_tokens} forced suffix toks"
            if shared_ctx
            else ""
        )
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"serve_tokens_per_sec_{datalen // 1024}k"
                    + ("_sharedctx" if shared_ctx else "")
                ),
                "value": round(served_tps, 1),
                "unit": "tokens/s",
                "vs_baseline": round(served_tps / static_tps, 3),
            }
        )
    )


def _probe_backend(timeout_s: int = 300) -> bool:
    """The axon remote-TPU tunnel makes jax.devices() BLOCK forever
    when it is down; probe in a subprocess so the bench fails fast
    with a JSON line instead of hanging the driver."""
    import subprocess

    try:
        p = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('BACKEND_UP', jax.devices())"],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ),
        )
        return "BACKEND_UP" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    from shadowkv_tpu.config import CacheConfig, RuntimeConfig
    from shadowkv_tpu.models.params import init_synthetic_params
    from shadowkv_tpu.models.registry import toy_config

    _enable_compile_cache()
    signal.signal(signal.SIGTERM, _on_term)
    if not _probe_backend():
        log("backend probe failed (TPU tunnel down?) — failing fast")
        print(json.dumps({
            "metric": "backend_unavailable",
            "value": 0,
            "unit": "tokens/s",
            "vs_baseline": None,
        }))
        sys.exit(1)

    datalen = int(os.environ.get("BENCH_DATALEN", 122880))
    full_batch = int(os.environ.get("BENCH_FULL_BATCH", 1))
    shadow_batch = int(os.environ.get("BENCH_SHADOW_BATCH", 4))
    steps = int(os.environ.get("BENCH_DECODE_STEPS", 100))
    bench_mode = os.environ.get("BENCH_MODE", "both")
    quant = os.environ.get("BENCH_QUANT", "int8")
    _up = os.environ.get("BENCH_USE_PALLAS", "")
    use_pallas = "auto" if _up == "auto" else _up == "1"
    ring = os.environ.get("BENCH_RING", "") == "1"
    cache_mode = os.environ.get("BENCH_CACHE_MODE", "shadow")
    # dense-splash keeps the prefill HBM peak low enough for batch 4 at
    # 122K (GQA K/V consumed without the 2x [B, H, S, Dh] repeats).
    prefill_pattern = os.environ.get("BENCH_PREFILL", "dense-splash")

    # BENCH_FAMILY=glm swaps in the GLM-4 head layout: 4 KV groups +
    # partial interleaved RoPE on the first 64 dims + QKV bias —
    # exercising the GLM variant of the reconstruction kernel and the
    # interleaved-RoPE decode math e2e (reference glm.py:174,238,261).
    family = os.environ.get("BENCH_FAMILY", "llama")
    # BENCH_FAMILY=yi mirrors Yi-9B-200K's head layout at bench scale:
    # 4 KV groups (half the llama-bench KV state), 5M rope theta, the
    # 64K vocab (reference index.html:239-260 family table).
    family_kw = {
        "glm": dict(num_kv_heads=4, rope_style="glm",
                    rope_partial_dim=64, qkv_bias=True),
        "yi": dict(num_kv_heads=4, rope_theta=5_000_000.0,
                   vocab_size=64000),
        "llama": {},
    }[family]
    # BENCH_MODEL=8b: the EXACT Llama-3.1-8B dims (the north-star
    # metric's model) with synthetic values. bf16 weights alone are
    # 16 GB, so this shape requires the int8 weight path (forced) and
    # host-side init — ShadowKV + int8 weights is what makes 8B@122K
    # runnable on a 16 GB chip at all.
    model_size = os.environ.get("BENCH_MODEL", "1.4b")
    if model_size == "8b":
        cfg_kw = dict(
            name=f"sbench-8b-{family}",
            num_layers=32,
            hidden_size=4096,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            intermediate_size=14336,
            vocab_size=128256,
            rope_theta=500000.0,
            dtype=jnp.bfloat16,
        )
    else:
        cfg_kw = dict(
            name=f"sbench-1.4b-{family}",
            num_layers=16,
            hidden_size=2048,
            num_heads=16,
            num_kv_heads=8,
            head_dim=128,
            intermediate_size=5632,
            vocab_size=32768,
            rope_theta=500000.0,
            # f32 escape hatch for CPU smoke tests (CPU lacks bf16 dots)
            dtype=(
                jnp.float32
                if os.environ.get("BENCH_DTYPE") == "f32"
                else jnp.bfloat16
            ),
        )
    cfg_kw.update(family_kw)
    cfg = toy_config(**cfg_kw)
    rt = RuntimeConfig(
        prefill_sub_batch=1, prefill_block_q=256,
        use_pallas=use_pallas if use_pallas else None,
        ring_gather=True if ring else None,
        prefill_pattern=prefill_pattern,
        offload_prefill_segments=int(
            os.environ.get("BENCH_OFFLOAD_SEGMENTS", "1")
        ),
        # BENCH_VS_SIM=clustered: measure the VS prefill pipeline at
        # the pattern structure real checkpoints produce (synthetic
        # weights give adversarially scattered patterns; see
        # RuntimeConfig.vs_sim / core/minference.py sim_vs_scores)
        vs_sim=os.environ.get("BENCH_VS_SIM") or None,
        # BENCH_HIT_RATE: benchmark-only forced selection locality
        # (RuntimeConfig.debug_hit_rate) — measures the decode paths
        # at the hit rates REAL models produce (50-60 %) instead of
        # the ~3 % synthetic-weight churn.
        debug_hit_rate=(
            float(os.environ["BENCH_HIT_RATE"])
            if os.environ.get("BENCH_HIT_RATE")
            else None
        ),
        # BENCH_TRACK_HIT=1: observe-only slot-hit-rate sampling — the
        # measurement behind the organic-locality story (trained
        # weights via BENCH_WEIGHTS, no BENCH_HIT_RATE forcing).
        track_hit_rate=os.environ.get("BENCH_TRACK_HIT", "") == "1",
        # BENCH_HYSTERESIS (float, default 0 = reference-exact):
        # selection hysteresis, RuntimeConfig.selection_hysteresis.
        selection_hysteresis=float(
            os.environ.get("BENCH_HYSTERESIS", "0") or 0
        ),
    )
    log(f"devices: {jax.devices()}")
    wquant = os.environ.get("BENCH_WQUANT", "")
    prompt = None
    weights_dir = os.environ.get("BENCH_WEIGHTS", "")
    if weights_dir:
        # TRAINED bench-shape weights + an in-distribution recall-style
        # prompt stream (scripts/train_bench_weights.py): real attention
        # structure -> organic selection locality, the regime every
        # reference number runs in (index.html:326, ~60 % hit reuse).
        from shadowkv_tpu.models.params import load_params_npz

        params = load_params_npz(
            os.path.join(weights_dir, "params.npz"),
            weight_quant=wquant or "none",
        )
        params = jax.device_put(params)
        # BENCH_PROMPT: override the snapshot's prompt stream (A/B the
        # prompt distribution against fixed weights)
        ppath = os.environ.get(
            "BENCH_PROMPT", os.path.join(weights_dir, "prompt.npy")
        )
        if os.path.exists(ppath):
            prompt = np.load(ppath)
            assert prompt.shape[0] >= datalen, (
                f"prompt stream {prompt.shape[0]} < datalen {datalen}"
            )
        log(f"weights: trained snapshot {weights_dir} "
            f"(wquant={wquant or 'none'}, prompt="
            f"{None if prompt is None else prompt.shape[0]})")
    elif model_size == "8b":
        # host-side init + forced int8: a device bf16 8B init would
        # fill HBM before quantization could run
        from shadowkv_tpu.models.params import init_synthetic_params_host

        params = init_synthetic_params_host(cfg, weight_quant="int8")
        log("weights: 8B shape, int8 per-channel (host-side init)")
    else:
        params = init_synthetic_params(cfg, jax.random.PRNGKey(0))
        if wquant == "int8":
            from shadowkv_tpu.core.wquant import quantize_params

            params = jax.jit(quantize_params)(params)
            log("weights: int8 per-channel (BENCH_WQUANT=int8)")
    jax.block_until_ready(params)

    if bench_mode == "serve":
        run_serve(cfg, rt, params, datalen, shadow_batch, steps, quant,
                  cache_mode)
        return

    # Headline (shadow) FIRST: the round-4 driver run timed out inside
    # the full baseline's cold prefill compile and printed nothing.
    # Shadow-first + the deadline guard below mean the JSON line always
    # carries the headline value; the baseline runs only if the budget
    # still allows it (vs_baseline: null otherwise).
    _PARTIAL["datalen"] = datalen
    deadline = float(os.environ.get("BENCH_DEADLINE", "1500"))
    # conservative cost of the full-baseline leg: cold 122K prefill
    # compile measured 137.9-417.9 s across rounds without the compile
    # cache; with it, warm prefill is ~70-140 s.
    full_budget = float(os.environ.get("BENCH_FULL_BUDGET", "540"))

    shadow_tps = None
    if bench_mode in ("shadow", "both"):
        shadow_cfg = CacheConfig(
            mode=cache_mode,
            max_length=datalen + 128,
            sparse_budget=2048,
            rank=160,
            # Default 16 (measured): same 2048-token budget in half
            # the chunks — doubles the gathered row and halves the
            # landmark/selection work. 214.8 tok/s vs 201.7 at cs8
            # (bench_cs16_r3c vs bench_xla_r3c, b4/122K) with the
            # tiny-model oracle scoring EQUAL (0.70 cs16 vs 0.70 cs8
            # shadow, eval_tiny_cs16_r4). The reference's canonical
            # chunk_size stays 8 (CacheConfig default).
            chunk_size=int(os.environ.get("BENCH_CHUNK_SIZE", "16")),
            kv_quant=quant,
            # BENCH_APPROX_TOPK=0 forces exact top-k; default follows
            # CacheConfig (approx + mult2 override — the measured
            # recall/latency frontier, probe_topk_recall).
            approx_topk=os.environ.get("BENCH_APPROX_TOPK", "1") == "1",
        )
        shadow_tps = run_engine(
            "shadowkv", cfg, shadow_cfg, rt, params, datalen, shadow_batch,
            steps, prompt=prompt,
        )
        _PARTIAL["shadow"] = shadow_tps
        gc.collect()
        jax.clear_caches()
        gc.collect()

    full_tps = None
    if bench_mode in ("full", "both"):
        if bench_mode == "both" and _elapsed() + full_budget > deadline:
            log(f"[full] skipped: {_elapsed():.0f}s elapsed + "
                f"{full_budget:.0f}s budget > {deadline:.0f}s deadline "
                f"(vs_baseline: null this run)")
        else:
            full_cfg = CacheConfig(mode="full", max_length=datalen + 128)
            try:
                full_tps = run_engine(
                    "full", cfg, full_cfg, rt, params, datalen, full_batch,
                    steps, prompt=prompt,
                )
                _PARTIAL["full"] = full_tps
            except Exception as e:
                # Full attention often simply does not fit where shadow
                # does (that gap IS the headline) — report the shadow
                # number with vs_baseline null instead of dying.
                if bench_mode != "both":
                    raise
                log(f"[full] infeasible at b{full_batch}/{datalen}: "
                    f"{type(e).__name__}: {str(e)[:200]}")
                jax.clear_caches()
        gc.collect()

    _emit(shadow_tps, full_tps, datalen)


if __name__ == "__main__":
    main()
