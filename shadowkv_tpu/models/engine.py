"""The inference engine: prefill + autoregressive decode loops.

Replaces the reference ``LLM`` base class driver
(models/base.py:127-657). Differences are deliberate and TPU-first:

- the per-layer Python loop is a single jitted ``lax.scan`` program,
- the decode step (including sampling) is ONE compiled function with
  donated cache buffers — no per-layer kernel launches, no streams:
  XLA's scheduler provides the compute/copy overlap the reference gets
  from ``copy_stream`` (models/base.py:326-338),
- sub-batch prefill (reference batch_prefill T=4/8, base.py:533-543)
  writes each sub-batch into the shared cache at a batch offset.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.cache.full import FullCache
from shadowkv_tpu.cache.shadow import ShadowCache, ShadowLayout
from shadowkv_tpu.config import CacheConfig, ModelConfig, RuntimeConfig
from shadowkv_tpu.core import rope as rope_lib
from shadowkv_tpu.core.layers import ModelParams
from shadowkv_tpu.core import wquant
from shadowkv_tpu.core.sampling import sample_token
from shadowkv_tpu.models import forward


@dataclasses.dataclass
class GenerationStats:
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0
    prefill_tokens: int = 0
    decode_tokens: int = 0

    @property
    def decode_tokens_per_second(self) -> float:
        if self.decode_seconds == 0:
            return 0.0
        return self.decode_tokens / self.decode_seconds


_HOST_DUS_CAP = None  # process-wide cache of the host-space dus probe


def _probe_host_space_dus() -> bool:
    """One-off capability probe (tiny arrays, two compiles), cached
    process-wide — every Engine shares the platform's answer."""
    global _HOST_DUS_CAP
    if _HOST_DUS_CAP is not None:
        return _HOST_DUS_CAP
    try:
        dev = jax.devices()[0]
        pinned = jax.sharding.SingleDeviceSharding(
            dev, memory_kind="pinned_host"
        )
        big = jax.jit(
            lambda: jnp.zeros((2, 8, 128), jnp.bfloat16),
            out_shardings=pinned,
        )()
        part = jax.device_put(
            jnp.ones((1, 8, 128), jnp.bfloat16), pinned
        )
        # EXPLICIT in_shardings: without them the partitioner treats
        # one operand as device-resident and rejects the mixed-space
        # dus even on platforms that support host-space dus (round-2
        # axon finding).
        upd = jax.jit(
            lambda a, b: jax.lax.dynamic_update_slice(a, b, (1, 0, 0)),
            donate_argnums=(0,),
            in_shardings=(pinned, pinned),
            out_shardings=pinned,
        )(big, part)
        ok = (
            upd.sharding.memory_kind == "pinned_host"
            and bool(jnp.all(upd[1] == 1))
        )
    except Exception:
        ok = False
    _HOST_DUS_CAP = ok
    return ok


def _v_placeholder(v_full):
    """Zero-chunk stand-in keeping the cache pytree structure unchanged
    when the real V store lives outside device memory."""
    shape = v_full.shape
    return jnp.zeros(shape[:3] + (0,) + shape[4:], v_full.dtype)


class Engine:
    """Single-program inference engine over one model + cache config."""

    def __init__(
        self,
        model: ModelConfig,
        cache_cfg: CacheConfig,
        rt: RuntimeConfig,
        params: ModelParams,
    ):
        self.model = model
        self.cache_cfg = cache_cfg
        self.rt = rt
        self.params = params
        # bf16 tables when the model runs bf16 (the reference's fused
        # cos/sin cache is bf16 too, models/llama.py:322-332); fp32
        # otherwise for exact CPU testing.
        table_dtype = (
            jnp.float32 if model.dtype == jnp.float32 else jnp.bfloat16
        )
        cos, sin = rope_lib.compute_cos_sin(
            model, cache_cfg.max_length + cache_cfg.gen_capacity,
            dtype=table_dtype,
        )
        self.cos_table = cos
        self.sin_table = sin
        self.v_store = None
        self._host_v = None  # pinned-host V store (ring offload mode):
        # a TUPLE of per-slot pinned arrays on single-chip engines (this
        # platform cannot update a pinned array in place — host-space
        # dus is rejected at the jax level, and a numpy mirror rides the
        # tunnel at ~0.2 GB/s; per-slot parts are replaced wholesale by
        # direct d2h device_puts instead, and the ring kernel selects
        # the owning part with statically-unrolled pl.when guards), or
        # one array on mesh engines (shard_map specs take one operand).
        self._host_parts = None  # mutable list behind the tuple
        self._host_axis = "batch"  # axis the parts shard:
        # per-slot ('batch') normally; per-layer-segment
        # ('layer') after a segmented offload prefill
        self._seg_prefill_jit = None
        self._embed_jit = None
        self._host_v_np = None  # numpy mirror (mesh engines only)
        self._host_dus = None  # cached host-space dus capability probe
        self._cache = None  # persisted across generate() for cont=True
        # Multi-chip: RuntimeConfig.dp/tp > 1 builds the (dp, tp) mesh
        # (parallel/mesh.py — B on dp, GQA KV heads + factors +
        # buffers on tp) and shards the weights once here; caches are
        # sharded at prefill. GSPMD partitions the XLA paths from these
        # NamedShardings; the Pallas decode paths additionally get the
        # mesh for their shard_map islands (cache/shadow.py).
        self.mesh = None
        self._sp_prefill_jits = {}
        self.pp = rt.pp
        if rt.pp > 1:
            # Pipeline parallelism: layers shard their leading L axis
            # over a 'pp' mesh; decode runs the circular microbatch
            # pipeline (parallel/pipeline.py). v1 composes with no
            # other axis and serves the HBM shadow mode + XLA path.
            from shadowkv_tpu.parallel import mesh as mesh_lib

            assert rt.sp == 1, "pp x sp unsupported"
            assert rt.tp == 1 or rt.dp == 1, (
                "pp composes with EITHER dp OR tp (both manual axes); "
                "a 3-axis pp x dp x tp mesh is future work"
            )
            assert cache_cfg.mode == "shadow", (
                "pp > 1 supports cache mode 'shadow' (HBM) only"
            )
            assert not (rt.ring_gather or rt.use_pallas), (
                "pp > 1 runs the XLA decode path"
            )
            assert model.num_layers % rt.pp == 0, (
                f"pp={rt.pp} must divide num_layers {model.num_layers}"
            )
            if rt.tp > 1:
                # Fully-MANUAL tp inside the pipeline body (explicit
                # psums; the GSPMD-auto composition deadlocked, commit
                # 2772c9e). The packed projection dims are permuted so
                # each rank's contiguous block IS its Megatron slice
                # (parallel/mesh.py::permute_packed_for_tp); int8 KV is
                # excluded (global-head scale trailer).
                assert model.num_kv_heads % rt.tp == 0, (
                    f"tp={rt.tp} must divide num_kv_heads "
                    f"{model.num_kv_heads}"
                )
                assert cache_cfg.kv_quant == "none", (
                    "pp x tp serves kv_quant='none'"
                )
                self.params = mesh_lib.permute_packed_for_tp(
                    self.params, model, rt.tp
                )
            self.mesh = mesh_lib.build_mesh_pp(rt.pp, tp=rt.tp, dp=rt.dp)
            self.params = mesh_lib.shard_pytree(
                self.mesh, self.params,
                mesh_lib.param_pspecs_pp(self.params, tp=rt.tp > 1),
            )
        elif rt.dp * rt.tp * rt.sp > 1:
            from shadowkv_tpu.parallel import mesh as mesh_lib

            self.mesh = mesh_lib.build_mesh(rt.dp, rt.tp, rt.sp)
            assert model.num_kv_heads % rt.tp == 0, (
                f"tp={rt.tp} must divide num_kv_heads "
                f"{model.num_kv_heads}"
            )
            if rt.sp > 1:
                # Sequence-parallel prefill serves the XLA decode path
                # over the HBM-resident shadow cache; the Pallas decode
                # islands and the pinned-host stores keep 2-axis
                # (dp, tp) specs (see shadow_decode_layer).
                assert cache_cfg.mode == "shadow", (
                    "sp > 1 supports cache mode 'shadow' (HBM) only"
                )
                assert not (rt.ring_gather or rt.use_pallas), (
                    "sp > 1 runs the XLA decode path (the Pallas "
                    "islands' shard_map specs are (dp, tp))"
                )
            self.params = mesh_lib.shard_pytree(
                self.mesh, self.params, mesh_lib.param_pspecs(self.params)
            )
        self._build_jits()

    def _shard_cache(self, cache):
        """NamedShard a freshly built (or loaded) cache over the mesh."""
        if self.mesh is None:
            return cache
        from shadowkv_tpu.parallel import mesh as mesh_lib

        if self.pp > 1:
            pspecs = mesh_lib.shadow_cache_pspecs_pp(
                cache, tp=self.rt.tp > 1, dp=self.rt.dp > 1
            )
        elif isinstance(cache, ShadowCache):
            pspecs = mesh_lib.shadow_cache_pspecs(cache, self.mesh)
        else:
            pspecs = mesh_lib.full_cache_pspecs(cache, self.mesh)
        return mesh_lib.shard_pytree(self.mesh, cache, pspecs)

    # -- jit construction ---------------------------------------------------

    def _build_jits(self):
        model, rt = self.model, self.rt
        assert rt.use_pallas in (None, True, False, "auto"), (
            f"use_pallas must be None/True/False/'auto', got "
            f"{rt.use_pallas!r}"
        )
        self.pallas_auto = rt.use_pallas == "auto"
        if self.pallas_auto:
            # Adaptive path choice: start on the XLA path (safe at any
            # hit rate), track the measured slot hit rate, and move to
            # the fused kernel once selection proves temporally stable
            # (see _auto_observe). The two regimes are real: the kernel
            # wins above ~75 % hits, the XLA gather below.
            assert self.cache_cfg.mode == "shadow", (
                "use_pallas='auto' supports the HBM 'shadow' mode only "
                "(offload commits the V store per-path)"
            )
            self.use_pallas = False
        elif rt.use_pallas is None:
            # The fused kernel wins when selection is temporally stable
            # (real-model decoding: hits dominate, refresh ~0.5 ms/step
            # vs the XLA path's fixed all-slot gathers). The XLA path
            # wins in miss-heavy regimes (its vectorized gather beats
            # scalar-issued per-chunk DMAs below ~75 % hit rate).
            # Default to the XLA path; opt in via RuntimeConfig.
            self.use_pallas = False
        else:
            # Explicit True is honored on CPU too: the kernel runs in
            # interpret mode there (tests of the engine-level kernel
            # paths).
            self.use_pallas = bool(rt.use_pallas)
        # Live decode-path state for 'auto' (also reported by kv_stats).
        self._kernel_now = self.use_pallas
        # Benchmark-only forced-selection rate (read at decode trace
        # time; mutate + _decode_shadow_jit.clear_cache() to re-trace).
        self._debug_hit_rate = rt.debug_hit_rate
        self._auto_hit_ema = None
        self._hit_samples: list = []  # every sampled per-step hit frac
        self._auto_prev_ids = None
        self._auto_counter = 0
        self._auto_switches = 0
        # Ring-DMA gather of selected chunks (kernels/gather.py).
        # Allowed on CPU too (interpret mode) so tests can drive it.
        self.ring_gather = bool(rt.ring_gather)
        assert not (self.use_pallas and self.ring_gather), (
            "use_pallas and ring_gather are mutually exclusive decode "
            "paths"
        )

        # Flash prefill on TPU: the jnp blockwise fallback attends every
        # q-block to all keys; at 122K that is one >100 s XLA program,
        # long enough to trip the device watchdog.
        use_flash = jax.devices()[0].platform != "cpu"

        # batch_start is a TRACED arg: a static one would trigger one
        # full XLA compile per sub-batch offset (~25 s each through the
        # remote-compile tunnel). start_pos stays static (it sizes the
        # attention history slice).
        @partial(jax.jit, static_argnums=(2,), donate_argnums=(1,))
        def prefill_full_fn(params, cache, start_pos, input_ids, batch_start):
            return forward.prefill_full(
                model, rt, params, cache, input_ids, start_pos,
                self.cos_table, self.sin_table, batch_start,
                use_flash=use_flash,
            )

        @partial(jax.jit, donate_argnums=(1,))
        def prefill_shadow_fn(params, cache, input_ids, batch_start):
            return forward.prefill_shadow_into(
                model, rt, params, cache, input_ids,
                self.cos_table, self.sin_table, batch_start,
                use_flash=use_flash,
            )

        def _sample(logits, key, temperature, top_k, top_p):
            return sample_token(
                logits[:, -1], key,
                temperature=temperature, top_k=top_k, top_p=top_p,
            )

        # Fully unroll the decode layer loop on TPU (see
        # RuntimeConfig.decode_unroll): inside a rolled scan body XLA
        # materializes every per-layer dynamic slice — weights,
        # landmark table, committed-buffer attention views — as a full
        # copy each iteration (GBs/step of pure copy traffic, measured
        # via prof_hlo_decode.py). CPU keeps the scan: 16x smaller
        # programs for the test tier, identical numerics.
        decode_unroll = rt.decode_unroll
        if decode_unroll is None:
            decode_unroll = jax.devices()[0].platform != "cpu"
        self._decode_unroll = bool(decode_unroll)
        self._decode_segmented = rt.decode_segmented

        @partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(1,))
        def decode_full_fn(params, cache, tokens, key, temperature, top_k, top_p):
            logits, cache = forward.decode_full(
                model, params, cache, tokens, self.cos_table,
                self.sin_table, unroll=self._decode_unroll,
            )
            return _sample(logits, key, temperature, top_k, top_p), cache

        # Offload mode: with ring_gather (fetch ALL selected chunks) or
        # use_pallas (fused refresh: hit reuse + fetch MISSES only —
        # the reference ShadowKVCache_CPU architecture exactly) the V
        # store stays committed to pinned host DRAM and Pallas DMAs
        # chunks host->HBM (reference pinned-memory gather,
        # kv_cache.py:554-563 + gather_copy kernels K2/K3); otherwise V
        # moves to a HostVStore fetched through an io_callback (for
        # runtimes without Pallas host-memory support).
        self.ring_host = False
        if self.cache_cfg.mode == "shadow_offload":
            self.ring_host = self.ring_gather or self.use_pallas
        assert not (
            self.cache_cfg.mode == "shadow_offload"
            and self.cache_cfg.kv_quant != "none"
            and not self.ring_host
        ), (
            "offload + quantized V store needs ring_gather=True (the "
            "io_callback path serves bf16 rows only)"
        )
        assert not (self.pallas_auto and self.ring_gather), (
            "use_pallas='auto' switches XLA <-> fused kernel; it does "
            "not compose with ring_gather"
        )
        ring_gather = self.ring_gather
        ring_host = self.ring_host
        engine = self
        approx_topk = (
            self.cache_cfg.approx_topk
            and jax.devices()[0].platform != "cpu"
        )

        @partial(jax.jit, static_argnums=(4, 5, 6, 7, 8),
                 donate_argnums=(1,))
        def decode_shadow_jit(params, cache, tokens, key, temperature,
                              top_k, top_p, use_kernel, host_axis,
                              *v_host):
            logits, cache = forward.decode_shadow(
                model, params, cache, tokens, self.cos_table,
                self.sin_table, use_kernel=use_kernel,
                v_store=engine.v_store, approx_topk=approx_topk,
                ring_gather=ring_gather,
                v_host=v_host[0] if v_host else None,
                v_host_axis=host_axis,
                mesh=engine.mesh,
                unroll=engine._decode_unroll,
                segmented=engine._decode_segmented,
                debug_hit_rate=engine._debug_hit_rate,
                debug_hit_layout=rt.debug_hit_layout,
                hysteresis=rt.selection_hysteresis,
            )
            return _sample(logits, key, temperature, top_k, top_p), cache

        # Raw jit handle: benchmarks mutate _debug_hit_rate (the forced
        # selection knob) and clear_cache() to retrace at a new rate
        # without rebuilding the engine (benchmarks/prof_refresh_sweep).
        self._decode_shadow_jit = decode_shadow_jit

        track = self.pallas_auto or rt.track_hit_rate
        if ring_host:
            # The pinned-host V store rides as an input-only trailing
            # arg (set by _offload_v after prefill).
            def decode_shadow_fn(params, cache, tokens, key, *sample):
                out = decode_shadow_jit(
                    params, cache, tokens, key, *sample,
                    engine._kernel_now, engine._host_axis,
                    engine._host_v,
                )
                if track:
                    engine._auto_observe(out[1])
                return out
        elif track:
            def decode_shadow_fn(params, cache, tokens, key, *sample):
                out = decode_shadow_jit(
                    params, cache, tokens, key, *sample,
                    engine._kernel_now, "batch",
                )
                engine._auto_observe(out[1])
                return out
        else:
            def decode_shadow_fn(params, cache, tokens, key, *sample):
                return decode_shadow_jit(
                    params, cache, tokens, key, *sample,
                    engine._kernel_now, "batch",
                )

        # Multi-step decode chunk: ONE dispatch + ONE sync per k steps
        # (serving's tunnel-tax fix, round-2 weak #6 — each jit call
        # through the axon tunnel costs a host round trip, measured
        # ~0.4-0.6 s against the ~5 ms device step). The k-step scan
        # carries ONLY the mutated cache fields; ShadowStatic leaves
        # stay jit-arg invariants because XLA copies every scan carry
        # buffer (cache/shadow.py:432). Teacher-forced suffix tokens
        # ride as traced [k, B] (value, on) arrays so admission replay
        # needs no mid-chunk host sync. k is the scan length — a new k
        # compiles a new program, so callers should reuse one chunk
        # size.
        @partial(jax.jit, static_argnums=(6, 7, 8, 9, 10),
                 donate_argnums=(1,))
        def decode_chunk_jit(params, cache, tokens, key, forced_val,
                             forced_on, temperature, top_k, top_p,
                             use_kernel, host_axis, *v_host):
            def body(carry, xs):
                k_buf, v_buf, ids, gen_len, toks, key = carry
                fv, fm = xs
                c = cache.replace(
                    k_buf=k_buf, v_buf=v_buf, cached_ids=ids,
                    gen_len=gen_len,
                )
                logits, c2 = forward.decode_shadow(
                    model, params, c, toks[:, None], self.cos_table,
                    self.sin_table, use_kernel=use_kernel,
                    v_store=engine.v_store, approx_topk=approx_topk,
                    ring_gather=ring_gather,
                    v_host=v_host[0] if v_host else None,
                    v_host_axis=host_axis,
                    mesh=engine.mesh,
                    unroll=engine._decode_unroll,
                    segmented=engine._decode_segmented,
                    debug_hit_rate=rt.debug_hit_rate,
                    debug_hit_layout=rt.debug_hit_layout,
                    hysteresis=rt.selection_hysteresis,
                )
                key, sub = jax.random.split(key)
                t2 = _sample(logits, sub, temperature, top_k, top_p)
                t2 = jnp.where(fm, fv, t2)
                return (
                    c2.k_buf, c2.v_buf, c2.cached_ids, c2.gen_len,
                    t2, key,
                ), t2

            carry0 = (cache.k_buf, cache.v_buf, cache.cached_ids,
                      cache.gen_len, tokens, key)
            carry, toks_all = jax.lax.scan(
                body, carry0, (forced_val, forced_on)
            )
            k_buf, v_buf, ids, gen_len, tokens, key = carry
            cache = cache.replace(
                k_buf=k_buf, v_buf=v_buf, cached_ids=ids,
                gen_len=gen_len,
            )
            return tokens, cache, key, toks_all

        if ring_host:
            def decode_chunk_fn(params, cache, tokens, key, fv, fm,
                                *sample):
                return decode_chunk_jit(
                    params, cache, tokens, key, fv, fm, *sample,
                    engine._kernel_now, engine._host_axis,
                    engine._host_v,
                )
        else:
            def decode_chunk_fn(params, cache, tokens, key, fv, fm,
                                *sample):
                return decode_chunk_jit(
                    params, cache, tokens, key, fv, fm, *sample,
                    engine._kernel_now, "batch",
                )

        # (hit-rate auto-tracking samples per STEP pairs; the chunked
        # program doesn't observe — serving doesn't drive 'auto'.)
        self._decode_chunk = decode_chunk_fn

        if self.pp > 1:
            self._decode_chunk = None  # pp decode is whole-program
            # layer-pipelined decode + prefill (parallel/pipeline.py)
            from shadowkv_tpu.parallel.pipeline import (
                decode_shadow_pp,
                prefill_shadow_pp,
            )

            @partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(1,))
            def decode_shadow_fn(params, cache, tokens, key, temperature,
                                 top_k, top_p):
                logits, cache = decode_shadow_pp(
                    model, params, cache, tokens, self.cos_table,
                    self.sin_table, engine.mesh, approx_topk=approx_topk,
                )
                return _sample(logits, key, temperature, top_k, top_p), cache

            @partial(jax.jit, donate_argnums=(1,))
            def prefill_pp_fn(params, cache, input_ids):
                return prefill_shadow_pp(
                    model, rt, params, cache, input_ids, self.cos_table,
                    self.sin_table, engine.mesh, use_flash=use_flash,
                )

            self._prefill_pp = prefill_pp_fn

        @partial(jax.jit, static_argnums=(2, 3, 4))
        def sample_fn(logits, key, temperature, top_k, top_p):
            return _sample(logits, key, temperature, top_k, top_p)

        # Write a sub-batch shadow cache's slots into the full-batch
        # cache at (traced) batch offset b0. Used by the incremental
        # offload prefill and by continuous-batching admission in
        # offload mode; v_full is NOT merged (the big cache keeps a
        # zero-chunk placeholder — the real store lives host-side).
        @partial(jax.jit, donate_argnums=(0,))
        def merge_slots_fn(big, small, b0):
            def put(dst, src):
                idx = (0, b0) + (0,) * (dst.ndim - 2)
                return jax.lax.dynamic_update_slice(
                    dst, src.astype(dst.dtype), idx
                )

            updates = dict(
                u=put(big.u, small.u),
                sv=put(big.sv, small.sv),
                landmarks=put(big.landmarks, small.landmarks),
                landmark_mask=put(big.landmark_mask, small.landmark_mask),
                k_buf=put(big.k_buf, small.k_buf),
                v_buf=put(big.v_buf, small.v_buf),
                cached_ids=put(big.cached_ids, small.cached_ids),
            )
            if big.lm_scale is not None:
                updates["lm_scale"] = put(big.lm_scale, small.lm_scale)
            return big.replace(**updates)

        # 'auto' decode-path helpers: a device-side copy of cached_ids
        # (the live buffer is donated by the next step) and the scalar
        # slot-hit fraction between two snapshots.
        self._copy_ids = jax.jit(lambda x: x + 0)
        self._hit_frac = jax.jit(
            lambda a, b: jnp.mean((a == b).astype(jnp.float32))
        )

        # merge_slots + the V store: restores a 1-slot snapshot into a
        # live HBM-mode cache (shared-prefix context reuse, serving.py;
        # offload engines restore host rows separately).
        @partial(jax.jit, donate_argnums=(0,))
        def merge_slots_v_fn(big, small, b0):
            big = merge_slots_fn(big, small, b0)
            idx = (0, b0) + (0,) * (big.v_full.ndim - 2)
            return big.replace(
                v_full=jax.lax.dynamic_update_slice(
                    big.v_full, small.v_full.astype(big.v_full.dtype), idx
                )
            )

        self._merge_slots_v = merge_slots_v_fn

        # Inverse of merge_slots_fn: copy slot b0's state out of the
        # full-batch cache into a 1-slot cache pytree (serving's
        # shared-prefix context snapshots, serving.py).
        @jax.jit
        def extract_slot_fn(big, b0):
            def take(x):
                idx = (0, b0) + (0,) * (x.ndim - 2)
                return jax.lax.dynamic_slice(
                    x, idx, (x.shape[0], 1) + x.shape[2:]
                )

            updates = dict(
                u=take(big.u),
                sv=take(big.sv),
                landmarks=take(big.landmarks),
                landmark_mask=take(big.landmark_mask),
                k_buf=take(big.k_buf),
                v_buf=take(big.v_buf),
                v_full=take(big.v_full),
                cached_ids=take(big.cached_ids),
                gen_len=jax.lax.dynamic_slice(big.gen_len, (b0,), (1,)),
            )
            if big.lm_scale is not None:
                updates["lm_scale"] = take(big.lm_scale)
            return big.replace(**updates)

        self._extract_slot = extract_slot_fn

        self._prefill_full = prefill_full_fn
        self._prefill_shadow = prefill_shadow_fn
        self._decode_full = decode_full_fn
        self._decode_shadow = decode_shadow_fn
        self._sample = sample_fn
        self._merge_slots = merge_slots_fn
        # (Round-2 finding: jitted host-space dus/slice are rejected at
        # the jax level on this platform even with explicit pinned
        # in_shardings — the pinned V store is therefore kept as
        # per-slot/per-segment PARTS that are replaced wholesale by
        # direct device_puts; see _commit_host_v / _host_v_write.)

    @property
    def is_shadow(self) -> bool:
        return self.cache_cfg.mode in ("shadow", "shadow_offload")

    # -- prefill ------------------------------------------------------------

    def prefill(self, input_ids: np.ndarray):
        """Prefill in sub-batches (reference batch_prefill T=4/8,
        models/base.py:533-543); returns (last-token logits, cache)."""
        input_ids = jnp.asarray(input_ids, jnp.int32)
        b, s = input_ids.shape
        assert s <= self.cache_cfg.max_length, (
            f"prompt length {s} exceeds max_length "
            f"{self.cache_cfg.max_length} (RoPE tables / cache would be "
            "silently clamped)"
        )
        t = max(1, min(self.rt.prefill_sub_batch, b))
        logits_parts = []
        if self.is_shadow:
            # int8 store layout follows the decode path: tiled for the
            # Pallas kernel's DMAs, flat rows for the XLA gather
            # (core/quant.py module docstring).
            # int8 stores: both Pallas decode paths (fused refresh,
            # ring gather) DMA tiled (32, row) chunks; the XLA path
            # gathers flat rows (core/quant.py module docstring).
            layout = ShadowLayout.build(
                self.cache_cfg, s,
                # 'auto' may flip to the fused kernel mid-decode: it
                # needs the tiled int8 store from the start (one tiled
                # format serves BOTH paths at ~equal XLA-gather speed).
                kernel_store=(
                    self.use_pallas or self.ring_gather or self.pallas_auto
                ),
                # MHA-style head counts (>15) widen the int8 scale
                # trailer (scale_lanes_for, core/quant.py).
                num_kv_heads=self.model.num_kv_heads,
            )
            if self.pp > 1:
                # Layer-pipelined whole-batch prefill: each pipeline
                # stage prefills its local layers' cache slices;
                # microbatching bounds activations like sub-batching
                # (parallel/pipeline.py).
                cache = self._shard_cache(
                    ShadowCache.init(self.model, layout, b)
                )
                lg, cache = self._prefill_pp(self.params, cache, input_ids)
                logits_parts.append(lg)
            elif self.rt.sp > 1:
                # Sequence-parallel prefill: the WHOLE batch in one
                # program with the sequence dim sharded over 'sp'
                # (per-chip activations are [B, S/sp, D] — sp is what
                # makes whole-batch long-context prefill fit), then the
                # cache reshards batch-over-(dp, sp) for decode.
                lg, cache = self._prefill_sp(layout, input_ids)
                cache = self._shard_cache(cache)
                logits_parts.append(lg)
            elif self.cache_cfg.mode == "shadow_offload" and self.mesh is None:
                if self.rt.offload_prefill_segments > 1:
                    # Layer-segmented offload prefill: evict each layer
                    # segment's V to pinned host DRAM before the next
                    # runs — peak HBM holds L/segments layers of V
                    # (what fits 8B@122K prefill on one 16 GB chip).
                    cache = self._prefill_offload_segmented(
                        input_ids, layout, logits_parts
                    )
                else:
                    # Incremental offload: each sub-batch's V store is
                    # evicted to host DRAM as soon as that sub-batch's
                    # prefill produces it, so peak HBM holds ONE
                    # sub-batch of V, never the full batch (the
                    # reference's async V->pinned-CPU copy during
                    # prefill, kv_cache.py:825-828 — a full-batch 122K
                    # V store is larger than the chip).
                    cache = self._prefill_offload_incremental(
                        input_ids, layout, t, logits_parts
                    )
            else:
                cache = self._shard_cache(
                    ShadowCache.init(self.model, layout, b)
                )
                for b0 in range(0, b, t):
                    lg, cache = self._prefill_shadow(
                        self.params, cache, input_ids[b0 : b0 + t], b0
                    )
                    logits_parts.append(lg)
                if self.cache_cfg.mode == "shadow_offload":
                    cache = self._offload_v(cache)
        else:
            cache = self._shard_cache(
                FullCache.init(self.model, self.cache_cfg, b)
            )
            for b0 in range(0, b, t):
                lg, cache = self._prefill_full(
                    self.params, cache, 0, input_ids[b0 : b0 + t], b0
                )
                logits_parts.append(lg)
        logits = (
            logits_parts[0]
            if len(logits_parts) == 1
            else jnp.concatenate(logits_parts, axis=0)
        )
        self._cache = cache  # save_state()-able before any decode
        return logits, cache

    def _prefill_sp(self, layout, input_ids):
        """Whole-batch sequence-parallel shadow prefill (RuntimeConfig.sp):
        ids sharded [B/dp, S/sp] per chip, jitted once per layout (the
        layout is static — it sizes every cache buffer)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rt = self.rt
        b, s = input_ids.shape
        assert s % rt.sp == 0, (
            f"sp={rt.sp} must divide the prompt length {s} (shard_map "
            "needs an even sequence split)"
        )
        assert b % (rt.dp * rt.sp) == 0, (
            f"batch {b} must divide dp*sp={rt.dp * rt.sp} (decode "
            "shards the batch over both axes)"
        )
        fn = self._sp_prefill_jits.get(layout)
        if fn is None:
            model, mesh = self.model, self.mesh

            @jax.jit
            def fn(params, ids):
                return forward.prefill_shadow(
                    model, rt, layout, params, ids,
                    self.cos_table, self.sin_table, sp_mesh=mesh,
                )

            self._sp_prefill_jits[layout] = fn
        ids = jax.device_put(
            jnp.asarray(input_ids, jnp.int32),
            NamedSharding(self.mesh, P("dp", "sp")),
        )
        return fn(self.params, ids)

    def _host_space_update_supported(self) -> bool:
        """Probe: can this platform run a jitted dynamic_update_slice
        whose inputs AND output live in pinned host memory? True means
        the offloaded V store can be assembled/updated entirely on the
        device host (no staging through local numpy — which, through a
        remote-TPU tunnel, would round-trip the multi-GB store over the
        network). CPU lacks the output-side device-placement annotation
        (see _commit_host_v), so this returns False there."""
        if self._host_dus is None:
            self._host_dus = _probe_host_space_dus()
        return self._host_dus

    def _pinned_sharding(self):
        if (
            self.mesh is not None
            and "dp" in self.mesh.axis_names
            and "tp" in self.mesh.axis_names
        ):
            return jax.sharding.NamedSharding(
                self.mesh,
                jax.sharding.PartitionSpec(None, "dp", "tp"),
                memory_kind="pinned_host",
            )
        return jax.sharding.SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        )

    def _use_host_parts(self) -> bool:
        """Per-slot host V parts (the in-place-update-free store): the
        single-chip ring path. Mesh engines keep one array (shard_map
        takes one operand); the fused refresh kernel likewise."""
        return self.ring_gather and self.mesh is None

    @staticmethod
    def _host_aligned(v):
        """Host-word layout for a chunk-major V store [..., CT, TS, WV]:
        host-space DMA descriptors need every stride / dynamic-offset
        multiplier to be a 4096-byte multiple (Mosaic LLO,
        benchmarks/probe_ring_compile.py), so leading rows are reshaped
        to whole 4096-B units — identity for int8 32-row tiles
        (32*128 = 4096), pairs bf16 8-row chunks into 16-row units.
        A chunk-tile count not divisible by the fold factor is ZERO-
        PADDED first: the ring kernel addresses units as cid // pt_v,
        so trailing pad units are never touched by real chunk ids.
        Otherwise a pure reshape: the bytes (and the numpy mirror/
        slot-row slicing on dims 0..2) are unchanged."""
        ts, wv = v.shape[-2], v.shape[-1]
        unit = ts * wv * v.dtype.itemsize
        if unit % 4096 == 0:
            return v
        f = -(-4096 // unit)
        assert (unit * f) % 4096 == 0, (v.shape, v.dtype, unit)
        ct = v.shape[-3]
        if ct % f:
            pad = f - ct % f
            widths = [(0, 0)] * (v.ndim - 3) + [(0, pad), (0, 0), (0, 0)]
            xp = np if isinstance(v, np.ndarray) else jnp
            v = xp.pad(v, widths)
            ct += pad
        return v.reshape(*v.shape[:-3], ct // f, ts * f, wv)

    @staticmethod
    def _host_dealigned(v, raw_ts: int, raw_ct: int | None = None):
        """Inverse of _host_aligned: restore the raw chunk-major row
        layout (identity when alignment was an identity); ``raw_ct``
        truncates the zero-padding alignment may have appended."""
        ts, wv = v.shape[-2], v.shape[-1]
        if ts == raw_ts:
            return v
        assert ts % raw_ts == 0, (v.shape, raw_ts)
        f = ts // raw_ts
        v = v.reshape(*v.shape[:-3], v.shape[-3] * f, raw_ts, wv)
        if raw_ct is not None and v.shape[-3] != raw_ct:
            v = v[..., :raw_ct, :, :]
        return v

    def _host_v_write(self, v_sub, b0: int, total_b: int):
        """Write a sub-batch's device-resident chunk-major V store into
        the pinned-host store at batch offset ``b0``. Per-slot parts:
        each slot's rows are one direct d2h device_put — no host-side
        update primitive exists on this platform (host-space dus is
        rejected; a numpy mirror crosses the tunnel at ~0.2 GB/s)."""
        if self._host_parts is None or len(self._host_parts) != total_b:
            self._host_parts = [None] * total_b
        pinned = self._pinned_sharding()
        tt = v_sub.shape[1]
        for i in range(tt):
            self._host_parts[b0 + i] = jax.device_put(
                self._host_aligned(v_sub[:, i : i + 1]), pinned
            )
        self._host_v = tuple(self._host_parts)

    def _pinned_host_direct(self) -> bool:
        """True when slot snapshots/restores can stay entirely in the
        device's pinned host memory (no numpy staging across the
        tunnel) — the per-slot-parts store makes this unconditional on
        single-chip ring engines."""
        return self._use_host_parts() and self._host_parts is not None

    def host_slot_rows(self, slot: int):
        """Copy one batch slot's chunk-major V rows out of the host
        store (serving's shared-prefix context snapshots). Returns a
        pinned-host jax array when the platform supports host-space
        slicing, else a local numpy copy."""
        assert self.cache_cfg.mode == "shadow_offload"
        if self.ring_host:
            if self._pinned_host_direct():
                # the store IS per-slot pinned arrays — the snapshot is
                # a reference, zero copies (snapshots are never written
                # in place: set_host_slot_rows replaces whole parts)
                return self._host_parts[slot]
            src = (
                self._host_v_np
                if self._host_v_np is not None
                else np.asarray(self._host_v)
            )
            return np.array(src[:, slot : slot + 1])
        l, b, k, c, cs, dh = self.v_store.shape
        return np.array(
            self.v_store.rows.reshape(l, b, k, c, cs, dh)[
                :, slot : slot + 1
            ]
        )

    def set_host_slot_rows(self, rows, slot: int) -> None:
        """Restore one slot's host-side V rows (context snapshot
        reuse); the same write paths as admit_slot."""
        assert self.cache_cfg.mode == "shadow_offload"
        if self.ring_host:
            if self._use_host_parts() and self._host_parts is not None:
                if (
                    isinstance(rows, jax.Array)
                    and rows.sharding.memory_kind == "pinned_host"
                ):
                    self._host_parts[slot] = rows  # already a part
                else:
                    self._host_parts[slot] = jax.device_put(
                        self._host_aligned(rows), self._pinned_sharding()
                    )
                self._host_v = tuple(self._host_parts)
                return
            if self._host_v_np is None:
                self._host_v_np = np.array(self._host_v)
            rows = np.asarray(rows)
            if self.ring_gather:
                rows = self._host_aligned(rows)
            self._host_v_np[:, slot : slot + 1] = rows
            self._host_v = jax.device_put(
                self._host_v_np, self._pinned_sharding()
            )
            return
        self.v_store.update_slot(slot, np.asarray(rows))

    def _prefill_offload_incremental(
        self, input_ids, layout, t: int, logits_parts: list
    ) -> ShadowCache:
        """Sub-batch prefill for the offloaded-V modes: each sub-batch
        prefills into a small REAL cache, its V store is evicted to
        host DRAM immediately, and the V-less slices merge into the
        full-batch cache (whose v_full is a zero-chunk placeholder).
        Peak HBM holds one sub-batch of V, never the full batch — the
        TPU shape of the reference's async V->pinned-CPU copy during
        prefill (kv_cache.py:825-828)."""
        b, s = input_ids.shape
        cache = ShadowCache.init(
            self.model, layout, b, v_placeholder=True
        )
        self._host_axis = "batch"
        pinned_path = self._use_host_parts()
        v_np = None
        for b0 in range(0, b, t):
            tt = min(t, b - b0)
            small = ShadowCache.init(self.model, layout, tt)
            lg, small = self._prefill_shadow(
                self.params, small, input_ids[b0 : b0 + tt], 0
            )
            logits_parts.append(lg)
            if pinned_path:
                self._host_v_write(small.v_full, b0, b)
            else:
                v_sub = np.asarray(small.v_full)
                if v_np is None:
                    v_np = np.empty(
                        v_sub.shape[:1] + (b,) + v_sub.shape[2:],
                        v_sub.dtype,
                    )
                v_np[:, b0 : b0 + tt] = v_sub
            small = small.replace(v_full=_v_placeholder(small.v_full))
            cache = self._merge_slots(cache, small, b0)
        if self.ring_host:
            if pinned_path:
                self._host_v_np = None  # per-slot parts are authoritative
            else:
                # Only the ring kernel speaks the host-aligned layout;
                # the fused refresh kernel (use_pallas offload) expects
                # the raw chunk layout (mirrors _commit_host_v).
                if self.ring_gather:
                    v_np = self._host_aligned(v_np)
                self._host_v_np = v_np
                self._host_v = jax.device_put(
                    v_np, self._pinned_sharding()
                )
        else:
            from shadowkv_tpu.cache.offload import HostVStore

            self._host_v_np = None
            if self.v_store is None:
                self.v_store = HostVStore(v_np)
            else:
                self.v_store.update(v_np)
        return cache

    def _prefill_offload_segmented(
        self, input_ids, layout, logits_parts
    ) -> ShadowCache:
        """Layer-segmented offload prefill (ring host store): the layer
        scan is split into rt.offload_prefill_segments cond-gated
        segments sharing ONE compiled program (a traced layer0); after
        each call the segment's V buffer is committed to pinned host
        DRAM as a LAYER-sharded part (the ring kernel selects the
        owning part per DMA). Peak HBM holds seg_len layers of V —
        the reference's per-layer V->pinned-CPU copy during prefill
        (kv_cache.py:825-828). Requires the whole batch in one call."""
        from shadowkv_tpu.models import forward

        b, s = input_ids.shape
        n_seg = self.rt.offload_prefill_segments
        n_layers = self.model.num_layers
        assert self.ring_gather and self.mesh is None, (
            "segmented offload prefill serves the single-chip ring path"
        )
        assert n_layers % n_seg == 0, (n_layers, n_seg)
        seg_len = n_layers // n_seg
        cache = ShadowCache.init(
            self.model, layout, b, v_placeholder=True
        )
        kh, dh = self.model.num_kv_heads, self.model.head_dim
        q8 = layout.quant == "int8"
        pt = (32 // layout.chunk_size) if q8 else 1
        v_shape = (
            seg_len, b, kh, layout.chunks // pt,
            (32 if q8 else layout.chunk_size), dh,
        )
        v_seg = jnp.zeros(v_shape, jnp.int8 if q8 else self.model.dtype)

        if self._seg_prefill_jit is None:
            model, rt = self.model, self.rt
            use_flash = jax.devices()[0].platform != "cpu"

            @partial(jax.jit, donate_argnums=(1, 2, 3),
                     static_argnums=(5,))
            def seg_fn(params, cache, v_seg, x, layer0, seg_len):
                return forward.prefill_shadow_segment(
                    model, rt, params, cache, v_seg, x,
                    self.cos_table, self.sin_table, layer0, seg_len,
                    use_flash=use_flash,
                )

            self._seg_prefill_jit = seg_fn
            self._embed_jit = jax.jit(
                lambda p, ids: wquant.take_rows(
                    p.embed, ids, model.dtype
                )
            )

        x = self._embed_jit(
            self.params, jnp.asarray(input_ids, jnp.int32)
        )
        pinned = self._pinned_sharding()
        parts = []
        lg = None
        for si in range(n_seg):
            lg, x, cache, v_seg = self._seg_prefill_jit(
                self.params, cache, v_seg, x,
                jnp.asarray(si * seg_len, jnp.int32), seg_len,
            )
            part = jax.device_put(self._host_aligned(v_seg), pinned)
            # serialize the d2h against the donated reuse of v_seg by
            # the next segment call
            jax.block_until_ready(part)
            parts.append(part)
        logits_parts.append(lg)
        self._host_parts = parts
        self._host_v = tuple(parts)
        self._host_axis = "layer"
        self._host_v_np = None
        return cache

    def admit_slot(self, cache: ShadowCache, input_ids_row, slot: int):
        """Prefill ONE request into batch slot ``slot`` of a live cache
        (continuous-batching admission, serving.ContinuousBatcher).

        Shadow (HBM) mode prefills directly into the donated cache.
        Offload modes prefill a 1-slot cache, merge its V-less slices,
        and overwrite the host store's slot: in-place numpy rows for
        the io_callback path, a pinned-host slot write (or numpy-mirror
        repin fallback) for the ring/fused-kernel paths. Returns
        (last-token logits [1, 1, V], cache)."""
        ids = jnp.asarray(input_ids_row, jnp.int32)[None]
        if self.cache_cfg.mode != "shadow_offload":
            return self._prefill_shadow(self.params, cache, ids, slot)
        layout = cache.layout
        small = ShadowCache.init(self.model, layout, 1)
        lg, small = self._prefill_shadow(self.params, small, ids, 0)
        if self.ring_host:
            assert self._host_axis == "batch", (
                "slot admission over a layer-sharded host store (from a "
                "segmented offload prefill) is unsupported — serve with "
                "offload_prefill_segments=1"
            )
            if self._use_host_parts() and self._host_parts is not None:
                self._host_v_write(
                    small.v_full, slot, len(self._host_parts)
                )
            else:
                if self._host_v_np is None:
                    # one-time mirror pull (engine came from load_state,
                    # a mesh prefill, or a platform without host-dus);
                    # np.array COPIES — np.asarray of a jax array is a
                    # read-only view
                    self._host_v_np = np.array(self._host_v)
                rows = np.asarray(small.v_full)
                if self.ring_gather:
                    # the mirror lives in the host-ALIGNED row layout
                    rows = self._host_aligned(rows)
                self._host_v_np[:, slot : slot + 1] = rows
                self._host_v = jax.device_put(
                    self._host_v_np, self._pinned_sharding()
                )
        else:
            self.v_store.update_slot(slot, np.asarray(small.v_full))
        small = small.replace(v_full=_v_placeholder(small.v_full))
        cache = self._merge_slots(cache, small, slot)
        return lg, cache

    def _offload_v(self, cache: ShadowCache) -> ShadowCache:
        """Move the chunk-major V store to host DRAM.

        TPU analogue of the reference's pinned-CPU V cache
        (kv_cache.py:554-563); misses are fetched back per step through
        an io_callback + the native host gather (cache/offload.py). The
        device-side v_full leaf shrinks to a zero-chunk placeholder so
        the pytree structure (and the decode jit) stays unchanged.
        """
        if self.ring_host:
            # The store moves to pinned host memory and is passed to the
            # decode jit as an INPUT-ONLY argument (host-memory leaves
            # must not appear in jit outputs — XLA's device-placement
            # annotation is output-side and not universally supported);
            # the Pallas kernels DMA chunks host->HBM per step.
            return self._commit_host_v(cache, cache.v_full)
        from shadowkv_tpu.cache.offload import HostVStore

        if self.v_store is None:
            self.v_store = HostVStore(cache.v_full)
        else:
            self.v_store.update(cache.v_full)
        return cache.replace(v_full=_v_placeholder(cache.v_full))

    def _commit_host_v(self, cache, v_data):
        """Pin ``v_data`` (device array or host numpy) in host memory as
        the decode jit's input-only V store; the cache keeps a
        zero-chunk placeholder. numpy input never stages through HBM
        (a 122K/b4 store is ~the size of the whole chip).

        Single-chip ring engines split the store into PER-SLOT pinned
        parts (serving admission / snapshot restore then replace one
        part with a direct d2h device_put — the only host-store update
        this platform supports)."""
        self._host_axis = "batch"  # every commit here shards by batch
        if self._use_host_parts():
            b = v_data.shape[1]
            pinned = self._pinned_sharding()
            self._host_parts = [
                jax.device_put(
                    self._host_aligned(v_data[:, i : i + 1]), pinned
                )
                for i in range(b)
            ]
            self._host_v = tuple(self._host_parts)
            self._host_v_np = None
            shape = v_data.shape
            return cache.replace(
                v_full=jnp.zeros(
                    shape[:3] + (0,) + shape[4:], v_data.dtype
                )
            )
        if isinstance(v_data, jax.Array) and (
            self.mesh is None
            or isinstance(v_data.sharding, jax.sharding.NamedSharding)
        ):
            sharding = v_data.sharding.with_memory_kind("pinned_host")
        elif self.mesh is not None:
            sharding = jax.sharding.NamedSharding(
                self.mesh,
                jax.sharding.PartitionSpec(None, "dp", "tp"),
                memory_kind="pinned_host",
            )
        else:
            sharding = jax.sharding.SingleDeviceSharding(
                jax.devices()[0], memory_kind="pinned_host"
            )
        # Only the ring kernel speaks the host-aligned row layout; the
        # fused refresh kernel (use_pallas offload) keeps the raw
        # chunk-tile layout and its own window logic.
        v_aligned = (
            self._host_aligned(v_data) if self.ring_gather else v_data
        )
        self._host_v = jax.device_put(v_aligned, sharding)
        # keep the numpy mirror when one exists (serving admission
        # updates a slot in it and repins) — in the ALIGNED layout, so
        # slot writes and the pinned store stay byte-compatible
        self._host_v_np = (
            v_aligned if isinstance(v_aligned, np.ndarray) else None
        )
        return cache.replace(v_full=_v_placeholder(self._host_v))

    # -- prefilled-state checkpointing --------------------------------------

    def save_state(self, path: str):
        """Persist the current cache (post-prefill or mid-generation) so
        another process can resume this context without re-prefilling
        (utils/checkpoint.py; new capability — the reference recomputes
        SVD + landmarks every run, SURVEY.md §5.4)."""
        from shadowkv_tpu.utils.checkpoint import save_shadow_state

        assert self.is_shadow, "save_state supports shadow caches"
        assert self._cache is not None, (
            "save_state needs a prefilled cache: call prefill()/"
            "generate() first"
        )
        cache = self._cache
        variant = "hbm"
        if self.ring_host:
            # Fold the pinned-host store back into the pytree for the
            # save (np.asarray reads it host-side, no device copy).
            hv = self._host_v
            if isinstance(hv, tuple):  # multi-part store -> one array:
                # parts shard the batch axis (per-slot serving parts)
                # or the layer axis (segmented offload prefill)
                hv = np.concatenate(
                    [np.asarray(p) for p in hv],
                    axis=0 if self._host_axis == "layer" else 1,
                )
            # Checkpoints persist the RAW chunk layout — the ring
            # store's host-ALIGNED rows (bf16: paired 16-row units)
            # would silently mis-shape a cross-placement load into an
            # hbm/io_callback engine; load_state re-aligns via
            # _commit_host_v on ring engines.
            lo = self._cache.layout
            tiled = lo.quant == "int8" and lo.kernel_store
            raw_ts = 32 if tiled else lo.chunk_size
            raw_ct = lo.chunks // (
                (32 // lo.chunk_size) if tiled else 1
            )
            hv = self._host_dealigned(np.asarray(hv), raw_ts, raw_ct)
            cache = cache.replace(v_full=hv)
            variant = "ring"
        elif self.v_store is not None:
            variant = "io_callback"
        save_shadow_state(
            cache, path, v_store=self.v_store, variant=variant
        )

    def load_state(self, path: str):
        """Load a checkpoint written by save_state; afterwards
        ``generate(..., cont=True)`` continues that context.

        Checkpoints are cross-compatible between V placements (hbm /
        ring / io_callback engines): the store lands wherever THIS
        engine keeps it. The static layout must match this engine's
        cache config and decode path — validated here, because a
        mismatch (e.g. a flat-row int8 store fed to the tiled-store
        kernels, or differing gen capacities) corrupts silently.
        """
        from shadowkv_tpu.cache.offload import HostVStore
        from shadowkv_tpu.utils.checkpoint import load_shadow_state

        assert self.is_shadow, "load_state supports shadow caches"
        offloaded = self.cache_cfg.mode == "shadow_offload"
        cache, host_v = load_shadow_state(
            path, v_to="numpy" if offloaded else "device"
        )
        self._check_layout(cache.layout)
        cache = self._shard_cache(cache)
        if self.ring_host:
            cache = self._commit_host_v(cache, host_v)
        elif offloaded:
            if self.v_store is None:
                self.v_store = HostVStore(host_v)
            else:
                self.v_store.update(host_v)
        self._cache = cache

    def _check_layout(self, lo):
        cc = self.cache_cfg
        expect = {
            "chunk_size": cc.chunk_size,
            "select_sets": cc.select_sets,
            "rank": cc.rank,
            "gen_capacity": cc.gen_capacity,
            "quant": cc.kv_quant,
            # Mirrors ShadowLayout.build's gating: the tiled store only
            # exists for int8 (bf16 stores are one layout for all paths).
            "kernel_store": (self.use_pallas or self.ring_gather)
            and cc.kv_quant == "int8",
        }
        got = {k: getattr(lo, k) for k in expect}
        assert got == expect, (
            f"checkpoint layout does not match this engine: {got} != "
            f"{expect}"
        )
        assert lo.prefill_len <= cc.max_length, (
            f"checkpoint prefill_len {lo.prefill_len} exceeds "
            f"max_length {cc.max_length} (RoPE tables too short)"
        )

    # -- adaptive decode path (use_pallas='auto') ----------------------------

    def _auto_observe(self, cache) -> None:
        """Track the measured slot hit rate and switch decode paths.

        Slot-STABLE assignment (core/selection.py::assign_slots_stable)
        means a slot's chunk id is unchanged between consecutive steps
        iff that slot was a hit, so the per-step hit rate is exactly
        ``mean(ids[t] == ids[t+1])``. Sampled one consecutive pair per
        ``pallas_auto_interval`` steps (one scalar host sync per
        interval); EMA crossing ``pallas_hit_threshold`` flips between
        the XLA gather path (miss-heavy) and the fused refresh kernel
        (hit-heavy) — the regime split measured on v5e (CLAUDE.md /
        reference index.html:326's ~60 % real-model hit rates).
        """
        rt = self.rt
        phase = self._auto_counter % max(2, rt.pallas_auto_interval)
        self._auto_counter += 1
        if phase == 0:
            self._auto_prev_ids = self._copy_ids(cache.cached_ids)
        elif phase == 1 and self._auto_prev_ids is not None:
            frac = float(
                self._hit_frac(self._auto_prev_ids, cache.cached_ids)
            )
            self._auto_prev_ids = None
            ema = self._auto_hit_ema
            self._auto_hit_ema = (
                frac if ema is None else 0.5 * ema + 0.5 * frac
            )
            self._hit_samples.append(frac)
            if not self.pallas_auto:
                return  # rt.track_hit_rate: observe only, never switch
            thresh = rt.pallas_hit_threshold
            if thresh is None:
                # measured crossovers (prof_refresh_sweep cs8/cs16)
                thresh = (
                    0.45 if self.cache_cfg.chunk_size >= 16 else 0.7
                )
            # Dead-band around the crossover (round 5): a workload
            # whose EMA sits AT the threshold made auto oscillate
            # (bench_trained_auto_r5: 2 switches, 118.9 tok/s — worse
            # than either path held steady). Flip ON only clearly
            # above, OFF only clearly below; inside the band both
            # paths cost the same anyway (that is what a crossover
            # means), so staying put is free.
            band = rt.pallas_auto_deadband
            if self._kernel_now:
                want = self._auto_hit_ema >= thresh - band
            else:
                want = self._auto_hit_ema >= thresh + band
            if want != self._kernel_now:
                self._kernel_now = want
                self._auto_switches += 1

    def _auto_reset(self) -> None:
        self._auto_prev_ids = None
        self._auto_counter = 0
        if self.pallas_auto:
            self._kernel_now = False

    # -- observability ------------------------------------------------------

    def kv_stats(self) -> dict:
        """Measured cache statistics from the LIVE pytree (reference
        print_stats / print_kv_stats, kv_cache.py:651-663 +
        models/base.py:100-107, but exact: every field's real nbytes
        including quantization, lane padding and the compact-buffer
        capacity, not an estimate)."""
        cc, m = self.cache_cfg, self.model
        out: dict = {"mode": cc.mode, "quant": cc.kv_quant}
        cache = self._cache
        if cache is None:
            return out
        fields = {
            name: getattr(cache, name)
            for name in type(cache).__dataclass_fields__  # flax.struct
        }
        bytes_by_field = {
            k: int(v.nbytes)
            for k, v in fields.items()
            if hasattr(v, "nbytes")
        }
        out["bytes_by_field"] = bytes_by_field
        host_bytes = 0
        if self._host_v is not None:
            host_bytes = int(self._host_v.nbytes)
            # the device pytree keeps a zero-chunk placeholder for
            # v_full in offload mode — don't count it as HBM
            bytes_by_field.pop("v_full", None)
        elif self.v_store is not None and getattr(
            self.v_store, "rows", None
        ) is not None:
            host_bytes = int(self.v_store.rows.nbytes)
            bytes_by_field.pop("v_full", None)
        out["device_bytes"] = sum(bytes_by_field.values())
        out["host_bytes"] = host_bytes
        if self.is_shadow:
            lo = cache.layout
            gen = int(jax.device_get(cache.gen_len).max())
            cached = lo.prefill_len + gen
            bytes_per = 2 if m.dtype != jnp.float32 else 4
            full_equiv = (
                2 * m.num_layers * cache.k_buf.shape[1] * m.num_kv_heads
                * max(cached, 1) * m.head_dim * bytes_per
            )
            out.update(
                sparse_budget=cc.sparse_budget,
                chunk_size=cc.chunk_size,
                rank=cc.rank,
                cached=cached,
                local_chunks=cc.local_chunks,
                outlier_chunks=cc.resolved_outlier_chunks(),
                full_equivalent_bytes=full_equiv,
                hbm_reduction=full_equiv / max(1, out["device_bytes"]),
            )
            if self._hit_samples:
                import numpy as _np

                out.update(
                    hit_rate_mean=float(_np.mean(self._hit_samples)),
                    hit_rate_ema=self._auto_hit_ema,
                    hit_samples=len(self._hit_samples),
                )
            if self.pallas_auto:
                out.update(
                    auto_hit_ema=self._auto_hit_ema,
                    auto_kernel_now=self._kernel_now,
                    auto_switches=self._auto_switches,
                )
        else:
            out["cached"] = int(jax.device_get(cache.length))
        return out

    def print_kv_stats(self) -> None:
        s = self.kv_stats()
        if not s.get("bytes_by_field"):
            print(f"[KV] mode={s['mode']}: no live cache (prefill first)")
            return
        gib = 2.0**30
        if self.is_shadow:
            parts = ", ".join(
                f"{k} {v / gib:.3f}"
                for k, v in sorted(
                    s["bytes_by_field"].items(), key=lambda kv: -kv[1]
                )
                if v > 0
            )
            print(
                f"[KV] {s['mode']} | budget {s['sparse_budget']} | chunk "
                f"{s['chunk_size']} | rank {s['rank']} | cached "
                f"{s['cached']} | local {s['local_chunks']} | outlier "
                f"{s['outlier_chunks']} | HBM {s['device_bytes'] / gib:.2f} "
                f"GiB ({parts}) | host {s['host_bytes'] / gib:.2f} GiB | "
                f"full-attn equivalent {s['full_equivalent_bytes'] / gib:.2f}"
                f" GiB ({s['hbm_reduction']:.1f}x HBM reduction)"
            )
        else:
            print(
                f"[KV] full | cached {s['cached']} | HBM "
                f"{s['device_bytes'] / gib:.2f} GiB"
            )

    # -- generation ---------------------------------------------------------

    def generate(
        self,
        input_ids: np.ndarray,
        gen_len: int = 256,
        temperature: float = 0.0,
        top_k: int = 50,
        top_p: float = 0.9,
        seed: int = 0,
        stop_ids: tuple[int, ...] = (),
        benchmark: bool = False,
        cont: bool = False,
        cont_chunk: int = 16,
    ) -> tuple[np.ndarray, GenerationStats]:
        """Autoregressive generation for a batch of equal-length prompts.

        Returns ([B, <=gen_len] generated ids, stats). Stop-token
        handling truncates per sequence post-hoc (decode continues for
        the full batch, as the reference's batch loop does).

        ``cont=True`` continues over the cache left by the previous
        generate() call (reference generate(cont=True) for chat turns
        against a prefilled context, models/base.py:162-204,386-497):
        the new prompt is teacher-forced token-by-token through the
        decode step — no new prefill compile per turn length.
        """
        stats = GenerationStats()
        b, s = np.asarray(input_ids).shape
        if self.is_shadow and not cont:
            assert gen_len <= self.cache_cfg.gen_capacity, (
                f"gen_len {gen_len} > gen_capacity "
                f"{self.cache_cfg.gen_capacity}"
            )
        if not self.is_shadow and not cont:
            # FullCache is allocated at exactly max_length; appends past
            # it would be silently clamped by dynamic_update_slice.
            assert s + gen_len <= self.cache_cfg.max_length, (
                f"prompt {s} + gen_len {gen_len} exceeds full-cache "
                f"max_length {self.cache_cfg.max_length}"
            )
        decode = self._decode_shadow if self.is_shadow else self._decode_full
        key = jax.random.PRNGKey(seed)
        sample_args = (temperature, top_k, top_p)

        t0 = time.perf_counter()
        if cont:
            assert self._cache is not None, "cont=True needs a prior call"
            cache = self._cache
            # The decode steps below DONATE the cache; a stale
            # self._cache alias would reference deleted buffers if the
            # loop is interrupted (cleared until the loop completes).
            self._cache = None
            if self.is_shadow:
                used = int(cache.gen_len) + s + gen_len
                assert used <= self.cache_cfg.gen_capacity, (
                    f"gen region overflow: {used} > "
                    f"{self.cache_cfg.gen_capacity} (raise gen_capacity)"
                )
            prompt = jnp.asarray(input_ids, jnp.int32)
            tokens = None
            # Teacher-force the follow-up turn in MULTI-TOKEN decode
            # steps: the decode path takes [B, Qn] (row-space causal
            # mask in decode_attention_hm; selection sums scores over
            # the q positions, the reference's multi-q semantics,
            # kv_cache.py:431). cont_chunk-sized steps cut a 500-token
            # turn from 500 decode dispatches to ~32+4 (two compiled
            # programs: Qn=cont_chunk and Qn=1). The pp pipeline is
            # decode-qn=1 only (parallel/pipeline.py asserts).
            chunk = max(1, cont_chunk) if self.pp == 1 else 1
            t = 0
            while t < s:
                step = chunk if (s - t) >= chunk else 1
                key, sub = jax.random.split(key)
                tokens, cache = decode(
                    self.params, cache, prompt[:, t : t + step], sub,
                    *sample_args,
                )
                t += step
        else:
            logits, cache = self.prefill(input_ids)
            self._cache = None  # about to be donated (see cont branch)
            key, sub = jax.random.split(key)
            tokens = self._sample(logits, sub, *sample_args)
        tokens.block_until_ready()
        stats.prefill_seconds = time.perf_counter() - t0
        stats.prefill_tokens = b * s

        out = [np.asarray(tokens)]
        t0 = time.perf_counter()
        for _ in range(gen_len - 1):
            key, sub = jax.random.split(key)
            tokens, cache = decode(
                self.params, cache, tokens[:, None], sub, *sample_args
            )
            out.append(np.asarray(tokens))
            if stop_ids and b == 1 and out[-1][0] in stop_ids:
                break
        jax.block_until_ready(tokens)
        stats.decode_seconds = time.perf_counter() - t0
        # Only the timed decode steps count (the first token came from
        # the prefill logits, outside the timed region).
        stats.decode_tokens = b * (len(out) - 1)
        self._cache = cache  # kept for generate(cont=True) chat turns
        result = np.stack(out, axis=1)  # [B, T]
        if stop_ids:
            result = _truncate_at_stop(result, stop_ids)
        return result, stats

    def batch_generate(
        self,
        input_ids: np.ndarray,
        gen_len: int = 100,
        temperature: float = 0.6,
        top_k: int = 50,
        top_p: float = 0.9,
        seed: int = 0,
        warmup_steps: int = 2,
    ) -> tuple[np.ndarray, GenerationStats]:
        """Throughput-oriented generation (reference batch_generate,
        models/base.py:572-657): timed decode loop without host syncs
        in the middle."""
        b0, s0 = np.asarray(input_ids).shape
        if self.is_shadow:
            assert gen_len + warmup_steps <= self.cache_cfg.gen_capacity
        else:
            assert s0 + gen_len + warmup_steps <= self.cache_cfg.max_length
        stats = GenerationStats()
        b, s = np.asarray(input_ids).shape

        # Drop any previous run's cache BEFORE prefilling: a second
        # batch_generate on the same engine otherwise holds two
        # full-batch caches at the prefill peak (round-2: back-to-back
        # b4/122K runs OOM'd a chip the single run fits with room).
        self._cache = None
        t0 = time.perf_counter()
        logits, cache = self.prefill(input_ids)
        self._cache = None  # prefill re-aliases it; about to be donated
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        sample_args = (temperature, top_k, top_p)
        tokens = self._sample(logits, sub, *sample_args)
        tokens.block_until_ready()
        stats.prefill_seconds = time.perf_counter() - t0
        stats.prefill_tokens = b * s

        decode = self._decode_shadow if self.is_shadow else self._decode_full
        # Warmup (compile + cache steady-state), not timed. In 'auto'
        # mode alternate paths so BOTH programs compile here, not
        # mid-timed-loop at the first path switch.
        for i in range(warmup_steps):
            if self.pallas_auto and warmup_steps >= 2:
                self._kernel_now = i % 2 == 1
            key, sub = jax.random.split(key)
            tokens, cache = decode(
                self.params, cache, tokens[:, None], sub, *sample_args
            )
        if self.pallas_auto:
            self._auto_reset()
        jax.block_until_ready(tokens)

        out = []
        t0 = time.perf_counter()
        for _ in range(gen_len):
            key, sub = jax.random.split(key)
            tokens, cache = decode(
                self.params, cache, tokens[:, None], sub, *sample_args
            )
            out.append(tokens)
        jax.block_until_ready(tokens)
        stats.decode_seconds = time.perf_counter() - t0
        stats.decode_tokens = b * gen_len
        self._cache = cache  # post-run kv_stats / generate(cont=True)
        return np.stack([np.asarray(t) for t in out], axis=1), stats


def _truncate_at_stop(tokens: np.ndarray, stop_ids: tuple[int, ...]):
    """Zero out everything after the first stop token per row."""
    out = tokens.copy()
    for row in range(out.shape[0]):
        hits = np.isin(out[row], stop_ids).nonzero()[0]
        if hits.size:
            out[row, hits[0] :] = stop_ids[0]
    return out
