"""Configuration dataclasses for the engine.

The reference scatters configuration over argparse defaults, constructor
kwargs and in-class constants (see SURVEY.md §5.6; reference
``models/llama.py:172-182``, ``models/kv_cache.py:205-206,547-548``).
Here everything lives in three frozen dataclasses so a run is fully
described by (ModelConfig, CacheConfig, RuntimeConfig).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters for a decoder-only transformer.

    Mirrors the information the reference pulls from HF configs in
    ``models/llama.py``, ``glm.py``, ``qwen.py``, ``phi3.py``.
    """

    name: str = "llama"
    num_layers: int = 32
    hidden_size: int = 4096
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 14336
    vocab_size: int = 128256
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    # 'neox': rotate-half over the full head_dim (llama / yi / qwen / phi3).
    # 'glm': interleaved (even,odd) pairs over only the first
    #        ``rope_partial_dim`` dims, rest passed through
    #        (reference models/glm.py:261-273, kernels/rope_new.cu:429-534).
    rope_style: str = "neox"
    rope_partial_dim: Optional[int] = None
    # Llama-3.1-style NTK rope scaling (factor, low_freq_factor,
    # high_freq_factor, original_max_position_embeddings) or None.
    # Accepts a dict; stored as a sorted item-tuple so the config stays
    # hashable (it rides jit static_argnums).
    rope_scaling: Optional[Any] = None
    qkv_bias: bool = False  # qwen2 / glm4 use biases on q,k,v
    tie_word_embeddings: bool = False
    max_position_embeddings: int = 1048576
    dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if isinstance(self.rope_scaling, dict):
            object.__setattr__(
                self, "rope_scaling", tuple(sorted(self.rope_scaling.items()))
            )

    @property
    def rope_scaling_dict(self) -> Optional[dict]:
        return dict(self.rope_scaling) if self.rope_scaling else None

    @property
    def num_groups(self) -> int:
        """GQA group size (query heads per KV head)."""
        return self.num_heads // self.num_kv_heads

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim

    @property
    def rope_dim(self) -> int:
        """Number of head dims that get rotary applied."""
        return self.rope_partial_dim or self.head_dim


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """KV-cache / sparse-attention policy configuration.

    Defaults match the reference's canonical setting
    (sparse_budget=2048, rank=160, chunk_size=8 — README.md:92,
    test/eval_acc.py:74-78) and its in-class constants
    (local_chunk=4 kv_cache.py:547, outlier scaling kv_cache.py:548).
    """

    mode: str = "full"  # 'full' | 'shadow' | 'shadow_offload'
    max_length: int = 32 * 1024
    sparse_budget: int = 2048
    rank: int = 160
    chunk_size: int = 8
    local_chunks: int = 4
    # Number of outlier chunks; the reference production path scales it
    # with the budget: (sparse_budget // 1024) * 24 (kv_cache.py:548).
    outlier_chunks: Optional[int] = None
    # Capacity of the generated-token region of the compact buffer.
    gen_capacity: int = 256
    # Memory kind for the full V store: 'device' (HBM) or 'pinned_host'.
    v_memory_kind: str = "device"
    # 'int8' quantizes the V store, U factors and landmark table with
    # per-row scales (~2x feasible batch at 122K); 'none' keeps bf16.
    kv_quant: str = "none"
    # Approximate top-k (jax.lax.approx_max_k) for the per-step
    # landmark selection. Default True with the measured mult2
    # reduction override (core/selection.py): exact top-k costs ~6
    # ms/step at the headline config (bench_xla_exact_r4: 156.0 vs
    # 201.7 tok/s) while mult2 keeps on-chip recall at 0.986/0.976
    # for the 60K/122K landmark scales (probe_topk_recall — above the
    # 0.95 bar the r3 mult8 default failed). The reference uses exact
    # top-k (kv_cache.py:1031-1035); False restores that.
    approx_topk: bool = True

    def resolved_outlier_chunks(self) -> int:
        if self.outlier_chunks is not None:
            return self.outlier_chunks
        return max(1, (self.sparse_budget // 1024) * 24)

    @property
    def select_sets(self) -> int:
        assert self.sparse_budget % self.chunk_size == 0
        return self.sparse_budget // self.chunk_size


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Execution configuration: batching, sampling, mesh layout."""

    batch_size: int = 1
    # Decode/prefill split point: query lengths above this take the
    # prefill path (reference models/base.py:299 uses 4*1024).
    prefill_threshold: int = 4 * 1024
    # Prefill is chunked into sub-batches to bound activation memory
    # (reference models/base.py:533-543 uses T=4/8).
    prefill_sub_batch: int = 4
    # Query-block size for blockwise causal prefill attention.
    prefill_block_q: int = 512
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0
    top_p: float = 0.9
    # Mesh axis sizes; dp shards batch, tp shards heads / factors.
    dp: int = 1
    tp: int = 1
    # Sequence-parallel prefill (context parallelism): sp > 1 adds an
    # 'sp' mesh axis that shards the PROMPT's sequence dim during the
    # whole-batch shadow prefill (attention runs per-shard against
    # all-gathered K/V inside a shard_map; the SVD sketch reduces over
    # sp via GSPMD psums). At decode the same devices serve the cache
    # batch-sharded over ("dp", "sp") — sp buys prefill latency and
    # per-chip prefill HBM, not decode throughput. The reference has no
    # sequence parallelism at all (SURVEY §5.7); this is the TPU-native
    # long-context scaling axis. Shadow HBM mode + XLA decode path only.
    sp: int = 1
    # Layer-segmented offload prefill: with shadow_offload + ring
    # gather, split the prefill layer scan into this many segments and
    # evict each segment's V store to pinned host DRAM before the next
    # segment runs — peak HBM holds L/segments layers of V instead of
    # all L (the reference's per-layer V->pinned-CPU copy during
    # prefill, kv_cache.py:825-828). What lets the 8B model prefill
    # 122K on a 16 GB chip. Single-chip, whole-batch-per-call.
    offload_prefill_segments: int = 1
    # Pipeline parallelism: pp > 1 shards the LAYER axis over a 'pp'
    # mesh — each stage holds L/pp layers' weights, factors, landmarks,
    # buffers and V store (per-chip memory 1/pp of everything
    # layer-shaped); decode runs a circular microbatch pipeline with
    # ppermute handoffs (parallel/pipeline.py). v1: composes with no
    # other axis; HBM shadow mode + XLA decode path.
    pp: int = 1
    # Prefill attention pattern: 'dense' (flash causal),
    # 'dense-splash' (causal via the splash MQA kernel — same math,
    # GQA K/V consumed natively so the two [B, H, S, Dh] repeats that
    # set the prefill HBM peak disappear; ~20 % slower prefill, buys
    # a larger decode batch on memory-tight chips), or 'stream'
    # (attention-sink + sliding window via splash attention — the TPU
    # counterpart of the reference's MInference sparse prefill,
    # models/tensor_op.py:68-117).
    # 'vs' runs the MInference per-head dynamic patterns
    # (vertical_and_slash estimation + runtime block-sparse kernel,
    # core/minference.py + kernels/vs_sparse.py).
    prefill_pattern: str = "dense"
    stream_window: int = 8192
    stream_sink: int = 1024
    # MInference 'vs' pattern knobs (reference defaults: the MInference
    # config JSONs cluster around vertical 1000 / slash 6096).
    vs_vertical_size: int = 1000
    vs_slash_size: int = 6144
    vs_block: int = 128
    # VS execution engine: 'tile' = the decomposed kernel
    # (kernels/vs_tile.py — token-granular verticals + 512-row diagonal
    # group tiles; the 122K-scale path), 'walk' = the per-128-block walk
    # kernel (kernels/vs_sparse.py — measured 5-11x slower than dense at
    # 122K, kept for small contexts and as the parity cross-check).
    vs_impl: str = "tile"
    vs_tile: int = 512
    # Optional per-q-head pattern table: a tuple of
    # (kind, vertical_size, slash_size) tuples or kind strings, kinds in
    # {vertical_and_slash, stream_llm, block_sparse, dense} — the
    # reference's minference_parttern JSON (models/llama.py:242-247),
    # uniform across layers. None = all heads vertical_and_slash.
    minference_patterns: Optional[tuple] = None
    # Optional PER-LAYER pattern table: a tuple of num_layers entries,
    # each a per-head table as above (kinds limited to
    # {vertical_and_slash, stream_llm, dense}) — full parity with the
    # reference's layer-indexed JSONs (models/base.py:291). The table
    # rides the prefill layer-scan as traced arrays
    # (core/minference.py::minference_prefill_dynamic). Takes
    # precedence over minference_patterns when both are set.
    minference_layer_patterns: Optional[tuple] = None
    # BENCHMARK-ONLY pattern simulation (core/minference.py
    # sim_vs_scores): 'clustered' replaces the estimated vertical/slash
    # SCORES with the diagonal-decaying + hot-token structure real
    # checkpoints produce (synthetic bench weights give top-k-of-noise
    # patterns that scatter diag blocks 17x wider than real models).
    # Estimation still runs and is timed; never set outside benchmarks.
    vs_sim: Optional[str] = None
    # Fused Pallas sparse-refresh kernel on the decode path. None/False
    # = the vectorized-XLA gather path (wins below ~75 % hit rate);
    # True = the fused kernel (wins when selection is temporally
    # stable); 'auto' = measure the LIVE per-step slot hit rate every
    # pallas_auto_interval steps (slot-stable assignment makes
    # "cached_ids unchanged" == "hit", core/selection.py) and switch
    # paths when its EMA crosses pallas_hit_threshold ('shadow' HBM
    # mode only — offload commits the V store differently per path).
    use_pallas: Optional[object] = None
    # None = resolve from the measured crossover for the cache's chunk
    # size (prof_refresh_sweep, forced-rate scatter layout on v5e):
    # cs8 kernel wins >=~0.7 (16.8 vs 21.1 ms/step at 0.75), cs16
    # >=~0.45 (18.0 vs 19.3; 2x faster by 0.9). A float pins it.
    pallas_hit_threshold: Optional[float] = None
    pallas_auto_interval: int = 16
    # Hysteresis band around pallas_hit_threshold for the 'auto' path
    # flip: ON above thresh+band, OFF below thresh-band. A workload
    # sitting AT the crossover otherwise oscillates (2 switches and a
    # worse-than-either result, bench_trained_auto_r5); inside the
    # band the two paths cost the same, so holding is free.
    pallas_auto_deadband: float = 0.05
    # BENCHMARK-ONLY forced selection: replace every layer's top-k
    # chunk selection with a deterministic sliding-window id stream
    # whose step-to-step overlap is exactly this hit rate — the knob
    # that measures the kernel-vs-XLA crossover WITHOUT needing real
    # weights to produce the locality (benchmarks/prof_refresh_sweep).
    # 'scatter' maps the window through a fixed bijection so miss
    # slots/chunks interleave like real selection; 'contig' keeps the
    # raw window (best case for batched DMA write-backs).
    # LIMITATION (advisor r4): the forced window slides over ALL
    # lo.chunks without consulting landmark_mask, so it can select
    # outlier chunks (whose positions are data-dependent) that real
    # selection would mask out. Timing-exact, but never combine this
    # knob with an accuracy measurement.
    debug_hit_rate: Optional[float] = None
    debug_hit_layout: str = "scatter"
    # Selection hysteresis (beyond-reference, round 5): multiplicative
    # score bonus h for chunks already resident in the sparse buffer —
    # a challenger must beat a resident by >h RELATIVE to evict it.
    # Near-tied landmark scores otherwise thrash the top-S set between
    # adjacent decode steps (measured 0.32 organic slot-stay at
    # b4/122K) even though the evicted/admitted chunks carry near-
    # identical attention mass. 0.0 = reference-exact selection
    # (default); oracle-validated values documented in README.
    selection_hysteresis: float = 0.0
    # Observe-only slot-hit-rate sampling on every shadow decode path
    # (one consecutive step-pair per pallas_auto_interval steps, one
    # scalar host sync each): kv_stats() then reports hit_rate_mean /
    # hit_rate_ema. The measurement behind the reference's ~60 %
    # temporal-locality claim (index.html:326), without flipping paths.
    track_hit_rate: bool = False
    # Weight-only quantization of the dense matmul path ('none' or
    # 'int8': per-output-channel symmetric QTensor leaves,
    # core/wquant.py). Halves weight-read HBM bytes in weight-bound
    # decode and is what fits an 8B model's weights (16 GB bf16) on a
    # 16 GB chip next to the shadow KV state. Beyond-reference (the
    # reference keeps bf16 weights on an 80 GB A100).
    weight_quant: str = "none"
    # Fully unroll the decode layer loop (lax.scan unroll=num_layers).
    # Inside a scanned body every per-layer operand slice — weight
    # matrices, the landmark table, the committed-buffer attention
    # views — is a dynamic-slice XLA MATERIALIZES as a copy each
    # iteration (measured via compiled-HLO dump, prof_hlo_decode.py:
    # ~90 MiB of weight copies + 64 MiB of view copies + 45 MiB of
    # landmark copies per layer per step at 60K/b6 — several GB/step
    # of pure copy traffic). Unrolled, the slice indices are constants,
    # contiguous leading-dim slices become bitcasts, and the dots read
    # the stacked arrays in place. Costs ~num_layers x the program
    # size/compile time, so 'auto' (None) enables it on TPU and keeps
    # the scan on CPU (tests compile 16x faster; numerics identical).
    decode_unroll: Optional[bool] = None
    # Segmented decode attention (core/attention.py
    # decode_attention_segments): feed the freshly reconstructed
    # sparse K/V straight to the attention dots instead of slicing a
    # per-layer view out of the stacked [L,B,K,cap,Dh] buffers.
    # MEASURED SLOWER on v5e (59.8 vs 22.1 ms/step at b4/122K,
    # benchmarks/probe_decode_variants.py): the three-einsum split +
    # prefix/gen slices cost more than the view copies they avoid.
    # None = off. Kept as a tested alternative (tests/test_segmented.py)
    # for layouts where the cap-row views dominate.
    decode_segmented: Optional[bool] = None
    # Ring-DMA chunk gather (kernels/gather.py) replacing the decode
    # step's XLA gathers of U/V chunk rows: a pipelined ring of async
    # HBM DMAs fetching ALL selected chunks (dequant/matmul/RoPE stay
    # in XLA). Targets the miss-heavy regime where the fused kernel's
    # hit-skip machinery has nothing to skip. Mutually exclusive with
    # use_pallas. Runs in interpret mode on CPU (tests).
    ring_gather: Optional[bool] = None
