"""High-level LLM interface: tokenizer + templates + engine.

User-facing counterpart of the reference ``LLM`` base class surface
(models/base.py:43-657: encode / generate / batch_generate) minus the
compute internals, which live in the jitted Engine. One class serves
every model family — family differences (RoPE style, biases, templates,
stop tokens) are data in ModelConfig / prompt_templates, not subclasses
(the reference's Llama/GLM/Qwen2/Phi3 subclasses exist to hold CUDA
weight containers; a functional JAX engine doesn't need them).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import jax
import numpy as np

from shadowkv_tpu.config import CacheConfig, ModelConfig, RuntimeConfig
from shadowkv_tpu.models.engine import Engine, GenerationStats
from shadowkv_tpu.models.params import (
    init_synthetic_params,
    load_hf_params,
)
from shadowkv_tpu.models.prompt_templates import (
    CHAT_TEMPLATES,
    CTX_TEMPLATES,
    PREFIX_TEMPLATES,
    STOP_STRINGS,
    template_family,
)
from shadowkv_tpu.models.registry import choose_model_config


class LLM:
    """A loaded model + tokenizer + inference engine.

    Args mirror the reference constructor (models/base.py:43-70 via
    models/llama.py:172-182): ``attn_mode`` in {'full', 'shadow',
    'shadow_offload'} ('shadowkv'/'shadowkv_cpu' accepted as reference
    aliases), canonical sparse defaults budget=2048/rank=160/chunk=8.
    """

    def __init__(
        self,
        model_name: str,
        batch_size: int = 1,
        max_length: int = 64 * 1024,
        attn_mode: str = "full",
        sparse_budget: int = 2048,
        rank: int = 160,
        chunk_size: int = 8,
        model_dir: Optional[str] = None,
        dtype=None,
        minference=False,  # reference --minference equivalent. True or
        # 'vs': per-head dynamic vertical_and_slash patterns
        # (core/minference.py); 'stream': uniform sink+window splash
        # prefill. Per-head tables via RuntimeConfig.minference_patterns.
        prefill_sub_batch: int = 4,
        gen_capacity: int = 256,
        dp: int = 1,  # device-mesh axes (parallel/mesh.py): batch on
        tp: int = 1,  # dp, GQA KV heads + factors + buffers on tp
        sp: int = 1,  # sequence-parallel prefill shards (shadow mode)
        pp: int = 1,  # pipeline stages: layer axis sharded, decode =
        # circular microbatch pipeline (parallel/pipeline.py)
        weight_quant: str = "none",  # 'int8': weight-only quantized
        # dense path (core/wquant.py) — fits 8B weights on a 16 GB chip
        track_hit_rate: bool = False,  # sample the slot hit rate during
        # decode; kv_stats() reports hit_rate_mean/ema
        kv_quant: str = "none",  # 'int8': quantized V/U/landmark
        # stores (CacheConfig.kv_quant; the bench's default regime)
        approx_topk: Optional[bool] = None,  # None = CacheConfig
        # default (approx + measured mult2 override); False = exact
        # top-k (the reference's choice, kv_cache.py:1031-1035, ~6
        # ms/step slower at the headline config)
        stream_sink: Optional[int] = None,  # stream-prefill sink /
        stream_window: Optional[int] = None,  # window token counts
        # (defaults from RuntimeConfig; set both < datalen for a
        # genuinely sparse stream prefill at short oracle contexts)
        use_pallas=None,  # fused refresh kernel: True / False / 'auto'
        # (RuntimeConfig.use_pallas; 'auto' flips on the measured
        # chunk-size-aware hit-rate crossover)
        selection_hysteresis: float = 0.0,  # relative score bonus for
        # resident chunks (RuntimeConfig.selection_hysteresis; 0 =
        # reference-exact selection)
    ):
        mode_alias = {"shadowkv": "shadow", "shadowkv_cpu": "shadow_offload"}
        attn_mode = mode_alias.get(attn_mode, attn_mode)
        overrides = {"dtype": dtype} if dtype is not None else {}
        self.model_name = model_name
        self.model_dir = model_dir or os.environ.get(
            "SHADOWKV_MODEL_DIR", ""
        )
        if self.model_dir and os.path.exists(
            os.path.join(self.model_dir, "config.json")
        ):
            # A local checkpoint's config.json is authoritative for the
            # dims (registry entries carry the published sizes only).
            from shadowkv_tpu.models.registry import config_from_hf_dir

            self.config = config_from_hf_dir(
                self.model_dir, name=model_name, **overrides
            )
        else:
            self.config = choose_model_config(model_name, **overrides)
        self.family = template_family(model_name)
        self.batch_size = batch_size
        self.tokenizer = self._load_tokenizer()
        assert weight_quant in ("none", "int8", None), weight_quant
        params = self._load_params(weight_quant or "none")

        self.cache_cfg = CacheConfig(
            mode=attn_mode,
            max_length=max_length,
            sparse_budget=sparse_budget,
            rank=rank,
            chunk_size=chunk_size,
            gen_capacity=gen_capacity,
            kv_quant=kv_quant,
            **({} if approx_topk is None else
               {"approx_topk": approx_topk}),
        )
        if minference is True:
            pattern = "vs"
        elif minference in ("vs", "stream"):
            pattern = minference
        else:
            assert not minference, minference
            pattern = "dense"
        stream_kw = {}
        if stream_sink is not None:
            stream_kw["stream_sink"] = stream_sink
        if stream_window is not None:
            stream_kw["stream_window"] = stream_window
        rt = RuntimeConfig(
            batch_size=batch_size, prefill_sub_batch=prefill_sub_batch,
            prefill_pattern=pattern,
            dp=dp, tp=tp, sp=sp, pp=pp,
            weight_quant=weight_quant or "none",
            track_hit_rate=track_hit_rate,
            use_pallas=use_pallas,
            selection_hysteresis=selection_hysteresis,
            **stream_kw,
        )
        self.engine = Engine(self.config, self.cache_cfg, rt, params)
        self.stop_ids = self._resolve_stop_ids()

    # -- setup ---------------------------------------------------------------

    def _load_tokenizer(self):
        from transformers import AutoTokenizer

        for candidate in (self.model_dir, self.model_name):
            if not candidate:
                continue
            try:
                return AutoTokenizer.from_pretrained(
                    candidate, trust_remote_code=True
                )
            except Exception:  # pragma: no cover - offline fallback
                continue
        print(
            "[LLM] no tokenizer available (offline, no local checkpoint); "
            "token-id interfaces only",
            file=sys.stderr,
        )
        return None

    def _load_params(self, weight_quant: str = "none"):
        if self.model_dir and os.path.isdir(self.model_dir):
            # quantization happens host-side inside the loader: the
            # device peak is the FINAL params (quantize-after-load
            # would stage bf16 + int8 copies of an 8B model at once)
            return load_hf_params(
                self.model_dir, self.config, weight_quant=weight_quant
            )
        print(
            f"[LLM] no checkpoint dir for {self.model_name}; using "
            "synthetic weights (throughput benchmarking only)",
            file=sys.stderr,
        )
        if weight_quant == "int8":
            # host-side init + per-leaf quantize: a device bf16 init of
            # an 8B-shape model fills HBM before quantization could run
            from shadowkv_tpu.models.params import (
                init_synthetic_params_host,
            )

            return init_synthetic_params_host(
                self.config, weight_quant="int8"
            )
        return init_synthetic_params(self.config, jax.random.PRNGKey(0))

    def _resolve_stop_ids(self) -> tuple[int, ...]:
        if self.tokenizer is None:
            return ()
        ids = []
        for s in STOP_STRINGS.get(self.family, []):
            tid = self.tokenizer.convert_tokens_to_ids(s)
            if tid is not None and tid >= 0:
                ids.append(int(tid))
        eos = getattr(self.tokenizer, "eos_token_id", None)
        if eos is not None:
            ids.append(int(eos))
        return tuple(dict.fromkeys(ids))

    # -- prompting ------------------------------------------------------------

    def encode(self, text: str, template: Optional[str] = None) -> np.ndarray:
        """Tokenize with an optional model template
        (reference models/base.py:206-244)."""
        assert self.tokenizer is not None, "no tokenizer loaded"
        if template == "ctx":
            text = CTX_TEMPLATES[self.family].format(ctx=text)
        elif template == "chat":
            text = CHAT_TEMPLATES[self.family].format(msg=text)
        elif template == "prefix":
            text = PREFIX_TEMPLATES[self.family].format(ctx=text)
        ids = self.tokenizer.encode(text, add_special_tokens=False)
        return np.asarray(ids, np.int32)[None]

    def decode(self, token_rows: np.ndarray) -> list[str]:
        assert self.tokenizer is not None, "no tokenizer loaded"
        out = []
        for row in token_rows:
            row = [int(t) for t in row if int(t) not in self.stop_ids]
            out.append(self.tokenizer.decode(row, skip_special_tokens=True))
        return out

    # -- generation ------------------------------------------------------------

    def generate(
        self,
        input_ids: np.ndarray,
        gen_len: int = 256,
        temperature: float = 0.0,
        top_k: int = 50,
        top_p: float = 0.9,
        verbose: bool = False,
        seed: int = 0,
        cont: bool = False,
    ) -> list[str]:
        """Generate and decode text for a [B, S] batch of token ids
        (reference models/base.py:385-497). ``cont=True`` continues the
        previous call's cache (chat turns against a prefilled context)."""
        input_ids = np.atleast_2d(np.asarray(input_ids))
        tokens, stats = self.engine.generate(
            input_ids,
            gen_len=gen_len,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            seed=seed,
            stop_ids=self.stop_ids,
            cont=cont,
        )
        if verbose:
            print(
                f"prefill {stats.prefill_tokens} tok in "
                f"{stats.prefill_seconds:.1f}s | decode "
                f"{stats.decode_tokens_per_second:.1f} tok/s",
                file=sys.stderr,
            )
        return self.decode(tokens)

    def batch_generate(
        self,
        input_ids: np.ndarray,
        gen_len: int = 100,
        temperature: float = 0.6,
        top_k: int = 50,
        top_p: float = 0.9,
        benchmark: bool = False,
        seed: int = 0,
    ) -> tuple[list[str] | np.ndarray, float]:
        """Throughput loop; returns (decoded or ids, decode tokens/s)
        (reference models/base.py:572-657)."""
        tokens, stats = self.engine.batch_generate(
            np.asarray(input_ids),
            gen_len=gen_len,
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            seed=seed,
        )
        out = self.decode(tokens) if self.tokenizer is not None else tokens
        return out, stats.decode_tokens_per_second

    # -- context checkpointing -------------------------------------------------

    def save_context(self, path: str):
        """Persist the prefilled context (utils/checkpoint.py); resume
        with ``load_context`` + ``generate(..., cont=True)``."""
        self.engine.save_state(path)

    def load_context(self, path: str):
        self.engine.load_state(path)

    def __str__(self) -> str:
        """One-line summary incl. device memory (reference
        LLM.__str__, models/base.py:60-68)."""
        dev = jax.devices()[0]
        mem = ""
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats and "bytes_in_use" in stats:
            used = stats["bytes_in_use"] / 2**30
            limit = stats.get("bytes_limit")
            mem = f", device mem: {used:.2f}"
            mem += f" / {limit / 2**30:.2f} GB" if limit else " GB"
        return (
            f"LLM: {self.model_name}, attn_mode: {self.cache_cfg.mode}, "
            f"max_length: {self.cache_cfg.max_length}, batch_size: "
            f"{self.batch_size}, device: {dev.platform}, dtype: "
            f"{np.dtype(self.config.dtype).name}{mem}"
        )

    def print_kv_stats(self):
        """KV memory accounting (reference models/base.py:101-107,
        kv_cache.py:651-663). Prefers the engine's MEASURED live-cache
        stats; falls back to the config estimate before any prefill."""
        if self.engine._cache is not None:
            self.engine.print_kv_stats()
            return
        cfg, cc = self.config, self.cache_cfg
        bytes_per = 2 if cfg.dtype != np.float32 else 4
        full = (
            2 * cfg.num_layers * self.batch_size * cfg.num_kv_heads
            * cc.max_length * cfg.head_dim * bytes_per
        )
        if cc.mode == "full":
            print(f"[KV] full cache: {full / 2**30:.2f} GiB")
            return
        rank_bytes = (
            cfg.num_layers * self.batch_size * cc.max_length * cc.rank
            * bytes_per
        )
        sv = (
            cfg.num_layers * self.batch_size * cfg.num_kv_heads * cc.rank
            * cfg.head_dim * bytes_per
        )
        bufcap = cc.sparse_budget + cc.gen_capacity + 2048
        bufs = (
            2 * cfg.num_layers * self.batch_size * cfg.num_kv_heads
            * bufcap * cfg.head_dim * bytes_per
        )
        v_store = full // 2
        where = "host" if cc.mode == "shadow_offload" else "HBM"
        print(
            f"[KV] shadow: U {rank_bytes / 2**30:.2f} + SV "
            f"{sv / 2**30:.3f} + buffers {bufs / 2**30:.2f} GiB in HBM; "
            f"V store {v_store / 2**30:.2f} GiB in {where}; full-attn "
            f"equivalent {full / 2**30:.2f} GiB"
        )
