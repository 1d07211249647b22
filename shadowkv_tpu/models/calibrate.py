"""Offline per-head sparse-prefill pattern calibration.

The reference ships MInference's pre-searched per-head pattern tables
(JSON via ``MODEL2PATH``, reference models/llama.py:242-247) and never
includes the search itself. This module IS that search, self-contained:
run one calibration prompt through the model, and for every head score
each candidate pattern by how closely its sparse attention output
matches dense attention; emit the per-head table that
``RuntimeConfig.minference_patterns`` consumes.

Method (MInference's recipe, simplified to this repo's
uniform-over-layers tables): layers are evaluated in a Python loop
(offline tool, moderate calibration length); per layer the dense
causal output is the oracle and also feeds the next layer, so errors
do not compound. Per-head relative L2 errors are averaged over layers
and the lowest-error candidate wins; ties prefer the cheaper pattern.

Tables serialize to JSON (head index -> [kind, vertical, slash]) so a
calibration on a checkpoint host can ship to serving hosts, mirroring
the reference's JSON workflow.
"""

from __future__ import annotations

import json
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.config import ModelConfig
from shadowkv_tpu.core.minference import minference_prefill

DEFAULT_CANDIDATES = (
    ("vertical_and_slash", 1000, 6144),
    ("vertical_and_slash", 100, 800),
    ("stream_llm", 0, 0),  # sizes unused; sink/window from kwargs
)


def calibrate_patterns(
    model: ModelConfig,
    params,
    input_ids: np.ndarray,  # [S] calibration prompt
    candidates: Sequence[tuple] = DEFAULT_CANDIDATES,
    block: int = 64,
    stream_sink: int = 64,
    stream_window: int = 256,
    return_errors: bool = False,
    per_layer: bool = False,
):
    """Search the best pattern per q-head on one calibration prompt.

    Returns the per-head tuple table for
    ``RuntimeConfig.minference_patterns`` (optionally with the
    [n_candidates, H] error matrix). With ``per_layer=True``, winners
    are chosen per LAYER from the per-layer errors (no averaging) and
    the result is a [num_layers] tuple of per-head tables for
    ``RuntimeConfig.minference_layer_patterns`` — full parity with the
    reference's layer-indexed MInference JSONs (models/base.py:291,
    llama.py:242-247). Per-layer candidates must avoid block_sparse
    (unsupported by the traced-pattern path, core/minference.py
    ``patterns_to_arrays``)."""
    from shadowkv_tpu.core import rope as rope_lib
    from shadowkv_tpu.core.attention import causal_prefill_attention
    from shadowkv_tpu.models.forward import _layer_qkv, _layer_tail

    ids = jnp.asarray(np.asarray(input_ids), jnp.int32)[None]  # [1, S]
    s = ids.shape[1]
    h = model.num_heads
    cos_t, sin_t = rope_lib.compute_cos_sin(model, s, dtype=jnp.float32)
    cos = cos_t[:s]
    sin = sin_t[:s]

    from shadowkv_tpu.core.wquant import take_rows

    x = take_rows(params.embed, ids, model.dtype)

    errs = np.zeros((len(candidates), h), np.float64)

    @jax.jit
    def layer_step(lp, x):
        q, k_r, _, v = _layer_qkv(model, lp, x, cos, sin)
        dense = causal_prefill_attention(q, k_r, v, block_q=min(512, s))
        outs = []
        for cand in candidates:
            sparse = minference_prefill(
                q, k_r, v, patterns=[cand] * h, block=block,
                stream_sink=stream_sink, stream_window=stream_window,
                use_kernel=False,
            )
            diff = jnp.linalg.norm(
                (sparse - dense).astype(jnp.float32), axis=(1, 3)
            )  # [B, H]
            ref = jnp.linalg.norm(dense.astype(jnp.float32), axis=(1, 3))
            outs.append((diff / jnp.maximum(ref, 1e-6))[0])  # [H]
        x_next = _layer_tail(lp, model, x, dense)
        return jnp.stack(outs), x_next

    layer_errs = np.zeros((model.num_layers, len(candidates), h))
    for layer in range(model.num_layers):
        lp = jax.tree_util.tree_map(lambda a: a[layer], params.layers)
        e, x = layer_step(lp, x)
        layer_errs[layer] = np.asarray(e)
        errs += layer_errs[layer]
    errs /= model.num_layers

    # lowest mean error wins; ties (within 1e-6 of the MINIMUM, not of
    # a drifting running best) prefer the LATER candidate (cheaper
    # patterns should be listed later)
    def pick(err_ch):  # [n_candidates, H] -> per-head table
        rows = []
        for hh in range(h):
            min_err = err_ch[:, hh].min()
            best = max(
                ci for ci in range(len(candidates))
                if err_ch[ci, hh] <= min_err + 1e-6
            )
            rows.append(tuple(candidates[best]))
        return tuple(rows)

    if per_layer:
        table = tuple(
            pick(layer_errs[li]) for li in range(model.num_layers)
        )
        if return_errors:
            return table, layer_errs
        return table
    table = pick(errs)
    if return_errors:
        return table, errs
    return table


def _row_dict(table: Sequence) -> dict:
    # bare kind strings serialize as [kind] (list("dense") would
    # explode the string into characters)
    return {
        str(i): ([t] if isinstance(t, str) else list(t))
        for i, t in enumerate(table)
    }


def _row_tuple(raw: dict) -> tuple:
    out = []
    for i in range(len(raw)):
        e = raw[str(i)]
        if len(e) == 1:
            out.append(e[0])  # bare kind string
        else:
            out.append(tuple(e[:1]) + tuple(int(v) for v in e[1:3]))
    return tuple(out)


def _is_head_entry(e) -> bool:
    """A head entry is a bare kind string or (kind, vertical, slash)."""
    if isinstance(e, str):
        return True
    return (
        isinstance(e, (tuple, list))
        and bool(e)
        and isinstance(e[0], str)
        and all(isinstance(x, (int, np.integer)) for x in e[1:3])
    )


def save_patterns(table: Sequence, path: str, per_layer: Optional[bool] = None):
    """JSON: {head: [kind, vertical_size, slash_size]} for uniform
    tables, or a LIST of such dicts (one per layer) for per-layer
    tables — the latter is the reference's MInference JSON structure
    exactly (a layer-indexed list of head dicts, models/llama.py:247).

    Auto-detection: a table whose every element is a head entry is
    uniform, otherwise per-layer. The one ambiguous case — a per-layer
    table for a ONE-head model whose rows are 1-tuples of bare kind
    strings, e.g. (("dense",), ("stream_llm",)) — reads as uniform;
    pass ``per_layer=True`` explicitly there.
    """
    if per_layer is None:
        per_layer = bool(table) and not all(
            _is_head_entry(e) for e in table
        )
    with open(path, "w") as f:
        if per_layer:
            json.dump([_row_dict(row) for row in table], f)
        else:
            json.dump(_row_dict(table), f)


def load_patterns(path: str) -> tuple:
    """Load save_patterns output; a JSON list means a per-layer table
    (feed to ``RuntimeConfig.minference_layer_patterns``), a dict means
    a uniform table (``minference_patterns``)."""
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, list):
        return tuple(_row_tuple(row) for row in raw)
    return _row_tuple(raw)
