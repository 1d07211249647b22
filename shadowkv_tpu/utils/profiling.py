"""Profiling and observability helpers.

The reference has no structured tracing — wall-clock prints inline in
generate loops plus kernel-bandwidth prints in standalone tests
(SURVEY.md §5.1; reference models/base.py:437-486, 624-640). Here:

- ``time_fn``: block-until-ready wall-clock timing of a jitted callable,
- ``trace``: context manager around ``jax.profiler`` producing an xplane
  trace; ``top_ops`` parses it into a per-op time table (how every hot-op
  breakdown in benchmarks/ was produced),
- ``device_memory_stats``: per-device HBM usage.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import time
from typing import Callable, Optional

import jax


def time_fn(fn: Callable, *args, n: int = 20, warmup: int = 3) -> float:
    """Mean wall-clock seconds per call (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/tr'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def top_ops(log_dir: str, limit: int = 25) -> list[tuple[float, int, str]]:
    """Parse the newest trace in ``log_dir`` into
    [(total_ms, count, op_name)] sorted by total time."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X":
            dur[e.get("name", "?")] += e.get("dur", 0)
            cnt[e.get("name", "?")] += 1
    return [
        (d / 1e3, cnt[name], name) for name, d in dur.most_common(limit)
    ]


def op_table(
    log_dir: str,
    by: str = "source",
    limit: int = 25,
    name_filter: Optional[str] = None,
) -> list[dict]:
    """Grouped DEVICE-op table from the newest xplane trace.

    ``top_ops`` groups by raw op NAME, which the unrolled decode defeats
    (every layer gets its own ``fusion.N`` — the table fragments into
    hundreds of one-off rows) and which host-side runtime events drown
    out (round-4 prof_trace finding). This view instead:

    - keeps only events that ran on the DEVICE (``device_duration_ps``
      present — host callstack/runtime events have no device time),
    - groups by ``by``: 'source' (repo file:line from op metadata — the
      view that answers "which python line costs what"), 'category'
      (XLA hlo_category: loop fusion / all-gather / dynamic-slice ...),
      or 'base' (op name with trailing .N unroll suffixes stripped),
    - carries bytes_accessed so each row shows effective GB/s — the
      number to compare against the v5e's ~819 GB/s HBM peak.

    Returns rows ``{ms, count, gbytes, gbps, gflops, key}`` sorted by
    total device time; ``name_filter`` keeps only ops whose tf_op/name
    contains the substring (e.g. 'decode' to drop prefill ops).
    """
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    agg: dict = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        dur_ps = args.get("device_duration_ps")
        if dur_ps is None:
            continue
        name = e.get("name", "?")
        if name_filter and name_filter not in args.get("tf_op", name):
            continue
        # whole-program envelope events (jit_foo(fingerprint)) carry
        # device time but no category/source; they'd double-count every
        # op — program_table reports them as per-step totals instead
        if not args.get("hlo_category") and name.startswith("jit_"):
            continue
        if by == "source":
            key = args.get("source") or "<no-source>"
        elif by == "category":
            key = args.get("hlo_category") or "<no-category>"
        else:
            key = name.rstrip("0123456789").rstrip(".")
        row = agg.setdefault(
            key, {"ms": 0.0, "count": 0, "gbytes": 0.0, "gflops": 0.0}
        )
        row["ms"] += int(dur_ps) / 1e9
        row["count"] += 1
        row["gbytes"] += int(args.get("bytes_accessed", 0)) / 1e9
        row["gflops"] += int(args.get("model_flops", 0)) / 1e9
    rows = [
        {
            "key": k,
            "ms": round(v["ms"], 3),
            "count": v["count"],
            "gbytes": round(v["gbytes"], 3),
            "gbps": round(v["gbytes"] / (v["ms"] / 1e3), 1)
            if v["ms"] > 0
            else 0.0,
            "gflops": round(v["gflops"], 3),
        }
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["ms"])
    return rows[:limit]


def program_table(log_dir: str) -> list[dict]:
    """Per-PROGRAM device totals (the jit envelope events op_table
    excludes): ``{ms, count, ms_per_call, key}`` — e.g. one
    decode_shadow_jit row whose ms_per_call IS the step time."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    agg: dict = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        dur_ps = args.get("device_duration_ps")
        name = e.get("name", "?")
        if dur_ps is None or args.get("hlo_category") or (
            not name.startswith("jit_")
        ):
            continue
        key = name.split("(")[0]
        row = agg.setdefault(key, {"ms": 0.0, "count": 0})
        row["ms"] += int(dur_ps) / 1e9
        row["count"] += 1
    rows = [
        {
            "key": k,
            "ms": round(v["ms"], 3),
            "count": v["count"],
            "ms_per_call": round(v["ms"] / v["count"], 3),
        }
        for k, v in agg.items()
    ]
    rows.sort(key=lambda r: -r["ms"])
    return rows


def print_op_table(rows: list[dict], total_ms: Optional[float] = None):
    """Render an op_table as an aligned text table (benchmarks use)."""
    tot = total_ms or sum(r["ms"] for r in rows)
    print(f"{'ms':>9} {'%':>5} {'count':>6} {'GB':>8} {'GB/s':>7}  key")
    for r in rows:
        print(
            f"{r['ms']:9.3f} {100 * r['ms'] / max(tot, 1e-9):5.1f} "
            f"{r['count']:6d} {r['gbytes']:8.3f} {r['gbps']:7.1f}  "
            f"{r['key']}"
        )


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes) where the backend reports them."""
    out = {}
    for dev in jax.devices():
        stats: Optional[dict] = None
        try:
            stats = dev.memory_stats()
        except Exception:
            pass
        if stats:
            out[str(dev)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
