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
