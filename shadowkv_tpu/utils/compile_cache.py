"""Persistent XLA compilation cache (one shared dir for every entry
point).

Remote axon compiles of the same program swung 1 min -> 12+ min across
sessions (no server-side cache persistence is guaranteed), and a slow
compile once starved the benchmark driver's timeout entirely
(BENCH_r04: rc=124 with nothing printed). Executable
serialization/deserialization through the tunnel is probe-verified;
with a warm cache the 122K prefill + decode programs load in seconds.

Default dir: <repo>/.jax_cache (gitignored), override with
SHADOWKV_COMPILE_CACHE_DIR, disable with SHADOWKV_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at
    ``cache_dir``; returns the dir or None when disabled/unavailable."""
    if os.environ.get("SHADOWKV_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("SHADOWKV_COMPILE_CACHE_DIR")
        or _DEFAULT
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return cache_dir
    except Exception:  # pragma: no cover - config API drift
        return None
