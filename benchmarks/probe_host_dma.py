"""Probe: does this TPU runtime support the pinned-host offload path?

Three facts gate the ring / fused-kernel offload paths on real hardware
(PARITY.md "known gaps"): (1) `jax.device_put` onto a
``memory_kind='pinned_host'`` sharding, (2) passing that array into a
jitted program as an input-only leaf, (3) a Pallas kernel declaring the
operand in ``pltpu.MemorySpace.HOST`` and DMA'ing host->HBM.

Run standalone on the real chip (NOT concurrently with another TPU
job):  python benchmarks/probe_host_dma.py
Prints PASS/FAIL per stage plus an effective host->HBM gather bandwidth
for the ring kernel at bench-like sizes.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FAILURES: list[str] = []


def stage(name):
    def deco(fn):
        def run(*a):
            try:
                out = fn(*a)
                # NOTE: `out` may be a jax array — no truthiness on it.
                msg = f"  {out}" if isinstance(out, str) else ""
                print(f"PASS  {name}{msg}", flush=True)
                return out if out is not None else True
            except Exception:
                print(f"FAIL  {name}", flush=True)
                traceback.print_exc()
                FAILURES.append(name)
                return None

        return run

    return deco


@stage("pinned_host device_put")
def probe_put():
    x = jnp.arange(4 * 8 * 128, dtype=jnp.bfloat16).reshape(4, 8, 128)
    s = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind="pinned_host"
    )
    h = jax.device_put(x, s)
    h.block_until_ready()
    assert h.sharding.memory_kind == "pinned_host", h.sharding
    np.testing.assert_array_equal(np.asarray(h), np.asarray(x))
    return h


@stage("pinned_host as jit input (device output)")
def probe_jit_input(h):
    # Host leaf rides as an input-only arg; output stays in HBM.
    def f(a):
        return jnp.sum(a.astype(jnp.float32))

    in_s = jax.tree.map(lambda _: h.sharding, h)
    out = jax.jit(f, in_shardings=in_s)(h)
    expect = np.asarray(h).astype(np.float32).sum()
    np.testing.assert_allclose(float(out), expect, rtol=1e-6)


@stage("Pallas HOST-operand DMA (ring gather, tiny)")
def probe_ring_tiny():
    from shadowkv_tpu.kernels.gather import (
        gather_chunks,
        gather_chunks_reference,
    )

    rng = np.random.RandomState(0)
    l, b, k, c, cs, r, dh = 2, 1, 2, 64, 8, 128, 128
    u = jnp.asarray(
        rng.randn(l, b, c, cs, r).astype(np.float32), jnp.bfloat16
    )
    v = jnp.asarray(
        rng.randn(l, b, k, c, cs, dh).astype(np.float32), jnp.bfloat16
    )
    host_s = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind="pinned_host"
    )
    v_host = jax.device_put(v, host_s)
    ids = jnp.asarray(rng.randint(0, c, (b, k, 8)), jnp.int32)
    layer = jnp.asarray(1, jnp.int32)
    got_u, got_v = gather_chunks(
        layer, ids, u, v_host, chunk_size=cs, tile_sub=cs, host_v=True
    )
    want_u, want_v = gather_chunks_reference(
        1, ids, u, v, chunk_size=cs, tile_sub=cs
    )
    np.testing.assert_array_equal(np.asarray(got_u), np.asarray(want_u))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))


@stage("host->HBM ring bandwidth (bench-like sizes)")
def probe_ring_bandwidth():
    from shadowkv_tpu.kernels.gather import gather_chunks

    rng = np.random.RandomState(1)
    # 122K-ish geometry: C=15296 chunks, S=256 selected, 8 kv heads.
    l, b, k, c, cs, r, dh = 2, 2, 8, 15296, 8, 160, 128
    u = jnp.zeros((l, b, c, cs, r), jnp.bfloat16)
    v = jnp.zeros((l, b, k, c, cs, dh), jnp.bfloat16)
    host_s = jax.sharding.SingleDeviceSharding(
        jax.devices()[0], memory_kind="pinned_host"
    )
    v_host = jax.device_put(v, host_s)
    ids = jnp.asarray(rng.randint(0, c, (b, k, 256)), jnp.int32)
    layer = jnp.asarray(0, jnp.int32)

    def run():
        return gather_chunks(
            layer, ids, u, v_host, chunk_size=cs, tile_sub=cs,
            host_v=True,
        )

    jax.block_until_ready(run())  # compile
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = run()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    v_bytes = b * k * 256 * cs * dh * 2
    u_bytes = b * k * 256 * cs * r * 2
    return (
        f"{dt * 1e3:.2f} ms/call, host V {v_bytes / dt / 1e9:.1f} GB/s "
        f"(+HBM U {u_bytes / dt / 1e9:.1f} GB/s)"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    h = probe_put()
    if h is not None and not isinstance(h, bool):
        probe_jit_input(h)
    ok = probe_ring_tiny()
    if ok:
        probe_ring_bandwidth()
    elif "Pallas HOST-operand DMA (ring gather, tiny)" in FAILURES:
        # Dynamically-indexed host DMA of sub-32-bit data is a KNOWN
        # platform limit (probe_host_min.py: the packed-tile contiguous
        # unit — 1024 B int8 / 2048 B bf16 — fails Mosaic's 4096-B
        # host-word check for every geometry). The capability answer is
        # recorded, the probe itself did its job.
        print(
            "ring stage unsupported on this platform "
            "(expected — see probe_host_min.py / CLAUDE.md)"
        )
        FAILURES.remove("Pallas HOST-operand DMA (ring gather, tiny)")
    if FAILURES:
        print("failed stages:", FAILURES)
        sys.exit(1)
