"""Compile-only bisect of the ring-gather host-DMA LLO failure.

bench_offload_b6_ring's decode program fails REMOTE COMPILE with

    LLO_CHECK multiplier_in_bytes % word_size == 0 (1024 vs 4096)

(llo_region_builder.cc:4758) — some DMA in the kernel moves 1024-byte
units while host-space descriptors need 4096-byte words. This probe AOT
-compiles kernels/gather.py::gather_chunks alone at the bench shapes,
one variant per line, so the offending geometry is identified from
evidence instead of theory:

    int8 x {1 part, 6 per-slot parts} x {batch,layer} axis, bf16 x 1.

Compile-only (TpuAotCompiler is chipless): safe to run while another
process owns the chip's HBM, but still serialized through the session
pause hook out of caution.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

from shadowkv_tpu.kernels.gather import gather_chunks

# Bench-config shapes (122K llama-ish 1.4B: 16L, 8KV, rank_pad 192,
# cs 8, C=15104 sparse chunks -> CT=3776 int8 tiles), shrunk along CT
# (the tile count does not change descriptor geometry).
L, K, CS, DH, RP = 16, 8, 8, 128, 256
CT_I8, S = 64, 16  # selected sets per head


def structs(b, dtype, nparts, axis):
    dev = jax.devices()[0]
    host = jax.sharding.SingleDeviceSharding(
        dev, memory_kind="pinned_host"
    )
    hbm = jax.sharding.SingleDeviceSharding(dev)
    import numpy as _np

    ts = 32 if dtype == jnp.int8 else CS
    ct = CT_I8 if dtype == jnp.int8 else CT_I8 * (32 // CS)
    layer = jax.ShapeDtypeStruct((), jnp.int32, sharding=hbm)
    ids = jax.ShapeDtypeStruct((b, K, S), jnp.int32, sharding=hbm)
    u = jax.ShapeDtypeStruct((L, b, ct, ts, RP), dtype, sharding=hbm)
    if axis == "batch":
        pb, pl_ = b // nparts, L
    else:
        pb, pl_ = b, L // nparts
    # Host parts ride the ALIGNED layout (engine._host_aligned): one
    # leading row = one 4096-B host DMA word.
    unit = ts * DH * _np.dtype(dtype).itemsize
    f = 1 if unit % 4096 == 0 else -(-4096 // unit)
    v = tuple(
        jax.ShapeDtypeStruct(
            (pl_, pb, K, ct // f, ts * f, DH), dtype, sharding=host
        )
        for _ in range(nparts)
    )
    return layer, ids, u, v, ts


def case(name, b, dtype, nparts, axis):
    try:
        layer, ids, u, v, ts = structs(b, dtype, nparts, axis)
        gather_chunks.lower(
            layer, ids, u, v,
            chunk_size=CS, tile_sub=ts, host_v=True, host_axis=axis,
        ).compile()
        print(f"PASS  {name}", flush=True)
        return True
    except Exception:
        err = traceback.format_exc().splitlines()
        key = [
            ln for ln in err
            if "LLO" in ln or "multiplier" in ln or "Mosaic" in ln
        ][:2]
        print(f"FAIL  {name}", flush=True)
        print("      " + "\n      ".join(key or err[-2:]), flush=True)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    r = {}
    r["i8_b6_p1"] = case("int8 b6 1-part", 6, jnp.int8, 1, "batch")
    r["i8_b6_p6"] = case("int8 b6 6 slot parts", 6, jnp.int8, 6, "batch")
    r["i8_b6_seg"] = case("int8 b6 4 layer segs", 6, jnp.int8, 4, "layer")
    r["bf16_b6_p1"] = case("bf16 b6 1-part", 6, jnp.bfloat16, 1, "batch")
    r["i8_b1_p1"] = case("int8 b1 1-part", 1, jnp.int8, 1, "batch")
    print("summary:", r, flush=True)
    sys.exit(0 if any(r.values()) else 1)
