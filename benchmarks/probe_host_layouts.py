"""Probe: which host->HBM DMA geometries does this TPU accept?

Round-2 finding: the ring gather's per-chunk host DMA ([cs=8, 128] bf16
= 2048 B) fails Mosaic's LLO check ``multiplier_in_bytes % word_size ==
0 (2048 vs 4096)`` — host-space DMA descriptors appear to operate in
4096-byte words. This probe compiles + runs one tiny pallas_call per
candidate geometry and prints PASS/FAIL + the error head, so the
offload store layout is chosen from evidence:

  A  bf16 [C, 8,128] slice  [ 8,128] = 2048 B  (round-1 layout; expect FAIL)
  B  bf16 [C,16,128] slice  [16,128] = 4096 B  (chunk pairs / cs=16)
  C  bf16 [C, 8,256] slice  [ 8,256] = 4096 B  (wide rows)
  D  int8 [C,32,128] slice  [32,128] = 4096 B  (full int8 tile = 4 chunks)
  E  int8 [C,32,128] slice  [16,128] = 2048 B  (half tile; expect FAIL)
  F  bf16 [C,32,128] slice  [32,128] = 8192 B  (bigger unit sanity)

Run standalone on the real chip: python benchmarks/probe_host_layouts.py
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(ids_ref, src_hbm, dst, sem, *, sub: int):
    i = pl.program_id(0)
    cid = ids_ref[i]
    cp = pltpu.make_async_copy(
        src_hbm.at[cid, pl.ds(0, sub), :],
        dst.at[i, pl.ds(0, sub), :],
        sem.at[0],
    )
    cp.start()
    cp.wait()


def run_case(name, dtype, c, ts, w, sub, n=8, bandwidth=False):
    """Host store [c, ts, w]; DMA [sub, w] slices of n chunks."""
    try:
        host_s = jax.sharding.SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        )
        rng = np.random.RandomState(0)
        src = jnp.asarray(
            rng.randint(-4, 4, (c, ts, w)).astype(np.float32), dtype
        )
        src_h = jax.device_put(src, host_s)
        ids = jnp.asarray(rng.randint(0, c, (n,)), jnp.int32)

        @functools.partial(jax.jit, static_argnames=())
        def go(ids, src_h):
            return pl.pallas_call(
                functools.partial(_copy_kernel, sub=sub),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(n,),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST)],
                    out_specs=pl.BlockSpec(memory_space=pl.ANY),
                    scratch_shapes=[pltpu.SemaphoreType.DMA((1,))],
                ),
                out_shape=jax.ShapeDtypeStruct((n, sub, w), dtype),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True
                ),
            )(ids, src_h)

        out = go(ids, src_h)
        want = np.asarray(src)[np.asarray(ids)][:, :sub, :]
        np.testing.assert_array_equal(np.asarray(out), want)
        unit = sub * w * np.dtype(
            np.int8 if dtype == jnp.int8 else np.float16
        ).itemsize * (2 if dtype != jnp.int8 else 1)
        print(f"PASS  {name}  unit={unit}B", flush=True)
        if bandwidth:
            nb = 512
            ids_b = jnp.asarray(rng.randint(0, c, (nb,)), jnp.int32)

            @jax.jit
            def go_b(ids, src_h):
                return pl.pallas_call(
                    functools.partial(_copy_kernel, sub=sub),
                    grid_spec=pltpu.PrefetchScalarGridSpec(
                        num_scalar_prefetch=1,
                        grid=(nb,),
                        in_specs=[
                            pl.BlockSpec(
                                memory_space=pltpu.MemorySpace.HOST
                            )
                        ],
                        out_specs=pl.BlockSpec(memory_space=pl.ANY),
                        scratch_shapes=[pltpu.SemaphoreType.DMA((1,))],
                    ),
                    out_shape=jax.ShapeDtypeStruct((nb, sub, w), dtype),
                    compiler_params=pltpu.CompilerParams(
                        has_side_effects=True
                    ),
                )(ids, src_h)

            jax.block_until_ready(go_b(ids_b, src_h))
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                o = go_b(ids_b, src_h)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / reps
            by = nb * unit
            print(
                f"      bandwidth: {by/dt/1e9:.2f} GB/s "
                f"({dt*1e3:.2f} ms / {by/1e6:.1f} MB)",
                flush=True,
            )
        return True
    except Exception:
        err = traceback.format_exc().splitlines()
        key = [ln for ln in err if "LLO" in ln or "Mosaic" in ln or
               "INTERNAL" in ln or "Error" in ln][:3]
        print(f"FAIL  {name}", flush=True)
        print("      " + "\n      ".join(key or err[-3:]), flush=True)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    C = 4096
    run_case("A bf16 [C,8,128] sub8  (2048B)", jnp.bfloat16, C, 8, 128, 8)
    b_ok = run_case(
        "B bf16 [C,16,128] sub16 (4096B)", jnp.bfloat16, C, 16, 128, 16,
        bandwidth=True,
    )
    run_case("C bf16 [C,8,256] sub8  (4096B)", jnp.bfloat16, C, 8, 256, 8)
    d_ok = run_case(
        "D int8 [C,32,128] sub32 (4096B)", jnp.int8, C, 32, 128, 32,
        bandwidth=True,
    )
    run_case("E int8 [C,32,128] sub16 (2048B)", jnp.int8, C, 32, 128, 16)
    run_case("F bf16 [C,32,128] sub32 (8192B)", jnp.bfloat16, C, 32, 128, 32)
    print(f"summary: pair_bf16={b_ok} full_tile_int8={d_ok}", flush=True)
    if not (b_ok or d_ok):
        sys.exit(1)  # every geometry failing means probe or platform bug
