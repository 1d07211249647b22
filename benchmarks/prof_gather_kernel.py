"""Microbenchmark: Pallas chunk-gather strategies vs XLA's native gather.

The decode hot path gathers ~16K chunk rows (2-4 KB each) per layer
from U and from the V store. XLA's gather runs at ~106 GB/s effective;
this measures what hand-pipelined DMA can do.

Mosaic constraint: the DMA'd unit must have its (sublane, lane) dims
aligned to the dtype tiling — so tables are laid out 4D
[B, C, cs, lanes] with cs a multiple of 8 and lanes a multiple of 128,
and the gather slices the UNTILED dim 1 (chunk id).
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


B, K, S = 8, 8, 256  # gather [B,K,S] chunks
C = 4084  # table chunks (32K ctx)
CS, LANES = 8, 128  # chunk unit [8, 128] bf16 = 2 KB


def make_inputs(key):
    # [B*K, C, cs, lanes] ~534 MB at 32K ctx — matches one layer of the
    # real per-(batch,head) V store and defeats any VMEM promotion.
    table = jax.random.normal(key, (B * K, C, CS, LANES), jnp.bfloat16)
    ids = jax.random.randint(key, (B, K, S), 0, C)
    return table, ids


def xla_gather(table, ids):
    bki = jnp.arange(B * K).reshape(B, K)[..., None]
    return table[bki, ids]  # [B,K,S,CS,LANES]


def _ring_kernel(ids_ref, table_ref, out_ref, sems):
    NSEM = 16
    bk = pl.program_id(0)
    b = bk // K
    k = bk % K

    def dma(j, slot):
        cid = ids_ref[b, k, j]
        return pltpu.make_async_copy(
            table_ref.at[bk, cid],
            out_ref.at[bk, j],
            sems.at[slot],
        )

    def loop(j, _):
        @pl.when(j >= NSEM)
        def _():
            dma(j - NSEM, j % NSEM).wait()

        dma(j, j % NSEM).start()
        return 0

    jax.lax.fori_loop(0, S, loop, 0)

    def drain(i, _):
        j = S - NSEM + i
        dma(j, j % NSEM).wait()
        return 0

    jax.lax.fori_loop(0, NSEM, drain, 0)


def pallas_ring(table, ids):
    out = pl.pallas_call(
        _ring_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B * K,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        ),
        out_shape=jax.ShapeDtypeStruct((B * K, S, CS, LANES), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ids, table)
    return out.reshape(B, K, S, CS, LANES)


def main():
    key = jax.random.PRNGKey(0)
    table, ids = make_inputs(key)
    bytes_moved = 2 * B * K * S * CS * LANES * 2  # read + write
    t = timeit(jax.jit(xla_gather), table, ids)
    print(f"xla gather:      {t:.3f} ms  ({bytes_moved/t*1e3/1e9:.0f} GB/s r+w)")
    t = timeit(jax.jit(pallas_ring), table, ids)
    print(f"pallas ring dma: {t:.3f} ms  ({bytes_moved/t*1e3/1e9:.0f} GB/s r+w)")
    a = jax.jit(xla_gather)(table, ids)
    bb = jax.jit(pallas_ring)(table, ids)
    print("match:", bool(jnp.all(a == bb)))


if __name__ == "__main__":
    main()
