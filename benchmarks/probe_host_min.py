"""Minimal host->HBM Pallas DMA geometry bisect.

One kernel, ONE make_async_copy per case, compiled + executed against a
numpy reference. Establishes from first principles which (dtype, rows,
lanes, static/dynamic index) host-space descriptors this platform's
Mosaic LLO accepts — the ring-gather compile failures (multiplier 1024
int8 / 2048 bf16 vs word 4096) survived the 4096-B row relayout, so the
constraint is NOT simply "unit >= 4096 B".
"""

from __future__ import annotations

import functools
import os
import sys
import traceback

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kern(ids_ref, src, out, sem, *, dyn: bool):
    i = ids_ref[0] if dyn else 0
    cp = pltpu.make_async_copy(src.at[i], out, sem.at[0])
    cp.start()
    cp.wait()


def case(name, dtype, c, rows, lanes, dyn):
    try:
        rng = np.random.RandomState(0)
        x = rng.randint(-100, 100, (c, rows, lanes)).astype(np.int32)
        src = jnp.asarray(x, dtype)
        host = jax.sharding.SingleDeviceSharding(
            jax.devices()[0], memory_kind="pinned_host"
        )
        src_h = jax.device_put(src, host)
        idx = jnp.asarray([2], jnp.int32)

        @jax.jit
        def go(idx, src_h):
            return pl.pallas_call(
                functools.partial(_kern, dyn=dyn),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=1,
                    grid=(1,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.MemorySpace.HOST)
                    ],
                    out_specs=pl.BlockSpec(memory_space=pl.ANY),
                    scratch_shapes=[pltpu.SemaphoreType.DMA((1,))],
                ),
                out_shape=jax.ShapeDtypeStruct((rows, lanes), dtype),
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True
                ),
            )(idx, src_h)

        out = np.asarray(go(idx, src_h))
        want = x[2 if dyn else 0].astype(out.dtype)
        ok = np.array_equal(out.astype(np.int32), want.astype(np.int32))
        unit = rows * lanes * np.dtype(dtype).itemsize
        print(f"PASS  {name} unit={unit}B data_ok={ok}", flush=True)
        return True
    except Exception:
        err = traceback.format_exc().splitlines()
        key = [
            ln for ln in err
            if "LLO" in ln or "multiplier" in ln or "Mosaic" in ln
            or "INTERNAL" in ln
        ][:2]
        print(f"FAIL  {name}", flush=True)
        print("      " + "\n      ".join(key or err[-2:]), flush=True)
        return False


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    r = {}
    r["bf16_16x128_st"] = case("bf16 [16,128] static", jnp.bfloat16, 8, 16, 128, False)
    r["bf16_16x128_dy"] = case("bf16 [16,128] dynamic", jnp.bfloat16, 8, 16, 128, True)
    r["i8_32x128_st"] = case("int8 [32,128] static", jnp.int8, 8, 32, 128, False)
    r["i8_32x128_dy"] = case("int8 [32,128] dynamic", jnp.int8, 8, 32, 128, True)
    r["i8_64x128_dy"] = case("int8 [64,128] dynamic", jnp.int8, 8, 64, 128, True)
    r["bf16_32x128_dy"] = case("bf16 [32,128] dynamic", jnp.bfloat16, 8, 32, 128, True)
    r["i8_32x512_dy"] = case("int8 [32,512] dynamic", jnp.int8, 8, 32, 512, True)
    r["bf16_16x512_dy"] = case("bf16 [16,512] dynamic", jnp.bfloat16, 8, 16, 512, True)
    r["f32_8x128_dy"] = case("f32 [8,128] dynamic", jnp.float32, 8, 8, 128, True)
    print("summary:", r, flush=True)
    sys.exit(0 if any(r.values()) else 1)
