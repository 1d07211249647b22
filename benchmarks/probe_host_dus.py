"""Probe: host-space (pinned_host) jit updates + transfer costs.

Answers the hardware questions behind Engine's offload admission /
incremental-prefill strategy choices (models/engine.py
``_host_space_update_supported`` / ``_host_v_write``):

1. Can a jitted dynamic_update_slice run with pinned_host input AND
   output (device-side host-store assembly, no local staging)?
2. How fast is device(HBM) -> pinned_host device_put (per-sub-batch V
   eviction during incremental offload prefill)?
3. How fast is local-numpy -> pinned_host device_put (the fallback
   full-store repin per serving admission — through the axon tunnel
   this ships the bytes over the network)?

Prints one JSON line per measurement to stdout; diagnostics on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def main():
    dev = jax.devices()[0]
    log(f"device: {dev}")
    pinned = jax.sharding.SingleDeviceSharding(
        dev, memory_kind="pinned_host"
    )

    # -- 1. host-space dus capability ------------------------------------
    # Two variants: round 1 omitted in_shardings and the partitioner
    # saw one operand as device-resident ("memory_space of all inputs
    # ... must be the same") — the EXPLICIT form pins both inputs.
    def try_dus(name, explicit):
        try:
            big = jax.jit(
                lambda: jnp.zeros((2, 8, 128), jnp.bfloat16),
                out_shardings=pinned,
            )()
            part = jax.device_put(
                jnp.ones((1, 8, 128), jnp.bfloat16), pinned
            )
            kw = dict(donate_argnums=(0,), out_shardings=pinned)
            if explicit:
                kw["in_shardings"] = (pinned, pinned)
            upd = jax.jit(
                lambda a, b: jax.lax.dynamic_update_slice(
                    a, b, (1, 0, 0)
                ),
                **kw,
            )(big, part)
            got = (
                upd.sharding.memory_kind == "pinned_host"
                and bool(jnp.all(upd[1] == 1))
            )
            emit(name, ok=got)
            return got
        except Exception as e:
            emit(name, ok=False, error=f"{type(e).__name__}: {e}")
            return False

    ok = try_dus("host_space_dus", explicit=False)
    ok = try_dus("host_space_dus_explicit", explicit=True) or ok

    # A slot-sized block at the bench config (16 layers, 8 kv heads,
    # 122K ctx, Dh 128, bf16): ~0.5 GB per slot.
    l, k, c, cs, dh = 16, 8, 15360, 8, 128
    slot_shape = (l, 1, k, c, cs, dh)
    nbytes = int(np.prod(slot_shape)) * 2
    log(f"slot store: {slot_shape} = {nbytes/1e9:.2f} GB bf16")

    # -- 2. HBM -> pinned_host eviction bandwidth ------------------------
    # Round 1 printed 8794 GB/s — the put is asynchronous beyond
    # block_until_ready. Force materialization by reading one element
    # back (tiny tunnel fetch) and take the min over reps.
    try:
        x = jax.jit(lambda: jnp.ones(slot_shape, jnp.bfloat16))()
        jax.block_until_ready(x)
        best = float("inf")
        h = None
        for _ in range(3):
            if h is not None:
                del h
            t0 = time.perf_counter()
            h = jax.device_put(x, pinned)
            jax.block_until_ready(h)
            _ = np.asarray(h[0, 0, 0, -1, -1, :1])  # force completion
            best = min(best, time.perf_counter() - t0)
        emit("d2h_pin_gbps", value=round(nbytes / best / 1e9, 2),
             seconds=round(best, 3))
        del x
    except Exception as e:
        emit("d2h_pin_gbps", error=f"{type(e).__name__}: {e}")
        h = None

    # -- 2b. pinned dus of a slot into a 4-slot store --------------------
    if ok and h is not None:
        try:
            full_shape = (l, 4, k, c, cs, dh)
            store = jax.jit(
                lambda: jnp.zeros(full_shape, jnp.bfloat16),
                out_shardings=pinned,
            )()
            jax.block_until_ready(store)

            dus = jax.jit(
                lambda a, p, o: jax.lax.dynamic_update_slice(
                    a, p, (0, o, 0, 0, 0, 0)
                ),
                donate_argnums=(0,),
                out_shardings=pinned,
            )
            t0 = time.perf_counter()
            store = dus(store, h, 2)
            jax.block_until_ready(store)
            dt = time.perf_counter() - t0
            emit("pinned_slot_dus_gbps", value=round(nbytes / dt / 1e9, 2),
                 seconds=round(dt, 3))
            del store
        except Exception as e:
            emit("pinned_slot_dus_gbps", error=f"{type(e).__name__}: {e}")

    # -- 3. local numpy -> pinned repin (tunnel path) --------------------
    try:
        arr = np.ones(slot_shape, np.float16)  # bf16-sized payload
        t0 = time.perf_counter()
        h2 = jax.device_put(arr.view(np.uint16), pinned)
        jax.block_until_ready(h2)
        dt = time.perf_counter() - t0
        emit("np_pin_gbps", value=round(nbytes / dt / 1e9, 2),
             seconds=round(dt, 3))
    except Exception as e:
        emit("np_pin_gbps", error=f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
