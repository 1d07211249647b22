"""Host-offloaded V store.

The reference keeps the full V cache in pinned CPU DRAM and DMA-gathers
selected chunks per decode step (reference kv_cache.py:554-563,
1081-1095 + CUDA kernels K2/K3). XLA on this TPU platform cannot gather
from host-memory buffers inside a compiled program (mixed memory-space
gathers are rejected), so the TPU-native shape of the same idea is:

- the chunk-major V store lives in host numpy memory,
- inside the jitted decode step an ``io_callback`` fires per layer,
  running the native multithreaded row gather
  (native/host_gather.cpp) over the selected chunk ids,
- the gathered block rides the host->device infeed back into the
  program; hit slots are skipped on the host exactly like the
  reference's cnts-prefix logic.

This is the "correct and measured" offload path (SURVEY.md §7.2 item 1
fallback contract); HBM-resident mode remains the throughput path on a
16 GB chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from shadowkv_tpu.native import gather_rows


class HostVStore:
    """Chunk-major V store in host DRAM with per-layer fetch."""

    def __init__(self, v_full: jax.Array | np.ndarray):
        self.update(v_full)

    def update(self, v_full: jax.Array | np.ndarray):
        """(Re)load the store. The decode jit captures this object by
        reference and the callback reads ``self.rows`` at call time, so
        re-prefilling swaps the data without retracing."""
        # [L, B, K, C, cs, Dh] -> rows [L*B*K*C, cs, Dh]
        arr = np.asarray(v_full)
        self.shape = arr.shape
        l, b, k, c, cs, dh = arr.shape
        self.rows = np.ascontiguousarray(
            arr.reshape(l * b * k * c, cs, dh)
        )
        self.dtype = arr.dtype
        self._jax_dtype = jnp.asarray(arr[:0]).dtype

    def update_slot(self, slot: int, v_slot: np.ndarray):
        """In-place overwrite of one batch slot's chunk rows (continuous
        batching admission, serving.ContinuousBatcher: the freshly
        prefilled request's V replaces the finished request's). The
        decode jit's io_callback reads ``self.rows`` at call time, so
        this swaps data without any retrace."""
        l, b, k, c, cs, dh = self.shape
        v_slot = np.asarray(v_slot).reshape(l, k, c, cs, dh)
        self.rows.reshape(l, b, k, c, cs, dh)[:, slot] = v_slot

    def _host_fetch(self, layer, slot_ids, stay):
        layer = int(layer)
        l, b, k, c, cs, dh = self.shape
        slot_ids = np.asarray(slot_ids)  # [B, K, S]
        s = slot_ids.shape[-1]
        base = (
            (layer * b + np.arange(b)[:, None, None]) * k
            + np.arange(k)[None, :, None]
        ) * c
        flat_idx = (base + slot_ids).reshape(-1).astype(np.int64)
        out = gather_rows(
            self.rows, flat_idx,
            skip=np.asarray(stay).reshape(-1),
        )
        return out.reshape(b, k, s, cs, dh)

    def fetch(self, layer, slot_ids, stay):
        """jit-safe fetch: [B, K, S] chunk ids -> [B, K, S, cs, Dh].

        Rows where ``stay`` is True are unspecified garbage (the caller
        selects the resident buffer rows for those slots anyway).
        """
        b, k, s = slot_ids.shape
        _, _, _, _, cs, dh = self.shape
        return jax.experimental.io_callback(
            self._host_fetch,
            jax.ShapeDtypeStruct((b, k, s, cs, dh), self._jax_dtype),
            layer, slot_ids, stay,
        )
